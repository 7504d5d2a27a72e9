"""AGR-style JSON sources — S11 (ccmm/agr/genes.py:64-200 in the reference).

The reference json.load()s {metaData:..., data:[...]} documents and walks
the per-gene dicts in Python. Here one spark.read.json (multiLine) scan +
explode(data) yields a genes DataFrame with nested genomeLocations; the
disease/phenotype documents are the same shape with different nested
fields. All field access is columnar; no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_data_array_json(spark: SparkSession, path: str) -> DataFrame:
    """Generic S11 reader: a {data:[...]} document exploded to one row per
    element. multiLine handles pretty-printed documents (one JSON per
    file); at scale prefer JSON-lines landing files (no multiLine —
    splittable)."""
    doc = spark.read.option("multiLine", True).json(path)
    return doc.select(F.explode("data").alias("rec"))


def read_bgi_genes(spark: SparkSession, path: str) -> DataFrame:
    """BGI gene documents (agr/genes.py:64-124): primaryId/symbol/taxon and
    the nested genomeLocations array flattened to typed interval columns
    (the GenomeLocation struct from SURVEY.md §1.2 — range-join ready)."""
    recs = read_data_array_json(spark, path)
    return recs.select(
        F.col("rec.primaryId").alias("gene_id"),
        F.col("rec.symbol").alias("symbol"),
        F.col("rec.soTermId").alias("so_term_id"),
        F.col("rec.taxonId").alias("taxon_id"),
        F.explode_outer("rec.genomeLocations").alias("loc"),
    ).select(
        "gene_id", "symbol", "so_term_id", "taxon_id",
        F.col("loc.assembly").alias("assembly"),
        F.col("loc.chromosome").alias("chromosome"),
        F.col("loc.startPosition").cast("long").alias("start"),
        F.col("loc.endPosition").cast("long").alias("end"),
        F.col("loc.strand").alias("strand"),
    )


def read_phenotype_annotations(spark: SparkSession, path: str) -> DataFrame:
    """Phenotype documents (agr/genes.py:327-380): one MP term per record
    (the reference's stated RGD/MGI assumption), publication id possibly
    empty — the downstream pub count skips empties exactly like the
    reference's `if i == "": continue`."""
    recs = read_data_array_json(spark, path)
    return recs.select(
        F.col("rec.objectId").alias("gene_id"),
        F.col("rec.phenotypeTermId").alias("phe_term_id"),
        F.col("rec.evidence.publicationId").alias("publication_id"),
        F.col("rec.dateAssigned").alias("date_assigned"),
    )


def read_disease_annotations(spark: SparkSession, path: str) -> DataFrame:
    """Disease documents (agr/genes.py:126-162): DOid + evidence codes +
    publication ids per object; grouped per (gene, DOid) downstream with
    collect_list (J7)."""
    recs = read_data_array_json(spark, path)
    return recs.select(
        F.col("rec.objectId").alias("gene_id"),
        F.col("rec.DOid").alias("do_id"),
        F.col("rec.objectRelation.associationType").alias("association_type"),
        F.col("rec.evidence.evidenceCodes").alias("evidence_codes"),
        F.col("rec.evidence.publication.publicationId").alias("publication_id"),
    )
