"""dbGaP-style XML sources — S7 data_dict / var_report parser and S8
study-directory scanner (ccmm/dbgap/public_metadata.py:94-231 and :234-349
in the reference).

The reference walks an ElementTree per file on the driver. Here Spark 4's
native XML data source scans `<variable>` row tags distributed, yielding a
nested variables DataFrame (per-variable stats struct, enum value+count
arrays) — the S7 contract. The S8 filename catalog is a regexp_extract
cascade over the file listing, with the reference's substudy heuristic (a
study with no data_dict is a substudy) as an anti-join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# dbGaP file-name shape the reference parses (public_metadata.py:16-40):
#   phs000951.v2.pht005252.v2.TOPMed_WGS_Amish_Subject.data_dict.xml
FILENAME_RE = (
    r"(phs\d+)\.(v\d+)\.(pht\d+)\.(v\d+)\.([A-Za-z0-9_]+?)"
    r"\.(data_dict|var_report)\.xml$"
)


def read_data_dict(spark: SparkSession, path: str) -> DataFrame:
    """S7: one row per <variable> with id/name/type/unit and nested enum
    values; source file retained for S8-style cataloging."""
    df = (
        spark.read.format("xml")
        .option("rowTag", "variable")
        .load(path)
    )
    cols = {f.name for f in df.schema.fields}
    out = df.select(
        F.col("_id").alias("var_id"),
        F.col("name").alias("var_name"),
        *( [F.col("type").alias("var_type")] if "type" in cols else [] ),
        *( [F.col("unit").alias("unit")] if "unit" in cols else [] ),
        *(
            [
                F.expr(
                    "transform(value, v -> struct(v._code AS code, v._VALUE AS label))"
                ).alias("enum_values")
            ]
            if "value" in cols
            else []
        ),
        F.col("_metadata.file_path").alias("source_file"),
    )
    return out


def read_var_report(spark: SparkSession, path: str) -> DataFrame:
    """S7: variable summary statistics (n, mean, median, min, max, sd) and
    enum value counts from a var_report document."""
    df = spark.read.format("xml").option("rowTag", "variable").load(path)
    stat = "total.stats.stat"
    out = df.select(
        F.col("_id").alias("var_id"),
        F.col("name").alias("var_name"),
        F.col(f"{stat}._n").cast("long").alias("n"),
        F.col(f"{stat}._mean").cast("double").alias("mean"),
        F.col(f"{stat}._median").cast("double").alias("median"),
        F.col(f"{stat}._min").cast("double").alias("min"),
        F.col(f"{stat}._max").cast("double").alias("max"),
        F.col(f"{stat}._sd").cast("double").alias("sd"),
        *(
            [
                F.expr(
                    "transform(total.stats.enum.value,"
                    " v -> struct(v._VALUE AS label, v._count AS n))"
                ).alias("enum_counts")
            ]
            if _has_nested_field(df.schema, ["total", "stats", "enum"])
            else []
        ),
        F.col("_metadata.file_path").alias("source_file"),
    )
    return out


def _has_nested_field(schema, path: list[str]) -> bool:
    """True iff the dotted field path exists in the inferred XML schema
    (enum sections are absent for purely numeric var_reports)."""
    from pyspark.sql.types import StructType

    cur = schema
    for name in path:
        if not isinstance(cur, StructType) or name not in cur.fieldNames():
            return False
        cur = cur[name].dataType
    return True


def scan_study_directory(spark: SparkSession, directory: str) -> DataFrame:
    """S8 (public_metadata.py:234-266): regex-parse every metadata filename
    in a study directory into (study_id, study_version, phenotype_id,
    table_name, metadata_type)."""
    names = [
        (f,) for f in sorted(os.listdir(directory)) if f.endswith(".xml")
    ]
    files = spark.createDataFrame(names, "file_name string")
    parsed = files.select(
        "file_name",
        F.regexp_extract("file_name", FILENAME_RE, 1).alias("study_id"),
        F.regexp_extract("file_name", FILENAME_RE, 2).alias("study_version"),
        F.regexp_extract("file_name", FILENAME_RE, 3).alias("phenotype_id"),
        F.regexp_extract("file_name", FILENAME_RE, 4).alias("table_version"),
        F.regexp_extract("file_name", FILENAME_RE, 5).alias("table_name"),
        F.regexp_extract("file_name", FILENAME_RE, 6).alias("metadata_type"),
    ).filter(F.col("study_id") != "")
    return parsed


def substudies(catalog_df: DataFrame) -> DataFrame:
    """P7 substudy heuristic (public_metadata.py:279-299): studies with no
    data_dict file are substudies — derived with an anti-join."""
    with_dd = catalog_df.filter(F.col("metadata_type") == "data_dict").select(
        "study_id"
    ).distinct()
    return (
        catalog_df.select("study_id").distinct().join(with_dd, "study_id", "left_anti")
    )
