"""Embedded study-catalog text parser — S15 (ccmm/gtex/wgs_datasets.py:65-119,
ccmm/topmed/wgs_datasets.py:188-248 in the reference).

The reference runs a line-oriented regex state machine over pasted dbGaP
search output: a record starts at an accession line; subsequent lines attach
fields to the current record. The Spark re-expression keeps exact line
semantics without driver-side loops:

  wholetext read (one row per file) → split to (line_no, line) via
  posexplode (deterministic line numbers, unlike monotonically_increasing_id)
  → record id = running count of record-start lines (window cumsum per
  file) → one groupBy(record) picking each field with max(regexp_extract).

Catalog files are small (they're pasted text); the wholetext read is the
honest scale statement — per-file sequential semantics, files parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """(file, line_no, line) with exact in-file line numbers."""
    # NB: wholetext must be the .text() keyword — .option("wholetext", ...)
    # is silently ignored by the text source in Spark 4.1, which would
    # degrade this to per-line rows with line_no always 0.
    whole = spark.read.text(path, wholetext=True).select(
        F.col("value"), F.input_file_name().alias("file")
    )
    return whole.select(
        "file",
        F.posexplode(F.split("value", "\n")).alias("line_no", "line"),
    )


def parse_records(
    lines: DataFrame,
    record_start: str,
    fields: dict[str, str],
) -> DataFrame:
    """State-machine record assembly: `record_start` is the regex marking a
    new record; `fields` maps output column -> regex with one capture
    group, matched against any line of the record."""
    started = lines.withColumn(
        "__start", F.when(F.col("line").rlike(record_start), 1).otherwise(0)
    )
    w = (
        W.partitionBy("file")
        .orderBy("line_no")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    rec = started.withColumn("record_id", F.sum("__start").over(w)).filter(
        F.col("record_id") > 0
    )
    aggs = [
        F.max(
            F.when(
                F.col("line").rlike(pattern),
                F.regexp_extract("line", pattern, 1),
            )
        ).alias(name)
        for name, pattern in fields.items()
    ]
    return rec.groupBy("file", "record_id").agg(*aggs)


# The dbGaP search-output shape the reference's embedded catalogs encode
# (study accession header line, then indented attribute lines).
STUDY_START = r"^(phs\d+\.v\d+\.p\d+)"
STUDY_FIELDS = {
    "study_id": r"^(phs\d+\.v\d+\.p\d+)",
    "study_name": r"^phs\d+\.v\d+\.p\d+\s+(.+?)\s*$",
    "n_participants": r"participants:\s*(\d+)",
    "study_type": r"study type:\s*(.+?)\s*$",
    "platform": r"platform:\s*(.+?)\s*$",
}


def parse_study_catalog(spark: SparkSession, path: str) -> DataFrame:
    """S15: the embedded study catalog as a DataFrame of
    (study_id, study_name, n_participants, study_type, platform)."""
    recs = parse_records(read_lines(spark, path), STUDY_START, STUDY_FIELDS)
    return recs.select(
        "study_id",
        "study_name",
        F.col("n_participants").cast("long").alias("n_participants"),
        "study_type",
        "platform",
    )
