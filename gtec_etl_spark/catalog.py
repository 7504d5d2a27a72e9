"""Table catalog over the driver-generated parquet test data.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. Parquet scans give Catalyst predicate pushdown
and column pruning for free — every query should show `PushedFilters` /
pruned `ReadSchema` in `.explain("formatted")`.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # events.parquet is INT64 TIMESTAMP(NANOS); any session that hasn't set
    # nanosAsLong throws PARQUET_TYPE_ILLEGAL at plan time. Set it
    # defensively here (runtime-settable) so the catalog works under ANY
    # SparkSession, not just our own session.py.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # With nanosAsLong the ts column scans as a long that we truncate
        # to microseconds (same floor DuckDB applies reading ns).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


class _LazyTables(Mapping):
    """Mapping of table name -> DataFrame that reads each parquet footer
    only on first access. A query touching 3 tables plans 3 scans, and a
    bad/unreadable table can never block queries that don't use it.

    A real collections.abc.Mapping (NOT a dict subclass, whose C-level
    fast paths like dict(t) / {**t} would bypass lazy loading and see an
    empty store): every protocol operation — get/items/values/in/dict() —
    derives from __getitem__/__iter__/__len__, so all of them agree and
    materializing the whole mapping explicitly loads all tables."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(name)
        if name not in self._cache:
            self._cache[name] = table(self._spark, self._sf_dir, name)
        return self._cache[name]

    def __iter__(self):
        return iter(TABLES)

    def __len__(self) -> int:
        return len(TABLES)


def load_tables(spark: SparkSession, sf_dir: str) -> Mapping[str, DataFrame]:
    """Lazy per-table access: tables load on first subscript, not here."""
    return _LazyTables(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view (parse-once-query-many; the
    reference's shared-graph pattern, SURVEY.md §4)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
