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

# Schema of the driver's events table as stored on disk: ts is parquet
# TIMESTAMP(NANOS), which a default session refuses to scan
# (PARQUET_TYPE_ILLEGAL). An explicit user schema with `ts long` reads it
# on ANY session without touching spark.sql.legacy.parquet.nanosAsLong —
# no hidden session-global conf mutation (streaming read_events_stream
# uses the same trick).
EVENTS_FILE_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string,"
    " value double, props string"
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        df = spark.read.schema(EVENTS_FILE_SCHEMA).parquet(path)
        # Truncate nanos to microseconds (same floor DuckDB applies
        # reading ns) and surface a real timestamp column.
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(path)


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
