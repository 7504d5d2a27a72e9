"""Change-data-capture application: collapse a changelog to its
latest-wins effect and merge it into a dimension snapshot.

Shared by the batch query (plans/incremental_queries.etl_cdc_upsert) and
the streaming maintenance loop (streaming/pipelines.
run_cdc_dimension_maintenance) so both paths apply IDENTICAL merge
semantics — the property that makes a streaming-maintained dimension
reconcilable against a batch rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collapse_changelog(log: DataFrame, key: str, attrs: list[str]) -> DataFrame:
    """Reduce (key, op, seq, *attrs) change rows to the single
    highest-seq change per key (max_by — ONE bounded shuffle on the key,
    the log is always << the dimension). Ties on seq are resolved by
    max_by's last-encountered row; feed a total (seq) ordering for
    determinism — production changelogs (Kafka offsets, LSNs) are."""
    return log.groupBy(key).agg(
        F.max_by("op", "seq").alias("op"),
        *[F.max_by(a, "seq").alias(a) for a in attrs],
    )


def apply_changes(
    base: DataFrame, latest: DataFrame, key: str, attrs: list[str]
) -> DataFrame:
    """Merge a collapsed changelog into the dimension: one FULL join on
    the key applies inserts (log-only rows), updates (matched, op<>'D')
    and deletes (op='D' filtered out) in a single pass — `MERGE INTO`
    semantics without a table-format dependency. The base side should
    stay hash-partitioned on the key across runs so only the (small) log
    side moves."""
    b, l = base.alias("b"), latest.alias("l")
    merged = b.join(F.broadcast(l), F.col(f"l.{key}") == F.col(f"b.{key}"), "full")
    return merged.filter(
        F.col("l.op").isNull() | (F.col("l.op") != "D")
    ).select(
        F.coalesce(F.col(f"l.{key}"), F.col(f"b.{key}")).alias(key),
        *[
            F.when(F.col(f"l.{key}").isNull(), F.col(f"b.{a}"))
            .otherwise(F.col(f"l.{a}"))
            .alias(a)
            for a in attrs
        ],
    )
