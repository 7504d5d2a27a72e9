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
    """Merge a collapsed changelog into the dimension — `MERGE INTO`
    semantics without a table-format dependency — as two broadcast
    branches, NOT one full-outer join: Spark's BroadcastHashJoin supports
    every join type EXCEPT full outer, so a broadcast hint on a full join
    is silently ignored and the merge degrades to a sort-merge join that
    shuffles the whole dimension. The split keeps the hint honored:

    - upserts: base LEFT OUTER broadcast(log) — matched op='D' rows drop,
      matched op<>'D' take the log attrs, unmatched keep base attrs;
    - inserts: log-only op<>'D' rows, found by anti-joining the log
      against the (log-bounded) output of base LEFT SEMI broadcast(log).

    Cost: two base scans (semi + outer), ZERO shuffles of the dimension,
    every join side that moves is log-sized — the claim "only the (small)
    log side moves" now actually holds in the physical plan
    (tests/test_operators.py pins no-SortMergeJoin on this path)."""
    b, l = base.alias("b"), latest.alias("l")
    on = F.col(f"l.{key}") == F.col(f"b.{key}")
    upserts = (
        b.join(F.broadcast(l), on, "left")
        .filter(F.col("l.op").isNull() | (F.col("l.op") != "D"))
        .select(
            F.col(f"b.{key}").alias(key),
            *[
                F.when(F.col(f"l.{key}").isNull(), F.col(f"b.{a}"))
                .otherwise(F.col(f"l.{a}"))
                .alias(a)
                for a in attrs
            ],
        )
    )
    matched_keys = b.join(F.broadcast(l), on, "left_semi").select(
        F.col(f"b.{key}").alias(key)
    )
    inserts = (
        latest.filter(F.col("op").isNull() | (F.col("op") != "D"))
        .join(F.broadcast(matched_keys), key, "left_anti")
        .select(key, *attrs)
    )
    return upserts.unionByName(inserts)
