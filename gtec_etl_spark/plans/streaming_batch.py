"""Batch-checkable analogs of the streaming surface (SURVEY.md §2.10).

The reference is batch-only; the engine adds Structured Streaming over the
`events` table (gtec_etl_spark/streaming/). These queries compute the same
windowed aggregations in batch so the oracle can verify the window
semantics; the streaming module reuses identical expressions behind
readStream + watermark.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gtec_etl_spark import catalog
from gtec_etl_spark.plans.registry import query


@query(
    "ev_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum("value"), 4) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    tags=("streaming",),
)
def ev_tumbling_hourly(spark, sf_dir):
    """Tumbling 1-hour window aggregation — the batch shape of
    `groupBy(window('ts','1 hour'), ...)` with a watermark in streaming."""
    ev = catalog.table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "ev_sliding_windows",
    oracle="""
    SELECT window_start, count(*) AS n_events, round(sum("value"), 4) AS total_value
    FROM (
      SELECT time_bucket(INTERVAL '10 minutes', ts)
               - k * INTERVAL '10 minutes' AS window_start,
             "value"
      FROM events, generate_series(0, 2) s(k)
    )
    GROUP BY window_start ORDER BY window_start
    """,
    tags=("streaming",),
)
def ev_sliding_windows(spark, sf_dir):
    """Sliding windows (30-minute length, 10-minute slide) via the native
    window() generator — each event lands in 3 overlapping windows."""
    ev = catalog.table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@query(
    "ev_json_props_extract",
    oracle="""
    SELECT CAST(json_extract("props", '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n, round(avg("value"), 4) AS avg_value
    FROM events GROUP BY 1 ORDER BY k_bucket
    """,
    tags=("streaming", "scalar"),
)
def ev_json_props_extract(spark, sf_dir):
    """§2.9 JSON decode: get_json_object over the props payload column —
    the semi-structured path every event pipeline needs."""
    ev = catalog.table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_bucket", F.get_json_object("props", "$.k").cast("long") % 10
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("k_bucket")
    )
