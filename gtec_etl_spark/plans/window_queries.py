"""Analytic window-function pack — §2.6 extended.

The reference has no lead/lag/rank/frames (SURVEY.md §2.6: the mode pick is
its only ranking-like computation); a complete engine needs the full
analytic family. All frames are deterministic (total orders with unique
tie-breakers) so the DuckDB oracle hashes identically.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from gtec_etl_spark import catalog
from gtec_etl_spark.plans.registry import query


@query(
    "q29_order_gaps_lead_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey)  OVER w AS prev_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           date_diff('day',
             lag(CAST(o_orderdate AS DATE)) OVER w,
             CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "analytic"),
)
def q29_order_gaps_lead_lag(spark, sf_dir):
    """lead/lag over a per-customer order timeline: previous/next order and
    inter-order gap in days — the analytic family the reference lacks."""
    orders = catalog.table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_date = F.lag(F.col("o_orderdate").cast("date")).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.datediff(F.col("o_orderdate").cast("date"), prev_date).alias("days_since_prev"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q30_rank_dense_ntile",
    oracle="""
    SELECT o_custkey, o_orderkey,
           rank()       OVER w AS price_rank,
           dense_rank() OVER w AS price_dense_rank,
           ntile(4)     OVER w AS price_quartile
    FROM orders
    WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "analytic"),
)
def q30_rank_dense_ntile(spark, sf_dir):
    """rank / dense_rank / ntile quartiles per customer by order value."""
    orders = catalog.table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q31_range_frame_rolling",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS events_last_hour
    FROM events
    WHERE user_id < 5
    ORDER BY user_id, event_id
    """,
    tags=("window", "analytic", "range-frame"),
)
def q31_range_frame_rolling(spark, sf_dir):
    """RANGE frame over event time: events in the trailing hour per user —
    a value-based (not row-based) frame, the time-series rolling shape.
    Counts are tie-safe even with equal timestamps (RANGE peers)."""
    ev = catalog.table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
    ).orderBy("user_id", "event_id")


@query(
    "q32_characteristic_pivot",
    oracle="""
    PIVOT (
      SELECT c_custkey AS subject_id, char_name, char_value FROM (
        SELECT c_custkey, 'mktsegment' AS char_name, c_mktsegment AS char_value FROM customer
        UNION ALL
        SELECT c_custkey, 'nation', CAST(c_nationkey AS VARCHAR) FROM customer
        UNION ALL
        SELECT c_custkey, 'balance_band',
               CASE WHEN c_acctbal < 0 THEN 'neg'
                    WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END FROM customer
      )
    ) ON char_name USING min(char_value)
    GROUP BY subject_id
    ORDER BY subject_id
    """,
    tags=("pivot", "dynamic", "refquery"),
)
def q32_characteristic_pivot(spark, sf_dir):
    """The reference's ACTUAL Q6 pivot shape (rdflib_tabular_dump.py:
    335-342): characteristics stored tall as (subject, name, value) rows,
    pivoted into data-dependent wide columns — unpivot (stack) then
    two-pass dynamic pivot."""
    from gtec_etl_spark.operators.pivot import dynamic_pivot

    cust = catalog.table(spark, sf_dir, "customer")
    tall = cust.select(
        F.col("c_custkey").alias("subject_id"),
        F.expr(
            "stack(3,"
            " 'mktsegment', c_mktsegment,"
            " 'nation', CAST(c_nationkey AS STRING),"
            " 'balance_band', CASE WHEN c_acctbal < 0 THEN 'neg'"
            "   WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END"
            ") AS (char_name, char_value)"
        ),
    )
    return dynamic_pivot(tall, ["subject_id"], "char_name", F.min("char_value")).orderBy(
        "subject_id"
    )


@query(
    "q48_percent_rank_cume",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT)
             AS pr_ppm,
           CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT)
             AS cd_ppm
    FROM orders
    WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def q48_percent_rank_cume(spark, sf_dir):
    """The relative-position window pair q30's rank family left out:
    percent_rank ((rank-1)/(n-1)) and cume_dist (rows<=current / n) —
    the normalized forms percentile-based quality cuts use ("drop the
    bottom decile per group"). Both are ratios of small integers, so
    the double is exact (numerator, denominator < 2^26; one IEEE
    division is identical in both engines) and the ppm quantization is
    pure presentation. Same fingerprint-row convention and
    deterministic tie-break as the rest of the window pack."""
    orders = catalog.table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        orders.filter(F.col("o_custkey") < 30)
        .select(
            "o_custkey",
            "o_orderkey",
            F.floor(F.percent_rank().over(w) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("pr_ppm"),
            F.floor(F.cume_dist().over(w) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("cd_ppm"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )
