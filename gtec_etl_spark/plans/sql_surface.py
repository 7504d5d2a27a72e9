"""SQL-text query surface with parameter binding — the capability parity
for the reference's SPARQL text + initBindings layer (SURVEY.md §3.3).

The reference ships each query twice: SPARQL text evaluated generically,
and a hand-compiled rdflib plan (the fast path). Catalyst collapses the
distinction: the SQL text below IS the fast path (§4). Parameters use
Spark's native named-parameter binding (`spark.sql(query, args=...)`) —
constant-folded into the plan exactly like initBindings narrowed the BGP.

Queries registered here share oracles with their DataFrame twins in
etl_queries.py, proving the two surfaces are equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gtec_etl_spark import catalog
from gtec_etl_spark.plans.registry import query


def run_sql(
    spark: SparkSession, sf_dir: str, sql: str, args: dict | None = None
) -> DataFrame:
    """Register the catalog as temp views (parse-once-query-many) and run
    parameterized SQL text."""
    catalog.register_views(spark, sf_dir)
    return spark.sql(sql, args=args or {})


REF_Q2_SQL = """
    SELECT DISTINCT p.p_name AS var_name, p.p_partkey AS var_id
    FROM nation n
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE n.n_name = :study
    ORDER BY var_name, var_id
"""

REF_Q3_SQL = """
    SELECT r.r_name AS program, n.n_name AS study, c.c_mktsegment AS study_group,
           c.c_custkey AS member_id, c.c_name AS member_name
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE r.r_name = :program AND c.c_mktsegment = :grp
    ORDER BY study, member_name, member_id
"""


@query(
    "ref_q2_sql_param",
    oracle="""
    SELECT DISTINCT p.p_name AS var_name, p.p_partkey AS var_id
    FROM nation n
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE n.n_name = 'NATION_3'
    ORDER BY var_name, var_id
    """,
    tags=("refquery", "sql"),
)
def ref_q2_sql_param(spark, sf_dir):
    """Q2 as parameterized SQL TEXT (initBindings parity): the :study
    parameter is constant-folded by Catalyst into a pushed-down filter,
    same plan as the DataFrame twin ref_q2_dataset_variables."""
    return run_sql(spark, sf_dir, REF_Q2_SQL, {"study": "NATION_3"})


@query(
    "ref_q3_sql_param",
    oracle="""
    SELECT r.r_name AS program, n.n_name AS study, c.c_mktsegment AS study_group,
           c.c_custkey AS member_id, c.c_name AS member_name
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA' AND c.c_mktsegment = 'BUILDING'
    ORDER BY study, member_name, member_id
    """,
    tags=("refquery", "sql"),
)
def ref_q3_sql_param(spark, sf_dir):
    """Q3 as parameterized SQL text with two bindings (study set + group
    name), mirroring sparql_list_study_group_members.py:47-64."""
    return run_sql(spark, sf_dir, REF_Q3_SQL, {"program": "ASIA", "grp": "BUILDING"})


EXISTS_SQL = """
    SELECT c.c_custkey AS member_id, c.c_name AS member_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    ORDER BY member_id
"""


@query("q37_correlated_exists", oracle=EXISTS_SQL, tags=("refquery", "sql"))
def q37_correlated_exists(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS — the SQL spelling of the J9/J10
    semi/anti reconciliation (bin/gtex_v7_to_dats.py:42-94): members with
    at least one finalized order and none open. Catalyst rewrites both
    subqueries into left-semi / left-anti hash joins (no per-row
    subquery execution), so the plan is the same 100 TB shape as the
    DataFrame twins q04/q05. The oracle is the IDENTICAL SQL text run on
    DuckDB."""
    return run_sql(spark, sf_dir, EXISTS_SQL)


LATERAL_SQL = """
    SELECT n.n_name AS study, t.c_name AS member_name, t.c_acctbal AS acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
    ORDER BY study, acctbal DESC, member_name
"""


@query("q38_lateral_topk_per_group", oracle=LATERAL_SQL, tags=("refquery", "sql"))
def q38_lateral_topk_per_group(spark, sf_dir):
    """LATERAL correlated subquery: top-2 members per study by balance —
    the SQL spelling of the q16 window top-k. Spark decorrelates the
    LATERAL into a ranked window over one hash exchange (never a per-group
    re-scan). The comma-LATERAL text parses identically on DuckDB, so the
    same string is query and oracle."""
    return run_sql(spark, sf_dir, LATERAL_SQL)


SCD2_SPARK_SQL = """
    WITH base AS (
      SELECT c_custkey AS cust_id, c_name AS name, c_mktsegment AS segment,
             DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
             TRUE AS is_current
      FROM customer
    ),
    batch AS (
      SELECT c_custkey AS cust_id,
             CASE WHEN c_custkey % 7 = 0 THEN concat(c_name, '-v2')
                  ELSE c_name END AS name,
             CASE WHEN c_custkey % 13 = 0 THEN concat('SEG-', c_mktsegment)
                  ELSE c_mktsegment END AS segment
      FROM customer WHERE c_custkey % 7 = 0 OR c_custkey % 13 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS cust_id,
             concat('new-', CAST(c_custkey AS STRING)) AS name,
             c_mktsegment AS segment
      FROM customer WHERE c_custkey % 97 = 0
    ),
    changed AS (
      SELECT b.cust_id, b.name, b.segment
      FROM batch b JOIN base d ON d.cust_id = b.cust_id
      WHERE d.is_current AND (d.name IS DISTINCT FROM b.name
                              OR d.segment IS DISTINCT FROM b.segment)
    ),
    brand_new AS (
      SELECT b.cust_id, b.name, b.segment
      FROM batch b LEFT ANTI JOIN base d ON d.cust_id = b.cust_id
    )
    SELECT d.cust_id, d.name, d.segment, d.valid_from,
           CASE WHEN c.cust_id IS NOT NULL
                THEN DATE '2024-06-01' ELSE d.valid_to END AS valid_to,
           c.cust_id IS NULL AS is_current
    FROM base d LEFT JOIN changed c ON c.cust_id = d.cust_id
    UNION ALL
    SELECT cust_id, name, segment, DATE '2024-06-01' AS valid_from,
           CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
    FROM (SELECT * FROM changed UNION ALL SELECT * FROM brand_new)
    ORDER BY cust_id, valid_from
"""


def _scd2_oracle() -> str:
    from gtec_etl_spark.plans.incremental_queries import SCD2_ORACLE_SQL

    return SCD2_ORACLE_SQL


@query("sql_scd2_merge", oracle=_scd2_oracle(), tags=("incremental", "sql"))
def sql_scd2_merge(spark, sf_dir):
    """etl_scd2_merge expressed as pure SQL TEXT through spark.sql — the
    MERGE-shaped SCD2 recipe is fully declarative, so the SQL surface and
    the DataFrame twin (plans/incremental_queries.py) compile to the same
    Catalyst plan and share one oracle; dialect deltas are confined to
    concat()/LEFT ANTI JOIN spelling. Proves a reference user can run the
    incremental-ETL layer from SQL alone (the SPARQL-text capability
    parity argument of this module, extended to the extension surface)."""
    return run_sql(spark, sf_dir, SCD2_SPARK_SQL)
