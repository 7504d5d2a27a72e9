"""RDF-style triples view + basic-graph-pattern query — S16/J13
(sparql/v0.7/rdflib_util.py:54-63 and the SPARQL BGP plans, SURVEY.md §2.4
J13).

The reference materializes its document as ~663k (s, p, o) triples and
answers queries by chained triple scans. This module demonstrates both
halves of the engine's position (SURVEY.md §4):

1. a `triples` view CAN be built from the normalized tables (entity
   columns unpivoted to predicates) and BGP queries run as self-joins of
   that view — shown here, oracle-checked;
2. the same answer falls out of one direct join on the entity tables —
   which is why the engine's primary surface is the normalized model (the
   reference itself abandoned the generic evaluator for hand-compiled
   plans at 120x speedup; Catalyst compiles our joins automatically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gtec_etl_spark import catalog
from gtec_etl_spark.plans.registry import query

TRIPLES_SQL_CTE = """
    triples AS (
      SELECT concat('cust:', CAST(c_custkey AS VARCHAR)) AS s, 'name' AS p,
             c_name AS o FROM customer
      UNION ALL
      SELECT concat('cust:', CAST(c_custkey AS VARCHAR)), 'segment',
             c_mktsegment FROM customer
      UNION ALL
      SELECT concat('cust:', CAST(c_custkey AS VARCHAR)), 'nation',
             concat('nation:', CAST(c_nationkey AS VARCHAR)) FROM customer
      UNION ALL
      SELECT concat('nation:', CAST(n_nationkey AS VARCHAR)), 'title',
             n_name FROM nation
    )
"""


def triples_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (s, p, o) unpivot of the customer/nation entity tables."""
    t = catalog.load_tables(spark, sf_dir)
    c = t["customer"]
    s = F.concat(F.lit("cust:"), F.col("c_custkey").cast("string"))
    cust_triples = c.select(
        F.expr(
            "stack(3,"
            " 'name', c_name,"
            " 'segment', c_mktsegment,"
            " 'nation', concat('nation:', CAST(c_nationkey AS STRING))"
            ") AS (p, o)"
        ),
        s.alias("s"),
    ).select("s", "p", "o")
    nation_triples = t["nation"].select(
        F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string")).alias("s"),
        F.lit("title").alias("p"),
        F.col("n_name").alias("o"),
    )
    return cust_triples.unionByName(nation_triples)


@query(
    "q34_bgp_over_triples",
    oracle=f"""
    WITH {TRIPLES_SQL_CTE}
    SELECT t_name.o AS customer_name, t_title.o AS nation_name
    FROM triples t_seg
    JOIN triples t_nat   ON t_nat.s = t_seg.s AND t_nat.p = 'nation'
    JOIN triples t_name  ON t_name.s = t_seg.s AND t_name.p = 'name'
    JOIN triples t_title ON t_title.s = t_nat.o AND t_title.p = 'title'
    WHERE t_seg.p = 'segment' AND t_seg.o = 'BUILDING'
      AND t_title.o IN ('NATION_1', 'NATION_2', 'NATION_3')
    ORDER BY customer_name
    """,
    tags=("refquery", "triples"),
)
def q34_bgp_over_triples(spark, sf_dir):
    """A 4-pattern SPARQL basic graph pattern evaluated as self-joins of
    the triples view (J13): ?c segment 'BUILDING' . ?c nation ?n .
    ?c name ?name . ?n title ?title FILTER(?title IN ...). Catalyst
    reorders the pattern joins — the optimization the reference performed
    by hand (starting from the most selective pattern)."""
    tr = triples_view(spark, sf_dir)

    def pat(p_val, s_col, o_col):
        return tr.filter(F.col("p") == p_val).select(
            F.col("s").alias(s_col), F.col("o").alias(o_col)
        )

    seg = tr.filter((F.col("p") == "segment") & (F.col("o") == "BUILDING")).select(
        F.col("s").alias("c")
    )
    nat = pat("nation", "c", "n")
    name = pat("name", "c", "customer_name")
    title = pat("title", "n", "nation_name")
    return (
        seg.join(nat, "c")
        .join(name, "c")
        .join(title, "n")
        .filter(F.col("nation_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .select("customer_name", "nation_name")
        .orderBy("customer_name")
    )


# ---------------------------------------------------------------------------
# S16 closure: foreign JSON-LD -> triples ingest (the reference's
# rdflib_util.read_json_ld_graph, sparql/v0.7/rdflib_util.py:54-63).
# ---------------------------------------------------------------------------

from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gtec_etl_spark.sources.jsonld_triples import (  # noqa: E402
    read_jsonld,
    triples_from_json_strings,
)

_K1_MEMBER = StructType(
    [
        StructField("@id", StringType()),
        StructField("@type", StringType()),
        StructField("name", StringType()),
    ]
)
K1_DOC_SCHEMA = StructType(
    [
        StructField("@id", StringType()),
        StructField("@type", StringType()),
        StructField("name", StringType()),
        StructField("size", LongType()),
        StructField("members", ArrayType(_K1_MEMBER)),
    ]
)


@query(
    "src_jsonld_roundtrip",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment AS grp, c_name,
             'dats:Material/' || substr(sha256('Material' || chr(31) || c_name), 1, 32) AS mid
      FROM customer WHERE c_custkey < 50
    ),
    g AS (
      SELECT grp,
             'dats:StudyGroup/' || substr(sha256('StudyGroup' || chr(31) || grp), 1, 32) AS gid,
             count(*) AS n
      FROM m GROUP BY grp
    ),
    tr AS (
      SELECT gid AS s, '@type' AS p, 'StudyGroup' AS o FROM g
      UNION ALL SELECT gid, 'name', grp FROM g
      UNION ALL SELECT gid, 'size', CAST(n AS VARCHAR) FROM g
      UNION ALL SELECT g.gid, 'members', m.mid FROM m JOIN g USING (grp)
      UNION ALL SELECT mid, '@type', 'Material' FROM m
      UNION ALL SELECT mid, 'name', c_name FROM m
    )
    SELECT DISTINCT s, p, o FROM tr ORDER BY s, p, o
    """,
    tags=("sources", "triples", "jsonld"),
)
def src_jsonld_roundtrip(spark, sf_dir):
    """S16 round-trip: the K1 emitter's own JSON-LD StudyGroup documents
    are parsed BACK (from_json with a pinned schema) and flattened into
    the (s, p, o) graph the reference would get from
    rdflib.Graph().parse(format='json-ld') — emit -> reload -> triples,
    entirely inside the engine. The oracle rebuilds the same graph
    relationally from the customer table, so the parser's subject/edge/
    literal semantics (including null-dropping for @id-only refs) are all
    pinned cross-engine."""
    from gtec_etl_spark.plans.sink_queries import k1_jsonld_study_groups

    docs = k1_jsonld_study_groups(spark, sf_dir)
    return triples_from_json_strings(docs, "doc", K1_DOC_SCHEMA).orderBy(
        "s", "p", "o"
    )


_FIXTURE_TRIPLES = [
    ("dats:Org/broad", "@type", "Organization"),
    ("dats:Org/broad", "name", "Broad Institute"),
    ("dats:Study/s1", "@type", "Study"),
    ("dats:Study/s1", "producedBy", "dats:Org/broad"),
    ("dats:Study/s1", "studyGroups", "dats:StudyGroup/g1"),
    ("dats:Study/s1", "studyGroups", "dats:StudyGroup/g2"),
    ("dats:Study/s1", "title", "GTEx RNA-Seq Study"),
    ("dats:Study/s1", "types", "RNA-Seq"),
    ("dats:Study/s1", "types", "WGS"),
    ("dats:Study/s2", "@type", "Study"),
    ("dats:Study/s2", "description", "whole genomes"),
    ("dats:Study/s2", "producedBy", "dats:Org/nhlbi"),
    ("dats:Study/s2", "title", "TOPMed WGS"),
    ("dats:StudyGroup/g1", "@type", "StudyGroup"),
    ("dats:StudyGroup/g1", "members", "dats:Material/m1"),
    ("dats:StudyGroup/g1", "members", "dats:Material/m2"),
    ("dats:StudyGroup/g1", "name", "all subjects"),
    ("dats:StudyGroup/g1", "size", "2"),
]

_FIXTURE_PATH = __import__("os").path.abspath(
    __import__("os").path.join(
        __import__("os").path.dirname(__file__),
        "..", "..", "fixtures", "jsonld", "dats_studies.jsonld",
    )
)

_FIXTURE_VALUES = ",\n      ".join(
    "('{}', '{}', '{}')".format(*t) for t in _FIXTURE_TRIPLES
)


@query(
    "src_jsonld_foreign_fixture",
    oracle=f"""
    SELECT s, p, o FROM (VALUES
      {_FIXTURE_VALUES}
    ) AS t(s, p, o) ORDER BY s, p, o
    """,
    tags=("sources", "triples", "jsonld"),
)
def src_jsonld_foreign_fixture(spark, sf_dir):
    """S16 foreign-document path: a reference-shaped DATS JSON-LD fixture
    the engine did NOT emit (nested producedBy org, study groups with
    member refs, heterogeneous fields across documents) loaded via
    spark.read.json schema merge and flattened to triples. @id-only
    references (StudyGroup/g2, Org/nhlbi) contribute edges but no
    literals — rdflib parse semantics. The oracle is the hand-derived
    triple set, so this pins the parser against a ground truth the
    emitter had no hand in."""
    return read_jsonld(spark, _FIXTURE_PATH).orderBy("s", "p", "o")


_NESTED_FIXTURE_PATH = __import__("os").path.abspath(
    __import__("os").path.join(
        __import__("os").path.dirname(__file__),
        "..", "..", "fixtures", "jsonld", "nested_lists.jsonld",
    )
)

_NESTED_TRIPLES = [
    ("e:m", "@type", "Matrix"),
    ("e:m", "cube[0][0]", "5"),
    ("e:m", "cube[0][0]", "6"),
    ("e:m", "grid[0]", "1"),
    ("e:m", "grid[0]", "2"),
    ("e:m", "grid[1]", "3"),
    ("e:m", "grid[1]", "4"),
    ("e:m", "tags", "x"),
    ("e:m", "tags", "y"),
    ("e:p", "name", "routes"),
    ("e:p", "paths[0]", "e:a"),
    ("e:p", "paths[0]", "e:b"),
    ("e:p", "paths[1]", "e:c"),
]

_NESTED_VALUES = ",\n      ".join(
    "('{}', '{}', '{}')".format(*t) for t in _NESTED_TRIPLES
)


@query(
    "src_jsonld_nested_list",
    oracle=f"""
    SELECT s, p, o FROM (VALUES
      {_NESTED_VALUES}
    ) AS t(s, p, o) ORDER BY s, p, o
    """,
    tags=("sources", "triples", "jsonld"),
)
def src_jsonld_nested_list(spark, sf_dir):
    """S16 nested-@list path (round-6 closure of the arrays-of-arrays
    NotImplementedError): a foreign fixture with list-of-lists of scalars
    (2 and 3 levels deep) and a list-of-lists of node REFERENCES flattens
    with list position encoded in indexed predicates (grid[0], cube[0][0],
    paths[1]) — the standard RDF position-as-predicate reification.
    Plain single-level arrays in the same documents keep the unordered
    multi-value predicate (tags). The reference accepts such documents
    through rdflib (sparql/v0.7/rdflib_util.py:54-63); the oracle is the
    hand-derived triple set."""
    return read_jsonld(spark, _NESTED_FIXTURE_PATH).orderBy("s", "p", "o")
