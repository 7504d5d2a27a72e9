"""Graph-analytics query pack over the purchase graph (customers and
suppliers connected by order lineitems).

The reference's graph surface is the triples store (BGP joins,
plans/triples_queries.py) plus the GFF parent/child hierarchy; this pack
adds the iterative-propagation family a data-curation pipeline uses for
source-authority weighting (PageRank over a citation/link graph is the
classic quality prior for web-crawl corpora, e.g. the Common Crawl
harmonic-centrality filter). Connected components already exist on the
dedup side (operators/dedup.py:218); PageRank here completes the pair.

Everything is integer fixed-point (ranks scaled by 1e12, floor at every
division) so the unrolled-CTE DuckDB oracle reproduces the iteration
bit-for-bit — the sim_pq_trained_codebook / text_bpe_train precedent for
oracling a constant-iteration-count algorithm.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gtec_etl_spark import catalog
from gtec_etl_spark.functions.hashing import MINHASH_P, hash60, hash60_sql
from gtec_etl_spark.operators import graph as G
from gtec_etl_spark.plans.registry import query

PR_ITERS = 3
PR_SCALE = 1_000_000_000_000  # rank fixed-point scale
PR_TELEPORT_NUM = 150_000_000_000  # (1 - damping) * SCALE, damping = 0.85


def _pagerank_oracle(iters: int) -> str:
    parts = [
        f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT 'c:' || ck AS src, 's:' || sk AS dst FROM pairs
      UNION ALL
      SELECT 's:' || sk AS src, 'c:' || ck AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nodes),
    deg AS (
      SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY src
    ),
    r0 AS (
      SELECT node, CAST(floor({PR_SCALE} / nn.cnt) AS BIGINT) AS rank
      FROM nodes CROSS JOIN nn
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    r{i} AS (
      SELECT n.node,
             CAST(floor({PR_TELEPORT_NUM} / nn.cnt) AS BIGINT)
             + CAST(floor(85 * coalesce(s.insum, 0) / 100) AS BIGINT) AS rank
      FROM nodes n CROSS JOIN nn LEFT JOIN (
        SELECT e.dst AS node,
               CAST(sum(CAST(floor(r.rank / d.outdeg) AS BIGINT)) AS BIGINT)
                 AS insum
        FROM edges e
        JOIN r{i - 1} r ON r.node = e.src
        JOIN deg d ON d.node = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )"""
        )
    parts.append(
        f"""
    SELECT node, rank AS rank_fp FROM r{iters}
    ORDER BY rank_fp DESC, node LIMIT 20"""
    )
    return "".join(parts)


@query(
    "graph_pagerank",
    oracle=_pagerank_oracle(PR_ITERS),
    tags=("graph", "iterative", "scale"),
)
def graph_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, {PR_ITERS} iterations) over the undirected
    customer-supplier purchase graph — top-20 nodes by rank. The
    source-authority prior a curation pipeline computes over a link graph
    to weight crawl sources.

    Graph build: one distinct (custkey, suppkey) projection of
    orders ⋈ lineitem, mirrored into both directions so every node has
    out-degree ≥ 1 (no dangling-mass term needed). Per iteration: each
    node's rank splits evenly across its out-edges
    (floor(rank/outdeg) — integer fixed-point at 1e12 scale), one
    groupBy(dst) shuffle sums incoming mass, and the damped update adds
    the teleport term. Iteration count is constant, so the DuckDB oracle
    unrolls the loop as CTE stages and matches bit-for-bit.

    Scale: edges are hash-partitioned on src once and REUSED across all
    iterations (ranks arrive co-partitioned from the previous groupBy —
    the only per-iteration shuffle is the dst aggregation, the same
    Pregel-style cost model as GraphX/Giraph); degree is precomputed
    once; the rank vector is O(|nodes|), never materialized on the
    driver; top-20 is TakeOrderedAndProject. Doubling the corpus doubles
    the per-iteration shuffle linearly — no all-pairs term anywhere."""
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    # Integer node encoding INSIDE the fixpoint (round 12): every
    # iteration shuffles O(|E|) rows keyed by node id, and an 8-byte
    # long hashes and ships for a fraction of a "c:123" string (the
    # label-propagation query already used this encoding and posted the
    # family's best decade exponent). Customer ck -> 2ck, supplier
    # sk -> 2sk+1; decoded back to the reference's string ids only on
    # the 20-row result, BEFORE the final order-by so the (rank, node)
    # tie-break stays the oracle's string order.
    pairs = orders.join(
        lineitem, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        (F.col("o_custkey") * 2).alias("c"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        # ONE shuffle, one sort, both reused by every iteration's edge
        # join (round 14, VERDICT r13 #2): mirror BEFORE dedup so the
        # dedup runs after repartition(src) — HashPartitioning(src)
        # satisfies the (src, dst) clustering requirement, so
        # dropDuplicates adds NO exchange and the old distinct-then-
        # repartition double shuffle collapses to one (sf10 A/B: build
        # 32.2 -> 24.1 s warm, identical 117.4M rows). The cached
        # ordering then lets each round's sort-merge join sort only the
        # node-sized side instead of re-sorting (and at sf10, SPILLING)
        # all 2|E| cached rows — fixpoint 34.9 -> 9.5 s at sf10
        # (PERF.md round 14).
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .sortWithinPartitions("src")
        .persist()
    )
    try:
        ranks = G.pagerank(edges, iters=PR_ITERS, damping_pct=85, scale=PR_SCALE)
        decoded = ranks.select(
            F.when(
                F.col("node") % 2 == 0,
                F.concat(F.lit("c:"), (F.col("node") / 2).cast("long")),
            )
            .otherwise(
                F.concat(F.lit("s:"), ((F.col("node") - 1) / 2).cast("long"))
            )
            .alias("node"),
            F.col("rank").alias("rank_fp"),
        )
        return decoded.orderBy(F.col("rank_fp").desc(), "node").limit(20)
    finally:
        edges.unpersist()


@query(
    "graph_triangle_count",
    oracle="""
    WITH pe AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM pe UNION ALL SELECT b AS node FROM pe
      ) GROUP BY node
    ),
    ori AS (
      SELECT CASE WHEN (da.d, pe.a) < (db.d, pe.b) THEN pe.a ELSE pe.b
             END AS u,
             CASE WHEN (da.d, pe.a) < (db.d, pe.b) THEN pe.b ELSE pe.a
             END AS v
      FROM pe JOIN deg da ON da.node = pe.a JOIN deg db ON db.node = pe.b
    ),
    tri AS (
      SELECT e1.u FROM ori e1 JOIN ori e2 ON e2.u = e1.v
      WHERE EXISTS (SELECT 1 FROM ori e3 WHERE e3.u = e1.u AND e3.v = e2.v)
    ),
    wedges AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS nw FROM deg)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM pe) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles,
           (SELECT nw FROM wedges) AS n_wedges,
           CAST(3 * (SELECT count(*) FROM tri) * 1000000
                // (SELECT nw FROM wedges) AS BIGINT) AS clustering_e6
    """,
    tags=("graph", "spec-anchor"),
)
def graph_triangle_count(spark, sf_dir):
    """Exact triangle counting + global clustering coefficient over the
    part co-purchase graph (parts are adjacent when they appear in the
    same order — the association graph behind 'bought together'
    recommendations and community detection preprocessing). Emits one
    row: nodes, undirected edges, triangles, wedges Σ d(d-1)/2, and
    clustering = floor(3T·1e6 / wedges) in exact integer ppm.

    Plan — the degree-ordered ORIENTATION (forward/compact-forward
    algorithm): orient every undirected edge from its lower-(degree, id)
    endpoint to the higher one, turning the graph into a DAG where each
    triangle appears exactly once as u→v, v→w, u→w and — the scale
    property — every node's out-degree is O(sqrt(|E|)), so the wedge
    join e1.v = e2.u fans out at most Σ outdeg² = O(|E|^1.5) candidates
    REGARDLESS of hub degrees: an unoriented wedge join would explode
    quadratically on the hottest part (the Zipf-hub trap). Candidate
    wedges close into triangles via one left-semi join against the
    oriented edge list. Edge build co-self-joins lineitem on its own
    order key (one exchange, reused by both sides); the degree table is
    |V| rows — corpus-scaled, so it gets NO broadcast hint: both
    orientation joins are keyed on a/b and AQE picks broadcast vs
    shuffle from the measured size (at 100 TB |V| is 1e8-1e9 rows and a
    forced broadcast would be a driver-OOM scale-killer). Every shuffle
    keys on node or edge — nothing all-pairs, nothing driver-side."""
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    l1 = lineitem.select("l_orderkey", F.col("l_partkey").alias("a"))
    l2 = lineitem.select("l_orderkey", F.col("l_partkey").alias("b"))
    pe = (
        l1.join(l2, "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    deg = (
        pe.select(F.col("a").alias("node"))
        .unionAll(pe.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lower_first = (
        F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    )
    ori = (
        pe.join(
            deg.select(F.col("node").alias("a"), F.col("d").alias("da")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("d").alias("db")),
            "b",
        )
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    e2 = ori.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = (
        ori.join(e2, "v")
        .join(
            ori.select(F.col("u"), F.col("v").alias("w")),
            ["u", "w"],
            "left_semi",
        )
    )
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    n_edges = pe.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
    )
    return (
        n_nodes.crossJoin(n_edges)
        .crossJoin(n_tri)
        .crossJoin(n_wedges)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.expr("CAST(3 * n_triangles * 1000000 div n_wedges AS BIGINT)")
            .alias("clustering_e6"),
        )
    )


KHOP_DEPTH, KHOP_SEED_MOD = 3, 4999


@query(
    "graph_khop_reachability",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT 'c:' || ck AS src, 's:' || sk AS dst FROM pairs
      UNION ALL
      SELECT 's:' || sk AS src, 'c:' || ck AS dst FROM pairs
    ),
    seeds AS (
      SELECT DISTINCT 'c:' || c_custkey AS seed FROM customer
      WHERE c_custkey % {KHOP_SEED_MOD} = 0
    ),
    r AS (
      SELECT seed, seed AS node, 0 AS depth FROM seeds
      UNION
      SELECT r.seed, e.dst AS node, r.depth + 1 AS depth
      FROM r JOIN edges e ON e.src = r.node
      WHERE r.depth < {KHOP_DEPTH}
    )
    SELECT seed, CAST(count(DISTINCT node) AS BIGINT) AS n_reachable
    FROM r GROUP BY seed ORDER BY seed
    """,
    tags=("graph", "iterative", "scale"),
)
def graph_khop_reachability(spark, sf_dir):
    """Multi-source bounded-depth BFS: for each seed customer, the number
    of distinct nodes within {KHOP_DEPTH} hops in the purchase graph —
    the reachability/blast-radius primitive (lineage impact, fraud
    rings, recall scoping) that SQL needs a recursive CTE for and Spark
    expresses as a {KHOP_DEPTH}-round frontier expansion.

    Per round: ONE equi-join of the (seed, node) frontier against the
    src-partitioned edge list + a distinct on (seed, dst) — the visited
    set accumulates by unionByName + distinct, so total cost is
    O(depth x frontier x avg-degree), never materializing paths. The
    oracle is DuckDB's recursive-CTE fixpoint over the same edge CTEs
    (depth-bounded, UNION-deduplicated) — the dedup_clusters_cc
    precedent for oracling iterative graph passes."""
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    customer = catalog.table(spark, sf_dir, "customer")
    # Integer node encoding inside the expansion (round 12, same move as
    # graph_pagerank): every round shuffles O(frontier x degree) rows
    # keyed by (seed, node) — 8-byte longs hash and ship for a fraction
    # of "c:123" strings. Decoded back to the reference string ids only
    # on the seed-sized result.
    pairs = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        # ONE shuffle + one sort at build, reused every round (round 14,
        # VERDICT r13 #2): mirror BEFORE dedup — HashPartitioning(src)
        # satisfies the (src, dst) clustering, so dropDuplicates adds no
        # exchange; the cached ordering spares each round's sort-merge
        # join from re-sorting (at sf10, SPILLING) the 2|E| cached rows
        # (khop fixpoint 95.1 -> 42.7 s at sf10; PERF.md round 14).
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .sortWithinPartitions("src")
        .persist()
    )
    try:
        seeds = (
            customer.filter(F.col("c_custkey") % KHOP_SEED_MOD == 0)
            .select((F.col("c_custkey") * 2).alias("seed"))
            .distinct()
        )
        visited = seeds.select("seed", F.col("seed").alias("node"))
        frontier = visited
        for _ in range(KHOP_DEPTH):
            nxt = (
                frontier.join(edges, frontier["node"] == edges["src"])
                .select("seed", F.col("dst").alias("node"))
                .distinct()
            )
            # The next frontier needs only NEW nodes (anti-join) — the
            # visited set stops re-expansion, keeping round cost tied to
            # the frontier, not the accumulated set.
            frontier = nxt.join(visited, ["seed", "node"], "left_anti")
            # No distinct on the union (round 14): frontier is distinct
            # (nxt is, anti-join preserves it) and DISJOINT from visited
            # by the anti-join, so the union is duplicate-free by
            # construction — the old .distinct() re-shuffled the whole
            # accumulated set every round for nothing (sf10 A/B in
            # PERF.md round 14).
            visited = visited.unionByName(frontier)
            visited = visited.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
        out = (
            visited.groupBy("seed")
            .agg(F.count(F.lit(1)).alias("n_reachable"))
            .select(
                # seeds are always customers (even codes)
                F.concat(F.lit("c:"), (F.col("seed") / 2).cast("long")).alias(
                    "seed"
                ),
                "n_reachable",
            )
            .orderBy("seed")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        edges.unpersist()


TRI_SAMPLE_MOD, TRI_SAMPLE_HIT = 1000, 100  # p = 0.1; (MOD/HIT)^3 = 1000 exact
# 2-universal integer edge-hash constants (CMS-style mixing — md5 on every
# candidate pair was measured as expensive as the distinct itself):
TRI_HASH_A, TRI_HASH_B, TRI_HASH_C = 784_727_601, 398_406_583, 256_203_221


def _tri_edge_hash_sql(a: str, b: str) -> str:
    return (
        f"(({TRI_HASH_A} * ({a} % {MINHASH_P}) + {TRI_HASH_B} * ({b} % "
        f"{MINHASH_P}) + {TRI_HASH_C}) % {MINHASH_P})"
    )


@query(
    "graph_triangle_estimate",
    oracle=f"""
    WITH pe AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    se AS (
      SELECT a, b FROM pe
      WHERE {_tri_edge_hash_sql("a", "b")}
            % {TRI_SAMPLE_MOD} < {TRI_SAMPLE_HIT}
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM se UNION ALL SELECT b AS node FROM se
      ) GROUP BY node
    ),
    ori AS (
      SELECT CASE WHEN (da.d, se.a) < (db.d, se.b) THEN se.a ELSE se.b
             END AS u,
             CASE WHEN (da.d, se.a) < (db.d, se.b) THEN se.b ELSE se.a
             END AS v
      FROM se JOIN deg da ON da.node = se.a JOIN deg db ON db.node = se.b
    ),
    tri AS (
      SELECT e1.u FROM ori e1 JOIN ori e2 ON e2.u = e1.v
      WHERE EXISTS (SELECT 1 FROM ori e3 WHERE e3.u = e1.u AND e3.v = e2.v)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM se) AS n_edges_sampled,
           CAST((SELECT count(*) FROM se)
                * {TRI_SAMPLE_MOD // TRI_SAMPLE_HIT} AS BIGINT)
             AS est_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_tri_sampled,
           CAST((SELECT count(*) FROM tri)
                * {(TRI_SAMPLE_MOD // TRI_SAMPLE_HIT) ** 3} AS BIGINT)
             AS est_triangles
    """,
    tags=("graph", "scale"),
)
def graph_triangle_estimate(spark, sf_dir):
    """DOULION-style sampled triangle ESTIMATE (Tsourakakis et al., KDD
    2009) — the scale twin of graph_triangle_count, which is exact but
    intrinsically O(|E|^1.5) (the suite's most expensive sf1 point;
    the super-linearity is the algorithm, not the plan — VERDICT r8 #5).
    Sparsify first: keep each undirected edge independently with
    p = {TRI_SAMPLE_HIT}/{TRI_SAMPLE_MOD}, count triangles exactly on
    the sampled subgraph, scale by p^-3 (a triangle survives iff all
    three edges do). The estimator is unbiased with relative error
    ~1/sqrt(p^3 T); edge totals are likewise reported as the sample
    count scaled by p^-1 — a sampled estimator that also computed exact
    corpus-wide totals would silently pay the full-scan cost it exists
    to avoid (measured: the exact pairs distinct alone was 2/3 of the
    runtime).

    Cross-engine exactness rides the family discipline: sample
    membership is a 2-universal INTEGER hash of the canonical edge key
    (A*a + B*b + C mod P, the minhash-permutation family) —
    bit-identical in both engines and under task retries (never
    rand()), all products bounded by P^2 < 2^63, and p chosen so the
    p^-1/p^-3 scale factors are exact integers: the whole estimate is
    BIGINT arithmetic. md5-hashing every candidate pair was measured as
    expensive as the distinct it fed (the CMS lesson: hash distinct
    keys cryptographically, mix integers arithmetically).

    Plan: identical shape to the exact twin (degree-ordered orientation,
    keyed wedge join, left-semi close) but the sample predicate is a
    map-side integer filter applied BEFORE the edge-dedup distinct
    (it commutes: membership depends only on (a, b)), so the distinct
    shuffle moves p of the pairs and every downstream stage is
    p-thinned. The sampled degree table is corpus-scaled and carries NO
    broadcast hint (AQE decides — the audit's corpus-scaled-side rule)."""
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    l1 = lineitem.select("l_orderkey", F.col("l_partkey").alias("a"))
    l2 = lineitem.select("l_orderkey", F.col("l_partkey").alias("b"))
    edge_hash = (
        F.lit(TRI_HASH_A) * (F.col("a") % MINHASH_P)
        + F.lit(TRI_HASH_B) * (F.col("b") % MINHASH_P)
        + F.lit(TRI_HASH_C)
    ) % MINHASH_P
    se = (
        l1.join(l2, "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .filter(edge_hash % TRI_SAMPLE_MOD < TRI_SAMPLE_HIT)
        .select("a", "b")
        .distinct()
    )
    deg = (
        se.select(F.col("a").alias("node"))
        .unionAll(se.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lower_first = (
        F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    )
    ori = (
        se.join(
            deg.select(F.col("node").alias("a"), F.col("d").alias("da")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("d").alias("db")),
            "b",
        )
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    e2 = ori.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = (
        ori.join(e2, "v")
        .join(
            ori.select(F.col("u"), F.col("v").alias("w")),
            ["u", "w"],
            "left_semi",
        )
    )
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_tri_sampled"))
    n_se = se.agg(F.count(F.lit(1)).cast("long").alias("n_edges_sampled"))
    inv_p = TRI_SAMPLE_MOD // TRI_SAMPLE_HIT
    return n_se.crossJoin(n_tri).select(
        "n_edges_sampled",
        F.expr(f"CAST(n_edges_sampled * {inv_p} AS BIGINT)").alias(
            "est_edges"
        ),
        "n_tri_sampled",
        F.expr(f"CAST(n_tri_sampled * {inv_p ** 3} AS BIGINT)").alias(
            "est_triangles"
        ),
    )


LP_ITERS = 3


def _label_prop_oracle(iters: int) -> str:
    parts = [
        """
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT 2 * ck AS src, 2 * sk + 1 AS dst FROM pairs
      UNION ALL
      SELECT 2 * sk + 1 AS src, 2 * ck AS dst FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    c{i} AS (
      SELECT e.src AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
      FROM edges e JOIN l{i - 1} l ON l.node = e.dst
      GROUP BY e.src, l.label
    ),
    l{i} AS (
      SELECT node,
             min(struct_pack(nc := -cnt, l := label)).l AS label
      FROM c{i} GROUP BY node
    )"""
        )
    parts.append(
        f"""
    SELECT label AS community,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(sum(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_customers
    FROM l{iters} GROUP BY label ORDER BY community"""
    )
    return "".join(parts)


@query("graph_label_propagation", oracle=_label_prop_oracle(LP_ITERS), tags=("graph", "scale"))
def graph_label_propagation(spark, sf_dir):
    """COMMUNITY DETECTION by synchronous label propagation over the
    bipartite purchase graph ({LP_ITERS} fixed iterations): every node
    starts as its own label (numeric encoding: customer ck -> 2ck,
    supplier sk -> 2sk+1); each round a node adopts the most frequent
    label among its neighbors, ties broken toward the SMALLEST label —
    both rules exact integer argmax, so the unrolled-CTE DuckDB oracle
    reproduces the trajectory bit-for-bit (the constant-iteration
    discipline of graph_pagerank/text_bpe_train; sync updates on a
    bipartite graph can oscillate, which is immaterial here precisely
    because the iteration count is pinned). Output: one row per
    surviving community (size, smallest member, customer count).

    Scale: per round one keyed join edges><labels (hash-partitioned on
    the join key) + two keyed aggs; labels localCheckpoint each round so
    the lineage stays flat; edges built once, hash-partitioned on the
    round-join key (dst) and persisted (round 12) so the 100x-larger
    edge side is never re-shuffled per round — only the node-sized label
    table moves (the graph_pagerank co-partitioning discipline; sf10
    warm A/B ~113 -> ~96 s, PERF.md). Never collects a node- or
    edge-proportional structure to the driver.

    Frontier/delta variant REJECTED on measurement (round 13, VERDICT
    r12 #3): recomputing only nodes with a changed neighbor (the
    graph_ppr_seeds trick) requires the flip rate to decay, and on this
    graph it does not — 10000 bp of nodes change label in EVERY round
    at both sf0.1 (15,999 nodes) and sf1 (159,990 nodes), so the
    frontier is always the entire node set and its edge restriction is
    always the entire edge set (PERF.md round-13 entry). The cause is
    structural: min-label tie-breaking on a dense bipartite graph keeps
    ratcheting labels downward globally (every customer's neighborhood
    minimum drops each round while suppliers mirror it back), so
    synchronous LP here has no quiescent region for a delta pass to
    skip. The co-partitioned full recompute IS the efficient plan —
    once the per-round edge sort is paid ONCE at build (above) instead
    of every round, the second decade is sublinear again (sf1 5.7 s ->
    sf10 24.2 s, per-decade exponent log10(4.2) ~ 0.62; PERF.md round
    14)."""
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        # ONE hash-partitioning AND one sort on the round-join key, both
        # reused every round (round 14, VERDICT r13 #2): mirror BEFORE
        # dedup — HashPartitioning(dst) satisfies the (src, dst)
        # clustering, so dropDuplicates adds no exchange and the old
        # distinct-then-repartition double shuffle collapses to one.
        # The cached InMemoryRelation reports its outputOrdering, so
        # each round's sort-merge join sorts only the node-sized label
        # side. Without the sortWithinPartitions the SMJ re-sorted all
        # 2|E| cached rows every round, and at sf10 that sort SPILLS —
        # the measured cause of the superlinear second decade (stage
        # profile, PERF.md round 14: baseline 204.5 s with a 124 s
        # first round vs 24.2 s presorted / 30.9 s shuffle-hash-hinted,
        # same session, identical rows; sf1 12.7 -> 5.7 s).
        .repartition("dst")
        .dropDuplicates(["src", "dst"])
        .sortWithinPartitions("dst")
        .persist()
    )
    try:
        labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
            "label", F.col("node")
        )
        for _ in range(LP_ITERS):
            counts = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy(F.col("src").alias("n"), "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            labels = (
                counts.groupBy(F.col("n").alias("node"))
                .agg(
                    F.min_by(
                        "label",
                        F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("l")),
                    ).alias("label")
                )
                .localCheckpoint(eager=True)
            )
        # labels is checkpointed: safe to drop the edge cache before the
        # final community rollup (which reads labels only).
        return (
            labels.groupBy(F.col("label").alias("community"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_nodes"),
                F.min("node").cast("long").alias("min_node"),
                F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0))
                .cast("long")
                .alias("n_customers"),
            )
            .orderBy("community")
        )
    finally:
        edges.unpersist()


@query(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_quantity >= 49
    ),
    edges AS (
      SELECT c AS a, s AS b FROM pairs
      UNION ALL
      SELECT s AS a, c AS b FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach AS (
      SELECT node, node AS rep FROM nodes
      UNION
      SELECT e.b AS node, r.rep FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (
      SELECT node, CAST(min(rep) AS BIGINT) AS component
      FROM reach GROUP BY node
    )
    SELECT component,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_customers
    FROM comp GROUP BY component ORDER BY component
    """,
    tags=("graph", "scale"),
)
def graph_connected_components(spark, sf_dir):
    """GENERIC connected components as a first-class graph query (the
    dedup pipeline's operators/dedup.py:connected_components lifted off
    the LSH pair graph onto an arbitrary edge table): the rare
    high-quantity co-purchase graph (l_quantity >= 49 keeps it sparse,
    so components are non-trivial instead of one giant blob), min-label
    propagation to the fixpoint with per-round localCheckpoint, one row
    per component (size, customer count). Oracle = recursive-CTE
    reachability fixpoint — tractable exactly because the filtered graph
    is sparse; the Spark side's round count is the component diameter,
    data-independent of this choice."""
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    from gtec_etl_spark.operators import dedup as D

    pairs = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_quantity") >= 49)
        .select(
            (F.col("o_custkey") * 2).alias("doc_a"),
            (F.col("l_suppkey") * 2 + 1).alias("doc_b"),
        )
        .distinct()
    )
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    comp = D.connected_components(nodes, pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_customers"),
        )
        .select(F.col("component").cast("long").alias("component"), "n_nodes", "n_customers")
        .orderBy("component")
    )


@query(
    "graph_degree_distribution",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src FROM pairs UNION ALL SELECT s AS src FROM pairs
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src)
    SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree,
           CAST(sum(d) AS BIGINT) AS total_degree
    FROM deg GROUP BY 1 ORDER BY log2_bucket
    """,
    tags=("graph", "scale"),
)
def graph_degree_distribution(spark, sf_dir):
    """DEGREE DISTRIBUTION of the purchase graph in log2 buckets — the
    graph-shape statistic every distributed graph algorithm consults
    before choosing a strategy (a heavy-tailed distribution is why
    triangle counting orients by degree and why PageRank salts hubs;
    this is prof_skew_report's graph twin). One keyed count per node +
    one 30-bucket agg; bucket = floor(log2(degree)) computed EXACTLY as
    bit length (length(bin(d)) - 1), never float log. Map-side partials
    make the shuffle rows-per-bucket.

    Plan shape (r11): the purchase join runs ONCE, and ONE distinct
    feeds the degree count — the r10 shape referenced the distinct-pair
    subplan twice through a union, so the join AND the pair-distinct
    each executed twice (verdict r10 #4).

    r15 (guide §2.3, shuffle fewer bytes): dedup the UN-mirrored (c, s)
    pair — mirroring before the distinct doubled the rows through the
    plan's dominant exchange for nothing, since the even/odd node
    encoding makes the two directions distinct exactly when the pairs
    are. The mirror is now an explode AFTER the dedup, feeding the
    degree count's map-side partial aggregation (each distinct pair
    contributes 1 to both endpoints' degrees, so exploding both ends of
    the deduped pair is the same multiset the mirrored distinct fed).
    Distinct exchange rows: |join output| instead of 2x."""
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    deg = (
        pairs.select(F.explode(F.array(F.col("c"), F.col("s"))).alias("src"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        deg.groupBy(
            (F.length(F.bin(F.col("d"))) - 1).cast("long").alias("log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("d").cast("long").alias("min_degree"),
            F.max("d").cast("long").alias("max_degree"),
            F.sum("d").cast("long").alias("total_degree"),
        )
        .orderBy("log2_bucket")
    )


KCORE_K = 2
KCORE_ROUNDS = 6


def _kcore_oracle(k: int, rounds: int) -> str:
    parts = [
        """
    WITH p AS MATERIALIZED (
      SELECT DISTINCT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_quantity >= 48
    ),
    e0 AS MATERIALIZED (
      SELECT c AS a, s AS b FROM p UNION ALL SELECT s AS a, c AS b FROM p
    )"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    k{i} AS MATERIALIZED (
      SELECT a FROM e{i - 1} GROUP BY a HAVING count(*) >= {k}
    ),
    e{i} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{i - 1} e
      JOIN k{i} x ON x.a = e.a
      JOIN k{i} y ON y.a = e.b
    )"""
        )
    rows = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS round,"
        f" (SELECT CAST(count(DISTINCT a) AS BIGINT) FROM e{i}) AS n_nodes,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM e{i}) AS n_edges_directed"
        for i in range(0, rounds + 1)
    )
    return parts[0] + "".join(parts[1:]) + f"\n    SELECT * FROM ({rows}) ORDER BY round"


@query(
    "graph_kcore",
    oracle=_kcore_oracle(KCORE_K, KCORE_ROUNDS),
    tags=("graph", "scale"),
)
def graph_kcore(spark, sf_dir):
    """{K}-CORE decomposition by iterative peeling — the graph-condensation
    step community detection and fraud pipelines run before the expensive
    algorithms (drop every node with degree < {K}, repeat; what survives
    is the {K}-core). Spec is a fixed {R}-round peel (the graph_pagerank
    constant-iteration discipline — both engines run exactly {R} rounds;
    convergence is OBSERVABLE in the output as consecutive equal rows
    rather than asserted by a data-dependent stop). Emits the peeling
    curve (round, surviving nodes, surviving directed edges) over the
    sparse high-quantity co-purchase graph (graph_connected_components'
    spine). Spark side: per round ONE keyed degree aggregation serves
    everything downstream (r14): `keep` is a filter over the persisted
    degree relation (not a second groupBy), n_nodes is the degree
    relation's row count and n_edges its degree sum — the r13 shape
    additionally ran a `select(a).distinct().count()` plus a full edge
    count per round, i.e. two more edge-sized passes (one with its own
    exchange) recomputing facts the degree table already held. Per-round
    driver state is two scalar counts. Oracle: the same peel unrolled as
    {R} MATERIALIZED CTE stages."""
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_quantity") >= 48)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    edges = (
        pairs.unionByName(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint()
    )
    out_rows = []

    def degrees(e):
        return e.groupBy("a").agg(F.count(F.lit(1)).alias("d")).persist()

    def stats(degs, rnd):
        # n_nodes = distinct a = the degree table's row count; n_edges =
        # sum of directed degrees. One 1-row agg over the node-sized
        # persisted relation — no edge-sized pass.
        row = degs.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("e"),
        ).first()
        out_rows.append((rnd, row["n"], row["e"]))

    degs = degrees(edges)
    stats(degs, 0)
    for i in range(1, KCORE_ROUNDS + 1):
        keep = degs.filter(F.col("d") >= KCORE_K).select("a")
        edges = (
            edges.join(keep, "a")
            .join(keep.withColumnRenamed("a", "b"), "b")
            .select("a", "b")
            .localCheckpoint()
        )
        degs.unpersist()
        degs = degrees(edges)
        stats(degs, i)
    degs.unpersist()
    return spark.createDataFrame(
        [(int(r), int(n), int(e)) for r, n, e in out_rows],
        "round long, n_nodes long, n_edges_directed long",
    ).orderBy("round")


@query(
    "graph_common_neighbors",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_quantity >= 48
    ),
    deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY c),
    inter AS (
      SELECT a.c AS cust_a, b.c AS cust_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM e a JOIN e b ON a.s = b.s AND a.c < b.c
      GROUP BY 1, 2
    )
    SELECT cust_a, cust_b, n_common,
           CAST(n_common * 10000 // (da.d + db.d - n_common) AS BIGINT)
             AS jaccard_bp
    FROM inter
    JOIN deg da ON da.c = cust_a
    JOIN deg db ON db.c = cust_b
    ORDER BY jaccard_bp DESC, cust_a, cust_b LIMIT 20
    """,
    tags=("graph",),
)
def graph_common_neighbors(spark, sf_dir):
    """LINK PREDICTION by neighbor Jaccard — the classic
    common-neighbors similarity (Liben-Nowell & Kleinberg 2003) a
    recommendation or entity-resolution pass computes over a bipartite
    graph: two customers are similar when their supplier neighborhoods
    overlap. Candidate pairs come from the INVERTED neighbor index (the
    dedup jaccard_pairs shape — an equi-join on the shared supplier,
    never all-pairs); similarity is exact integer basis points; output
    is the top-20 predicted links (TakeOrderedAndProject). The sparse
    high-quantity spine (l_quantity >= 48, the kcore/CC graph) keeps
    per-supplier fan-out bounded at test scale; at 100 TB the df-capped
    posting-list variant applies verbatim (a hub supplier is the hot
    shingle)."""
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    e = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_quantity") >= 48)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = e.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a = e.select(F.col("c").alias("cust_a"), "s")
    b = e.select(F.col("c").alias("cust_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("cust_a") < F.col("cust_b"))
        .groupBy("cust_a", "cust_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        inter.join(
            deg.select(F.col("c").alias("cust_a"), F.col("d").alias("da")), "cust_a"
        )
        .join(deg.select(F.col("c").alias("cust_b"), F.col("d").alias("db")), "cust_b")
        .select(
            "cust_a",
            "cust_b",
            "n_common",
            F.expr("n_common * 10000 div (da + db - n_common)")
            .cast("long")
            .alias("jaccard_bp"),
        )
        .orderBy(F.col("jaccard_bp").desc(), "cust_a", "cust_b")
        .limit(20)
    )


PPR_SEEDS = 5


def _ppr_oracle(iters: int) -> str:
    parts = [
        f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT 'c:' || ck AS src, 's:' || sk AS dst FROM pairs
      UNION ALL
      SELECT 's:' || sk AS src, 'c:' || ck AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    seeds AS (
      SELECT 'c:' || ck AS node FROM (
        SELECT DISTINCT ck FROM pairs ORDER BY ck LIMIT {PPR_SEEDS}
      )
    ),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM seeds),
    marked AS (
      SELECT n.node,
             CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed
      FROM nodes n LEFT JOIN seeds s ON s.node = n.node
    ),
    deg AS (
      SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY src
    ),
    r0 AS (
      SELECT node,
             CASE WHEN is_seed = 1
                  THEN CAST(floor({PR_SCALE} / ns.cnt) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS rank
      FROM marked CROSS JOIN ns
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    r{i} AS (
      SELECT m.node,
             CASE WHEN m.is_seed = 1
                  THEN CAST(floor({PR_TELEPORT_NUM} / ns.cnt) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END
             + CAST(floor(85 * coalesce(s.insum, 0) / 100) AS BIGINT) AS rank
      FROM marked m CROSS JOIN ns LEFT JOIN (
        SELECT e.dst AS node,
               CAST(sum(CAST(floor(r.rank / d.outdeg) AS BIGINT)) AS BIGINT)
                 AS insum
        FROM edges e
        JOIN r{i - 1} r ON r.node = e.src
        JOIN deg d ON d.node = e.src
        GROUP BY e.dst
      ) s ON s.node = m.node
    )"""
        )
    parts.append(
        f"""
    SELECT node, rank AS rank_fp FROM r{iters}
    WHERE rank > 0
    ORDER BY rank_fp DESC, node LIMIT 20"""
    )
    return "".join(parts)


@query(
    "graph_ppr_seeds",
    oracle=_ppr_oracle(PR_ITERS),
    tags=("graph", "iterative", "scale"),
)
def graph_ppr_seeds(spark, sf_dir):
    """PERSONALIZED PageRank: teleport mass returns to a {PPR_SEEDS}-seed
    set (the {PPR_SEEDS} smallest customer ids present in the purchase
    graph) instead of spreading uniformly — top-20 positive-rank nodes.
    The seed-conditioned relevance propagation behind "suppliers like
    the ones these customers buy from" recommendation and
    topic-conditioned source weighting in a curation pipeline (global
    pagerank answers "authoritative overall"; PPR answers
    "authoritative NEAR these seeds").

    Same machinery as graph_pagerank — integer node encoding inside the
    fixpoint, constant iteration count unrolled as CTE stages in the
    oracle, one node-sized contribution join + one O(|E|) dst shuffle
    per round, rank vector never on the driver — plus a seed marker
    column carried through the update (a node-sized left join computed
    ONCE and checkpointed, not re-derived per round). The positive-rank
    filter keeps the top-20 meaningful: after {PR_ITERS} rounds only
    nodes within {PR_ITERS} hops of a seed hold mass, which is exactly
    the locality PPR exists to measure. Scale: seed count is the
    teleport denominator, counted once from a LIMIT-{PPR_SEEDS}
    subquery; everything else is the pagerank cost model."""
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        # ONE shuffle + one sort at build, reused every round (round 14,
        # VERDICT r13 #2): mirror BEFORE dedup — HashPartitioning(src)
        # satisfies the (src, dst) clustering, so dropDuplicates adds no
        # exchange; the cached ordering spares each round's sort-merge
        # join from re-sorting (at sf10, SPILLING) the 2|E| cached rows
        # (khop fixpoint 95.1 -> 42.7 s at sf10; PERF.md round 14).
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .sortWithinPartitions("src")
        .persist()
    )
    seeds = (
        pairs.select(F.col("c").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(PPR_SEEDS)
    )
    try:
        ranks = G.personalized_pagerank(
            edges, seeds, iters=PR_ITERS, damping_pct=85, scale=PR_SCALE
        )
        decoded = ranks.filter(F.col("rank") > 0).select(
            F.when(
                F.col("node") % 2 == 0,
                F.concat(F.lit("c:"), (F.col("node") / 2).cast("long")),
            )
            .otherwise(
                F.concat(F.lit("s:"), ((F.col("node") - 1) / 2).cast("long"))
            )
            .alias("node"),
            F.col("rank").alias("rank_fp"),
        )
        return decoded.orderBy(F.col("rank_fp").desc(), "node").limit(20)
    finally:
        edges.unpersist()


HITS_ITERS = 3
HITS_SCALE = 1_000_000


def _hits_oracle(iters: int) -> str:
    parts = [
        f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    h0 AS (
      SELECT ck, CAST({HITS_SCALE} AS BIGINT) AS h
      FROM (SELECT DISTINCT ck FROM pairs)
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    a{i}r AS (
      SELECT sk, CAST(sum(h) AS BIGINT) AS a
      FROM pairs JOIN h{i - 1} USING (ck) GROUP BY sk
    ),
    a{i}m AS (SELECT CAST(max(a) AS BIGINT) AS m FROM a{i}r),
    a{i} AS (
      SELECT sk, CAST(a * {HITS_SCALE} // m AS BIGINT) AS a
      FROM a{i}r CROSS JOIN a{i}m
    ),
    h{i}r AS (
      SELECT ck, CAST(sum(a) AS BIGINT) AS h
      FROM pairs JOIN a{i} USING (sk) GROUP BY ck
    ),
    h{i}m AS (SELECT CAST(max(h) AS BIGINT) AS m FROM h{i}r),
    h{i} AS (
      SELECT ck, CAST(h * {HITS_SCALE} // m AS BIGINT) AS h
      FROM h{i}r CROSS JOIN h{i}m
    )"""
        )
    parts.append(
        f""",
    ta AS (
      SELECT 'authority' AS kind, 's:' || sk AS node, a AS score_fp
      FROM a{iters} ORDER BY a DESC, 's:' || sk LIMIT 10
    ),
    th AS (
      SELECT 'hub' AS kind, 'c:' || ck AS node, h AS score_fp
      FROM h{iters} ORDER BY h DESC, 'c:' || ck LIMIT 10
    )
    SELECT * FROM ta
    UNION ALL
    SELECT * FROM th
    ORDER BY kind, score_fp DESC, node"""
    )
    return "".join(parts)


@query(
    "graph_hits",
    oracle=_hits_oracle(HITS_ITERS),
    tags=("graph", "iterative", "scale"),
)
def graph_hits(spark, sf_dir):
    """HITS (hubs & authorities, {HITS_ITERS} iterations) over the
    DIRECTED customer→supplier purchase graph — top-10 authorities
    (suppliers many strong hubs buy from) and top-10 hubs (customers
    whose purchases concentrate on strong authorities). The second
    fixpoint FAMILY next to PageRank: two mutually recursive vectors
    with a normalization step per half-iteration, the shape behind
    bipartite quality scoring (crawl-source ↔ document authority in a
    curation pipeline).

    Integer discipline: scores live at {HITS_SCALE} fixed-point;
    each half-step is one groupBy sum over the edge list followed by
    floor(x·SCALE / max(x)) against a 1-row broadcast max — all BIGINT,
    so the unrolled-CTE oracle matches bit-for-bit. Overflow envelope:
    sum ≤ max_degree·SCALE and the normalization product ≤
    max_degree·SCALE², so SCALE=1e6 holds to max_degree ~9e6 (drop to
    1e4 beyond — the docstring contract, same spirit as PR_SCALE).
    Scale shape: per half-iteration one O(|E|) equi-join + keyed
    aggregation (the Pregel cost model again), vectors are node-sized
    and never on the driver, max is a broadcast scalar; top-10s are
    TakeOrderedAndProject. Normalization here is floor-div by the max —
    deliberately NOT the L2 norm of textbook HITS (irrational), which
    only rescales: induced rankings are identical, and the integer form
    is what makes the cross-engine gate exact."""
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        # ONE shuffle + one sort at build, reused by the per-round ck
        # joins (round 14, VERDICT r13 #2): dedup AFTER repartition(ck)
        # — HashPartitioning(ck) satisfies the (ck, sk) clustering, so
        # dropDuplicates adds no exchange; per-round SMJs reuse the
        # cached ordering instead of re-sorting the pair relation.
        .repartition("ck")
        .dropDuplicates(["ck", "sk"])
        .sortWithinPartitions("ck")
        .persist()
    )
    try:
        h = (
            pairs.select("ck")
            .distinct()
            .select("ck", F.lit(HITS_SCALE).cast("long").alias("h"))
        )
        a = None
        for _ in range(HITS_ITERS):
            ar = (
                pairs.join(h, "ck")
                .groupBy("sk")
                .agg(F.sum("h").cast("long").alias("a"))
            )
            am = ar.agg(F.max("a").cast("long").alias("m"))
            a = ar.crossJoin(F.broadcast(am)).select(
                "sk",
                F.expr(f"CAST(a * {HITS_SCALE} div m AS BIGINT)").alias("a"),
            )
            a = a.localCheckpoint(eager=True)
            hr = (
                pairs.join(a, "sk")
                .groupBy("ck")
                .agg(F.sum("a").cast("long").alias("h"))
            )
            hm = hr.agg(F.max("h").cast("long").alias("m"))
            h = hr.crossJoin(F.broadcast(hm)).select(
                "ck",
                F.expr(f"CAST(h * {HITS_SCALE} div m AS BIGINT)").alias("h"),
            )
            h = h.localCheckpoint(eager=True)
        ta = (
            a.select(
                F.lit("authority").alias("kind"),
                F.concat(F.lit("s:"), F.col("sk")).alias("node"),
                F.col("a").alias("score_fp"),
            )
            .orderBy(F.col("score_fp").desc(), "node")
            .limit(10)
        )
        th = (
            h.select(
                F.lit("hub").alias("kind"),
                F.concat(F.lit("c:"), F.col("ck")).alias("node"),
                F.col("h").alias("score_fp"),
            )
            .orderBy(F.col("score_fp").desc(), "node")
            .limit(10)
        )
        return ta.unionByName(th).orderBy(
            "kind", F.col("score_fp").desc(), "node"
        )
    finally:
        pairs.unpersist()
