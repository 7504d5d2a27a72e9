"""Iterative graph propagation operators (Pregel-style, DataFrame-first).

PageRank here is the integer fixed-point variant: ranks are scaled
BIGINTs and every division floors, so runs are bit-reproducible across
engines (the property plans/graph_queries.py's unrolled-CTE oracle
depends on) and across retries (no float summation order anywhere — the
per-edge messages are exact integers).

Connected components (min-label propagation) lives with its consumer in
operators/dedup.py:218; this module holds the weighted-propagation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """PageRank over directed `edges` (src string, dst string) → (node,
    rank) with rank an integer at `scale` fixed-point. Every node must
    appear as a src (mirror undirected graphs before calling — this keeps
    the dangling-mass term out of the inner loop).

    Per iteration: one join of the rank vector against the edge list on
    src (both sides arrive co-partitioned after the first round — the
    edge list should be pre-partitioned on src and cached by the caller),
    one groupBy(dst) shuffle summing incoming integer mass, one map-side
    damped update. O(|E|) per iteration, no driver-side state beyond the
    node count."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    try:
        n_nodes = nodes.count()
        teleport = ((100 - damping_pct) * scale // 100) // n_nodes
        ranks = nodes.select(
            "node", F.lit(scale // n_nodes).cast("long").alias("rank")
        )
        for _ in range(iters):
            # Per-NODE contribution first (rank/outdeg is a node-level
            # value): a node-sized join instead of fanning the degree
            # through every edge — at sf10 this swapped a 117M-row join
            # per iteration for a 1.6M-row one (PERF.md round 12). The
            # edge list is then touched exactly once per iteration.
            contrib = ranks.join(deg, ranks["node"] == deg["src"]).select(
                "src",
                F.floor(F.col("rank") / F.col("outdeg")).cast("long").alias("m"),
            )
            insum = (
                edges.join(contrib, "src")
                .groupBy("dst")
                .agg(F.sum("m").cast("long").alias("insum"))
            )
            ranks = nodes.join(
                insum, nodes["node"] == insum["dst"], "left"
            ).select(
                "node",
                (
                    F.lit(teleport)
                    + F.floor(
                        damping_pct * F.coalesce(F.col("insum"), F.lit(0)) / 100
                    ).cast("long")
                ).alias("rank"),
            )
            # Eager lineage truncation every iteration (the Pregel/GraphX
            # discipline): without it the plan nests one join tree per
            # iteration and the rank vector replays from iteration 0 on
            # every action. The vector stays DISTRIBUTED (executor
            # storage) — never collected to the driver, so the operator
            # holds at 100 TB node counts.
            ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        # Safe: the checkpointed vector reads from stored blocks, not
        # from lineage through the nodes cache.
        nodes.unpersist()


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Personalized PageRank: identical fixpoint to pagerank() except the
    teleport mass returns to the `seeds` node set (one column `node`)
    instead of spreading uniformly — the "similar to THESE" relevance
    propagation behind seed-based recommendation and topic-conditioned
    source weighting. Rank starts as scale/|seeds| on seeds and 0
    elsewhere, and every iteration adds teleport only at seeds, so mass
    concentrates in the seeds' neighborhoods.

    Same integer fixed-point discipline (floor at every division, exact
    BIGINTs end-to-end) and the same per-iteration cost model: one
    node-sized contribution join, one O(|E|) dst aggregation, eager
    localCheckpoint lineage truncation. `seeds` must be tiny (it is
    collected-side-free: only joined, never collected) — its size is the
    teleport denominator, counted once."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    marked = nodes.join(
        seeds.select(F.col("node"), F.lit(1).alias("is_seed")), "node", "left"
    ).select("node", F.coalesce(F.col("is_seed"), F.lit(0)).alias("is_seed"))
    marked = marked.localCheckpoint(eager=True)
    try:
        # Denominator = |seeds| AS GIVEN (the caller's personalization
        # vector), not |seeds ∩ nodes|: a seed absent from the edge list
        # receives teleport mass that then leaks (it has no out-edges in
        # `nodes`), diluting total rank mass — intended semantics when
        # the seed set is authoritative, but callers should pre-filter
        # seeds to the graph if they want conserved mass. Empty seeds is
        # a caller error; fail before any more jobs run.
        n_seeds = seeds.count()
        if n_seeds == 0:
            raise ValueError(
                "personalized_pagerank: empty seed set (teleport "
                "denominator would be zero); pass >=1 seed node"
            )
        seed_teleport = ((100 - damping_pct) * scale // 100) // n_seeds
        seed_init = scale // n_seeds
        ranks = marked.select(
            "node",
            F.when(F.col("is_seed") == 1, F.lit(seed_init))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rank"),
        )
        for _ in range(iters):
            # Zero-rank nodes contribute zero mass (floor(0/outdeg) = 0,
            # and the update coalesces missing insum to 0), so the
            # contribution join and the edge join only need the POSITIVE
            # frontier — after round i that is the seeds' i-hop
            # neighborhood, a small fraction of the graph in early
            # rounds. Output-invariant; purely less work.
            contrib = (
                ranks.filter(F.col("rank") > 0)
                .join(deg, ranks["node"] == deg["src"])
                .select(
                    "src",
                    F.floor(F.col("rank") / F.col("outdeg"))
                    .cast("long")
                    .alias("m"),
                )
            )
            insum = (
                edges.join(contrib, "src")
                .groupBy("dst")
                .agg(F.sum("m").cast("long").alias("insum"))
            )
            ranks = marked.join(
                insum, marked["node"] == insum["dst"], "left"
            ).select(
                "node",
                (
                    F.when(F.col("is_seed") == 1, F.lit(seed_teleport))
                    .otherwise(F.lit(0))
                    + F.floor(
                        damping_pct * F.coalesce(F.col("insum"), F.lit(0)) / 100
                    ).cast("long")
                ).alias("rank"),
            )
            ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        nodes.unpersist()
