"""Similarity search over embedding columns (array<float>).

Brute-force exact cosine top-k is the correctness baseline; the scale paths
are IVF (search only the nearest centroid's partition) and random-hyperplane
LSH (bucket join). Dot products are sequential JVM-side folds
(zip_with + aggregate) so results are bitwise reproducible in the SQL
oracle — no Python UDFs anywhere on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.sqrt(dot(F.col(vec_col), F.col(vec_col))))


def sqdist(a: Column, b: Column) -> Column:
    """Sequential left-fold squared L2 distance in double precision —
    the same add order as the oracle's list_reduce, so bit-reproducible."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def quantize_micros(vec: Column) -> Column:
    """Elementwise float→int64 quantization to integer micros:
    floor(x * 1e6 + 0.5). Every step (float→double cast, double multiply,
    add, floor) is an IEEE-754 operation with one correct answer, so any
    engine produces the same int64 — the foundation for cross-engine-exact
    integer distance arithmetic (PQ encode/ADC)."""
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast(
            "long"
        ),
    )


def dot_int(a: Column, b: Column) -> Column:
    """Exact dot product over int64 vectors (quantized micros). Pure
    integer arithmetic — engine-independent. Magnitude: |x| <= ~1e6 per
    element, so a 64-dim dot is <= ~6.4e13, far inside int64."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sqdist_int(a: Column, b: Column) -> Column:
    """Exact squared L2 distance over int64 vectors. Pure integer
    arithmetic: order-free, association-free, engine-independent."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    emb: DataFrame,
    query_vec: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single query vector (a 1-row
    DataFrame with column `q`). The query side is broadcast; ranking uses
    TakeOrderedAndProject (per-partition top-k, driver merge) — no global
    sort. Deterministic tie-break on id."""
    e = with_norm(emb, vec_col)
    q = with_norm(query_vec.select(F.col("q").alias("qv")), "qv", "qnorm")
    cos = dot(F.col(vec_col), F.col("qv")) / (F.col("norm") * F.col("qnorm"))
    return (
        e.crossJoin(F.broadcast(q))
        .withColumn("cosine_exact", cos)
        .orderBy(F.col("cosine_exact").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("cosine_exact", 4).alias("cosine"))
    )


def pq_kmeans_codebook(
    subs: DataFrame, init: DataFrame, iters: int = 4
) -> DataFrame:
    """Distributed Lloyd's iterations training a product-quantization
    codebook per subspace, in quantized-integer space.

    `subs`: (vec_id, j, sub array<long>) training sub-vectors (quantized
    micros, see quantize_micros) — typically a bounded deterministic
    sample of the corpus. `init`: (j, r, c array<long>) initial codebook
    (e.g. the hash-seeded sample sim_pq_adc_topk uses). Returns (j, r, c)
    with the same shape.

    Each iteration: assign every sub-vector to its nearest codeword
    (broadcast codebook join + integer-exact argmin, ties to the lowest
    r), then recompute each codeword as the elementwise mean of its
    members, re-quantized to int64 (floor(avg + 0.5)) so every iteration
    stays in exact-integer space — runs are bit-reproducible. Codewords
    that attract no members keep their previous value (the left-join
    coalesce), the standard empty-cluster fallback.

    Scale: per iteration, one broadcast join over the sample + two
    bounded shuffles (argmin groupBy on vec_id×j; centroid groupBy on
    j×r×dim ≤ M·K·subdim rows). The sample is cached once; the codebook
    is checkpoint-free because M·K rows re-broadcast cheaply. Production
    trains on a ~1e5-row sample regardless of corpus size — training cost
    is O(sample), never O(corpus); only ENCODE scans the full data."""
    subs = subs.persist()
    try:
        cb = _pq_kmeans_iterate(subs, init, iters)
        # Materialize the codebook (bounded: M*K rows by construction)
        # BEFORE releasing the cache — the trained plan references `subs`
        # once per iteration, so a lazy return would recompute the sample
        # iters× after unpersist. A collected 64-row codebook re-enters the
        # plan as a broadcast-sized local relation, which is exactly how
        # the search side consumes it.
        return subs.sparkSession.createDataFrame(cb.collect(), cb.schema)
    finally:
        # Caller-provided DataFrame: leaving it cached would leak blocks
        # across repeated calls in a long session (the same session-residue
        # class tools/bench_scale.py works around).
        subs.unpersist()


def _pq_kmeans_iterate(subs: DataFrame, init: DataFrame, iters: int) -> DataFrame:
    cb = init
    for _ in range(iters):
        assigned = (
            subs.join(F.broadcast(cb), "j")
            .withColumn("__d", sqdist_int(F.col("sub"), F.col("c")))
            .groupBy("vec_id", "j")
            .agg(
                F.min_by(
                    F.struct("r", "sub"), F.struct("__d", "r")
                ).alias("__a")
            )
            .select("j", F.col("__a.r").alias("r"), F.col("__a.sub").alias("sub"))
        )
        new = (
            assigned.select("j", "r", F.posexplode("sub").alias("d", "x"))
            .groupBy("j", "r", "d")
            # Explicit exact-int sum then ONE double division, instead of
            # avg(): both engines then perform the identical IEEE ops
            # (long sum is exact; sum and count are < 2^53 so the cast is
            # exact; one correctly-rounded divide), making the re-quantized
            # centroid bit-identical cross-engine by construction.
            .agg(
                F.floor(
                    F.sum("x").cast("double")
                    / F.count(F.lit(1)).cast("double")
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("cx")
            )
            .groupBy("j", "r")
            .agg(F.array_sort(F.collect_list(F.struct("d", "cx"))).alias("pairs"))
            .select("j", "r", F.expr("transform(pairs, p -> p.cx)").alias("c2"))
        )
        cb = cb.join(new, ["j", "r"], "left").select(
            "j", "r", F.coalesce("c2", "c").alias("c")
        )
    return cb


def hyperplane_weight(j: int, d: int) -> int:
    """Deterministic integer pseudo-random hyperplane weights, exactly
    representable in doubles and reproducible in SQL."""
    return ((1103515245 * (j * 64 + d) + 12345) % 2001) - 1000


def hyperplane_bucket(vec_col: Column, n_planes: int, dim: int) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane, packed."""
    bucket = None
    for j in range(n_planes):
        weights = F.array(*[F.lit(float(hyperplane_weight(j, d))) for d in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec_col, weights, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")
