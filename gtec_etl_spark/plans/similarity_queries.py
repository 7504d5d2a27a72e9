"""Similarity-search query pack over the embeddings table (charter M6).

Three tiers: exact brute-force top-k (correctness baseline), IVF-style
centroid-probed search, and random-hyperplane LSH bucketing (both scale
paths, still oracle-checked thanks to deterministic integer hyperplanes and
rounded centroids).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gtec_etl_spark import catalog
from gtec_etl_spark.operators import similarity as S
from gtec_etl_spark.operators import scale as Sc
from gtec_etl_spark.plans.registry import query


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    e AS (
      SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS norm
      FROM embeddings WHERE vec_id <> 0
    )
    SELECT vec_id,
           round({_dot_sql('embedding', 'qv')} / (norm * sqrt({_dot_sql('qv', 'qv')})), 4) AS cosine
    FROM e CROSS JOIN q
    ORDER BY {_dot_sql('embedding', 'qv')} / (norm * sqrt({_dot_sql('qv', 'qv')})) DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity",),
)
def sim_topk_bruteforce(spark, sf_dir):
    """Exact ANN baseline: brute-force cosine top-10 for the vec_id=0 query
    vector. Broadcast query + per-partition top-k (TakeOrderedAndProject);
    at 100 TB this is one scan, no shuffle."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    rest = emb.filter(F.col("vec_id") != 0)
    return S.brute_force_topk(rest, qv, 10)


@query(
    "sim_ivf_probe",
    oracle=f"""
    WITH dims AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS d,
             embedding AS e
      FROM embeddings
    ),
    cent AS (
      SELECT label, list(cv ORDER BY d) AS centroid FROM (
        SELECT label, d, round(avg(CAST(e[d] AS DOUBLE)), 4) AS cv
        FROM dims GROUP BY label, d
      ) GROUP BY label
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    best AS (
      SELECT label FROM cent CROSS JOIN q
      ORDER BY {_dot_sql('centroid', 'qv')} /
               (sqrt({_dot_sql('centroid', 'centroid')}) * sqrt({_dot_sql('qv', 'qv')})) DESC,
               label
      LIMIT 1
    ),
    e AS (
      SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS norm
      FROM embeddings WHERE label = (SELECT label FROM best) AND vec_id <> 0
    )
    SELECT vec_id,
           round({_dot_sql('embedding', 'qv')} / (norm * sqrt({_dot_sql('qv', 'qv')})), 4) AS cosine
    FROM e CROSS JOIN q
    ORDER BY {_dot_sql('embedding', 'qv')} / (norm * sqrt({_dot_sql('qv', 'qv')})) DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity",),
)
def sim_ivf_probe(spark, sf_dir):
    """IVF-style ANN: per-label centroids (element-wise mean, rounded to 4
    decimals for engine-portable determinism), probe the nearest centroid,
    brute-force only inside that partition. The scale path — at 100 TB the
    centroid table is tiny and broadcast, and the scan prunes to one
    cluster's partitions."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    # Element-wise centroid: posexplode → groupBy (label, pos) avg → rebuild.
    dims = emb.select("label", F.posexplode("embedding").alias("d", "x"))
    cent = (
        dims.groupBy("label", "d")
        .agg(F.round(F.avg(F.col("x").cast("double")), 4).alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "cv"))).alias("pairs"))
        .select("label", F.expr("transform(pairs, p -> p.cv)").alias("centroid"))
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    qn = S.with_norm(qv.select(F.col("q").alias("qv")), "qv", "qnorm")
    cent_cos = S.dot(F.col("centroid"), F.col("qv")) / (
        F.sqrt(S.dot(F.col("centroid"), F.col("centroid"))) * F.col("qnorm")
    )
    best = (
        cent.crossJoin(F.broadcast(qn))
        .orderBy(cent_cos.desc(), F.col("label"))
        .limit(1)
        .select("label")
    )
    cluster = emb.join(F.broadcast(best), "label", "left_semi").filter(F.col("vec_id") != 0)
    return S.brute_force_topk(cluster, qv, 10)


IVF_NPROBE = 3


@query(
    "sim_ivf_multiprobe",
    oracle=f"""
    WITH dims AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS d,
             embedding AS e
      FROM embeddings
    ),
    cent AS (
      SELECT label, list(cv ORDER BY d) AS centroid FROM (
        SELECT label, d, round(avg(CAST(e[d] AS DOUBLE)), 4) AS cv
        FROM dims GROUP BY label, d
      ) GROUP BY label
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    best AS (
      SELECT label FROM cent CROSS JOIN q
      ORDER BY {_dot_sql('centroid', 'qv')} /
               (sqrt({_dot_sql('centroid', 'centroid')}) * sqrt({_dot_sql('qv', 'qv')})) DESC,
               label
      LIMIT {IVF_NPROBE}
    ),
    e AS (
      SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS norm
      FROM embeddings WHERE label IN (SELECT label FROM best) AND vec_id <> 0
    )
    SELECT vec_id,
           round({_dot_sql('embedding', 'qv')} / (norm * sqrt({_dot_sql('qv', 'qv')})), 4) AS cosine
    FROM e CROSS JOIN q
    ORDER BY {_dot_sql('embedding', 'qv')} / (norm * sqrt({_dot_sql('qv', 'qv')})) DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity",),
)
def sim_ivf_multiprobe(spark, sf_dir):
    """IVF with multi-probe ({IVF_NPROBE} nearest centroids instead of 1) —
    the standard recall/latency knob: a query near a cluster boundary
    misses neighbors that landed in the adjacent cell, and probing P cells
    recovers them for P× scan cost (still a tiny fraction of the corpus).
    Same plan shape as sim_ivf_probe: broadcast centroid ranking, semi-join
    partition pruning, per-partition exact top-k — only LIMIT 1 becomes
    LIMIT {IVF_NPROBE}."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    dims = emb.select("label", F.posexplode("embedding").alias("d", "x"))
    cent = (
        dims.groupBy("label", "d")
        .agg(F.round(F.avg(F.col("x").cast("double")), 4).alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "cv"))).alias("pairs"))
        .select("label", F.expr("transform(pairs, p -> p.cv)").alias("centroid"))
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    qn = S.with_norm(qv.select(F.col("q").alias("qv")), "qv", "qnorm")
    cent_cos = S.dot(F.col("centroid"), F.col("qv")) / (
        F.sqrt(S.dot(F.col("centroid"), F.col("centroid"))) * F.col("qnorm")
    )
    best = (
        cent.crossJoin(F.broadcast(qn))
        .orderBy(cent_cos.desc(), F.col("label"))
        .limit(IVF_NPROBE)
        .select("label")
    )
    cluster = emb.join(F.broadcast(best), "label", "left_semi").filter(
        F.col("vec_id") != 0
    )
    return S.brute_force_topk(cluster, qv, 10)


def _bucket_sql(vec: str, n_planes: int, dim: int) -> str:
    terms = []
    for j in range(n_planes):
        weights = ", ".join(str(float(S.hyperplane_weight(j, d))) for d in range(dim))
        proj = (
            f"list_reduce(list_transform(generate_series(1, len({vec})),"
            f" i -> CAST({vec}[i] AS DOUBLE) * ([{weights}])[i]), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


@query(
    "sim_lsh_buckets",
    oracle=f"""
    SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM (SELECT vec_id, CAST({_bucket_sql('embedding', 8, 64)} AS BIGINT) AS bucket
          FROM embeddings)
    GROUP BY bucket ORDER BY bucket
    """,
    tags=("similarity",),
)
def sim_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucketing: 8 deterministic integer hyperplanes
    → 256 buckets. The ANN candidate structure — querying = hash the query
    vector, scan one bucket. Bucket histogram is the oracle-checked
    artifact; the projections are exact integer-weight folds."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    bucketed = emb.withColumn("bucket", S.hyperplane_bucket(F.col("embedding"), 8, 64))
    return (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )


# Product-quantization geometry: 64 dims = 4 subspaces x 16 dims, 16
# codewords per subspace (8-bit-per-subspace codes in production; 4 bits
# here keep the oracle SQL readable). Codebooks are a deterministic
# hash-ordered sample of the corpus — production trains them offline with
# k-means on a sample; the engine's distributed job is ENCODE + SEARCH,
# which is what this query exercises.
PQ_M, PQ_SUBDIM, PQ_K = 4, 16, 16


def _sqdist_sql(a: str, b: str, n: int) -> str:
    d = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"list_reduce(list_transform(generate_series(1, {n}),"
        f" i -> {d} * {d}), (x, y) -> x + y)"
    )


def _quantize_sql(vec: str) -> str:
    # Mirror of operators.similarity.quantize_micros: floor(x*1e6 + 0.5)
    # elementwise — IEEE-exact, so DuckDB and Spark produce identical int64.
    return (
        f"list_transform({vec},"
        f" x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
    )


def _sqdist_int_sql(a: str, b: str, n: int) -> str:
    # Exact integer squared L2 over pre-quantized BIGINT lists.
    return (
        f"list_reduce(list_transform(generate_series(1, {n}),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )


from gtec_etl_spark.functions.hashing import hash60, hash60_sql  # noqa: E402

# Shared CTE prefix for the PQ pipeline stages — the headline ADC query and
# every sim_pq_debug_* stage query embed this SAME text, so a driver-side
# red row on one stage localizes the first diverging stage by construction.
_PQ_CTES = f"""
    WITH h AS (
      SELECT vec_id, {_quantize_sql('embedding')} AS qe,
             {hash60_sql("CAST(vec_id AS VARCHAR)")} AS hh
      FROM embeddings WHERE vec_id <> 0
    ),
    seeds AS (
      SELECT vec_id, hh, qe, row_number() OVER (ORDER BY hh, vec_id) - 1 AS r
      FROM h ORDER BY hh, vec_id LIMIT {PQ_K}
    ),
    js AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS j),
    codebook AS (
      SELECT r, j,
             list_slice(qe, j*{PQ_SUBDIM}+1, j*{PQ_SUBDIM}+{PQ_SUBDIM}) AS c
      FROM seeds CROSS JOIN js
    ),
    subs AS (
      SELECT vec_id, j,
             list_slice({_quantize_sql('embedding')}, j*{PQ_SUBDIM}+1, j*{PQ_SUBDIM}+{PQ_SUBDIM}) AS sub
      FROM embeddings CROSS JOIN js WHERE vec_id <> 0
    ),
    enc AS (
      SELECT vec_id, s.j AS j, r,
             row_number() OVER (
               PARTITION BY vec_id, s.j
               ORDER BY {_sqdist_int_sql('sub', 'c', PQ_SUBDIM)}, r
             ) AS rn
      FROM subs s JOIN codebook cb ON cb.j = s.j
    ),
    qsubs AS (
      SELECT j, list_slice({_quantize_sql('embedding')}, j*{PQ_SUBDIM}+1, j*{PQ_SUBDIM}+{PQ_SUBDIM}) AS sub
      FROM embeddings CROSS JOIN js WHERE vec_id = 0
    ),
    lut AS (
      SELECT q.j AS j, r, {_sqdist_int_sql('sub', 'c', PQ_SUBDIM)} AS qd
      FROM qsubs q JOIN codebook cb ON cb.j = q.j
    )
"""


@query(
    "sim_pq_adc_topk",
    oracle=_PQ_CTES
    + """
    SELECT e.vec_id, CAST(sum(l.qd) AS BIGINT) AS adc_dist_q
    FROM enc e JOIN lut l ON l.j = e.j AND l.r = e.r
    WHERE e.rn = 1
    GROUP BY e.vec_id
    ORDER BY adc_dist_q, e.vec_id
    LIMIT 10
    """,
    tags=("similarity", "scale"),
)
def sim_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN with asymmetric-distance (ADC) search: every
    vector is compressed to {PQ_M} 4-bit codes (nearest codeword per
    subspace), the query builds a tiny {PQ_M}x{PQ_K} distance lookup
    table, and approximate distance = sum of the code's LUT entries —
    top-10 nearest by that score.

    Scale design: this is THE memory-bounded ANN path — at 100 TB the
    encoded corpus is ~2 bytes/vector instead of 256, so candidate scoring
    never touches the float arrays. The codebook is a hash-ordered
    deterministic {PQ_K}-row sample (TakeOrdered, no global sort) and the
    query LUT is {PQ_M}x{PQ_K} integers — both constant-size, so they ride
    into ONE Arrow mapInPandas closure that encodes and ADC-scores each
    corpus batch in a single pass with zero shuffles before the final
    TakeOrderedAndProject top-k. (Round 9: this replaces the exploded
    N x {PQ_M} x {PQ_K} encode rows pushed through a window — 64 rows and
    one interpreted sqdist fold per vector where one einsum suffices; the
    window's (vec_id, j) re-shuffle was the plan's only data-sized
    exchange.) sim_pq_trained_codebook adds the k-means-trained variant.

    Parity: embedding elements are quantized to integer micros
    (floor(x*1e6 + 0.5), IEEE-exact on any engine) BEFORE any distance.
    Inside the kernel every squared subdistance and partial sum is an
    integer < 2^53 (|micros| <= ~2.5e5, {PQ_SUBDIM}-term sums <= ~4e12),
    so float64 einsum reproduces the pure-int64 oracle bit-exactly in any
    summation order; codeword rows are ordered by rank r, so np.argmin's
    first-minimum rule IS the oracle's (sqdist, r) tie-break, and the ADC
    sum of {PQ_M} exact LUT integers is again exact.

    Round-6 fix for the r3-r5 driver-only hash-red: DuckDB promotes
    sum(BIGINT) to HUGEINT (int128) — the ONLY hugeint column in the whole
    registry (audit: tests/test_plans.py::test_no_oracle_emits_hugeint).
    A fetchall() client gets exact Python ints (why every local check was
    green), but a pandas/arrow fetch path renders int128 as float64 or
    decimal, whose canonical string diverges from Spark's int64 — hash-red
    with rows+schema green, exactly the driver's symptom. The oracle now
    CASTs the sum to BIGINT so every client sees int64. The
    sim_pq_debug_* stage queries below bisect any residual divergence."""
    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    base = emb.filter(F.col("vec_id") != 0)
    return pq_adc_search(
        base, emb.filter(F.col("vec_id") == 0), _pq_seed_codebook(base), k=10
    )


# ---------------------------------------------------------------------------
# PQ stage-level debug queries (round-6 bisection harness).
#
# sim_pq_adc_topk was driver-hash-red in r3/r4/r5 while locally
# oracle-exact under the driver's own protocol — a cross-BUILD divergence,
# not a plan bug. Each query below exposes ONE stage of the pipeline with
# a tiny pure-int64 output and an oracle sharing _PQ_CTES verbatim, so one
# driver sample localizes the first diverging stage:
#   quantize -> seeds -> codebook -> codes (encode) -> lut -> final ADC agg.
# Every aggregate is CAST to BIGINT — DuckDB promotes integer sums to
# HUGEINT, which a pandas/arrow fetch path renders as float64/decimal and
# which was itself the prime suspect for the headline query's divergence.
# ---------------------------------------------------------------------------


@query(
    "sim_pq_debug_quantize",
    oracle=f"""
    WITH h AS (SELECT {_quantize_sql('embedding')} AS qe FROM embeddings),
    ds AS (SELECT unnest(generate_series(1, {PQ_M * PQ_SUBDIM})) AS i)
    SELECT i - 1 AS d, CAST(sum(qe[i]) AS BIGINT) AS sum_q,
           min(qe[i]) AS min_q, max(qe[i]) AS max_q, count(*) AS n_vals
    FROM h CROSS JOIN ds GROUP BY i ORDER BY d
    """,
    tags=("similarity", "debug"),
)
def sim_pq_debug_quantize(spark, sf_dir):
    """PQ stage 0: per-dimension checksum (sum/min/max/count) of the
    quantized-micros values over the WHOLE corpus — 64 pure-int rows that
    catch any cross-build divergence in parquet float decoding or the
    floor(x*1e6+0.5) quantization, for every element of every vector."""
    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    return (
        emb.select(F.posexplode("qe").alias("d", "qx"))
        .groupBy("d")
        .agg(
            F.sum("qx").alias("sum_q"),
            F.min("qx").alias("min_q"),
            F.max("qx").alias("max_q"),
            F.count(F.lit(1)).alias("n_vals"),
        )
        .orderBy("d")
    )


@query(
    "sim_pq_debug_seeds",
    oracle=_PQ_CTES
    + """
    SELECT r, vec_id, hh FROM seeds ORDER BY r
    """,
    tags=("similarity", "debug"),
)
def sim_pq_debug_seeds(spark, sf_dir):
    """PQ stage 1: the 16 hash-ordered seed vectors (r, vec_id, hh). Red
    here (with quantize green) isolates hash60 or ORDER BY/LIMIT seed
    selection as the diverging stage."""
    from pyspark.sql import Window

    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    base = emb.filter(F.col("vec_id") != 0)
    seeds = (
        base.select(
            "vec_id", "qe", hash60(F.col("vec_id").cast("string")).alias("hh")
        )
        .orderBy("hh", "vec_id")
        .limit(PQ_K)
        .withColumn("r", F.row_number().over(Window.orderBy("hh", "vec_id")) - 1)
    )
    return seeds.select("r", "vec_id", "hh").orderBy("r")


@query(
    "sim_pq_debug_codebook",
    oracle=_PQ_CTES
    + f"""
    SELECT r, j, i - 1 AS d, c[i] AS cx
    FROM codebook CROSS JOIN (SELECT unnest(generate_series(1, {PQ_SUBDIM})) AS i)
    ORDER BY r, j, d
    """,
    tags=("similarity", "debug"),
)
def sim_pq_debug_codebook(spark, sf_dir):
    """PQ stage 2: every codeword element (r, j, d, cx) of the seeded
    codebook — {PQ_K}x{PQ_M}x{PQ_SUBDIM} pure-int rows. Red here (with
    seeds green) isolates the subspace slicing."""
    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    cb = _pq_seed_codebook(emb.filter(F.col("vec_id") != 0))
    return cb.select("r", "j", F.posexplode("c").alias("d", "cx")).orderBy(
        "r", "j", "d"
    )


@query(
    "sim_pq_debug_codes",
    oracle=_PQ_CTES
    + """
    SELECT vec_id, j, r FROM enc WHERE rn = 1 ORDER BY vec_id, j
    """,
    tags=("similarity", "debug"),
)
def sim_pq_debug_codes(spark, sf_dir):
    """PQ stage 3: the encode result — every vector's nearest-codeword
    assignment (vec_id, j, r). Red here (with codebook green) isolates the
    integer argmin / tie-break window."""
    from pyspark.sql import Window

    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    base = emb.filter(F.col("vec_id") != 0)
    codebook = _pq_seed_codebook(base)
    enc = _pq_slice(base, "qe").join(F.broadcast(codebook), "j").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("vec_id", "j").orderBy(
                S.sqdist_int(F.col("sub"), F.col("c")), F.col("r")
            )
        ),
    )
    return enc.filter(F.col("rn") == 1).select("vec_id", "j", "r").orderBy(
        "vec_id", "j"
    )


@query(
    "sim_pq_debug_lut",
    oracle=_PQ_CTES
    + """
    SELECT j, r, qd FROM lut ORDER BY j, r
    """,
    tags=("similarity", "debug"),
)
def sim_pq_debug_lut(spark, sf_dir):
    """PQ stage 4: the query-side distance lookup table (j, r, qd) — 64
    pure-int rows. Red here (with codebook green) isolates the query
    sub-vector slicing or integer distance; all stages green with the
    headline ADC query red would isolate the final join+sum+top-k."""
    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    codebook = _pq_seed_codebook(emb.filter(F.col("vec_id") != 0))
    qsubs = _pq_slice(emb.filter(F.col("vec_id") == 0), "qe", with_id=False)
    return (
        qsubs.join(F.broadcast(codebook), "j")
        .select("j", "r", S.sqdist_int(F.col("sub"), F.col("c")).alias("qd"))
        .orderBy("j", "r")
    )


def _pq_slice(df, vec_col: str, with_id: bool = True):
    """Explode a quantized embedding into (vec_id?, j, sub) subspace rows."""
    js = F.explode(F.array(*[F.lit(j) for j in range(PQ_M)])).alias("j")
    cols = (["vec_id", js, vec_col] if with_id else [js, vec_col])
    out = df.select(*cols)
    sub = F.slice(vec_col, F.col("j") * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sub")
    return out.select(*(["vec_id", "j", sub] if with_id else ["j", sub]))


def _pq_seed_codebook(base):
    """Hash-ordered deterministic PQ_K seed codebook over quantized
    embeddings — the same construction sim_pq_adc_topk pins to its
    oracle."""
    from pyspark.sql import Window

    seeds = (
        base.select(
            "vec_id", "qe", hash60(F.col("vec_id").cast("string")).alias("hh")
        )
        .orderBy("hh", "vec_id")
        .limit(PQ_K)
        .withColumn("r", F.row_number().over(Window.orderBy("hh", "vec_id")) - 1)
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(PQ_M)])).alias("j")
    return seeds.select("r", js, "qe").select(
        "r", "j", F.slice("qe", F.col("j") * PQ_SUBDIM + 1, PQ_SUBDIM).alias("c")
    )


def pq_adc_search(base, query_row, codebook, k: int = 10):
    """Encode `base` against `codebook`, build the query LUT, return the
    ADC top-k — the search half of PQ, shared by the seeded and trained
    codebook queries.

    Round 9: one Arrow mapInPandas pass. The codebook (M x K rows,
    bounded by construction) and the single query vector collect into the
    kernel closure; encode (nearest codeword per subspace) and ADC
    scoring (sum of LUT entries) happen batch-at-a-time with no shuffle
    before the TakeOrderedAndProject top-k. This replaces the exploded
    N x M x K encode rows + interpreted sqdist folds + (vec_id, j)
    window — see sim_pq_adc_topk's docstring for the measured history.

    Exactness: all inputs are integer micros, every squared subdistance
    and partial sum is an integer < 2^53, so float64 einsum reproduces
    the pure-int64 oracle bit-exactly; codebook rows ordered by r make
    np.argmin's first-minimum rule the oracle's (sqdist, r) tie-break."""
    import numpy as np
    import pandas as pd

    by: dict = {}
    for row in codebook.collect():
        by[(row["j"], row["r"])] = list(row["c"])
    js = sorted({jr[0] for jr in by})
    rs = sorted({jr[1] for jr in by})
    # C[i, j, :] = codeword rs[i]'s subvector for subspace j; ascending
    # rank order makes argmin's first-min the (sqdist, r) tie-break.
    C = np.array(
        [[by[(j, r)] for j in js] for r in rs], dtype=np.float64
    )
    nc2 = np.einsum("rjd,rjd->rj", C, C)  # exact: integer-valued < 2^53
    q = np.array(
        query_row.select("qe").collect()[0]["qe"], dtype=np.float64
    ).reshape(len(js), -1)
    diff = q[None, :, :] - C
    lut = np.einsum("rjd,rjd->rj", diff, diff).T  # (M, K) exact integers

    def adc_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["qe"].to_numpy()).astype(np.float64).reshape(
                len(pdf), len(js), -1
            )
            na2 = np.einsum("njd,njd->nj", M, M)
            cross = np.einsum("njd,rjd->njr", M, C)
            # d[n,j,r] = na2 - 2*cross + nc2: every term (and the 2-op
            # combination) is an exact integer < 2^53 in float64.
            d = na2[:, :, None] - 2.0 * cross + nc2.T[None, :, :]
            codes = np.argmin(d, axis=2)
            adc = np.take_along_axis(
                np.broadcast_to(lut[None, :, :], d.shape), codes[:, :, None], 2
            )[:, :, 0].sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "adc_dist_q": adc.astype(np.int64),
                }
            )

    return (
        base.select("vec_id", "qe")
        .mapInPandas(adc_batches, "vec_id long, adc_dist_q long")
        .orderBy("adc_dist_q", "vec_id")
        .limit(k)
    )


PQ_TRAIN_SAMPLE, PQ_TRAIN_ITERS = 1024, 4


def _lloyds_unrolled_sql(iters: int) -> str:
    """DuckDB oracle for the k-means-trained PQ search: Lloyd's iterations
    UNROLLED as chained CTE stages (the iteration count is a compile-time
    constant, so no recursion is needed). Mirrors
    operators.similarity.pq_kmeans_codebook stage for stage:

      a{{i}}: assign each training sub-vector to its nearest codeword
             (integer-exact sqdist, ties to the lowest r);
      n{{i}}: recompute each codeword as the re-quantized elementwise mean
             floor(sum/count + 0.5) — exact long sum, one double divide,
             the same IEEE ops Spark performs;
      cb{{i}}: left-join coalesce keeps codewords that attracted no members.

    Every quantity is int64 end to end (and every aggregate CAST away from
    DuckDB's HUGEINT), so exact hash parity with the Spark plan is a
    construction property, not luck."""
    sq = _sqdist_int_sql("sub", "c", PQ_SUBDIM)
    parts = [
        f"""
    WITH h AS (
      SELECT vec_id, {_quantize_sql('embedding')} AS qe,
             {hash60_sql("CAST(vec_id AS VARCHAR)")} AS hh
      FROM embeddings WHERE vec_id <> 0
    ),
    seeds AS (
      SELECT vec_id, hh, qe, row_number() OVER (ORDER BY hh, vec_id) - 1 AS r
      FROM h ORDER BY hh, vec_id LIMIT {PQ_K}
    ),
    js AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS j),
    ds AS (SELECT unnest(generate_series(1, {PQ_SUBDIM})) AS i),
    cb0 AS (
      SELECT r, j,
             list_slice(qe, j*{PQ_SUBDIM}+1, j*{PQ_SUBDIM}+{PQ_SUBDIM}) AS c
      FROM seeds CROSS JOIN js
    ),
    samp AS (
      SELECT vec_id, qe FROM h ORDER BY hh, vec_id LIMIT {PQ_TRAIN_SAMPLE}
    ),
    tsub AS (
      SELECT vec_id, j,
             list_slice(qe, j*{PQ_SUBDIM}+1, j*{PQ_SUBDIM}+{PQ_SUBDIM}) AS sub
      FROM samp CROSS JOIN js
    )"""
    ]
    for i in range(1, iters + 1):
        prev = f"cb{i - 1}"
        parts.append(
            f""",
    a{i} AS (
      SELECT j, r, sub FROM (
        SELECT s.j AS j, cb.r AS r, s.sub AS sub,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.j ORDER BY {sq}, cb.r
               ) AS rn
        FROM tsub s JOIN {prev} cb ON cb.j = s.j
      ) WHERE rn = 1
    ),
    n{i} AS (
      SELECT j, r, list(cx ORDER BY d) AS c2 FROM (
        SELECT j, r, i AS d,
               CAST(floor(
                 CAST(CAST(sum(sub[i]) AS BIGINT) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) + 0.5
               ) AS BIGINT) AS cx
        FROM a{i} CROSS JOIN ds GROUP BY j, r, i
      ) GROUP BY j, r
    ),
    cb{i} AS (
      SELECT cb.j, cb.r, coalesce(n.c2, cb.c) AS c
      FROM {prev} cb LEFT JOIN n{i} n ON n.j = cb.j AND n.r = cb.r
    )"""
        )
    parts.append(
        f""",
    subs AS (
      SELECT vec_id, j,
             list_slice({_quantize_sql('embedding')}, j*{PQ_SUBDIM}+1, j*{PQ_SUBDIM}+{PQ_SUBDIM}) AS sub
      FROM embeddings CROSS JOIN js WHERE vec_id <> 0
    ),
    enc AS (
      SELECT vec_id, s.j AS j, r,
             row_number() OVER (
               PARTITION BY vec_id, s.j ORDER BY {sq}, r
             ) AS rn
      FROM subs s JOIN cb{iters} cb ON cb.j = s.j
    ),
    qsubs AS (
      SELECT j, list_slice({_quantize_sql('embedding')}, j*{PQ_SUBDIM}+1, j*{PQ_SUBDIM}+{PQ_SUBDIM}) AS sub
      FROM embeddings CROSS JOIN js WHERE vec_id = 0
    ),
    lut AS (
      SELECT q.j AS j, r, {sq} AS qd
      FROM qsubs q JOIN cb{iters} cb ON cb.j = q.j
    )
    SELECT e.vec_id, CAST(sum(l.qd) AS BIGINT) AS adc_dist_q
    FROM enc e JOIN lut l ON l.j = e.j AND l.r = e.r
    WHERE e.rn = 1
    GROUP BY e.vec_id
    ORDER BY adc_dist_q, e.vec_id
    LIMIT 10
    """
    )
    return "".join(parts)


@query(
    "sim_pq_trained_codebook",
    oracle=_lloyds_unrolled_sql(PQ_TRAIN_ITERS),
    tags=("similarity", "scale"),
)
def sim_pq_trained_codebook(spark, sf_dir):
    """PQ ADC top-10 with a k-means-TRAINED codebook — the production
    answer to sim_pq_adc_topk's documented caveat (hash-sampled seeds).
    Distributed Lloyd's iterations (operators.similarity.
    pq_kmeans_codebook) refine the same deterministic seeds over a
    hash-ordered {PQ_TRAIN_SAMPLE}-vector sample, per subspace, entirely
    in quantized-integer space, so the trained codebook — and therefore
    this query — is bit-reproducible run to run.

    Oracled since round 6: the iteration count is a constant, so Lloyd's
    unrolls into {PQ_TRAIN_ITERS} chained CTE stages in DuckDB
    (_lloyds_unrolled_sql) with int64-exact arithmetic at every step —
    assignment argmin, re-quantized centroid mean floor(sum/count+0.5),
    empty-cluster coalesce — giving full hash parity instead of the prior
    rows-only check. tests/test_operators.py additionally pins the ML
    contract: training must not increase quantization distortion vs the
    seeds, and ADC top-10 recall vs exact integer-L2 search must clear a
    floor.

    Scale: training cost is O(sample × iters), independent of corpus
    size; encode+search is the same broadcast-join plan as
    sim_pq_adc_topk."""
    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    base = emb.filter(F.col("vec_id") != 0)
    init = _pq_seed_codebook(base)
    sample = (
        base.select(
            "vec_id", "qe", hash60(F.col("vec_id").cast("string")).alias("hh")
        )
        .orderBy("hh", "vec_id")
        .limit(PQ_TRAIN_SAMPLE)
    )
    trained = S.pq_kmeans_codebook(
        _pq_slice(sample, "qe"), init, iters=PQ_TRAIN_ITERS
    )
    qrow = emb.filter(F.col("vec_id") == 0)
    return pq_adc_search(base, qrow, trained, k=10)


# ---------------------------------------------------------------------------
# Semantic diversity sampling (cluster-balanced selection)
# ---------------------------------------------------------------------------

DS_K, DS_ITERS, DS_SAMPLE, DS_KEEP = 8, 3, 512, 10
_DS_DIM = PQ_M * PQ_SUBDIM


def _fullvec_lloyds_ctes(where: str = "", scaled: bool = False) -> str:
    """WITH-chain through cb{DS_ITERS}: full-vector k-means trained by
    DS_ITERS unrolled Lloyd's CTE stages (the single-subspace analogue of
    _lloyds_unrolled_sql) over `h` = embeddings filtered by `where`.
    Shared head of the diversity-sampling and trained-IVF oracles.

    scaled=True swaps the pinned K={DS_K} for the K ~ sqrt(N) production
    regime (kk CTE + LIMIT subqueries): K = max(16, floor(sqrt(count))),
    training sample = max({DS_SAMPLE}, 8K) — the SAME integer formulas the
    Spark twin computes driver-side, so the two engines train identical
    codebooks at any corpus size."""
    sq_s = _sqdist_int_sql("s.qe", "cb.c", _DS_DIM)
    w = f" WHERE {where}" if where else ""
    if scaled:
        kk = """,
    kk AS (
      SELECT GREATEST(16, CAST(floor(sqrt(CAST(count(*) AS DOUBLE)))
                               AS BIGINT)) AS k
      FROM h
    )"""
        k_lim = "(SELECT k FROM kk)"
        s_lim = f"(SELECT GREATEST({DS_SAMPLE}, 8 * k) FROM kk)"
    else:
        kk, k_lim, s_lim = "", str(DS_K), str(DS_SAMPLE)
    parts = [
        f"""
    WITH h AS (
      SELECT vec_id, {_quantize_sql('embedding')} AS qe,
             {hash60_sql("CAST(vec_id AS VARCHAR)")} AS hh
      FROM embeddings{w}
    ){kk},
    ds AS (SELECT unnest(generate_series(1, {_DS_DIM})) AS i),
    seeds AS (
      SELECT vec_id, hh, qe, row_number() OVER (ORDER BY hh, vec_id) - 1 AS r
      FROM h ORDER BY hh, vec_id LIMIT {k_lim}
    ),
    cb0 AS (SELECT r, qe AS c FROM seeds),
    samp AS (SELECT vec_id, qe FROM h ORDER BY hh, vec_id LIMIT {s_lim})"""
    ]
    for i in range(1, DS_ITERS + 1):
        prev = f"cb{i - 1}"
        parts.append(
            f""",
    a{i} AS (
      SELECT r, qe FROM (
        SELECT s.vec_id, cb.r AS r, s.qe AS qe,
               row_number() OVER (
                 PARTITION BY s.vec_id ORDER BY {sq_s}, cb.r
               ) AS rn
        FROM samp s CROSS JOIN {prev} cb
      ) WHERE rn = 1
    ),
    n{i} AS (
      SELECT r, list(cx ORDER BY d) AS c2 FROM (
        SELECT r, i AS d,
               CAST(floor(
                 CAST(CAST(sum(qe[i]) AS BIGINT) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) + 0.5
               ) AS BIGINT) AS cx
        FROM a{i} CROSS JOIN ds GROUP BY r, i
      ) GROUP BY r
    ),
    cb{i} AS (
      SELECT cb.r, coalesce(n.c2, cb.c) AS c
      FROM {prev} cb LEFT JOIN n{i} n ON n.r = cb.r
    )"""
        )
    return "".join(parts)


def _diversity_sql() -> str:
    """DuckDB oracle for sim_diversity_sample: the shared Lloyd's head,
    then nearest-centroid assignment over the whole corpus and a
    per-cluster top-DS_KEEP by (dist, vec_id). The oracle's per-cluster
    pick is ONE row_number window — the naive plan — which is exactly what
    the Spark side's two-level salted top-n must reproduce bit for bit."""
    sq_h = _sqdist_int_sql("h.qe", "cb.c", _DS_DIM)
    parts = [_fullvec_lloyds_ctes()]
    parts.append(
        f""",
    assign AS (
      SELECT vec_id, r AS cluster, d AS dist FROM (
        SELECT vec_id, r, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, r) AS rn
        FROM (
          SELECT h.vec_id AS vec_id, cb.r AS r, {sq_h} AS d
          FROM h CROSS JOIN cb{DS_ITERS} cb
        )
      ) WHERE rn = 1
    )
    SELECT cluster, vec_id, dist FROM (
      SELECT cluster, vec_id, dist,
             row_number() OVER (PARTITION BY cluster ORDER BY dist, vec_id) AS rn
      FROM assign
    ) WHERE rn <= {DS_KEEP}
    ORDER BY cluster, vec_id"""
    )
    return "".join(parts)


@query(
    "sim_diversity_sample",
    oracle=_diversity_sql(),
    tags=("similarity", "sampling", "scale"),
)
def sim_diversity_sample(spark, sf_dir):
    """Cluster-balanced diversity sampling over the embedding corpus — the
    SemDeDup-family selection pass an LLM data pipeline runs to keep a
    semantically spread subset instead of whatever dedup left behind:
    k-means the embeddings into {DS_K} clusters (full-vector Lloyd's over
    a hash-ordered {DS_SAMPLE}-vector training sample, quantized-integer
    arithmetic, bit-reproducible — operators.similarity.
    pq_kmeans_codebook with one subspace spanning all {_DS_DIM} dims),
    assign every vector to its nearest centroid, and keep the {DS_KEEP}
    most-central vectors per cluster (ties by vec_id).

    Scale design: training is O(sample x iters), corpus-independent;
    assignment is one crossJoin against the broadcast {DS_K}-row centroid
    table (no shuffle); the per-cluster pick uses
    operators.aggregates.topn_per_key_salted — a single window
    partitioned by {DS_K} clusters would sort 1/{DS_K}th of a 100 TB
    corpus on one task, so a deterministic hash salt first takes a local
    top-{DS_KEEP} per (cluster, salt) across 32 tasks per cluster, then a
    global window picks the final {DS_KEEP} from the <=320 survivors —
    identical output, straggler-free. The oracle computes the same pick
    with the naive single window, so the equivalence of the two plans is
    hash-checked, not asserted.

    No reference counterpart (the reference has no embedding operators) —
    LLM-pipeline extension per the brief, same family as sim_* and
    dedup_embedding_cosine."""
    import numpy as np
    import pandas as pd

    from gtec_etl_spark.operators import aggregates as A

    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    cb = _fullvec_centroids(emb)

    # Assignment as an Arrow kernel (r9): same gram-identity argmin as
    # _arrow_centroid_assign but emitting the winning DISTANCE instead of
    # the vector — every term integer-valued < 2^53 in float64, so exact;
    # rank-ordered centroid rows keep the (sqdist, r) tie-break.
    cb_rows = sorted(cb.collect(), key=lambda row: row["r"])
    C = np.array([row["c"] for row in cb_rows], dtype=np.float64)
    r_ids = np.array([row["r"] for row in cb_rows], dtype=np.int64)
    nc2 = np.einsum("kd,kd->k", C, C)

    def assign_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["qe"].to_numpy()).astype(np.float64)
            na2 = np.einsum("nd,nd->n", M, M)
            d = na2[:, None] - 2.0 * (M @ C.T) + nc2[None, :]
            best = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster": r_ids[best],
                    "dist": d[np.arange(len(best)), best].astype(np.int64),
                }
            )

    assigned = emb.select("vec_id", "qe").mapInPandas(
        assign_batches, "vec_id long, cluster long, dist long"
    )
    kept = A.topn_per_key_salted(
        assigned,
        "cluster",
        [F.col("dist"), F.col("vec_id")],
        DS_KEEP,
        salt_on="vec_id",
    )
    return kept.select("cluster", "vec_id", "dist").orderBy("cluster", "vec_id")


def _fullvec_centroids(base, k: int = DS_K, sample: int = DS_SAMPLE, iters: int = DS_ITERS):
    """Trained full-vector centroid table (r, c) — the Spark twin of
    _fullvec_lloyds_ctes: hash-ordered `k` seeds, hash-ordered `sample`
    training sample, `iters` integer Lloyd's iterations via
    pq_kmeans_codebook with a single subspace spanning all dims. `base`
    must carry (vec_id, qe). Registered queries pin the defaults (the
    oracle unrolls them); tools/bench_semdedup_k.py varies `k` to
    demonstrate the K ~ N scaling regime."""
    from pyspark.sql import Window

    hashed = base.select(
        "vec_id", "qe", hash60(F.col("vec_id").cast("string")).alias("hh")
    )
    seeds = (
        hashed.orderBy("hh", "vec_id")
        .limit(k)
        .withColumn("r", F.row_number().over(Window.orderBy("hh", "vec_id")) - 1)
    )
    init = seeds.select(F.lit(0).alias("j"), "r", F.col("qe").alias("c"))
    samp = hashed.orderBy("hh", "vec_id").limit(sample)
    subs = samp.select("vec_id", F.lit(0).alias("j"), F.col("qe").alias("sub"))
    return S.pq_kmeans_codebook(subs, init, iters=iters).select("r", "c")


SEMDEDUP_TAU = 0.35


def _dot_int_sql(a: str, b: str, n: int) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {n}),"
        f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


def _semdedup_sql(scaled: bool = False) -> str:
    """DuckDB oracle for sim_semdedup: shared Lloyd's head, nearest-centroid
    assignment carrying the quantized vector, within-cluster pairwise
    integer-cosine, earliest-id witness per removed vector. scaled=True
    uses the K ~ sqrt(N) head (sim_semdedup_scaled's regime)."""
    sq_h = _sqdist_int_sql("h.qe", "cb.c", _DS_DIM)
    dot_ab = _dot_int_sql("a.qe", "b.qe", _DS_DIM)
    cos = (
        f"CAST({dot_ab} AS DOUBLE)"
        f" / sqrt(CAST(a.na2 AS DOUBLE) * CAST(b.na2 AS DOUBLE))"
    )
    return _fullvec_lloyds_ctes(scaled=scaled) + f""",
    assign AS (
      SELECT vec_id, r AS cluster, qe FROM (
        SELECT h.vec_id AS vec_id, cb.r AS r, h.qe AS qe,
               row_number() OVER (
                 PARTITION BY h.vec_id ORDER BY {sq_h}, cb.r
               ) AS rn
        FROM h CROSS JOIN cb{DS_ITERS} cb
      ) WHERE rn = 1
    ),
    m AS (
      SELECT vec_id, cluster, qe,
             {_dot_int_sql('qe', 'qe', _DS_DIM)} AS na2
      FROM assign
    ),
    edges AS (
      SELECT a.cluster AS cluster, b.vec_id AS vec_id, a.vec_id AS dup_of,
             CAST(floor({cos} * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
      FROM m a JOIN m b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE {cos} >= {SEMDEDUP_TAU}
    )
    SELECT cluster, vec_id, dup_of, cos_e6 FROM (
      SELECT cluster, vec_id, dup_of, cos_e6,
             row_number() OVER (PARTITION BY vec_id ORDER BY dup_of) AS rn
      FROM edges
    ) WHERE rn = 1
    ORDER BY cluster, vec_id
    """


@query(
    "sim_semdedup",
    oracle=_semdedup_sql(),
    tags=("similarity", "dedup", "spec-anchor"),
)
def sim_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): cluster-scoped semantic deduplication
    — the pruning pass an LLM data pipeline runs over document embeddings.
    K-means the corpus into {DS_K} clusters (the bit-reproducible
    integer Lloyd's head shared with sim_diversity_sample /
    sim_ivf_trained_rerank), then compare pairs ONLY within a cluster:
    a vector is removed when an earlier-id cluster-mate has cosine >=
    {SEMDEDUP_TAU}; the emitted witness (`dup_of`) is the lowest such id.
    Cosine is computed over quantized-integer vectors with one exact int64
    dot and one IEEE double divide/sqrt, so the threshold compare and the
    emitted cos_e6 = floor(cos*1e6+0.5) are bit-identical cross-engine.

    Scale design: the whole point of SemDeDup is that pairwise work is
    cluster-local — at 100 TB you raise K ~ sqrt(N) (the paper's regime)
    so expected cluster size stays bounded and the within-cluster
    self-join never degenerates toward all-pairs; assignment is one
    broadcast crossJoin + argmin (no shuffle), and the self-join shuffles
    both sides once on the cluster key. The trained codebook is collected
    to a {DS_K}-row local relation (pq_kmeans_codebook), so re-deriving
    the assignment lineage on each join side re-runs only the broadcast
    argmin, not the training.

    No reference counterpart (the reference has no embedding operators) —
    LLM-pipeline extension per the brief, complementing
    dedup_embedding_cosine (label-blocked exact pass) with the trained-
    cluster-blocked variant that works without labels.

    Tagged `spec-anchor` (r14): with K PINNED the within-cluster
    pairwise term is N²/K by construction — measured sf1→sf10 ratio
    41.4 (exponent 1.62) — which is precisely the degeneration the
    K ~ sqrt(N) scaled twin exists to prevent (its ratio: 1.41).
    Correct, deliberately scale-unsafe, production path =
    sim_semdedup_scaled."""
    return _semdedup_plan(spark, sf_dir, DS_K, DS_SAMPLE)


@query(
    "sim_semdedup_scaled",
    oracle=_semdedup_sql(scaled=True),
    tags=("similarity", "dedup", "scale"),
)
def sim_semdedup_scaled(spark, sf_dir):
    """SemDeDup in the K ~ sqrt(N) PRODUCTION regime (Abbas et al. 2023
    §3's cluster-count scaling): identical pipeline to sim_semdedup, but
    K = max(16, floor(sqrt(N))) and training sample = max({DS_SAMPLE},
    8K) are derived from the corpus size, so expected cluster size —
    and with it the within-cluster pairwise cost Σ|cluster|² ≈ N²/K —
    stays O(N^1.5) instead of O(N²/const): the linearity knob
    SEMDEDUP_K.json measures (K=8→64 at 20k vectors halves the wall and
    caps the largest cluster 3284→695). sim_semdedup keeps the pinned
    K={DS_K} as the oracle-exactness twin; THIS is the variant a 100 TB
    corpus runs.

    Fully oracled, not rows-only: DuckDB computes the same K via a kk
    CTE + LIMIT subqueries, so codebooks — and therefore every emitted
    (cluster, vec_id, dup_of, cos_e6) row — are bit-identical
    cross-engine at any scale. The two driver-side scalars (count →
    K, sample) are the only non-distributed values; both are O(1)."""
    import math

    emb0 = catalog.table(spark, sf_dir, "embeddings")
    n = emb0.count()
    k = max(16, math.isqrt(n))
    sample = max(DS_SAMPLE, 8 * k)
    return _semdedup_plan(spark, sf_dir, k, sample)


def _arrow_centroid_assign(emb, cb):
    """Nearest-centroid assignment as an Arrow kernel over embedding
    batches (r8, VERDICT r7 #2; shared by SemDeDup and the kNN graph):
    the broadcast-crossJoin argmin it replaces materialized N*K rows each
    re-evaluating a 64-term zip_with fold — 26 of the 38 s at sf1 was
    THIS stage. The codebook is already a collected K-row local relation,
    so it rides into the closure as a K x dim float64 matrix. Exactness:
    ||x-c||^2 = na2 - 2*x.c + nc2 where every term — and every partial
    sum — is an integer < 2^53 (|element| <= ~1e6, 64-dim dot <=
    6.4e13), so float64 BLAS reproduces the integer sqdist bit-exactly
    in any summation order; rows are ordered by r, so np.argmin's
    first-minimum rule IS the (__d, r) tie-break. `emb` must carry
    (vec_id, qe); returns (vec_id, cluster, qe)."""
    import numpy as np
    import pandas as pd

    cb_rows = sorted(cb.collect(), key=lambda row: row["r"])
    C = np.array([row["c"] for row in cb_rows], dtype=np.float64)
    r_ids = np.array([row["r"] for row in cb_rows], dtype=np.int32)
    nc2 = np.einsum("ij,ij->i", C, C)

    def assign_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["qe"].to_numpy()).astype(np.float64)
            na2 = np.einsum("ij,ij->i", X, X)
            d = na2[:, None] - 2.0 * (X @ C.T) + nc2[None, :]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": r_ids[d.argmin(axis=1)],
                    "qe": pdf["qe"],
                }
            )

    return emb.select("vec_id", "qe").mapInPandas(
        assign_batches, "vec_id long, cluster int, qe array<long>"
    )


def _semdedup_plan(spark, sf_dir, k: int, sample: int):
    """Shared SemDeDup pipeline body (train k centroids on a
    `sample`-vector hash-ordered sample, assign, within-cluster pairwise
    cosine >= SEMDEDUP_TAU, earliest-id witness)."""
    import numpy as np
    import pandas as pd

    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    cb = _fullvec_centroids(emb, k=k, sample=sample)

    assigned = _arrow_centroid_assign(emb, cb)
    # Within-cluster pairwise cosine as ONE Arrow gram-matrix kernel per
    # cluster (r8, VERDICT r7 #2): the former cluster self-join re-evaluated
    # a 64-term zip_with fold per pair — ~30 of the 38 s at sf1 was this
    # constant. Exactness survives BLAS reordering because every quantity
    # up to the dot is an INTEGER exactly representable in float64
    # (|x|<=1e6 per element, 64-dim dot <= 6.4e13 < 2^53 — every partial
    # sum is an exact integer regardless of add order), and the divide /
    # sqrt / floor tail is the same IEEE op sequence as the oracle's.
    # The witness reduction (earliest dup_of per vec_id) happens in-kernel:
    # all of a vector's candidate pairs live in its one cluster, so the
    # per-column argmax over the sorted-id mask IS the global min dup_of.
    import numpy as np
    import pandas as pd

    tau = SEMDEDUP_TAU

    def cluster_dups(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"cluster": [], "vec_id": [], "dup_of": [], "cos_e6": []}
            ).astype({"cluster": "int32", "vec_id": "int64",
                      "dup_of": "int64", "cos_e6": "int64"})
        M = np.stack(pdf["qe"].to_numpy()[order]).astype(np.float64)
        na2 = np.einsum("ij,ij->i", M, M)  # exact: integer-valued < 2^53
        out_v, out_w, out_c = [], [], []
        chunk = 2048  # bounds the gram slab to chunk*n float64s
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            G = M[lo:hi] @ M.T  # exact integer dots in float64
            cos = G / np.sqrt(np.outer(na2[lo:hi], na2))
            mask = cos >= tau
            # only a < b (ids sorted ascending == row index order)
            mask &= np.arange(n)[None, :] > np.arange(lo, hi)[:, None]
            hit = mask.any(axis=0)
            cols = np.nonzero(hit)[0]
            wit = mask[:, cols].argmax(axis=0)  # first True row = min dup_of
            out_v.append(ids[cols])
            out_w.append(ids[lo + wit])
            out_c.append(
                np.floor(cos[wit, cols] * 1000000.0 + 0.5).astype(np.int64)
            )
        if not out_v:
            vs = np.array([], dtype=np.int64)
            ws = vs
            cs = vs
        else:
            vs = np.concatenate(out_v)
            ws = np.concatenate(out_w)
            cs = np.concatenate(out_c)
        res = pd.DataFrame({"vec_id": vs, "dup_of": ws, "cos_e6": cs})
        # a vec_id can surface in several row-chunks: keep the earliest
        # witness (chunks scan rows in ascending id order, so the first
        # occurrence is the minimum dup_of)
        res = res.groupby("vec_id", as_index=False).first()
        res.insert(0, "cluster", np.int32(key[0]))
        return res

    return (
        assigned.select("cluster", "vec_id", "qe")
        .groupBy("cluster")
        .applyInPandas(
            cluster_dups,
            "cluster int, vec_id long, dup_of long, cos_e6 long",
        )
        .orderBy("cluster", "vec_id")
    )


IVF_TRAINED_NPROBE = 2


def _ivf_trained_sql() -> str:
    """DuckDB oracle for sim_ivf_trained_rerank: the shared Lloyd's head
    over the corpus (vec_id <> 0), nearest-centroid assignment, probe the
    {IVF_TRAINED_NPROBE} centroids nearest the query, exact integer-L2
    re-rank within the probed cells."""
    sq_h = _sqdist_int_sql("h.qe", "cb.c", _DS_DIM)
    sq_q = _sqdist_int_sql("q.qe", "cb.c", _DS_DIM)
    sq_x = _sqdist_int_sql("h.qe", "q.qe", _DS_DIM)
    return _fullvec_lloyds_ctes("vec_id <> 0") + f""",
    qv AS (
      SELECT {_quantize_sql('embedding')} AS qe
      FROM embeddings WHERE vec_id = 0
    ),
    assign AS (
      SELECT vec_id, r AS cluster FROM (
        SELECT vec_id, r,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, r) AS rn
        FROM (
          SELECT h.vec_id AS vec_id, cb.r AS r, {sq_h} AS d
          FROM h CROSS JOIN cb{DS_ITERS} cb
        )
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT r FROM (
        SELECT cb.r AS r, row_number() OVER (ORDER BY {sq_q}, cb.r) AS rn
        FROM cb{DS_ITERS} cb CROSS JOIN qv q
      ) WHERE rn <= {IVF_TRAINED_NPROBE}
    )
    SELECT h.vec_id, CAST({sq_x} AS BIGINT) AS dist_q
    FROM h
    JOIN assign a ON a.vec_id = h.vec_id
    JOIN probe p ON p.r = a.cluster
    CROSS JOIN qv q
    ORDER BY dist_q, h.vec_id
    LIMIT 10
    """


@query(
    "sim_ivf_trained_rerank",
    oracle=_ivf_trained_sql(),
    tags=("similarity", "scale"),
)
def sim_ivf_trained_rerank(spark, sf_dir):
    """IVF-Flat ANN with a TRAINED coarse quantizer and exact re-rank —
    the production vector-search shape (a k-means coarse index narrows
    the corpus to nprobe={IVF_TRAINED_NPROBE} cells, then exact
    integer-L2 ranks only the candidates): completes the ANN family's
    progression label-IVF (sim_ivf_probe) -> multi-probe
    (sim_ivf_multiprobe) -> trained coarse quantizer + re-rank (this) ->
    memory-bounded PQ (sim_pq_*). Training reuses the bit-reproducible
    full-vector Lloyd's head shared with sim_diversity_sample
    (_fullvec_centroids / _fullvec_lloyds_ctes), so the two oracles pin
    the same codebook.

    Scale design: training is O(sample x iters), corpus-independent.
    Round 9: assignment + probe-prune + exact re-rank is ONE Arrow
    mapInPandas pass — the K-row trained centroids and the query vector
    ride the closure, each batch's vectors assign via the gram identity
    (integer-valued float64, exact < 2^53; rank-ordered rows preserve
    the (sqdist, r) tie-break), vectors outside the
    {IVF_TRAINED_NPROBE}-cell probe set are DROPPED (~nprobe/{DS_K} of
    the corpus survives — the inverted-list prune), and survivors get
    their exact integer L2 to the query; the only plan nodes after the
    scan are the kernel and the TakeOrderedAndProject. This replaced a
    crossJoin argmin whose K x 64-term interpreted sqdist folds per
    vector were the dominant cost (HOFs are not whole-stage-codegen).
    At 100 TB the assignment is the persisted index artifact, built
    once."""
    import numpy as np
    import pandas as pd

    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    base = emb.filter(F.col("vec_id") != 0)
    cb = _fullvec_centroids(base)

    cb_rows = sorted(cb.collect(), key=lambda row: row["r"])
    C = np.array([row["c"] for row in cb_rows], dtype=np.float64)
    nc2 = np.einsum("kd,kd->k", C, C)
    q = np.array(
        emb.filter(F.col("vec_id") == 0).select("qe").collect()[0]["qe"],
        dtype=np.float64,
    )
    nq2 = np.einsum("d,d->", q, q)
    dq = nq2 - 2.0 * (C @ q) + nc2
    probe = np.argsort(dq, kind="stable")[:IVF_TRAINED_NPROBE]
    probe_list = [int(cl) for cl in probe]

    def rerank_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            M = np.stack(pdf["qe"].to_numpy()).astype(np.float64)
            na2 = np.einsum("nd,nd->n", M, M)
            d = na2[:, None] - 2.0 * (M @ C.T) + nc2[None, :]
            cl = np.argmin(d, axis=1)
            keep = np.isin(cl, probe_list)
            if not keep.any():
                continue
            dist_q = na2[keep] - 2.0 * (M[keep] @ q) + nq2
            yield pd.DataFrame(
                {
                    "vec_id": ids[keep],
                    "dist_q": dist_q.astype(np.int64),
                }
            )

    return (
        base.select("vec_id", "qe")
        .mapInPandas(rerank_batches, "vec_id long, dist_q long")
        .orderBy("dist_q", "vec_id")
        .limit(10)
    )


IVFPQ_NPROBE = 2


def _ivfpq_sql() -> str:
    """DuckDB oracle for sim_ivfpq_adc_topk: the shared trained-coarse
    Lloyd's head, per-vector RESIDUAL encoding against a hash-seeded PQ
    codebook, per-probed-list query-residual LUTs, ADC over the probed
    lists only — FAISS's IVF-PQ layout, int64-exact end to end."""
    sq_h = _sqdist_int_sql("h.qe", "cb.c", _DS_DIM)
    sq_q = _sqdist_int_sql("q.qe", "cb.c", _DS_DIM)
    sub = f"list_slice(re, j*{PQ_SUBDIM}+1, j*{PQ_SUBDIM}+{PQ_SUBDIM})"
    qsub = f"list_slice(qr.re, p.j*{PQ_SUBDIM}+1, p.j*{PQ_SUBDIM}+{PQ_SUBDIM})"
    return _fullvec_lloyds_ctes("vec_id <> 0") + f""",
    qv AS (
      SELECT {_quantize_sql('embedding')} AS qe
      FROM embeddings WHERE vec_id = 0
    ),
    assign AS (
      SELECT vec_id, r AS cluster FROM (
        SELECT h.vec_id AS vec_id, cb.r AS r,
               row_number() OVER (PARTITION BY h.vec_id ORDER BY {sq_h}, cb.r)
                 AS rn
        FROM h CROSS JOIN cb{DS_ITERS} cb
      ) WHERE rn = 1
    ),
    res AS (
      SELECT h.vec_id AS vec_id, a.cluster AS cluster,
             list_transform(generate_series(1, {_DS_DIM}),
                            i -> h.qe[i] - cb.c[i]) AS re
      FROM h
      JOIN assign a ON a.vec_id = h.vec_id
      JOIN cb{DS_ITERS} cb ON cb.r = a.cluster
    ),
    js AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS j),
    pseeds AS (
      SELECT res.re AS re, s.pr AS pr FROM (
        SELECT vec_id, row_number() OVER (ORDER BY hh, vec_id) - 1 AS pr
        FROM h ORDER BY hh, vec_id LIMIT {PQ_K}
      ) s JOIN res ON res.vec_id = s.vec_id
    ),
    pcb AS (
      SELECT pr, j, {sub} AS c FROM pseeds CROSS JOIN js
    ),
    rsubs AS (
      SELECT vec_id, cluster, j, {sub} AS sub FROM res CROSS JOIN js
    ),
    enc AS (
      SELECT vec_id, cluster, j, pr FROM (
        SELECT rs.vec_id AS vec_id, rs.cluster AS cluster, rs.j AS j,
               p.pr AS pr,
               row_number() OVER (
                 PARTITION BY rs.vec_id, rs.j
                 ORDER BY {_sqdist_int_sql('rs.sub', 'p.c', PQ_SUBDIM)}, p.pr
               ) AS rn
        FROM rsubs rs JOIN pcb p ON p.j = rs.j
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT r AS cluster FROM (
        SELECT cb.r AS r, row_number() OVER (ORDER BY {sq_q}, cb.r) AS rn
        FROM cb{DS_ITERS} cb CROSS JOIN qv q
      ) WHERE rn <= {IVFPQ_NPROBE}
    ),
    qres AS (
      SELECT p.cluster AS cluster,
             list_transform(generate_series(1, {_DS_DIM}),
                            i -> q.qe[i] - cb.c[i]) AS re
      FROM probe p
      JOIN cb{DS_ITERS} cb ON cb.r = p.cluster
      CROSS JOIN qv q
    ),
    lut AS (
      SELECT qr.cluster AS cluster, p.j AS j, p.pr AS pr,
             {_sqdist_int_sql(qsub, 'p.c', PQ_SUBDIM)} AS qd
      FROM qres qr CROSS JOIN pcb p
    )
    SELECT e.vec_id, CAST(sum(l.qd) AS BIGINT) AS adc_dist_q
    FROM enc e
    JOIN lut l ON l.cluster = e.cluster AND l.j = e.j AND l.pr = e.pr
    GROUP BY e.vec_id
    ORDER BY adc_dist_q, e.vec_id
    LIMIT 10
    """


@query(
    "sim_ivfpq_adc_topk",
    oracle=_ivfpq_sql(),
    tags=("similarity", "scale"),
)
def sim_ivfpq_adc_topk(spark, sf_dir):
    """IVF-PQ with residual encoding — the capstone of the ANN family and
    the index layout production vector search actually ships (FAISS
    IVFPQ): a TRAINED coarse quantizer routes each vector to a list, the
    vector's RESIDUAL from its list centroid is product-quantized (4
    codes of 4 bits), and a query probes nprobe={IVFPQ_NPROBE} lists,
    building one tiny LUT per probed list from ITS query residual; ADC
    distance = sum of LUT entries for the candidate's codes. Residual
    encoding is why IVF-PQ beats flat PQ at equal bits: residual vectors
    are centered near zero, so the same codebook spends its 16 cells on
    a much smaller volume.

    Composition: the coarse quantizer is the shared bit-reproducible
    Lloyd's head (sim_diversity_sample / sim_ivf_trained_rerank pin the
    same codebook); the PQ codebook is the hash-seeded construction of
    sim_pq_adc_topk, trained here on residuals; everything stays int64
    (quantized micros; residual subtraction is exact; distances are
    integer sqdist), so the unrolled oracle matches bit-for-bit.

    Scale: the inverted-list posture is what changes at 100 TB — ADC
    scoring touches ONLY the probed lists (a semi-join on the cluster
    key prunes the candidate scan: ~nprobe/K of the corpus), while flat
    PQ (sim_pq_adc_topk) scores every code. Encode is one broadcast
    codebook join; the rank vector of per-list LUTs is
    nprobe x {PQ_M} x {PQ_K} rows, always broadcast-size.

    Round 9: the whole pipeline after training is ONE Arrow mapInPandas
    pass. The trained centroids (K rows), the PQ_K seed residuals (the
    residual codebook), the probe set, and the per-probed-list LUTs are
    all bounded-by-construction local state riding the kernel closure;
    the kernel assigns each batch's vectors to their coarse list via the
    gram identity, DROPS vectors outside the probed lists (the
    inverted-list prune, ~nprobe/K of the corpus survives), encodes the
    survivors' residuals, and sums their LUT entries — no join, window,
    or shuffle before the TakeOrderedAndProject top-k. All arithmetic is
    integer micros < 2^53 in float64 (residual diffs <= ~5e5 per
    element), so the unrolled oracle still matches bit-for-bit;
    rank-ordered codeword rows preserve both (sqdist, r) tie-breaks."""
    import numpy as np
    import pandas as pd

    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    base = emb.filter(F.col("vec_id") != 0)
    cb = _fullvec_centroids(base)  # (r, c) trained coarse centroids

    cb_rows = sorted(cb.collect(), key=lambda row: row["r"])
    C = np.array([row["c"] for row in cb_rows], dtype=np.float64)  # (K, dim)
    nc2 = np.einsum("kd,kd->k", C, C)

    def nearest_cluster(M):
        # argmin over rank-ordered centroid rows == (sqdist, r) tie-break.
        na2 = np.einsum("nd,nd->n", M, M)
        d = na2[:, None] - 2.0 * (M @ C.T) + nc2[None, :]
        return np.argmin(d, axis=1)

    # PQ_K hash-ordered seed vectors -> local residual codebook
    # pcb[pr, j, :]: assign each seed to its coarse list, subtract.
    seed_rows = (
        base.select(
            "vec_id", "qe", hash60(F.col("vec_id").cast("string")).alias("hh")
        )
        .orderBy("hh", "vec_id")
        .limit(PQ_K)
        .collect()
    )
    seed_rows.sort(key=lambda row: (row["hh"], row["vec_id"]))
    SV = np.array([row["qe"] for row in seed_rows], dtype=np.float64)
    pcb = (SV - C[nearest_cluster(SV)]).reshape(PQ_K, PQ_M, PQ_SUBDIM)
    pc2 = np.einsum("rjd,rjd->rj", pcb, pcb)

    # Query side: probe the IVFPQ_NPROBE nearest lists; one LUT per list
    # from the query's residual AGAINST THAT LIST's centroid.
    q = np.array(
        emb.filter(F.col("vec_id") == 0).select("qe").collect()[0]["qe"],
        dtype=np.float64,
    )
    dq = np.einsum("d,d->", q, q) - 2.0 * (C @ q) + nc2
    probe = np.argsort(dq, kind="stable")[:IVFPQ_NPROBE]  # ties -> lowest r
    luts = {}
    for cl in probe:
        qre = (q - C[cl]).reshape(PQ_M, PQ_SUBDIM)
        diff = qre[None, :, :] - pcb
        luts[int(cl)] = np.einsum("rjd,rjd->rj", diff, diff).T  # (M, K)
    probe_set = {int(cl) for cl in probe}

    def ivfpq_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            M = np.stack(pdf["qe"].to_numpy()).astype(np.float64)
            cl = nearest_cluster(M)
            keep = np.isin(cl, list(probe_set))
            if not keep.any():
                continue
            ids, cl, M = ids[keep], cl[keep], M[keep]
            R = (M - C[cl]).reshape(len(ids), PQ_M, PQ_SUBDIM)
            nr2 = np.einsum("njd,njd->nj", R, R)
            cross = np.einsum("njd,rjd->njr", R, pcb)
            d = nr2[:, :, None] - 2.0 * cross + pc2.T[None, :, :]
            codes = np.argmin(d, axis=2)  # ties -> lowest pr
            adc = np.empty(len(ids), dtype=np.int64)
            for i in range(len(ids)):
                lut = luts[int(cl[i])]
                adc[i] = int(lut[np.arange(PQ_M), codes[i]].sum())
            yield pd.DataFrame({"vec_id": ids, "adc_dist_q": adc})

    return (
        base.select("vec_id", "qe")
        .mapInPandas(ivfpq_batches, "vec_id long, adc_dist_q long")
        .orderBy("adc_dist_q", "vec_id")
        .limit(10)
    )


KNN_K = 5


def _knn_graph_sql(scaled: bool = False) -> str:
    """DuckDB oracle for sim_knn_graph: shared Lloyd's head, nearest-
    centroid assignment carrying the quantized vector, within-cluster
    pairwise integer cosine, top-{KNN_K} per vector by (cos_e6 DESC, id).
    scaled=True uses the K ~ sqrt(N) head (sim_knn_graph_scaled)."""
    sq_h = _sqdist_int_sql("h.qe", "cb.c", _DS_DIM)
    dot_ab = _dot_int_sql("a.qe", "b.qe", _DS_DIM)
    cos = (
        f"CAST({dot_ab} AS DOUBLE)"
        f" / sqrt(CAST(a.na2 AS DOUBLE) * CAST(b.na2 AS DOUBLE))"
    )
    return _fullvec_lloyds_ctes(scaled=scaled) + f""",
    assign AS (
      SELECT vec_id, r AS cluster, qe FROM (
        SELECT h.vec_id AS vec_id, cb.r AS r, h.qe AS qe,
               row_number() OVER (
                 PARTITION BY h.vec_id ORDER BY {sq_h}, cb.r
               ) AS rn
        FROM h CROSS JOIN cb{DS_ITERS} cb
      ) WHERE rn = 1
    ),
    m AS (
      SELECT vec_id, cluster, qe,
             {_dot_int_sql('qe', 'qe', _DS_DIM)} AS na2
      FROM assign
    ),
    pairs AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
             CAST(floor({cos} * 1000000.0 + 0.5) AS BIGINT) AS cos_e6
      FROM m a JOIN m b
        ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, neighbor_id, CAST(rk AS BIGINT) AS rank, cos_e6 FROM (
      SELECT vec_id, neighbor_id, cos_e6,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY cos_e6 DESC, neighbor_id
             ) AS rk
      FROM pairs
    ) WHERE rk <= {KNN_K} AND vec_id < 200
    ORDER BY vec_id, rank
    """


@query(
    "sim_knn_graph",
    oracle=_knn_graph_sql(),
    tags=("similarity", "graph", "spec-anchor"),
)
def sim_knn_graph(spark, sf_dir):
    """Approximate k-NN GRAPH construction ({KNN_K} neighbors per vector,
    IVF-cell-blocked): the batch primitive under SemDeDup-style cluster
    dedup, graph-based label propagation, and kNN-classifier curation —
    every vector's top-{KNN_K} cluster-mates by integer cosine,
    emitted as (vec_id, neighbor_id, rank, cos_e6) edges (output surface
    bounded to vec_id < 200 per the fingerprint-row convention; the graph
    is built corpus-wide).

    Scale design: candidate edges exist only WITHIN a trained IVF cell
    (the sim_semdedup blocking argument: Σ|cell|² with K ~ sqrt(N) cells
    keeps candidate count ~O(N^1.5), never all-pairs); the top-k is a
    window partitioned by vec_id — millions of independent partitions,
    no global sort. Recall is the standard IVF trade: multi-probe
    (sim_ivf_multiprobe's pattern) widens candidate cells without
    changing this plan's shape. Cosine ranks by the exact integer
    cos_e6 (one int64 dot + one IEEE divide), so ordering — and
    therefore the emitted graph — is bit-identical cross-engine.

    Tagged `spec-anchor` (r14): with K PINNED the per-cell gram work is
    N²/K by construction — measured sf1→sf10 ratio 25.5 (exponent
    1.41) — the degeneration the K ~ sqrt(N) scaled twin prevents (its
    second decade: exponent 0.41). Correct, deliberately scale-unsafe,
    production path = sim_knn_graph_scaled."""
    return _knn_graph_plan(spark, sf_dir, DS_K, DS_SAMPLE)


@query(
    "sim_knn_graph_scaled",
    oracle=_knn_graph_sql(scaled=True),
    tags=("similarity", "graph", "scale"),
)
def sim_knn_graph_scaled(spark, sf_dir):
    """sim_knn_graph in the K ~ sqrt(N) PRODUCTION regime — the same
    cell-count scaling as sim_semdedup_scaled (K = max(16,
    floor(sqrt(N))), sample = max({DS_SAMPLE}, 8K)), so within-cell
    candidate count stays ~O(N^1.5) instead of N²/const as the corpus
    grows; sim_knn_graph keeps the pinned K={DS_K} as the
    oracle-exactness twin. Fully hash-checked: the DuckDB head computes
    the same K via the kk CTE + LIMIT subqueries."""
    import math

    n = catalog.table(spark, sf_dir, "embeddings").count()
    k = max(16, math.isqrt(n))
    return _knn_graph_plan(spark, sf_dir, k, max(DS_SAMPLE, 8 * k))


def _knn_graph_plan(spark, sf_dir, k: int, sample: int):
    """Shared kNN-graph pipeline body (train k cells, assign,
    within-cell gram-matrix cosine, per-vector top-{KNN_K}).

    Round-9 rewrite to the SemDeDup Arrow-kernel shape after stage
    profiling (PERF.md round 9): the former crossJoin argmin + pair
    self-join + window spent ~26 s of its 37 s sf1 wall re-evaluating
    interpreted 64-term zip_with folds (the aggregate/zip_with
    higher-order functions are NOT whole-stage-codegen), a cost that
    count()-based timings hid because Catalyst pruned the unused fold
    columns. Assignment now rides the shared _arrow_centroid_assign
    kernel; the within-cell pairwise cosine + per-vector top-k is ONE
    BLAS gram slab per cell inside applyInPandas — same exactness
    argument as the SemDeDup kernel (integer-valued dots < 2^53 are
    exact in float64 under any summation order; the divide/sqrt/floor
    tail is the same IEEE op sequence as the oracle's), and the ranking
    happens on the QUANTIZED cos_e6 with stable argsort so ties break by
    ascending neighbor_id exactly like the oracle's row_number ORDER BY.

    Scale: candidates exist only within a trained IVF cell (with
    K ~ sqrt(N) cells the gram work is ~O(N^1.5), never all-pairs); the
    per-cell slab is chunked to bound memory; the shuffle keys on the
    cell id. Skewed cells are AQE territory like every keyed group."""
    import numpy as np
    import pandas as pd

    emb = Sc.cpu_fanout_repartition(
        catalog.table(spark, sf_dir, "embeddings"), "vec_id"
    ).withColumn("qe", S.quantize_micros(F.col("embedding")))
    cb = _fullvec_centroids(emb, k=k, sample=sample)
    assigned = _arrow_centroid_assign(emb, cb)

    topk = KNN_K

    def cluster_knn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vec_id": [], "neighbor_id": [], "rank": [], "cos_e6": []}
        ).astype({"vec_id": "int64", "neighbor_id": "int64",
                  "rank": "int64", "cos_e6": "int64"})
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        n = len(ids)
        if n < 2:
            return empty
        M = np.stack(pdf["qe"].to_numpy()[order]).astype(np.float64)
        na2 = np.einsum("ij,ij->i", M, M)  # exact: integer-valued < 2^53
        out_v, out_n, out_r, out_c = [], [], [], []
        chunk = 2048  # bounds the gram slab to chunk*n float64s
        kk = min(topk, n - 1)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            G = M[lo:hi] @ M.T  # exact integer dots in float64
            cos = G / np.sqrt(np.outer(na2[lo:hi], na2))
            ce6 = np.floor(cos * 1000000.0 + 0.5).astype(np.int64)
            rows = np.arange(lo, hi)
            # Self-exclusion sentinel: far below any real cos_e6 (>= -1e6)
            # but safely negatable — np.iinfo(int64).min would overflow
            # under the argsort's negation back onto itself and sort FIRST.
            ce6[rows - lo, rows] = -(10**18)
            # top-k by (cos_e6 DESC, neighbor_id ASC): ids are sorted
            # ascending == column order, and stable argsort keeps column
            # order among equal keys — the oracle's row_number tie-break.
            nb = np.argsort(-ce6, axis=1, kind="stable")[:, :kk]
            out_v.append(np.repeat(ids[rows], kk))
            out_n.append(ids[nb].ravel())
            out_r.append(np.tile(np.arange(1, kk + 1), hi - lo))
            out_c.append(np.take_along_axis(ce6, nb, axis=1).ravel())
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_v),
                "neighbor_id": np.concatenate(out_n),
                "rank": np.concatenate(out_r).astype(np.int64),
                "cos_e6": np.concatenate(out_c),
            }
        )

    return (
        assigned.select("cluster", "vec_id", "qe")
        .groupBy("cluster")
        .applyInPandas(
            cluster_knn,
            "vec_id long, neighbor_id long, rank long, cos_e6 long",
        )
        .filter(F.col("vec_id") < 200)
        .orderBy("vec_id", "rank")
    )


SIM_RANGE_THRESH = 0.25


@query(
    "sim_range_search",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    e AS (
      SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS norm
      FROM embeddings WHERE vec_id <> 0
    ),
    scored AS (
      SELECT vec_id,
             round({_dot_sql('embedding', 'qv')} /
                   (norm * sqrt({_dot_sql('qv', 'qv')})), 4) AS cosine
      FROM e CROSS JOIN q
    )
    SELECT vec_id, cosine FROM scored
    WHERE cosine >= {SIM_RANGE_THRESH}
    ORDER BY vec_id
    """,
    tags=("similarity",),
)
def sim_range_search(spark, sf_dir):
    """RANGE (threshold) similarity search — top-k's sibling: every vector
    with cosine >= {SIM_RANGE_THRESH} of the query, the shape retrieval
    uses when the consumer wants "all sufficiently similar" rather than a
    fixed count (dedup candidate pulls, recall-oriented retrieval). Same
    broadcast-query one-scan plan as sim_topk_bruteforce but the selection
    is a FILTER, not TakeOrdered — no ordering state at all, so at 100 TB
    it is a single embarrassing-parallel scan whose output is
    threshold-bounded. The threshold compares the 4-decimal ROUNDED cosine
    on both engines, so the cut sits on the already-parity-proven value,
    never a raw float boundary."""
    from gtec_etl_spark.operators.similarity import dot, with_norm

    emb = catalog.table(spark, sf_dir, "embeddings")
    qv = with_norm(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv")),
        "qv",
        "qnorm",
    )
    e = with_norm(emb.filter(F.col("vec_id") != 0), "embedding")
    cos = F.round(
        dot(F.col("embedding"), F.col("qv")) / (F.col("norm") * F.col("qnorm")), 4
    )
    return (
        e.crossJoin(F.broadcast(qv))
        .select("vec_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= SIM_RANGE_THRESH)
        .orderBy("vec_id")
    )


def _recall_oracle() -> str:
    from gtec_etl_spark.plans import registry

    o = registry.oracles()
    arms = []
    for method in ("sim_ivf_probe", "sim_ivf_multiprobe"):
        arms.append(
            f"""    SELECT '{method}' AS method, 10 AS k,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(count(*) AS BIGINT) * 10000 // 10 AS recall_bp
    FROM (SELECT vec_id FROM ({o[method]})) a
    JOIN (SELECT vec_id FROM ({o['sim_topk_bruteforce']})) t USING (vec_id)"""
        )
    return (
        "\n    SELECT * FROM (\n"
        + "\n    UNION ALL\n".join(arms)
        + "\n    ) ORDER BY method\n    "
    )


@query("sim_recall_report", oracle=_recall_oracle(), tags=("similarity",))
def sim_recall_report(spark, sf_dir):
    """ANN quality evaluation as a first-class operator: recall@10 of the
    IVF single-probe and multi-probe retrievers against the brute-force
    ground truth — the number an ANN deployment tracks when trading probe
    count for latency. Both the Spark plan AND the DuckDB oracle are
    COMPOSED from the already-gated queries (registry.queries /
    registry.oracles), so the report is definitionally consistent with
    the retrievers it scores; the join is on the 10-row result sets, so
    the evaluation itself costs nothing at any scale beyond the
    retrievals it reuses."""
    from gtec_etl_spark.plans import registry

    qs = registry.queries()
    truth = qs["sim_topk_bruteforce"](spark, sf_dir).select("vec_id")
    out = None
    for method in ("sim_ivf_probe", "sim_ivf_multiprobe"):
        got = qs[method](spark, sf_dir).select("vec_id")
        row = (
            got.join(truth, "vec_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
            .select(
                F.lit(method).alias("method"),
                F.lit(10).cast("int").alias("k"),
                "n_hits",
                F.expr("n_hits * 10000 div 10").alias("recall_bp"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("method")


@query(
    "sim_batch_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv,
             sqrt({_dot_sql('embedding', 'embedding')}) AS qnorm
      FROM embeddings WHERE vec_id < 8
    ),
    e AS (
      SELECT vec_id, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS norm
      FROM embeddings WHERE vec_id >= 8
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_dot_sql('e.embedding', 'q.qv')} / (e.norm * q.qnorm) AS cos,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY {_dot_sql('e.embedding', 'q.qv')} / (e.norm * q.qnorm) DESC,
                        e.vec_id
             ) AS rnk
      FROM e CROSS JOIN q
    )
    SELECT query_id, vec_id, round(cos, 4) AS cosine, CAST(rnk AS BIGINT) AS rnk
    FROM scored WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
    tags=("similarity",),
)
def sim_batch_topk(spark, sf_dir):
    """BATCH ANN serving — exact top-5 by cosine for EIGHT query vectors
    in ONE corpus pass (the production lookup shape: queries arrive in
    batches, the corpus is scanned once per batch, never once per
    query). The bounded query batch (vec_id < 8 — fixed 8 rows at any
    sf) broadcasts into a nested-loop join against the corpus; ranking
    is a per-query window (shuffle keyed on 8 query ids). Same
    sequential-left-fold cosine as sim_topk_bruteforce so the DuckDB
    oracle is bit-reproducible. At 100 TB the per-row fold is the Arrow
    gram-kernel's job (the sim_ivfpq lesson) and the top-5 becomes a
    per-partition heap; the plan shape — one scan, broadcast batch,
    keyed window — is already the right one."""
    from gtec_etl_spark.operators.similarity import dot, with_norm
    from pyspark.sql import Window

    emb = catalog.table(spark, sf_dir, "embeddings")
    queries = with_norm(
        emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        ),
        "qv",
        "qnorm",
    )
    corpus = with_norm(emb.filter(F.col("vec_id") >= 8))
    cos = dot(F.col("embedding"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        corpus.crossJoin(F.broadcast(queries))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "query_id",
            "vec_id",
            F.round("cos", 4).alias("cosine"),
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("query_id", "rnk")
    )


@query(
    "sim_ivf_balance",
    oracle="""
    WITH cells AS (
      SELECT label AS cell, CAST(count(*) AS BIGINT) AS n_vecs
      FROM embeddings GROUP BY label
    ),
    tot AS (
      SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST(max(n_vecs) AS BIGINT) AS max_cell
      FROM cells
    )
    SELECT c.cell, c.n_vecs,
           CAST(1000000 * c.n_vecs // t.n_total AS BIGINT) AS share_ppm,
           CAST(1000 * c.n_vecs * t.n_cells // t.n_total AS BIGINT)
             AS balance_e3
    FROM cells c CROSS JOIN tot t
    ORDER BY cell
    """,
    tags=("similarity", "profile"),
)
def sim_ivf_balance(spark, sf_dir):
    """IVF POSTING-LIST balance report — the ANN-planning statistic
    prof_skew_report is for joins: per inverted-list cell, its size,
    corpus share (ppm), and balance ratio (size x n_cells / total,
    x1000 — 1000 = perfectly even). A cell whose balance runs hot makes
    every probe that lands there scan too much — the signal to re-train
    centroids, split the cell, or raise nprobe; at 100 TB this report
    is one keyed count over the assignment (here the stored coarse
    label; for trained IVF it composes over the assignment stage), a
    few hundred rows out. All-integer output."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    from pyspark.sql import Window

    cells = emb.groupBy(F.col("label").alias("cell")).agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    w = Window.partitionBy()
    return (
        cells.select(
            "cell",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.sum("n_vecs").over(w).alias("_tot"),
            F.count(F.lit(1)).over(w).alias("_ncells"),
        )
        .select(
            "cell",
            "n_vecs",
            F.expr("1000000 * n_vecs div _tot").cast("long").alias("share_ppm"),
            F.expr("1000 * n_vecs * _ncells div _tot").cast("long").alias("balance_e3"),
        )
        .orderBy("cell")
    )


@query(
    "sim_embedding_profile",
    oracle=f"""
    WITH n AS (
      SELECT vec_id,
             CAST(floor(sqrt({_dot_sql('embedding', 'embedding')}) * 1000
                  + 0.5) AS BIGINT) AS norm_e3,
             len(embedding) AS dim
      FROM embeddings
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(dim) AS BIGINT) AS min_dim,
           CAST(max(dim) AS BIGINT) AS max_dim,
           CAST(min(norm_e3) AS BIGINT) AS min_norm_e3,
           CAST(max(norm_e3) AS BIGINT) AS max_norm_e3,
           CAST(sum(CASE WHEN norm_e3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_vectors
    FROM n
    """,
    tags=("similarity", "profile"),
)
def sim_embedding_profile(spark, sf_dir):
    """EMBEDDING-QUALITY preflight — the check an ANN pipeline runs
    before building any index: vector count, dimension consistency
    (ragged dims break every kernel downstream), the norm range
    (unnormalized corpora silently turn cosine into dot), and
    zero-vector count (cosine undefined — they must be quarantined).
    Norms quantize to integer milli-units via the same sequential-fold
    dot as the ANN queries, so the doubles are bit-reproducible. One
    scan, one global aggregate — the cheapest query in the similarity
    pack and the first one to run at 100 TB."""
    from gtec_etl_spark.operators.similarity import dot

    emb = catalog.table(spark, sf_dir, "embeddings")
    n = emb.select(
        F.floor(
            F.sqrt(dot(F.col("embedding"), F.col("embedding"))) * 1000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("norm_e3"),
        F.size("embedding").alias("dim"),
    )
    return n.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.min("dim").cast("long").alias("min_dim"),
        F.max("dim").cast("long").alias("max_dim"),
        F.min("norm_e3").cast("long").alias("min_norm_e3"),
        F.max("norm_e3").cast("long").alias("max_norm_e3"),
        F.sum(F.when(F.col("norm_e3") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_vectors"),
    )


FILTER_OVERFETCH = 30  # post-filter candidate overfetch (3x the final k)


@query(
    "sim_filtered_search",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    e AS (
      SELECT vec_id, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS norm
      FROM embeddings WHERE vec_id <> 0
    ),
    pre AS (
      SELECT vec_id,
             round({_dot_sql('embedding', 'qv')}
                   / (norm * sqrt({_dot_sql('qv', 'qv')})), 4) AS cosine
      FROM e CROSS JOIN q
      WHERE vec_id % 3 = 1
      ORDER BY {_dot_sql('embedding', 'qv')}
               / (norm * sqrt({_dot_sql('qv', 'qv')})) DESC, vec_id
      LIMIT 10
    ),
    dims AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS d,
             embedding AS ev
      FROM embeddings
    ),
    cent AS (
      SELECT label, list(cv ORDER BY d) AS centroid FROM (
        SELECT label, d, round(avg(CAST(ev[d] AS DOUBLE)), 4) AS cv
        FROM dims GROUP BY label, d
      ) GROUP BY label
    ),
    best AS (
      SELECT label FROM cent CROSS JOIN q
      ORDER BY {_dot_sql('centroid', 'qv')} /
               (sqrt({_dot_sql('centroid', 'centroid')})
                * sqrt({_dot_sql('qv', 'qv')})) DESC, label
      LIMIT 1
    ),
    over_ AS (
      SELECT vec_id,
             round({_dot_sql('embedding', 'qv')}
                   / (norm * sqrt({_dot_sql('qv', 'qv')})), 4) AS cosine
      FROM e CROSS JOIN q
      WHERE vec_id IN (SELECT vec_id FROM embeddings
                       WHERE label = (SELECT label FROM best))
      ORDER BY {_dot_sql('embedding', 'qv')}
               / (norm * sqrt({_dot_sql('qv', 'qv')})) DESC, vec_id
      LIMIT {FILTER_OVERFETCH}
    ),
    post AS (
      SELECT vec_id, cosine FROM over_
      WHERE vec_id % 3 = 1
      ORDER BY cosine DESC, vec_id LIMIT 10
    )
    SELECT * FROM (
      SELECT 'prefilter_exact' AS strategy, vec_id, cosine FROM pre
      UNION ALL
      SELECT 'postfilter_ivf', vec_id, cosine FROM post
    ) ORDER BY strategy, cosine DESC, vec_id
    """,
    tags=("similarity",),
)
def sim_filtered_search(spark, sf_dir):
    """FILTERED vector search — the query production retrieval actually
    runs (a tenant / category / licence predicate conjoined with top-k),
    and the strategy fork every vector store documents: PRE-FILTER (apply
    the predicate, exact top-k over survivors — correct but loses the
    index's pruning when the filter is sparse) vs POST-FILTER with
    overfetch (IVF-probe the nearest cell, take {FILTER_OVERFETCH}
    candidates, THEN filter and cut to 10 — keeps the index but can come
    back short or worse when the predicate decimates the cell). The
    metadata predicate here is vec_id % 3 = 1 (a synthetic tenant tag);
    both arms are emitted under a strategy column so the recall gap is
    directly visible in the result.

    CROSSOVER RULE (measured, tools/filtered_search_curve.py + PERF.md
    round 12): the post-filter arm's survivor count tracks
    E[survivors] = overfetch x keep_rate (measured 17/12/7/5/3 at keep
    rates 1/2..1/30 vs expected 15/10/6/3/1), so for keep_rate <
    k/overfetch (= 10/{FILTER_OVERFETCH} here) it cannot even RETURN k
    rows — and above that bound its recall is still capped by the
    index's unfiltered single-probe recall (2000 bp on this corpus,
    sim_recall_report). Pre-filter is exact (recall 10000 bp) at the
    cost of scanning the predicate's survivors — which a real lake
    prunes by partition/zone on the metadata column anyway. Use
    post-filter only when keep_rate >= k/overfetch AND the index's
    unfiltered recall is acceptable; sparse predicates always take the
    pre-filter arm. Pre-filter arm: one scan, broadcast
    query, TakeOrderedAndProject. Post-filter arm: broadcast K-row
    centroid table + one-cell semi-join (sim_ivf_probe's plan) + bounded
    re-rank. All cosines rounded to 4 decimals on the parity-proven
    path."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") % 3 == 1
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))

    pre = S.brute_force_topk(emb.filter(pred & (F.col("vec_id") != 0)), qv, 10)

    dims = emb.select("label", F.posexplode("embedding").alias("d", "x"))
    cent = (
        dims.groupBy("label", "d")
        .agg(F.round(F.avg(F.col("x").cast("double")), 4).alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "cv"))).alias("pairs"))
        .select("label", F.expr("transform(pairs, p -> p.cv)").alias("centroid"))
    )
    qn = S.with_norm(qv.select(F.col("q").alias("qv")), "qv", "qnorm")
    cent_cos = S.dot(F.col("centroid"), F.col("qv")) / (
        F.sqrt(S.dot(F.col("centroid"), F.col("centroid"))) * F.col("qnorm")
    )
    best = (
        cent.crossJoin(F.broadcast(qn))
        .orderBy(cent_cos.desc(), F.col("label"))
        .limit(1)
        .select("label")
    )
    cell = emb.join(F.broadcast(best), "label", "left_semi").filter(
        F.col("vec_id") != 0
    )
    over = S.brute_force_topk(cell, qv, FILTER_OVERFETCH)
    post = (
        over.filter(pred)
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )
    return (
        pre.select(F.lit("prefilter_exact").alias("strategy"), "vec_id", "cosine")
        .unionByName(
            post.select(F.lit("postfilter_ivf").alias("strategy"), "vec_id", "cosine")
        )
        .orderBy("strategy", F.col("cosine").desc(), "vec_id")
    )


SQ8_LEVELS = 255  # code domain 0..255 (mx maps to 255 via the mx>mn clamp)
SQ8_DIMS = PQ_M * PQ_SUBDIM
SQ8_OVERFETCH = 30


def _sq8_ctes() -> str:
    code = (
        f"CASE WHEN mx[i] > mn[i] THEN "
        f"CAST((qe[i] - mn[i]) * {SQ8_LEVELS} // (mx[i] - mn[i]) AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
    )
    recon = (
        f"mn[i] + CAST((2 * code[i] + 1) * (mx[i] - mn[i])"
        f" // {2 * SQ8_LEVELS} AS BIGINT)"
    )
    return f"""
    WITH h AS (
      SELECT vec_id, {_quantize_sql('embedding')} AS qe FROM embeddings
    ),
    dims AS (
      SELECT unnest(generate_series(1, {SQ8_DIMS})) AS d
    ),
    mm AS (
      SELECT list(mnv ORDER BY d) AS mn, list(mxv ORDER BY d) AS mx FROM (
        SELECT d, min(qe[d]) AS mnv, max(qe[d]) AS mxv
        FROM h CROSS JOIN dims WHERE vec_id <> 0 GROUP BY d
      )
    ),
    q AS (SELECT qe AS qv FROM h WHERE vec_id = 0),
    coded AS (
      SELECT vec_id,
             list_transform(generate_series(1, {SQ8_DIMS}),
                            i -> {code}) AS code
      FROM h CROSS JOIN mm WHERE vec_id <> 0
    ),
    cand AS (
      SELECT vec_id, code,
             list_reduce(list_transform(generate_series(1, {SQ8_DIMS}),
               i -> (qv[i] - ({recon})) * (qv[i] - ({recon}))),
               (x, y) -> x + y) AS adc_dist_q
      FROM coded CROSS JOIN mm CROSS JOIN q
      ORDER BY adc_dist_q, vec_id LIMIT {SQ8_OVERFETCH}
    )
    """


@query(
    "sim_sq8_rerank",
    oracle=_sq8_ctes()
    + f"""
    SELECT c.vec_id, CAST(c.adc_dist_q AS BIGINT) AS adc_dist_q,
           CAST({_sqdist_int_sql('h.qe', 'q.qv', SQ8_DIMS)} AS BIGINT)
             AS exact_dist_q
    FROM cand c JOIN h ON h.vec_id = c.vec_id CROSS JOIN q
    ORDER BY exact_dist_q, c.vec_id LIMIT 10
    """,
    tags=("similarity", "scale"),
)
def sim_sq8_rerank(spark, sf_dir):
    """Scalar-quantization (SQ8) ANN with exact rerank — the third
    compression tier between raw floats and PQ: each dimension is
    independently quantized to an 8-bit code against the corpus's
    per-dimension [min, max] range (256 B/vector vs PQ's 2 B and raw's
    256 B of floats, but with no codebook training and much higher
    per-dim fidelity — the faiss SQ8 trade-off). Search: approximate
    distance against the CODES ONLY (query vs floored cell-midpoint
    reconstruction — the float arrays are never touched while scoring),
    overfetch the top {SQ8_OVERFETCH}, then one exact integer-micros
    rerank over just those rows (the exact vectors are fetched by
    vec_id join for candidates only — the storage-access pattern a
    production two-stage retriever has).

    Parity: embeddings quantize to integer micros first (the PQ
    convention); codes, reconstructions, and both distances are then
    pure BIGINT arithmetic with non-negative numerators (floor==trunc
    on both engines). Max |recon diff| ~ 1.1e6 micros, squared 1.2e12,
    64-dim sums < 1e14 — no int64 overflow, no hugeint leak (CASTs).
    Plan: the per-dim min/max table is ONE 64-row aggregate (bounded by
    the fixed dimensionality, broadcast); coding + ADC scoring is one
    map-only pass over the corpus ending in TakeOrderedAndProject; the
    rerank touches {SQ8_OVERFETCH} rows. At 100 TB: scan-bound, zero
    corpus-sized shuffles."""
    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    corpus = emb.filter(F.col("vec_id") != 0).select("vec_id", "qe")
    mm = (
        corpus.select(F.posexplode("qe").alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("mnv"), F.max("x").alias("mxv"))
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("d", "mnv"))).alias("p1"),
            F.array_sort(F.collect_list(F.struct("d", "mxv"))).alias("p2"),
        )
        .select(
            F.expr("transform(p1, p -> p.mnv)").alias("mn"),
            F.expr("transform(p2, p -> p.mxv)").alias("mx"),
        )
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("qe").alias("qv"))
    code_expr = (
        f"transform(sequence(1, {SQ8_DIMS}), i -> CASE "
        f"WHEN element_at(mx, i) > element_at(mn, i) THEN "
        f"CAST((element_at(qe, i) - element_at(mn, i)) * {SQ8_LEVELS} "
        f"div (element_at(mx, i) - element_at(mn, i)) AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
    )
    recon = (
        f"element_at(mn, i) + CAST((2 * element_at(code, i) + 1) "
        f"* (element_at(mx, i) - element_at(mn, i)) "
        f"div {2 * SQ8_LEVELS} AS BIGINT)"
    )
    adc_expr = (
        f"aggregate(sequence(1, {SQ8_DIMS}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc + (element_at(qv, i) - ({recon})) "
        f"* (element_at(qv, i) - ({recon})))"
    )
    coded = corpus.crossJoin(F.broadcast(mm)).select(
        "vec_id", "mn", "mx", F.expr(code_expr).alias("code")
    )
    cand = (
        coded.crossJoin(F.broadcast(q))
        .select("vec_id", F.expr(adc_expr).alias("adc_dist_q"))
        .orderBy("adc_dist_q", "vec_id")
        .limit(SQ8_OVERFETCH)
    )
    exact_expr = (
        f"aggregate(sequence(1, {SQ8_DIMS}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc + (element_at(qe, i) - element_at(qv, i)) "
        f"* (element_at(qe, i) - element_at(qv, i)))"
    )
    return (
        cand.join(corpus, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "adc_dist_q",
            F.expr(exact_expr).alias("exact_dist_q"),
        )
        .orderBy("exact_dist_q", "vec_id")
        .limit(10)
    )


IVF_UPSERT_MOD = 7  # vec_id % 7 == 3 plays the arriving batch


@query(
    "sim_ivf_upsert",
    oracle=f"""
    WITH idx AS (
      SELECT * FROM embeddings
      WHERE vec_id <> 0 AND vec_id % {IVF_UPSERT_MOD} <> 3
    ),
    newb AS (
      SELECT * FROM embeddings
      WHERE vec_id <> 0 AND vec_id % {IVF_UPSERT_MOD} = 3
    ),
    dims AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS d,
             embedding AS e
      FROM idx
    ),
    cent AS (
      SELECT label,
             list(CAST(floor(cv * 1000000 + 0.5) AS BIGINT) ORDER BY d)
               AS cq
      FROM (
        SELECT label, d, round(avg(CAST(e[d] AS DOUBLE)), 4) AS cv
        FROM dims GROUP BY label, d
      ) GROUP BY label
    ),
    assign AS (
      SELECT vec_id, cent.label AS label, row_number() OVER (
               PARTITION BY vec_id
               ORDER BY {_sqdist_int_sql("cq", _quantize_sql('embedding'), 64)},
                        cent.label
             ) AS rn
      FROM newb CROSS JOIN cent
    ),
    adds AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_added
      FROM assign WHERE rn = 1 GROUP BY label
    ),
    occ AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_indexed FROM idx
      GROUP BY label
    ),
    tot AS (SELECT CAST(sum(n_added) AS BIGINT) AS t FROM adds)
    SELECT o.label, o.n_indexed, coalesce(a.n_added, 0) AS n_added,
           o.n_indexed + coalesce(a.n_added, 0) AS occupancy_after,
           CAST(coalesce(a.n_added, 0) * 10000 // tot.t AS BIGINT)
             AS add_share_bp
    FROM occ o LEFT JOIN adds a ON a.label = o.label CROSS JOIN tot
    ORDER BY o.label
    """,
    tags=("similarity", "scale"),
)
def sim_ivf_upsert(spark, sf_dir):
    """IVF index UPSERT — the maintenance pass a production vector store
    runs between retrains: an arriving batch (every
    {IVF_UPSERT_MOD}th vector plays the part) is assigned to its nearest
    EXISTING centroid (no retraining — the faiss add-after-train
    contract) and the per-cell occupancy report shows where the new
    mass landed and whether drift is skewing cells (a cell absorbing an
    outsized add share is the retrain trigger). Distances are exact
    integer squared-L2 over quantized micros against micro-quantized
    rounded-mean centroids (the sim_ivf_probe + PQ parity conventions),
    tie-broken by label, so assignment is bit-identical cross-engine.

    Plan: centroids aggregate the INDEXED corpus once (bounded |labels|
    x 64 output, broadcast); the batch-x-centroid join is batch-rows x
    |cells| with a per-vec_id argmin window over |cells| rows; the
    report is one bounded groupBy. At 100 TB the arriving batch is
    ingest-interval-sized and the centroid table is fixed — nothing
    corpus-scaled shuffles."""
    emb = catalog.table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    idx = emb.filter(F.col("vec_id") % IVF_UPSERT_MOD != 3)
    newb = emb.filter(F.col("vec_id") % IVF_UPSERT_MOD == 3)
    dims = idx.select("label", F.posexplode("embedding").alias("d", "x"))
    cent = (
        dims.groupBy("label", "d")
        .agg(F.round(F.avg(F.col("x").cast("double")), 4).alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "cv"))).alias("pairs"))
        .select(
            "label",
            F.expr(
                "transform(pairs, p -> CAST(floor(p.cv * 1000000 + 0.5)"
                " AS BIGINT))"
            ).alias("cq"),
        )
    )
    from pyspark.sql import Window

    nq = newb.select("vec_id", S.quantize_micros(F.col("embedding")).alias("qe"))
    sqdist = (
        "aggregate(sequence(1, 64), CAST(0 AS BIGINT), (acc, i) -> acc"
        " + (element_at(cq, i) - element_at(qe, i))"
        " * (element_at(cq, i) - element_at(qe, i)))"
    )
    assign = (
        nq.crossJoin(F.broadcast(cent))
        .withColumn("dist", F.expr(sqdist))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("dist", "label")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    adds = assign.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_added")
    )
    occ = idx.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_indexed")
    )
    tot = adds.agg(F.sum("n_added").cast("long").alias("t"))
    return (
        occ.join(adds, "label", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n_indexed",
            F.coalesce(F.col("n_added"), F.lit(0)).cast("long").alias("n_added"),
            (F.col("n_indexed") + F.coalesce(F.col("n_added"), F.lit(0)))
            .cast("long")
            .alias("occupancy_after"),
            F.expr(
                "CAST(coalesce(n_added, 0) * 10000 div t AS BIGINT)"
            ).alias("add_share_bp"),
        )
        .orderBy("label")
    )


MMR_POOL, MMR_K = 12, 5  # overfetched candidate pool, final diverse set
MMR_LAMBDA_NUM, MMR_LAMBDA_DEN = 7, 10  # lambda = 0.7


def _mmr_oracle() -> str:
    lam, rest = MMR_LAMBDA_NUM, MMR_LAMBDA_DEN - MMR_LAMBDA_NUM
    parts = [
        f"""
    WITH h AS (
      SELECT vec_id, {_quantize_sql('embedding')} AS qe FROM embeddings
    ),
    q AS (SELECT qe AS qv FROM h WHERE vec_id = 0),
    pool AS (
      SELECT vec_id, qe,
             {_dot_int_sql('qe', 'qv', 64)} AS dq
      FROM h CROSS JOIN q WHERE vec_id <> 0
      ORDER BY dq DESC, vec_id LIMIT {MMR_POOL}
    ),
    pd AS (
      SELECT a.vec_id AS av, b.vec_id AS bv,
             {_dot_int_sql('a.qe', 'b.qe', 64)} AS d
      FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
    ),
    s1 AS (
      SELECT vec_id, dq, CAST({lam} * dq AS BIGINT) AS mmr_score
      FROM pool ORDER BY dq DESC, vec_id LIMIT 1
    )"""
    ]
    for i in range(2, MMR_K + 1):
        prev_sel = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, i)
        )
        parts.append(
            f""",
    c{i} AS (
      SELECT p.vec_id, p.dq,
             CAST({lam} * p.dq - {rest} * max(pd.d) AS BIGINT) AS mmr_score
      FROM pool p
      JOIN pd ON pd.av = p.vec_id
             AND pd.bv IN ({prev_sel})
      WHERE p.vec_id NOT IN ({prev_sel})
      GROUP BY p.vec_id, p.dq
    ),
    s{i} AS (
      SELECT vec_id, dq, mmr_score FROM c{i}
      ORDER BY mmr_score DESC, vec_id LIMIT 1
    )"""
        )
    sel = "\n      UNION ALL\n      ".join(
        f"SELECT {i} AS rank, vec_id, dq, mmr_score FROM s{i}"
        for i in range(1, MMR_K + 1)
    )
    parts.append(
        f"""
    SELECT CAST(rank AS BIGINT) AS rank, vec_id, dq AS rel_dot_q,
           mmr_score
    FROM ({sel}) ORDER BY rank"""
    )
    return "".join(parts)


def _dot_int_sql(a: str, b: str, n: int) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {n}),"
        f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


@query("sim_mmr_rerank", oracle=_mmr_oracle(), tags=("similarity",))
def sim_mmr_rerank(spark, sf_dir):
    """Maximal-marginal-relevance rerank — the diversity pass a retrieval
    pipeline runs between ANN and the consumer (RAG context assembly,
    dedup'd search results): overfetch the top-{MMR_POOL} candidates by
    relevance, then greedily select {MMR_K} where each pick maximizes
    lambda·rel(q,d) − (1−lambda)·max_sim(d, selected) at lambda 0.7 —
    near-duplicate candidates are admitted once, not {MMR_K} times
    (sim_diversity_sample balances CLUSTERS corpus-wide; MMR diversifies
    ONE result list).

    Exactness: relevance and redundancy are integer micro-dot-products
    (|dot| ≤ 64·(5.3e5)² ≈ 1.8e13), lambda rides the 7/3 integer split,
    ties break on vec_id — the greedy trajectory is bit-identical
    cross-engine, stated by a {MMR_K}-stage unrolled oracle (the BPE /
    PQ-trained precedent for constant-iteration algorithms). Plan: ONE
    corpus pass ends at TakeOrderedAndProject({MMR_POOL}); everything
    after — the {MMR_POOL}² pairwise dots and the greedy stages — runs
    on bounded relations (broadcast-sized at any corpus scale)."""
    from pyspark.sql import Window

    lam, rest = MMR_LAMBDA_NUM, MMR_LAMBDA_DEN - MMR_LAMBDA_NUM
    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("qe").alias("qv"))
    dot_expr = (
        "aggregate(sequence(1, 64), CAST(0 AS BIGINT), (acc, i) -> acc"
        " + element_at({a}, i) * element_at({b}, i))"
    )
    pool = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "qe", F.expr(dot_expr.format(a="qe", b="qv")).alias("dq")
        )
        .orderBy(F.col("dq").desc(), "vec_id")
        .limit(MMR_POOL)
        .localCheckpoint(eager=True)  # bounded; greedy stages reuse it
    )
    a = pool.select(F.col("vec_id").alias("av"), F.col("qe").alias("aq"))
    b = pool.select(F.col("vec_id").alias("bv"), F.col("qe").alias("bq"))
    pd_ = (
        a.join(b, F.col("av") != F.col("bv"))
        .select("av", "bv", F.expr(dot_expr.format(a="aq", b="bq")).alias("d"))
        .localCheckpoint(eager=True)
    )
    sel = (
        pool.orderBy(F.col("dq").desc(), "vec_id")
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("rank"),
            "vec_id",
            "dq",
            (F.lit(lam) * F.col("dq")).cast("long").alias("mmr_score"),
        )
    )
    picked = sel.select("vec_id")
    for i in range(2, MMR_K + 1):
        cand = (
            pool.join(picked, "vec_id", "left_anti")
            .join(pd_, F.col("vec_id") == F.col("av"))
            .join(picked.select(F.col("vec_id").alias("bv")), "bv", "left_semi")
            .groupBy("vec_id", "dq")
            .agg(
                (F.lit(lam) * F.col("dq") - F.lit(rest) * F.max("d"))
                .cast("long")
                .alias("mmr_score")
            )
        )
        pick = (
            cand.orderBy(F.col("mmr_score").desc(), "vec_id")
            .limit(1)
            .select(
                F.lit(i).cast("long").alias("rank"),
                "vec_id",
                "dq",
                "mmr_score",
            )
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
        picked = sel.select("vec_id")
    return sel.select(
        "rank", "vec_id", F.col("dq").alias("rel_dot_q"), "mmr_score"
    ).orderBy("rank")
