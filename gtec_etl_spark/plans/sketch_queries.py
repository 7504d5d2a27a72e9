"""Sketch-operator query pack: fixed-size mergeable summaries — the
100 TB answer to "count/track everything" when exact state would be
unbounded. First member: count-min-sketch heavy hitters.

Everything here uses the engine's deterministic hash60 primitives
(functions/hashing.py), so the sketches — normally an approximate,
implementation-defined structure — are BIT-IDENTICAL across engines and
go through the full hash-compare oracle gate, not a tolerance contract:
the approximation error is part of the checked output.

No reference counterpart — LLM-pipeline / charter extension family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gtec_etl_spark import catalog
from gtec_etl_spark.functions.hashing import (
    MINHASH_P,
    hash60,
    hash60_sql,
    minhash_params,
    minhash_perm,
)
from gtec_etl_spark.plans.registry import query

CMS_D, CMS_W, CMS_TOPK = 4, 512, 20

# One universal-hash mixing pair per CMS row: the base 60-bit token hash is
# computed ONCE, then row di's column is ((a_i*(h%P)+b_i)%P) % W — pure
# int64 arithmetic, bit-identical cross-engine (vs r7's 4 md5-of-CONCAT
# per stream token, the 7.2x-sf1-ratio hot spot).
CMS_PARAMS = minhash_params(CMS_D)

_CMS_VALUES = ", ".join(
    f"({di}, {a}, {b})" for di, (a, b) in enumerate(CMS_PARAMS)
)


@query(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ),
    tc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks
      WHERE len(tok) > 0 GROUP BY tok
    ),
    base AS (SELECT tok, n, {hash60_sql("tok")} AS h FROM tc),
    keyed AS (
      SELECT d.di AS di,
             ((d.a * (b.h % {MINHASH_P}) + d.b) % {MINHASH_P}) % {CMS_W} AS col,
             b.n AS n
      FROM base b, (VALUES {_CMS_VALUES}) d(di, a, b)
    ),
    sketch AS (
      SELECT di, col, CAST(sum(n) AS BIGINT) AS cnt
      FROM keyed GROUP BY di, col
    ),
    exact AS (
      SELECT tok, n AS exact_n, h
      FROM base ORDER BY n DESC, tok LIMIT {CMS_TOPK}
    )
    SELECT e.tok AS token, e.exact_n AS exact_n,
           CAST(min(s.cnt) AS BIGINT) AS est_n,
           CAST(min(s.cnt) - e.exact_n AS BIGINT) AS overcount
    FROM exact e, (VALUES {_CMS_VALUES}) d(di, a, b)
    JOIN sketch s
      ON s.di = d.di
     AND s.col = ((d.a * (e.h % {MINHASH_P}) + d.b) % {MINHASH_P}) % {CMS_W}
    GROUP BY e.tok, e.exact_n
    ORDER BY exact_n DESC, token
    """,
    tags=("sketch", "text", "scale"),
)
def sketch_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters over the corpus token stream: build
    a {CMS_D}x{CMS_W} CMS (row di counts tokens at column
    mix_di(hash60(token)) mod {CMS_W}), then report the top-{CMS_TOPK}
    exact tokens with their exact count, their CMS estimate
    (min over the {CMS_D} rows), and the overcount — which the CMS
    guarantee bounds below eps·N and never negative; because the hash
    functions are the engine's deterministic hash60 family, the sketch
    and therefore the ERROR ITSELF is bit-identical cross-engine and
    rides the exact-hash oracle gate (no tolerance needed). The exact
    side exists to exhibit the contract at test scale; at 100 TB only
    the sketch path runs.

    Scale design — why a sketch at all: exact per-token counts keep
    |vocab| state (unbounded, Zipf-tailed); the CMS is a FIXED
    {CMS_D}x{CMS_W} integer grid whose {CMS_D * CMS_W}-row result
    BROADCASTS into the probe join, with state independent of corpus
    size. Sketches from shards/days merge by cell-wise addition
    (count-min is a monoid) — and the same additivity means the sketch
    ingests WEIGHTED (token, count) pairs, so here it consumes the
    vocabulary-level partial aggregate the exact top-k needs anyway
    (pre-aggregation commutes with sketching); a stream-only deployment
    feeds raw tokens with weight 1 into the identical cell expression.
    r7→r8 rewrite (VERDICT r7 #3): ONE md5 per distinct token, the
    {CMS_D} row-columns derived by integer universal-hash mixing — not
    {CMS_D} md5-of-CONCAT per stream occurrence (sf1 ratio 7.23)."""
    docs = catalog.table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
        )
        .filter(F.length("tok") > 0)
    )
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    base = tc.select("tok", "n", hash60(F.col("tok")).alias("h"))

    def cms_col(h_col):
        return [
            (minhash_perm(h_col, a, b) % CMS_W).alias(f"c{di}")
            for di, (a, b) in enumerate(CMS_PARAMS)
        ]

    keyed = base.select(
        "n", F.posexplode(F.array(*cms_col(F.col("h")))).alias("di", "col")
    )
    sketch = keyed.groupBy("di", "col").agg(F.sum("n").alias("cnt"))
    exact = (
        base.withColumnRenamed("n", "exact_n")
        .orderBy(F.col("exact_n").desc(), "tok")
        .limit(CMS_TOPK)
    )
    probes = exact.select(
        "tok",
        "exact_n",
        F.posexplode(F.array(*cms_col(F.col("h")))).alias("di", "col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["di", "col"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
        .select(
            F.col("tok").alias("token"),
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), "token")
    )


LC_M = 65536  # linear-counting bitmap width


@query(
    "sketch_linear_distinct",
    oracle=f"""
    WITH keys AS (SELECT l_partkey AS k FROM lineitem),
    occ AS (
      SELECT CAST(count(DISTINCT {hash60_sql("CAST(k AS VARCHAR)")} % {LC_M})
                  AS BIGINT) AS occupied
      FROM keys
    ),
    exact AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS exact_n FROM keys)
    SELECT e.exact_n AS exact_n, o.occupied AS occupied,
           CAST(floor(
             -{LC_M} * ln(CAST({LC_M} - LEAST(o.occupied, {LC_M} - 1)
                               AS DOUBLE) / {LC_M})
             + 0.5
           ) AS BIGINT) AS est_n
    FROM exact e CROSS JOIN occ o
    """,
    tags=("sketch", "scale"),
)
def sketch_linear_distinct(spark, sf_dir):
    """Linear-counting distinct sketch over the part keys of lineitem: a
    {LC_M}-cell occupancy bitmap (cell = hash60(key) mod {LC_M}) whose
    zero-cell fraction inverts to the cardinality estimate
    est = -m·ln((m - occupied)/m) — reported next to the exact distinct
    so the estimate's error is itself part of the hash-checked output.
    The single transcendental (one ln on one value, quantized to a whole
    count immediately) follows the repo's float-parity discipline; the
    hash is the deterministic hash60 family, so occupancy is
    bit-identical cross-engine. The one remaining exposure — a 1-ulp
    libm ln divergence flipping the floor if -m*ln(f)+0.5 sits on an
    integer boundary — is guarded by tests/test_float_guards.py
    (boundary clearance > 1e-6 asserted per corpus, ADVICE r7).

    Scale design: the sketch state is {LC_M} bits REGARDLESS of corpus
    size — the occupancy count is one map-side-combined distinct over a
    bounded domain (cells), vs count(DISTINCT key)'s unbounded
    shuffle-heavy state; shard bitmaps OR-merge (a monoid), the same
    merge story as the CMS. The exact twin exists to exhibit the error
    contract at test scale; HLL (Spark's approx_count_distinct) is the
    production swap-in when cardinalities approach m·ln(m)."""
    keys = catalog.table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k")
    )
    occ = keys.select(
        (hash60(F.col("k").cast("string")) % LC_M).alias("cell")
    ).agg(F.count_distinct("cell").cast("long").alias("occupied"))
    exact = keys.agg(F.count_distinct("k").cast("long").alias("exact_n"))
    return exact.crossJoin(occ).select(
        "exact_n",
        "occupied",
        F.floor(
            -F.lit(LC_M)
            * F.log(
                (F.lit(LC_M) - F.least(F.col("occupied"), F.lit(LC_M - 1)))
                .cast("double")
                / F.lit(LC_M)
            )
            + F.lit(0.5)
        )
        .cast("long")
        .alias("est_n"),
    )


# HyperLogLog geometry: m = 2^HLL_P registers indexed by the hash's top
# HLL_P bits; rho = leading-zero rank within the remaining HLL_W bits.
# The harmonic sum is kept EXACT by integer-scaling each 2^-M_j term to
# 2^(53-M_j) (M_j <= 53, so every term is a BIGINT and the register sum
# fits 2^61 < int64) — no float summation order anywhere; the single
# alpha*m^2*2^53 / s_int multiply-divide is IEEE-identical cross-engine
# on the identical s_int operand. ALPHA is computed once here and
# embedded as the SAME repr-literal in both plans.
HLL_P, HLL_W = 8, 52
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_SCALE = float(HLL_M * HLL_M * (1 << 53))


@query(
    "sketch_hll_distinct",
    oracle=f"""
    WITH h AS (
      SELECT {hash60_sql("CAST(l_partkey AS VARCHAR)")} AS h FROM lineitem
    ),
    b AS (
      SELECT h >> {HLL_W} AS bucket,
             CASE WHEN (h & {(1 << HLL_W) - 1}) = 0 THEN {HLL_W + 1}
                  ELSE {HLL_W} - length(bin(h & {(1 << HLL_W) - 1})) + 1
             END AS rho
      FROM h
    ),
    regs AS (
      SELECT bucket, CAST(max(rho) AS BIGINT) AS mj FROM b GROUP BY bucket
    ),
    s AS (
      SELECT CAST(sum(CAST(1 AS BIGINT) << CAST(53 - mj AS INTEGER))
                  AS BIGINT) AS s_present,
             CAST(count(*) AS BIGINT) AS n_present
      FROM regs
    ),
    agg AS (
      SELECT s_present + ({HLL_M} - n_present) * {1 << 53} AS s_int,
             {HLL_M} - n_present AS n_zero
      FROM s
    ),
    est AS (
      SELECT s_int, CAST(n_zero AS BIGINT) AS n_zero,
             {HLL_ALPHA!r} * {HLL_SCALE!r} / CAST(s_int AS DOUBLE) AS raw
      FROM agg
    ),
    exact AS (
      SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_n
      FROM lineitem
    )
    SELECT e.exact_n AS exact_n, s.n_zero AS n_zero,
           CAST(s.s_int AS BIGINT) AS s_int,
           CAST(floor(CASE WHEN s.raw <= {2.5 * HLL_M} AND s.n_zero > 0
                           THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE)
                                             / s.n_zero)
                           ELSE s.raw END + 0.5) AS BIGINT) AS est_n
    FROM exact e CROSS JOIN est s
    """,
    tags=("sketch", "scale"),
)
def sketch_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct sketch over lineitem part keys: {HLL_M}
    registers (top-{HLL_P} hash bits), register j holding the max
    leading-zero rank rho of the remaining {HLL_W} bits, inverted
    through the bias-corrected harmonic mean alpha_m*m^2/sum(2^-M_j) —
    with Flajolet's linear-counting fallback below 2.5m (the sf0.001
    corpus lands in the fallback, sf0.01+ in the raw regime, so BOTH
    branches ride the gate). Reported next to the exact distinct so the
    sketch error is itself hash-checked.

    Cross-engine exactness (the reason this can ride the hash gate at
    all): the harmonic sum is integer-scaled — each 2^-M_j becomes the
    BIGINT 2^(53-M_j), summed exactly in int64 (max 2^61) in ANY order;
    both engines then cast the identical s_int once and perform one
    multiply-divide by the repr-embedded alpha*m^2*2^53 literal (IEEE
    ops on identical operands are bit-identical). rho itself is pure
    integer/string work: length(bin(w)) = bit_length(w) in both
    engines. The fallback's single ln is quantized immediately and
    guarded against rounding-boundary flakiness in
    tests/test_float_guards.py, like sketch_linear_distinct's.

    Scale design: THE production distinct counter — {HLL_M} bytes of
    state regardless of corpus size (vs linear counting's m·ln(m)
    ceiling and count(DISTINCT)'s unbounded shuffle state); register
    vectors from shards/days/streams merge by elementwise max (a
    monoid, same merge story as the CMS). The register build is one
    map-side-combined groupBy over a {HLL_M}-value domain; everything
    after is a 1-row reduction. Spark's own approx_count_distinct is
    the same algorithm (HLL++) without the cross-engine determinism
    this gate needs."""
    li = catalog.table(spark, sf_dir, "lineitem")
    h = hash60(F.col("l_partkey").cast("string")).alias("h")
    w = F.col("h").bitwiseAND(F.lit((1 << HLL_W) - 1))
    regs = (
        li.select(h)
        .select(
            F.shiftright(F.col("h"), HLL_W).alias("bucket"),
            F.when(w == 0, F.lit(HLL_W + 1))
            .otherwise(F.lit(HLL_W) - F.length(F.bin(w)) + 1)
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("mj"))
    )
    s = regs.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mj AS INT))"))
        .cast("long")
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    ).select(
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << 53)
        ).alias("s_int"),
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("n_zero"),
    )
    est = s.select(
        "s_int",
        "n_zero",
        (F.lit(HLL_ALPHA) * F.lit(HLL_SCALE) / F.col("s_int").cast("double")).alias(
            "raw"
        ),
    )
    exact = li.agg(F.count_distinct("l_partkey").cast("long").alias("exact_n"))
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_n",
        "n_zero",
        F.col("s_int").cast("long").alias("s_int"),
        F.floor(
            F.when(
                (F.col("raw") <= F.lit(2.5 * HLL_M)) & (F.col("n_zero") > 0),
                F.lit(HLL_M)
                * F.log(F.lit(float(HLL_M)) / F.col("n_zero")),
            ).otherwise(F.col("raw"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("est_n"),
    )



@query(
    "sketch_hll_grouped",
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag AS grp,
             {hash60_sql("CAST(l_partkey AS VARCHAR)")} AS h
      FROM lineitem
    ),
    b AS (
      SELECT grp, h >> {HLL_W} AS bucket,
             CASE WHEN (h & {(1 << HLL_W) - 1}) = 0 THEN {HLL_W + 1}
                  ELSE {HLL_W} - length(bin(h & {(1 << HLL_W) - 1})) + 1
             END AS rho
      FROM h
    ),
    regs AS (
      SELECT grp, bucket, CAST(max(rho) AS BIGINT) AS mj
      FROM b GROUP BY grp, bucket
    ),
    s AS (
      SELECT grp,
             CAST(sum(CAST(1 AS BIGINT) << CAST(53 - mj AS INTEGER))
                  AS BIGINT) AS s_present,
             CAST(count(*) AS BIGINT) AS n_present
      FROM regs GROUP BY grp
    ),
    agg AS (
      SELECT grp, s_present + ({HLL_M} - n_present) * {1 << 53} AS s_int,
             {HLL_M} - n_present AS n_zero
      FROM s
    ),
    est AS (
      SELECT grp, s_int, CAST(n_zero AS BIGINT) AS n_zero,
             {HLL_ALPHA!r} * {HLL_SCALE!r} / CAST(s_int AS DOUBLE) AS raw
      FROM agg
    ),
    exact AS (
      SELECT l_returnflag AS grp,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT e.grp AS l_returnflag, e.exact_n AS exact_n, s.n_zero AS n_zero,
           CAST(s.s_int AS BIGINT) AS s_int,
           CAST(floor(CASE WHEN s.raw <= {2.5 * HLL_M} AND s.n_zero > 0
                           THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE)
                                             / s.n_zero)
                           ELSE s.raw END + 0.5) AS BIGINT) AS est_n
    FROM exact e JOIN est s ON s.grp = e.grp
    ORDER BY l_returnflag
    """,
    tags=("sketch", "scale"),
)
def sketch_hll_grouped(spark, sf_dir):
    """Per-GROUP HyperLogLog distinct — the grouped profiling shape
    ("distinct parts per return flag"; at 100 TB: distinct users per
    day per country) where count(DISTINCT) per group carries unbounded
    per-group state but a register vector per group is {HLL_M} bytes.
    Identical integer construction to sketch_hll_distinct, keyed by
    group: register build is one map-side-combined groupBy over the
    (group x {HLL_M}-bucket) domain, and register vectors merge by
    elementwise max — the monoid property that makes per-shard /
    per-day partial sketches combinable without re-reading data, which
    is the entire operational point of grouped sketches. Both the raw
    harmonic branch and the linear-counting fallback are exercised
    ACROSS groups/SFs; everything rides the integer-exact hash gate
    (see sketch_hll_distinct's exactness argument), with the per-group
    fallback ln guarded in tests/test_float_guards.py."""
    li = catalog.table(spark, sf_dir, "lineitem")
    h = hash60(F.col("l_partkey").cast("string")).alias("h")
    w = F.col("h").bitwiseAND(F.lit((1 << HLL_W) - 1))
    regs = (
        li.select(F.col("l_returnflag").alias("grp"), h)
        .select(
            "grp",
            F.shiftright(F.col("h"), HLL_W).alias("bucket"),
            F.when(w == 0, F.lit(HLL_W + 1))
            .otherwise(F.lit(HLL_W) - F.length(F.bin(w)) + 1)
            .alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").cast("long").alias("mj"))
    )
    s = (
        regs.groupBy("grp")
        .agg(
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mj AS INT))")
            )
            .cast("long")
            .alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        .select(
            "grp",
            (
                F.col("s_present")
                + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << 53)
            ).alias("s_int"),
            (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("n_zero"),
        )
    )
    est = s.select(
        "grp",
        "s_int",
        "n_zero",
        (
            F.lit(HLL_ALPHA) * F.lit(HLL_SCALE) / F.col("s_int").cast("double")
        ).alias("raw"),
    )
    exact = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count_distinct("l_partkey").cast("long").alias("exact_n")
    )
    return (
        exact.join(est, "grp")
        .select(
            F.col("grp").alias("l_returnflag"),
            "exact_n",
            "n_zero",
            F.col("s_int").cast("long").alias("s_int"),
            F.floor(
                F.when(
                    (F.col("raw") <= F.lit(2.5 * HLL_M))
                    & (F.col("n_zero") > 0),
                    F.lit(HLL_M)
                    * F.log(F.lit(float(HLL_M)) / F.col("n_zero")),
                ).otherwise(F.col("raw"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("est_n"),
        )
        .orderBy("l_returnflag")
    )




# Bloom-filter geometry: BLOOM_M bits as BLOOM_M/32 32-bit words (32-bit
# words keep every shifted bit positive in both engines' signed int64),
# BLOOM_K probe positions per key from the same universal-hash mixing
# family as the CMS rows — one md5 per DISTINCT key, integer mixing after.
BLOOM_M, BLOOM_K = 8192, 3
BLOOM_PARAMS = minhash_params(BLOOM_K)
_BLOOM_VALUES = ", ".join(
    f"({ki}, {a}, {b})" for ki, (a, b) in enumerate(BLOOM_PARAMS)
)


@query(
    "sketch_bloom_join",
    oracle=f"""
    WITH build AS (
      SELECT DISTINCT c_custkey AS k FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ),
    bh AS (SELECT k, {hash60_sql("CAST(k AS VARCHAR)")} AS h FROM build),
    words AS (
      SELECT p // 32 AS wi,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))
                  AS BIGINT) AS w
      FROM (
        SELECT ((d.a * (bh.h % {MINHASH_P}) + d.b) % {MINHASH_P})
                 % {BLOOM_M} AS p
        FROM bh, (VALUES {_BLOOM_VALUES}) d(ki, a, b)
      ) GROUP BY 1
    ),
    pk AS (
      SELECT k, {hash60_sql("CAST(k AS VARCHAR)")} AS h
      FROM (SELECT DISTINCT o_custkey AS k FROM orders)
    ),
    ppos AS (
      SELECT pk.k,
             ((d.a * (pk.h % {MINHASH_P}) + d.b) % {MINHASH_P})
               % {BLOOM_M} AS p
      FROM pk, (VALUES {_BLOOM_VALUES}) d(ki, a, b)
    ),
    key_pass AS (
      SELECT ppos.k,
             CAST(min(CASE WHEN (COALESCE(w.w, 0)
                                 >> CAST(ppos.p % 32 AS INTEGER)) & 1 = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS pass
      FROM ppos LEFT JOIN words w ON w.wi = ppos.p // 32
      GROUP BY ppos.k
    ),
    labeled AS (
      SELECT o.o_orderkey, kp.pass,
             CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END AS true_match
      FROM orders o
      JOIN key_pass kp ON kp.k = o.o_custkey
      LEFT JOIN build b ON b.k = o.o_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probe,
           CAST(sum(pass) AS BIGINT) AS n_pass_bloom,
           CAST(sum(true_match) AS BIGINT) AS n_true_match,
           CAST(sum(pass) - sum(true_match) AS BIGINT) AS n_false_pos
    FROM labeled
    """,
    tags=("sketch", "scale"),
)
def sketch_bloom_join(spark, sf_dir):
    """Bloom-filter semi-join pruning — the runtime-filter pattern every
    distributed engine uses to cut shuffle volume on selective joins,
    made explicit and deterministic: the build side (BUILDING-segment
    customer keys) folds into a {BLOOM_M}-bit filter stored as
    {BLOOM_M // 32} 32-bit words; every probe-side orders row is checked
    against the filter's {BLOOM_K} positions BEFORE any exact match.
    Output is the pruning contract itself, hash-gated: probe rows, bloom
    passers, true matches, and false positives (the bloom guarantee: no
    false NEGATIVES, so n_pass >= n_true always — and the FP count is
    bit-identical cross-engine because the hash60/mixing family is).

    Plan: one md5 per DISTINCT key on each side (the CMS r8 lesson —
    never per occurrence); the word table is an aggregate over a domain
    bounded by {BLOOM_M // 32} regardless of corpus, broadcast into
    {BLOOM_K} probe-side lookups; the per-key verdict then joins back to
    orders on the key. Spark's own runtime bloom (session.py pins
    creationSideThreshold) does this adaptively; this operator is the
    portable, oracle-checkable form.

    Scale: filter state is {BLOOM_M} bits REGARDLESS of build-side row
    count (size m to keys/10 bits for ~1% FP at scale); words OR-merge
    across shards (a monoid, like every sketch here). At 100 TB the win
    is shipping 1 KB instead of shuffling the probe side: only bloom
    passers reach the exact join."""
    cust = catalog.table(spark, sf_dir, "customer")
    orders = catalog.table(spark, sf_dir, "orders")
    build = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    bh = build.select("k", hash60(F.col("k").cast("string")).alias("h"))
    pos_cols = [
        (minhash_perm(F.col("h"), a, b) % BLOOM_M).alias(f"p{ki}")
        for ki, (a, b) in enumerate(BLOOM_PARAMS)
    ]
    words = (
        bh.select(F.explode(F.array(*pos_cols)).alias("p"))
        .groupBy((F.col("p") / 32).cast("long").alias("wi"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))")
            ).alias("w")
        )
    )
    pk = (
        orders.select(F.col("o_custkey").alias("k"))
        .distinct()
        .select("k", hash60(F.col("k").cast("string")).alias("h"))
    )
    probe_pos = pk.select(
        "k", F.posexplode(F.array(*pos_cols)).alias("ki", "p")
    )
    key_pass = (
        probe_pos.join(
            F.broadcast(words),
            (F.col("p") / 32).cast("long") == F.col("wi"),
            "left",
        )
        .select(
            "k",
            F.when(
                F.expr(
                    "(shiftright(COALESCE(w, 0), CAST(p % 32 AS INT)) & 1) = 1"
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("bit_set"),
        )
        .groupBy("k")
        .agg(F.min("bit_set").cast("long").alias("pass"))
    )
    labeled = (
        orders.select(F.col("o_custkey").alias("k"), "o_orderkey")
        .join(key_pass, "k")
        .join(
            build.select(F.col("k"), F.lit(1).alias("tm")),
            "k",
            "left",
        )
        .select("pass", F.coalesce(F.col("tm"), F.lit(0)).alias("true_match"))
    )
    return labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum("pass").cast("long").alias("n_pass_bloom"),
        F.sum("true_match").cast("long").alias("n_true_match"),
        (F.sum("pass") - F.sum("true_match")).cast("long").alias("n_false_pos"),
    )


KMV_K = 256  # k-minimum-values sketch size
_H60_SPACE = float(1 << 60)  # hash60 value space, as the repr-embedded literal


@query(
    "sketch_kmv_set_ops",
    oracle=f"""
    WITH a AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE year(o_orderdate) = 1996
    ),
    b AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE year(o_orderdate) = 1997
    ),
    ah AS (SELECT k, {hash60_sql("CAST(k AS VARCHAR)")} AS h FROM a),
    bh AS (SELECT k, {hash60_sql("CAST(k AS VARCHAR)")} AS h FROM b),
    uh AS (SELECT k, h FROM (SELECT * FROM ah UNION SELECT * FROM bh)),
    sk AS (SELECT k, h FROM uh ORDER BY h LIMIT {KMV_K}),
    kth AS (
      SELECT CAST(max(h) AS BIGINT) AS kth, CAST(count(*) AS BIGINT) AS n
      FROM sk
    ),
    rho AS (
      SELECT CAST(count(*) AS BIGINT) AS rho FROM sk
      WHERE k IN (SELECT k FROM a) AND k IN (SELECT k FROM b)
    ),
    est AS (
      SELECT CASE WHEN n < {KMV_K} THEN n
             ELSE CAST(floor(({KMV_K} - 1) * {_H60_SPACE!r}
                             / CAST(kth AS DOUBLE) + 0.5) AS BIGINT)
             END AS est_union,
             n
      FROM kth
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS exact_a,
           (SELECT CAST(count(*) AS BIGINT) FROM b) AS exact_b,
           (SELECT CAST(count(*) AS BIGINT) FROM
              (SELECT k FROM a INTERSECT SELECT k FROM b)) AS exact_inter,
           (SELECT CAST(count(*) AS BIGINT) FROM uh) AS exact_union,
           e.est_union AS est_union,
           CAST(r.rho * e.est_union // e.n AS BIGINT) AS est_inter
    FROM est e CROSS JOIN rho r
    """,
    tags=("sketch", "scale"),
)
def sketch_kmv_set_ops(spark, sf_dir):
    """K-minimum-values set-operation sketch (Beyer et al. / theta-sketch
    family): the {KMV_K} smallest hash60 values of a key set estimate its
    cardinality as (k-1)*HASH_SPACE/kth_min — and, unlike HLL, KMV
    sketches COMPOSE across set algebra: the union sketch is the k
    smallest of the merged sketches, and intersection follows from the
    inclusion fraction rho/k of union-sketch members present in both
    sides. Estimated here: customers active in 1996 vs 1997 — exact
    |A|, |B|, |A∩B|, |A∪B| reported alongside so the sketch error is
    itself hash-checked (the family discipline).

    Cross-engine exactness: hashes are the deterministic hash60 family;
    the k-smallest set is an ORDER BY h LIMIT k (TakeOrderedAndProject —
    distributed per-partition top-k, no global sort); the single
    float step (k-1)*2^60/kth is one multiply-divide on identical
    operands quantized immediately (kth < 2^60 casts to double with
    IEEE round-to-even identically in both engines); the intersection
    estimate rho*est_union/n is then pure integer arithmetic, dividing
    by the ACTUAL sketch size n = min(|A∪B|, k) — not the constant k —
    so in the small-set regime (n < k: the sketch IS the set, rho is
    the exact intersection, est_union = n) it reduces to rho*n/n = rho
    exactly; dividing by k there would shrink the answer by n/k.

    Scale: sketch state is {KMV_K} (hash, key) pairs per set REGARDLESS
    of cardinality; shard sketches merge by union-then-keep-k-smallest
    (a monoid — same merge story as every sketch here); membership
    provenance (which side a union-sketch member came from) is two
    semi-joins against the key sets, each probing only {KMV_K} rows.
    This is the sketch to reach for when the question is overlap —
    train/eval leakage rates, cross-snapshot churn — not just counts."""
    orders = catalog.table(spark, sf_dir, "orders")

    def keys(year):
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select(F.col("o_custkey").alias("k"))
            .distinct()
        )

    a, b = keys(1996), keys(1997)

    def hashed(df):
        return df.select("k", hash60(F.col("k").cast("string")).alias("h"))

    uh = hashed(a).unionByName(hashed(b)).distinct()
    sk = uh.orderBy("h").limit(KMV_K)
    kth = sk.agg(
        F.max("h").cast("long").alias("kth"),
        F.count(F.lit(1)).alias("n"),
    )
    rho = (
        sk.join(a, "k", "left_semi")
        .join(b, "k", "left_semi")
        .agg(F.count(F.lit(1)).alias("rho"))
    )
    est = kth.select(
        F.when(F.col("n") < KMV_K, F.col("n"))
        .otherwise(
            F.floor(
                F.lit(float(KMV_K - 1))
                * F.lit(_H60_SPACE)
                / F.col("kth").cast("double")
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("est_union"),
        F.col("n"),
    )
    exact_a = a.agg(F.count(F.lit(1)).cast("long").alias("exact_a"))
    exact_b = b.agg(F.count(F.lit(1)).cast("long").alias("exact_b"))
    exact_inter = (
        a.join(b, "k", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    exact_union = uh.agg(F.count(F.lit(1)).cast("long").alias("exact_union"))
    return (
        exact_a.crossJoin(exact_b)
        .crossJoin(exact_inter)
        .crossJoin(exact_union)
        .crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(rho))
        .select(
            "exact_a",
            "exact_b",
            "exact_inter",
            "exact_union",
            "est_union",
            F.expr("CAST(rho * est_union div n AS BIGINT)").alias(
                "est_inter"
            ),
        )
    )


SQ_B = 8          # number of range buckets (boundaries 1..B-1 emitted)
SQ_MOD, SQ_HIT = 1000, 20  # deterministic 2% Bernoulli sample by key hash


@query(
    "sketch_sampled_quantiles",
    oracle=f"""
    WITH vals AS (
      SELECT o_orderkey AS k,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    n_full AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
    samp AS (
      SELECT k, cents FROM vals
      WHERE {hash60_sql("CAST(k AS VARCHAR)")} % {SQ_MOD} < {SQ_HIT}
    ),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM samp),
    ranked AS (
      SELECT cents, row_number() OVER (ORDER BY cents, k) AS rn FROM samp
    ),
    bounds AS (
      SELECT i.i AS i, r.cents AS bound_cents
      FROM (SELECT unnest(generate_series(1, {SQ_B - 1})) AS i) i
      JOIN ns ON TRUE
      JOIN ranked r ON r.rn = (i.i * ns.n) // {SQ_B}
    ),
    audit AS (
      SELECT b.i, b.bound_cents,
             CAST(sum(CASE WHEN v.cents <= b.bound_cents
                      THEN 1 ELSE 0 END) AS BIGINT) AS full_rank
      FROM bounds b CROSS JOIN vals v
      GROUP BY b.i, b.bound_cents
    )
    SELECT a.i, a.bound_cents, a.full_rank,
           CAST({SQ_B} * a.full_rank - a.i * f.n AS BIGINT)
             AS rank_err_x{SQ_B}
    FROM audit a CROSS JOIN n_full f
    ORDER BY a.i
    """,
    tags=("sketch", "layout", "scale"),
)
def sketch_sampled_quantiles(spark, sf_dir):
    """Sample-based range-partition boundary estimation — the quantile
    machinery `repartitionByRange`/`write_range_bucketed` rest on, made
    explicit and audited: a deterministic {SQ_HIT / SQ_MOD:.0%}
    hash-Bernoulli sample of order totals (sample membership =
    hash60(key) % {SQ_MOD} < {SQ_HIT}, so the 'random' sample is
    bit-identical cross-engine) yields {SQ_B - 1} candidate bucket
    boundaries at the sample's own quantile ranks; the full corpus then
    audits each boundary with its TRUE rank and the signed rank error
    {SQ_B}*rank - i*N (kept in integer x{SQ_B} units — no division).
    The hash gate checks boundary VALUES and the error itself.

    Why sampled: exact boundaries need a global sort (the
    prof_equidepth_histogram regime); a p-sample bounds memory at p*N
    rows and gets rank error O(sqrt(N/p)/N) — the trade every
    range-writer makes. Spark's own repartitionByRange samples
    NON-deterministically (boundaries drift run to run, the reason
    sinks/tabular.py:write_range_bucketed uses fixed integer placement);
    this operator is the deterministic, oracle-checkable version of
    that sampling step.

    Plan: the sample filter pushes to the scan; the sample-side window
    sorts only sample-sized data; the audit is one crossJoin of the
    {SQ_B - 1}-row broadcast boundary set against the corpus with
    map-side-combined conditional sums — one pass, no per-boundary
    rescan."""
    orders = catalog.table(spark, sf_dir, "orders")
    vals = orders.select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    n_full = vals.agg(F.count(F.lit(1)).alias("n"))
    samp = vals.filter(
        hash60(F.col("k").cast("string")) % SQ_MOD < SQ_HIT
    )
    ns = samp.agg(F.count(F.lit(1)).alias("n_s"))
    from pyspark.sql import Window

    ranked = samp.select(
        "cents",
        F.row_number()
        .over(Window.orderBy("cents", "k"))
        .alias("rn"),
    )
    idx = spark.range(1, SQ_B).select(F.col("id").cast("long").alias("i"))
    bounds = (
        idx.crossJoin(F.broadcast(ns))
        .select("i", F.expr(f"(i * n_s) div {SQ_B}").alias("rn"))
        .join(ranked, "rn")
        .select("i", F.col("cents").alias("bound_cents"))
    )
    audit = (
        vals.crossJoin(F.broadcast(bounds))
        .groupBy("i", "bound_cents")
        .agg(
            F.sum(
                F.when(F.col("cents") <= F.col("bound_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("full_rank")
        )
    )
    return (
        audit.crossJoin(F.broadcast(n_full))
        .select(
            "i",
            "bound_cents",
            "full_rank",
            (F.lit(SQ_B) * F.col("full_rank") - F.col("i") * F.col("n"))
            .cast("long")
            .alias(f"rank_err_x{SQ_B}"),
        )
        .orderBy("i")
    )


@query(
    "sketch_hll_trailing",
    oracle=f"""
    WITH h AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             {hash60_sql("CAST(user_id AS VARCHAR)")} AS h
      FROM events
    ),
    regs AS (
      SELECT day, h >> {HLL_W} AS bucket,
             CAST(max(CASE WHEN (h & {(1 << HLL_W) - 1}) = 0 THEN {HLL_W + 1}
                  ELSE {HLL_W} - length(bin(h & {(1 << HLL_W) - 1})) + 1
             END) AS BIGINT) AS mj
      FROM h GROUP BY day, bucket
    ),
    days AS (SELECT DISTINCT day FROM regs),
    merged AS (
      SELECT d.day, r.bucket, CAST(max(r.mj) AS BIGINT) AS mj
      FROM days d JOIN regs r
        ON r.day BETWEEN d.day - INTERVAL 2 DAY AND d.day
      GROUP BY d.day, r.bucket
    ),
    s AS (
      SELECT day,
             CAST(sum(CAST(1 AS BIGINT) << CAST(53 - mj AS INTEGER))
                  AS BIGINT) + ({HLL_M} - count(*)) * {1 << 53} AS s_int,
             CAST({HLL_M} - count(*) AS BIGINT) AS n_zero
      FROM merged GROUP BY day
    ),
    est AS (
      SELECT day, s_int, n_zero,
             {HLL_ALPHA!r} * {HLL_SCALE!r} / CAST(s_int AS DOUBLE) AS raw
      FROM s
    ),
    ex AS (
      SELECT d.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS exact_n
      FROM days d JOIN (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
      ) e ON e.day BETWEEN d.day - INTERVAL 2 DAY AND d.day
      GROUP BY d.day
    )
    SELECT CAST(e.day AS DATE) AS day, e.exact_n, s.n_zero,
           CAST(s.s_int AS BIGINT) AS s_int,
           CAST(floor(CASE WHEN s.raw <= {2.5 * HLL_M} AND s.n_zero > 0
                           THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE)
                                             / s.n_zero)
                           ELSE s.raw END + 0.5) AS BIGINT) AS est_n
    FROM ex e JOIN est s ON s.day = e.day
    ORDER BY day
    """,
    tags=("sketch", "scale"),
)
def sketch_hll_trailing(spark, sf_dir):
    """TRAILING-WINDOW distinct users per day via HLL register MERGE —
    the sketch-algebra move that makes rolling distincts tractable at
    100 TB: per-day register vectors are built ONCE from the data (one
    keyed groupBy), and every day's trailing-3-day estimate comes from
    register-wise max over the three daily sketches — {HLL_M} bytes per
    day merged, the raw events never re-read per window (contrast
    ev_trailing_distinct_users, the exact twin whose state is the
    user-day table). Absent registers merge as zero, so the sparse
    day x bucket join (bounded: <= days x {HLL_M} rows) is the whole
    merge. The exact trailing distinct rides along as the validation
    column. Same integer register construction and guarded estimate
    branches as sketch_hll_distinct."""
    ev = catalog.table(spark, sf_dir, "events")
    h = ev.select(
        F.to_date("ts").alias("day"),
        hash60(F.col("user_id").cast("string")).alias("h"),
    )
    w = F.col("h").bitwiseAND(F.lit((1 << HLL_W) - 1))
    regs = (
        h.select(
            "day",
            F.shiftright(F.col("h"), HLL_W).alias("bucket"),
            F.when(w == 0, F.lit(HLL_W + 1))
            .otherwise(F.lit(HLL_W) - F.length(F.bin(w)) + 1)
            .alias("rho"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rho").cast("long").alias("mj"))
    )
    days = regs.select("day").distinct().select(F.col("day").alias("d"))
    merged = (
        days.join(
            regs,
            (F.col("day") >= F.date_sub(F.col("d"), 2))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d", "bucket")
        .agg(F.max("mj").cast("long").alias("mj"))
    )
    s = (
        merged.groupBy("d")
        .agg(
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mj AS INT))")
            )
            .cast("long")
            .alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        .select(
            "d",
            (
                F.col("s_present")
                + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << 53)
            ).alias("s_int"),
            (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("n_zero"),
        )
    )
    est = s.select(
        "d",
        "s_int",
        "n_zero",
        (
            F.lit(HLL_ALPHA) * F.lit(HLL_SCALE) / F.col("s_int").cast("double")
        ).alias("raw"),
    )
    exact = (
        days.join(
            ev.select(F.to_date("ts").alias("day"), "user_id"),
            (F.col("day") >= F.date_sub(F.col("d"), 2))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").cast("long").alias("exact_n"))
    )
    return (
        exact.join(est, "d")
        .select(
            F.col("d").alias("day"),
            "exact_n",
            "n_zero",
            F.col("s_int").cast("long").alias("s_int"),
            F.floor(
                F.when(
                    (F.col("raw") <= F.lit(2.5 * HLL_M))
                    & (F.col("n_zero") > 0),
                    F.lit(HLL_M)
                    * F.log(F.lit(float(HLL_M)) / F.col("n_zero")),
                ).otherwise(F.col("raw"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("est_n"),
        )
        .orderBy("day")
    )
