"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY.md §5: it had no unit tests at all): operator semantics hold for
arbitrary inputs, not just fixtures. Spark jobs are slow, so examples are
few but adversarially shrunk.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from gtec_etl_spark.operators.aggregates import mode_pick
from gtec_etl_spark.operators.scale import salted_join

SLOW = settings(max_examples=8, deadline=None)

values = st.sampled_from(["a", "b", "c", "dd", "EE"])
groups = st.integers(min_value=0, max_value=3)


@SLOW
@given(st.lists(st.tuples(groups, values), min_size=1, max_size=40))
def test_mode_pick_matches_reference_tiebreak(spark, data):
    """Mode with the reference's tie-break (count desc, then value asc —
    dna_extracts.py:49-53) equals a direct Python computation."""
    df = spark.createDataFrame(data, "g int, v string")
    got = {
        r["g"]: (r["mode_value"], r["mode_count"])
        for r in mode_pick(df, "g", "v").collect()
    }
    want = {}
    for g in {g for g, _ in data}:
        counts = Counter(v for gg, v in data if gg == g)
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[g] = best
    assert got == want


@SLOW
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=30),
    st.lists(st.integers(0, 5), min_size=0, max_size=6),
)
def test_salted_join_equals_plain_join(spark, fact_rows, dim_keys):
    """Salting never changes join semantics, for arbitrary key overlap
    (including empty sides and dangling keys)."""
    fact = spark.createDataFrame(fact_rows, "k int, payload int") if fact_rows else (
        spark.createDataFrame([], "k int, payload int")
    )
    dim_rows = [(k, f"d{k}") for k in sorted(set(dim_keys))]
    dim = spark.createDataFrame(dim_rows, "k int, label string") if dim_rows else (
        spark.createDataFrame([], "k int, label string")
    )
    plain = sorted(tuple(r) for r in fact.join(dim, "k").collect())
    salted = sorted(tuple(r) for r in salted_join(fact, dim, "k", n_salts=3).collect())
    assert salted == plain


@SLOW
@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=30), min_size=1, max_size=10))
def test_exact_dedup_fingerprint_whitespace_invariant(spark, texts):
    """The exact-dedup fingerprint is invariant under leading/trailing and
    repeated internal whitespace (the normalization contract)."""
    from gtec_etl_spark.operators.dedup import normalized_text

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["doc_id"]: r["fp"] for r in df.select("doc_id", F.md5(normalized_text(F.col("text"))).alias("fp")).collect()}
    messy = [(i, "  " + t.replace(" ", "   ") + " ") for i, t in rows]
    df2 = spark.createDataFrame(messy, "doc_id long, text string")
    fp2 = {r["doc_id"]: r["fp"] for r in df2.select("doc_id", F.md5(normalized_text(F.col("text"))).alias("fp")).collect()}
    assert fp == fp2


def test_pack_sequences_respect_budget(spark):
    """Packing invariant: every doc STARTS inside its sequence's budget
    window (start_offset in [seq_id*B, (seq_id+1)*B)), sequences within a
    bucket are dense from 0, and every doc appears exactly once."""
    from gtec_etl_spark.plans import registry
    from tests.conftest import SF_DIR

    rows = registry.specs()["text_pack_sequences"].fn(spark, SF_DIR).collect()
    B = 4096
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    n_docs = sum(len(v) for v in by_bucket.values())
    assert n_docs == len({r["doc_id"] for r in rows})
    for bucket, docs in by_bucket.items():
        seqs = sorted({d["seq_id"] for d in docs})
        assert seqs == list(range(len(seqs))), f"bucket {bucket}: gap in seq ids"
        # A doc in seq M started at offset >= M*B, so the bucket's total
        # token count must exceed M*B — holds independent of pack order.
        total = sum(d["n_tok"] for d in docs)
        assert total > max(seqs) * B, f"bucket {bucket}: seq beyond token mass"
        assert all(d["n_tok"] > 0 for d in docs)


def test_mixture_rebalance_rates_are_valid(spark):
    """Rebalance invariants: the smallest source keeps everything
    (keep_bp == 10000), every rate is in (0, 10000], and sampled counts
    are bounded by source size."""
    from gtec_etl_spark.plans import registry
    from tests.conftest import SF_DIR

    rows = registry.specs()["text_mixture_rebalance"].fn(spark, SF_DIR).collect()
    smallest = min(rows, key=lambda r: r["n_docs"])
    assert smallest["keep_bp"] == 10000
    for r in rows:
        assert 0 < r["keep_bp"] <= 10000
        assert 0 <= r["n_sampled"] <= r["n_docs"]


@SLOW
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 9)), min_size=0, max_size=40),
    st.integers(1, 4),
    st.integers(1, 5),
)
def test_topn_per_key_salted_equals_single_window(spark, rows, n, n_salts):
    """The two-level salted top-n (local per (key, salt) then global per
    key) returns EXACTLY the single-window top-n for any data, any n, any
    salt count — including heavy ties broken by the unique id column."""
    from gtec_etl_spark.operators.aggregates import top_k_per_group, topn_per_key_salted

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )
    order = [F.col("v"), F.col("id")]
    want = sorted(
        (r["k"], r["id"], r["v"], r["rn"])
        for r in top_k_per_group(df, "k", order, n).collect()
    )
    got = sorted(
        (r["k"], r["id"], r["v"], r["rn"])
        for r in topn_per_key_salted(df, "k", order, n, "id", n_salts).collect()
    )
    assert got == want


_iv = st.tuples(st.integers(-20, 20), st.integers(-20, 20)).map(
    lambda t: (min(t), max(t))
)


@SLOW
@given(
    st.lists(_iv, min_size=0, max_size=12),
    st.lists(_iv, min_size=0, max_size=12),
    st.integers(1, 9),
)
def test_interval_overlap_join_equals_bruteforce(spark, a_ivs, b_ivs, width):
    """The bucketized interval join equals the naive O(n*m) theta join for
    arbitrary half-open intervals — negative coordinates, empty intervals
    ([x,x) matches nothing), and any bucket width. Each overlapping pair
    must appear EXACTLY once (the first-shared-bucket dedup rule)."""
    from gtec_etl_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(a_ivs)], "a_id long, a_lo long, a_hi long"
    )
    b = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(b_ivs)], "b_id long, b_lo long, b_hi long"
    )
    got = Counter(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", width).collect()
    )
    want = Counter(
        (i, j)
        for i, (alo, ahi) in enumerate(a_ivs)
        for j, (blo, bhi) in enumerate(b_ivs)
        # half-open overlap; an EMPTY interval ([x,x)) covers nothing and
        # matches nothing (the operator's documented contract — the raw
        # overlap predicate alone would wrongly treat it as a point).
        if alo < ahi and blo < bhi and alo < bhi and blo < ahi
    )
    assert got == want


@SLOW
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=15),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=15),
)
def test_asof_join_equals_bruteforce(spark, fact_rows, event_rows):
    """asof_join equals the per-row Python reference (latest event
    at-or-before, ties by (event time, payload) max) for arbitrary data —
    duplicate fact rows and tied event timestamps included. Facts carry a
    synthetic unique pk used only as the stable row tag."""
    from gtec_etl_spark.operators.joins import asof_join

    facts = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(fact_rows)], "pk long, k long, t long"
    )
    events = spark.createDataFrame(
        [(k, t, f"p{k}_{t}_{i % 2}") for i, (k, t) in enumerate(event_rows)],
        "k long, et long, payload string",
    )
    got = {
        r["pk"]: (r["payload"], r["asof_time"])
        for r in asof_join(
            facts, events, "k", "k", "t", "et", ["payload"], row_tag="pk"
        ).collect()
    }
    ev_rows = [(k, t, f"p{k}_{t}_{i % 2}") for i, (k, t) in enumerate(event_rows)]
    want = {}
    for pk, (k, t) in enumerate(fact_rows):
        cands = [(et, p) for (ek, et, p) in ev_rows if ek == k and et <= t]
        want[pk] = max(cands)[::-1] if cands else (None, None)
    assert got == want


@SLOW
@given(
    st.lists(
        st.floats(
            min_value=-100.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=16,
    )
)
def test_quantize_micros_matches_python_ieee(spark, xs):
    """quantize_micros (floor(x*1e6 + 0.5) elementwise) is IEEE-exact: the
    JVM expression must produce the int64s Python's float arithmetic
    produces for any float32 input — the property the PQ oracle parity
    stands on."""
    import math

    from gtec_etl_spark.operators.similarity import quantize_micros

    df = spark.createDataFrame([(xs,)], "v array<float>")
    got = df.select(quantize_micros(F.col("v")).alias("q")).first()["q"]
    want = [math.floor(float(x) * 1000000.0 + 0.5) for x in xs]
    assert got == want


@SLOW
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([(16, 1), (16, 2), (8, 1), (8, 2)]),
    st.integers(min_value=1, max_value=200),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_codec_roundtrip_vs_stdlib(seed, layout, n_frames, rate):
    """For any seed/layout/length: the pure-struct WAV parser and stdlib
    `wave` (an independent RIFF implementation) agree on header fields and
    every decoded sample of fake_wav's output."""
    import io
    import wave

    import numpy as np

    from gtec_etl_spark.operators import multimodal as M

    bits, nch = layout
    blob = M.fake_wav(n_frames, rate, seed=seed, bits=bits, n_channels=nch)
    got_rate, got_nch, got_bits, s = M._decode_wav(blob)
    w = wave.open(io.BytesIO(blob))
    assert (w.getframerate(), w.getnchannels(), w.getsampwidth() * 8) == (
        got_rate,
        got_nch,
        got_bits,
    ) == (rate, nch, bits)
    raw = w.readframes(n_frames)
    ref = (
        np.frombuffer(raw, dtype="<i2").astype(np.int64)
        if bits == 16
        else np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
    )
    assert len(s) == n_frames * nch and (ref == s).all()


@SLOW
@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=8).map("".join),
        min_size=1,
        max_size=6,
    ),
    st.sampled_from(["aa", "ab", "ba", "bb"]),
)
def test_bpe_apply_merge_equals_python_greedy(spark, toks, pair):
    """operators.bpe.apply_merge (the map-side carry fold) implements
    greedy left-to-right non-overlapping pair merging — checked against a
    direct Python scan for adversarial inputs ('aaa' overlap runs etc.)."""
    from pyspark.sql import functions as F

    from gtec_etl_spark.operators import bpe as B

    left, right = pair[0], pair[1]

    def py_merge(ts):
        out, i = [], 0
        while i < len(ts):
            if i + 1 < len(ts) and ts[i] == left and ts[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(ts[i])
                i += 1
        return out

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    got = df.select(
        B.apply_merge(F.col("toks"), left, right).alias("m")
    ).collect()[0]["m"]
    assert got == py_merge(toks)


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),              # key
            st.sampled_from(["I", "U", "D"]),                   # op
            st.text(alphabet="xyz", min_size=1, max_size=3),    # value
        ),
        min_size=1,
        max_size=12,
    )
)
def test_cdc_collapse_apply_equals_sequential_replay(spark, ops):
    """operators.cdc: collapsing a changelog to max-seq-per-key and
    merging once must equal replaying the ops one at a time in seq order
    — the compacted-topic equivalence CDC consumers rely on."""
    from gtec_etl_spark.operators import cdc

    base_rows = [(1, "a"), (2, "b")]
    log_rows = [
        (k, op, i + 1, v if op != "D" else None)
        for i, (k, op, v) in enumerate(ops)
    ]

    state = dict(base_rows)
    for k, op, _seq, v in log_rows:
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v

    base = spark.createDataFrame(base_rows, "k long, v string")
    log = spark.createDataFrame(log_rows, "k long, op string, seq long, v string")
    latest = cdc.collapse_changelog(log, "k", ["v"])
    got = {
        r["k"]: r["v"]
        for r in cdc.apply_changes(base, latest, "k", ["v"]).collect()
    }
    assert got == state


@SLOW
@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
)
def test_z_value_prefix_bounds_both_coordinates(spark, x, y):
    """Morton-code property: the top 2k bits of z determine x's and y's
    top k bits — i.e. a z-prefix range is a 2-D tile, the invariant the
    Z-order layout's pruning claims rest on. Also: interleave is
    invertible (even/odd bit split returns (x, y))."""
    from pyspark.sql import functions as F

    from gtec_etl_spark.sinks.tabular import z_value

    df = spark.createDataFrame([(x, y)], "x long, y long")
    z = df.select(z_value(F.col("x"), F.col("y"), 8).alias("z")).collect()[0]["z"]
    xr = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    yr = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    assert (xr, yr) == (x, y)
    # Tile identity: the 4-bit bucket prefix is exactly (x_hi2, y_hi2)
    # interleaved, so one bucket spans one quarter of EACH axis.
    bucket = z >> 12
    assert bucket == (
        ((x >> 7) & 1) << 3 | ((y >> 7) & 1) << 2
        | ((x >> 6) & 1) << 1 | ((y >> 6) & 1)
    )


@given(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=50)
)
@settings(max_examples=60, deadline=None)
def test_cusum_prefix_identity_equals_recursion(counts):
    """ev_cusum_alerts computes the reset CUSUM
    S_i = max(0, S_(i-1) + d_i) via the window identity
    S_i = P_i - min(0, min_(j<=i) P_j) (P = inclusive prefix sum of d) —
    the identity is what makes the operator expressible without
    recursion in BOTH engines, so pin it against the textbook recursion
    for arbitrary deviation sequences (derived here exactly as the
    query derives them: d_i = 2*n_i - med2 - 1 over integer counts)."""
    med2 = int(2 * (sorted(counts)[len(counts) // 2] if len(counts) % 2
               else (sorted(counts)[len(counts) // 2 - 1]
                     + sorted(counts)[len(counts) // 2]) / 2))
    devs = [2 * n - med2 - 1 for n in counts]
    # textbook recursion
    s, rec = 0, []
    for d in devs:
        s = max(0, s + d)
        rec.append(s)
    # window identity
    pre, mn, idn = 0, 0, []
    for d in devs:
        pre += d
        mn = min(mn, pre)
        idn.append(pre - min(mn, 0))
    assert idn == rec


@SLOW
@given(
    st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=60
    )
)
def test_equidepth_scaled_rank_selection_equals_ntile(spark, cents):
    """prof_equidepth_scaled's closed-form boundary math (ntile bucket i
    covers ranks (i-1)*q + min(i-1, rem) + 1 .. i*q + min(i, rem), and
    value-at-rank is tie-break-independent) must reproduce the literal
    ntile spec for ARBITRARY duplicate-heavy value multisets, not just
    the orders fixture — duplicates spanning bucket boundaries are
    exactly the case the histogram argument has to survive."""
    from gtec_etl_spark.operators.scale import distributed_prefix_sum

    B = 4
    n = len(cents)
    q, rem = divmod(n, B)
    # Reference: literal ntile over (value, row index) tie-break.
    ordered = sorted(range(n), key=lambda i: (cents[i], i))
    want = {}
    for b in range(1, B + 1):
        s = (b - 1) * q + min(b - 1, rem) + 1
        e = b * q + min(b, rem)
        if s > e:
            continue
        vals = [cents[ordered[r - 1]] for r in range(s, e + 1)]
        want[b] = (e - s + 1, min(vals), max(vals))

    hist = (
        spark.createDataFrame([(v,) for v in cents], "v long")
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cum = distributed_prefix_sum(hist, "v", "c", out_col="cum")
    tot = hist.agg(F.sum("c").cast("long").alias("n"))
    spine = (
        spark.range(1, B + 1)
        .select(F.col("id").cast("long").alias("bucket"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.expr(
                f"(bucket - 1) * (n div {B}) + least(bucket - 1, n % {B}) + 1"
            ).alias("s_rank"),
            F.expr(f"bucket * (n div {B}) + least(bucket, n % {B})").alias(
                "e_rank"
            ),
        )
    )
    lo = cum.join(
        F.broadcast(spine),
        (F.col("cum") - F.col("c") < F.col("s_rank"))
        & (F.col("s_rank") <= F.col("cum")),
    ).select("bucket", "s_rank", "e_rank", F.col("v").alias("lo_v"))
    hi = cum.join(
        F.broadcast(spine.select("bucket", "e_rank")),
        (F.col("cum") - F.col("c") < F.col("e_rank"))
        & (F.col("e_rank") <= F.col("cum")),
    ).select("bucket", F.col("v").alias("hi_v"))
    got = {
        r["bucket"]: (
            int(r["e_rank"] - r["s_rank"] + 1),
            int(r["lo_v"]),
            int(r["hi_v"]),
        )
        for r in lo.join(hi, "bucket").collect()
    }
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.sampled_from(["view", "click", "signup", "error", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_markov_edge_explode_equals_three_branch_union(spark, events):
    """ev_attribution_markov's round-13 single-pass explode (START edge,
    consecutive pair, terminal null — one window chain) must emit the
    exact multiset of edges the naive three-branch union defines, for
    arbitrary journeys: purchase-first users, purchase-less users,
    single-event users, multi-purchase users (truncation at FIRST
    purchase)."""
    rows = [
        (u, f"2024-01-01 00:{i:02d}:00", i, t)
        for i, (u, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    # Reference: naive per-user Python replay.
    from collections import Counter, defaultdict

    seqs = defaultdict(list)
    for i, (u, t) in enumerate(events):
        seqs[u].append((i, t))  # ts order == event_id order here
    want: Counter = Counter()
    for u, evs in seqs.items():
        types = [t for _, t in evs]
        prk = next((k for k, t in enumerate(types) if t == "purchase"), None)
        kept = types if prk is None else types[: prk + 1]
        want[("START", kept[0])] += 1
        for a, b in zip(kept, kept[1:]):
            want[(a, b)] += 1
        if kept[-1] != "purchase":
            want[(kept[-1], "null")] += 1

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id")
    r = df.select(
        "user_id", "event_type", F.row_number().over(w).alias("rk")
    ).withColumn(
        "prk",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rk"))
        ).over(wp),
    )
    kept = r.filter(F.col("prk").isNull() | (F.col("rk") <= F.col("prk")))
    wk = Window.partitionBy("user_id").orderBy("rk")
    pairs = kept.select(
        "event_type", "rk", F.lead("event_type").over(wk).alias("nxt")
    )
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.when(
                        F.col("rk") == 1,
                        F.struct(
                            F.lit("START").alias("a"),
                            F.col("event_type").alias("b"),
                        ),
                    ),
                    F.struct(
                        F.col("event_type").alias("a"),
                        F.when(F.col("nxt").isNotNull(), F.col("nxt"))
                        .when(
                            F.col("event_type") != "purchase", F.lit("null")
                        )
                        .alias("b"),
                    ),
                )
            ).alias("e")
        )
        .filter(F.col("e").isNotNull() & F.col("e.b").isNotNull())
        .select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
    )
    got = Counter((r["a"], r["b"]) for r in edges.collect())
    assert got == want
