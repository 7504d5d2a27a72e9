"""Unit tests for operator primitives not yet covered by the oracle-parity
suite: conflict-checked merge (J2/J3), as-of join, derived-key join with
dangling-FK detection, count assertion, and the bucketized range join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gtec_etl_spark.operators import aggregates as A
from gtec_etl_spark.operators import joins as J


def test_conflict_checked_merge(spark):
    base = spark.createDataFrame(
        [("s1", "male", None), ("s2", "female", "30-39"), ("s3", None, "20-29")],
        "id string, sex string, age string",
    )
    extra = spark.createDataFrame(
        [("s1", "male", "40-49", "A"), ("s2", "male", "30-39", "B"), ("s4", "female", None, "C")],
        "id string, sex string, age string, consent string",
    )
    merged, conflicts = J.conflict_checked_merge(base, extra, "id")

    conf = [(r["id"], r["column"], r["base_value"], r["extra_value"]) for r in conflicts.collect()]
    assert conf == [("s2", "sex", "female", "male")]  # the reference's fatal case

    rows = {r["id"]: r for r in merged.collect()}
    assert rows["s1"]["age"] == "40-49"          # null filled from extra
    assert rows["s1"]["consent"] == "A"          # new column carried over
    assert rows["s2"]["sex"] == "female"         # base wins on conflict
    assert rows["s3"]["consent"] is None         # no extra row -> null
    assert "s4" not in rows                      # left merge keeps base keys


def test_asof_join_operator(spark):
    facts = spark.createDataFrame(
        [(1, "2024-01-10"), (2, "2024-01-05")], "k long, t string"
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    events = spark.createDataFrame(
        [
            (1, "2024-01-01", "a"),
            (1, "2024-01-09", "b"),
            (1, "2024-01-11", "late"),
            (2, "2024-01-07", "future"),
        ],
        "k long, et string, payload string",
    ).select("k", F.col("et").cast("timestamp").alias("et"), "payload")

    out = J.asof_join(facts, events, "k", "k", "t", "et", ["payload"])
    rows = {r["k"]: r for r in out.collect()}
    assert rows[1]["payload"] == "b"      # latest at-or-before
    assert rows[2]["payload"] is None     # only future events -> null

    # Stable row-tag variant (nondeterministic-upstream hardening): keying
    # the per-row group on an existing PK column gives identical results.
    tagged = J.asof_join(
        facts, events, "k", "k", "t", "et", ["payload"], row_tag="k"
    )
    assert {
        (r["k"], r["payload"]) for r in tagged.collect()
    } == {(r["k"], r["payload"]) for r in out.collect()}


def test_asof_join_row_tag_deterministic_under_shuffle(spark):
    """Property: with a stable row_tag, the asof result is a fixed multiset
    regardless of how the fact side is partitioned or ordered — including
    duplicate fact rows, which must each survive exactly once (the failure
    mode the monotonically_increasing_id caveat in the docstring warns
    about: a recomputed nondeterministic upstream can split/merge dup
    rows when the tag is physical)."""
    from collections import Counter

    facts = spark.createDataFrame(
        [(i, f"pk{i}", 100 + (i % 7) * 10) for i in range(40)]
        # two exact-duplicate PAYLOAD rows per key 0..4, distinct pk tags
        + [(i % 5, f"dup{i}", 120) for i in range(10)],
        "k long, pk string, t long",
    )
    events = spark.createDataFrame(
        [(k, et, f"v{k}_{et}") for k in range(7) for et in (95, 105, 115, 125)],
        "k long, et long, payload string",
    )

    def run(fact_df):
        out = J.asof_join(
            fact_df, events, "k", "k", "t", "et", ["payload"], row_tag="pk"
        )
        return Counter((r["pk"], r["payload"]) for r in out.collect())

    base = run(facts)
    assert sum(base.values()) == 50          # every fact row survives once
    assert max(base.values()) == 1           # pk is unique -> no merges
    for layout in (
        facts.repartition(13),
        facts.repartition(3, "t"),
        facts.orderBy(F.desc("t")).coalesce(1),
    ):
        assert run(layout) == base


def test_ivf_multiprobe_recall_not_below_single_probe(spark, sf_dir):
    """Multi-probe scans a superset of single-probe's candidates, so its
    overlap with the exact brute-force top-10 must be >= single-probe's —
    the monotone-recall property that justifies the nprobe knob."""
    from pyspark.sql import functions as F

    from gtec_etl_spark import catalog
    from gtec_etl_spark.operators import similarity as S
    from gtec_etl_spark.plans.similarity_queries import (
        sim_ivf_multiprobe,
        sim_ivf_probe,
        sim_topk_bruteforce,
    )

    exact = {r.vec_id for r in sim_topk_bruteforce(spark, sf_dir).collect()}
    single = {r.vec_id for r in sim_ivf_probe(spark, sf_dir).collect()}
    multi = {r.vec_id for r in sim_ivf_multiprobe(spark, sf_dir).collect()}
    assert len(multi & exact) >= len(single & exact)


def test_pq_kmeans_training_improves_distortion_and_recall(spark, sf_dir):
    """The trained-PQ BEHAVIORAL contract (complementing the exact
    unrolled-Lloyd's SQL oracle on sim_pq_trained_codebook): (1) Lloyd's
    iterations must not worsen total quantization distortion vs the
    seeded codebook on the training sample; (2) trained-ADC top-10 must
    overlap exact integer-L2 top-10 at a floor; (3) training is
    bit-reproducible (two runs, identical codebook)."""
    from pyspark.sql import functions as F

    from gtec_etl_spark import catalog
    from gtec_etl_spark.operators import similarity as S
    from gtec_etl_spark.plans.similarity_queries import (
        PQ_TRAIN_ITERS,
        PQ_TRAIN_SAMPLE,
        _pq_seed_codebook,
        _pq_slice,
        pq_adc_search,
        sim_pq_trained_codebook,
    )
    from gtec_etl_spark.functions.hashing import hash60

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
    subs = _pq_slice(sample, "qe")

    def distortion(cb):
        return (
            subs.join(F.broadcast(cb), "j")
            .withColumn("d", S.sqdist_int(F.col("sub"), F.col("c")))
            .groupBy("vec_id", "j")
            .agg(F.min("d").alias("md"))
            .agg(F.sum("md").alias("total"))
            .first()["total"]
        )

    trained = S.pq_kmeans_codebook(subs, init, iters=PQ_TRAIN_ITERS)
    d_seed, d_trained = distortion(init), distortion(trained)
    assert d_trained <= d_seed, (d_trained, d_seed)

    # Reproducibility: integer-space training has one possible answer.
    trained2 = S.pq_kmeans_codebook(subs, init, iters=PQ_TRAIN_ITERS)
    as_set = lambda cb: {(r.j, r.r, tuple(r.c)) for r in cb.collect()}
    assert as_set(trained) == as_set(trained2)

    # Recall floor vs exact integer-L2: PQ at 4x16 codewords is a
    # SHORTLIST generator (rerank exactly afterwards), so the contract is
    # candidate recall — the ADC top-10% shortlist must hold >=3 of the
    # exact top-10 (measured 5/10 here; random chance is ~1/10, so 3
    # still catches a broken encode/LUT). sim_pq_trained_codebook itself
    # returns the top-10 head of exactly this shortlist ranking.
    qrow = emb.filter(F.col("vec_id") == 0)
    shortlist_k = max(10, base.count() // 10)
    shortlist = {
        r.vec_id for r in pq_adc_search(base, qrow, trained, k=shortlist_k).collect()
    }
    qe = qrow.select(F.col("qe").alias("qv"))
    exact = {
        r.vec_id
        for r in base.crossJoin(F.broadcast(qe))
        .select("vec_id", S.sqdist_int(F.col("qe"), F.col("qv")).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    assert len(shortlist & exact) >= 3, (shortlist, exact)
    # And the registered query is the head of that same ranking.
    head = {r.vec_id for r in sim_pq_trained_codebook(spark, sf_dir).collect()}
    assert head <= shortlist and len(head) == 10


def test_derived_key_join_and_dangling(spark):
    samples = spark.createDataFrame(
        [("GTEX-AB1-0001",), ("GTEX-AB1-0002",), ("GTEX-ZZ9-0001",)], "SAMPID string"
    )
    subjects = spark.createDataFrame([("GTEX-AB1", 60)], "SUBJID string, age long")
    joined = J.derived_key_join(
        samples, subjects, r"^(GTEX-[^-]+)", "SAMPID", "SUBJID"
    )
    assert joined.count() == 2
    dangling = J.dangling_keys(
        samples.withColumn("SUBJID", F.regexp_extract("SAMPID", r"^(GTEX-[^-]+)", 1)),
        subjects,
        "SUBJID",
    )
    assert [r["SAMPID"] for r in dangling.collect()] == ["GTEX-ZZ9-0001"]


def test_count_assertion(spark):
    actual = spark.createDataFrame([("GRU", 60), ("HMB", 39)], "code string, n long")
    expected = spark.createDataFrame([("GRU", 60), ("HMB", 40)], "code string, expected long")
    bad = A.count_assertion(actual, expected, "code", "n", "expected")
    assert [(r["code"], r["n"], r["expected"]) for r in bad.collect()] == [("HMB", 39, 40)]


def test_bucket_range_join_boundaries(spark):
    facts = spark.createDataFrame([(0,), (4,), (5,), (29,), (59,), (60,)], "v long")
    ranges = spark.createDataFrame(
        [(0, 5, "XS"), (5, 30, "S"), (30, 60, "L")], "lo long, hi long, label string"
    )
    out = J.bucket_range_join(facts, F.col("v"), ranges, "lo", "hi", 7)
    got = sorted((r["v"], r["label"]) for r in out.collect())
    # half-open [lo, hi): 5 goes to S, 60 matches nothing
    assert got == [(0, "XS"), (4, "XS"), (5, "S"), (29, "S"), (59, "L")]


def test_interval_overlap_join_equals_theta_join(spark):
    a = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 6), (3, 100, 101), (4, 20, 40)], "a_id long, a_lo long, a_hi long"
    )
    b = spark.createDataFrame(
        [(11, 9, 12), (12, 5, 6), (13, 39, 45), (14, 200, 210)], "b_id long, b_lo long, b_hi long"
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in J.interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 7).collect()
    )
    theta = sorted(
        (r["a_id"], r["b_id"])
        for r in a.join(
            b, (F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi"))
        ).collect()
    )
    assert got == theta == [(1, 11), (1, 12), (2, 12), (4, 13)]


def test_interval_overlap_join_excludes_empty_intervals(spark):
    # Half-open [x, x) covers nothing: an empty interval lying INSIDE a
    # covering interval must not match (the raw strict predicate
    # a_lo < b_hi AND b_lo < a_hi would wrongly treat it as a point), and
    # the burst must not emit descending-sequence bucket rows for it.
    a = spark.createDataFrame([(1, 5, 5), (2, 3, 4)], "a_id long, a_lo long, a_hi long")
    b = spark.createDataFrame([(11, 0, 10), (12, 7, 7)], "b_id long, b_lo long, b_hi long")
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in J.interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 7).collect()
    )
    assert got == [(2, 11)]  # only the real interval pair survives


def test_frequency_cap_preserves_low_freq_pairs(spark):
    from gtec_etl_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d f"),    # high overlap with 1
            (3, "x y z w v"),
        ],
        "doc_id long, text string",
    )
    sh = D.word_shingles(docs, 3)
    uncapped = sorted(
        (r["doc_a"], r["doc_b"]) for r in D.jaccard_pairs(sh, min_jaccard=0.3).collect()
    )
    # A generous cap changes nothing; every shingle here has df <= 2.
    capped = sorted(
        (r["doc_a"], r["doc_b"])
        for r in D.jaccard_pairs(sh, min_jaccard=0.3, max_doc_freq=10).collect()
    )
    assert uncapped == capped == [(1, 2)]
    # A cap of 1 removes all shared shingles -> no candidates at all.
    none = D.jaccard_pairs(sh, min_jaccard=0.0, max_doc_freq=1).collect()
    assert none == []


def test_found_counters(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "x long")
    out = A.found_counters(df, F.col("x") <= 3).collect()[0]
    assert (out["n_found"], out["n_not_found"]) == (3, 1)


def test_connected_components_chain_and_isolate(spark):
    from gtec_etl_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    # Chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 5-6,
    # isolated 7.
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (6, 5)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_asof_nearest_join_directions(spark):
    from datetime import datetime

    from gtec_etl_spark.operators.joins import asof_nearest_join

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 10, t(30))], "lid long, k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(100, 10, t(20)), (200, 10, t(35)), (300, 10, t(50)), (400, 99, t(30))],
        "rid long, k long, rt timestamp",
    )
    def run(direction, tol=60_000_000, how="inner"):
        rows = asof_nearest_join(
            left, right, key="k", left_time="lt", right_time="rt",
            value_cols=["rid"], tolerance_us=tol, direction=direction, how=how,
        ).collect()
        return [(r["rid"], r["asof_dist_us"]) for r in rows]

    assert run("nearest") == [(200, 5_000_000)]      # +5s beats -10s
    assert run("backward") == [(100, 10_000_000)]    # only at-or-before
    assert run("forward") == [(200, 5_000_000)]
    assert run("nearest", tol=1_000_000) == []       # inner: excluded
    # merge_asof default: unmatched left rows survive with NULLs.
    assert run("nearest", tol=1_000_000, how="left") == [(None, None)]


def test_asof_nearest_join_keeps_duplicate_left_rows(spark):
    from datetime import datetime

    from gtec_etl_spark.operators.joins import asof_nearest_join

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    # Two IDENTICAL left rows (no unique id): merge_asof returns both.
    left = spark.createDataFrame(
        [(10, t(30)), (10, t(30))], "k long, lt timestamp"
    )
    right = spark.createDataFrame([(100, 10, t(20))], "rid long, k long, rt timestamp")
    rows = asof_nearest_join(
        left, right, key="k", left_time="lt", right_time="rt",
        value_cols=["rid"], tolerance_us=60_000_000,
    ).collect()
    assert [r["rid"] for r in rows] == [100, 100]


def test_lsh_incremental_pairs_partition_of_full_pairs(spark):
    """Batch-vs-index candidates + batch-internal + index-internal
    candidates must exactly partition the full corpus pair set — nothing
    lost, nothing double-counted, no batch-internal leakage."""
    from pyspark.sql import functions as F

    from gtec_etl_spark.operators import dedup as D

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),      # dup of 1
        (7, "alpha beta gamma delta epsilon eta"),       # near-dup, "batch"
        (17, "alpha beta gamma delta epsilon eta"),      # dup of 7, "batch"
        (4, "totally different words here entirely now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = D.minhash_signatures(D.word_shingles(docs, 3), 16)
    batch = sigs.filter(F.col("doc_id") % 10 == 7)
    index = sigs.filter(F.col("doc_id") % 10 != 7)

    full = {
        (r.doc_a, r.doc_b) for r in D.lsh_candidate_pairs(sigs, 16, 4).collect()
    }
    cross = {
        tuple(sorted((r.new_doc, r.index_doc)))
        for r in D.lsh_pairs_against_index(batch, index, 16, 4).collect()
    }
    batch_only = {
        (r.doc_a, r.doc_b)
        for r in D.lsh_candidate_pairs(batch, 16, 4).collect()
    }
    index_only = {
        (r.doc_a, r.doc_b)
        for r in D.lsh_candidate_pairs(index, 16, 4).collect()
    }
    assert cross | batch_only | index_only == full
    assert cross.isdisjoint(batch_only) and cross.isdisjoint(index_only)
    assert (7, 17) in batch_only and (7, 17) not in cross


def test_duplicated_spans_detects_and_merges(spark):
    """duplicated_spans (Lee-et-al k-gram substring dedup): a phrase shared
    verbatim across docs is reported as ONE merged maximal span per doc;
    unshared text produces nothing; spans are disjoint and >= k tokens."""
    from gtec_etl_spark.operators.dedup import duplicated_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} unrelated tail words here now"),
            (3, "completely different text with no overlap at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, 4).collect()
    }
    # doc 1: shared phrase starts after 2 tokens -> [2, 12); doc 2: [0, 10)
    assert spans[1] == (2, 12)
    assert spans[2] == (0, 10)
    assert 3 not in spans


def test_duplicated_spans_disjoint_and_min_length(spark, sf_dir):
    from gtec_etl_spark.operators.dedup import duplicated_spans
    from gtec_etl_spark import catalog

    docs = catalog.table(spark, sf_dir, "documents")
    rows = duplicated_spans(docs, 8).collect()
    assert rows, "test corpus has cross-doc 8-gram dups"
    by_doc: dict = {}
    for r in rows:
        assert r["span_end"] - r["span_start"] >= 8
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for doc, ss in by_doc.items():
        ss.sort()
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert s2 > e1, f"doc {doc}: spans overlap/adjacent -> not maximal"


def test_ivf_trained_rerank_recall_floor(spark, sf_dir):
    """Trained-IVF (nprobe=2 of 8 cells) with exact re-rank: its top-10
    must be exactly the integer-L2 top-10 RESTRICTED to the probed cells,
    and overlap the unrestricted exact top-10 at a floor (candidates from
    2/8ths of the corpus; random chance would be ~2.5/10)."""
    from gtec_etl_spark import catalog
    from gtec_etl_spark.operators import similarity as S
    from gtec_etl_spark.plans.similarity_queries import sim_ivf_trained_rerank

    emb = catalog.table(spark, sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("qe").alias("qqe"))
    exact = [
        r.vec_id
        for r in emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", S.sqdist_int(F.col("qe"), F.col("qqe")).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    got = [r.vec_id for r in sim_ivf_trained_rerank(spark, sf_dir).collect()]
    assert len(got) == 10
    assert len(set(got) & set(exact)) >= 4


def test_bpe_train_classic_corpus(spark):
    """BPE on the textbook corpus: 'low' x2 + 'lowest' — the first merges
    must follow the weighted pair counts with lexicographic tie-breaks,
    and the final vocab tokenizes 'low' as one symbol."""
    from gtec_etl_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(1, "low low lowest")], "doc_id long, text string"
    )
    merges, vocab = B.bpe_train(docs, 3)
    try:
        rows = {r["word"]: r["toks"] for r in vocab.collect()}
    finally:
        vocab.unpersist()
    # Pair counts round 1: (l,o)=3, (o,w)=3, (w,e)=1, (e,s)=1, (s,t)=1
    # -> tie on 3 breaks lexicographically: (l,o). Round 2: (lo,w)=3 wins.
    # Round 3: 'low' is fused; remaining pairs in 'lowest' count 1 each,
    # tie breaks to (e,s).
    assert [(m[1], m[2], m[3]) for m in merges] == [
        ("l", "o", 3),
        ("lo", "w", 3),
        ("e", "s", 1),
    ]
    assert rows["low"] == ["low"]
    assert rows["lowest"] == ["low", "es", "t"]


def test_pagerank_path_graph_symmetry_and_mass(spark):
    """Integer PageRank on the undirected path a—b—c: symmetry forces
    rank(a) == rank(c) < rank(b), and the total mass stays within
    rounding slack of the fixed-point scale (floors only ever lose
    sub-integer mass, bounded by iters * (|V| + |E|))."""
    from gtec_etl_spark.operators.graph import PR_SCALE, pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")],
        "src string, dst string",
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=4).collect()}
    assert ranks["a"] == ranks["c"] < ranks["b"]
    total = sum(ranks.values())
    assert abs(total - PR_SCALE) < 1000


def test_bpe_train_empty_and_degenerate_corpus(spark):
    """BPE edge cases: an empty corpus trains zero merges; a corpus of
    single-character words (no adjacent pairs) also trains zero merges
    but still returns a usable vocab."""
    from gtec_etl_spark.operators import bpe as B

    empty = spark.createDataFrame([], "doc_id long, text string")
    merges, vocab = B.bpe_train(empty, 3)
    try:
        assert merges == [] and vocab.count() == 0
    finally:
        vocab.unpersist()

    chars = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    merges, vocab = B.bpe_train(chars, 3)
    try:
        rows = {r["word"]: (r["freq"], r["toks"]) for r in vocab.collect()}
    finally:
        vocab.unpersist()
    assert merges == []
    assert rows == {"a": (2, ["a"]), "b": (1, ["b"])}


def test_personalized_pagerank_seed_locality_and_mass(spark):
    """PPR on two disconnected path components a—b—c and x—y with seed
    {a}: every node in the seed's component holds positive rank after
    enough iterations, the off-component nodes hold exactly ZERO (no
    uniform teleport — the defining PPR property), and total mass stays
    within rounding slack of the fixed-point scale."""
    from gtec_etl_spark.operators.graph import PR_SCALE, personalized_pagerank

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
            ("x", "y"), ("y", "x"),
        ],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    ranks = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, iters=4).collect()
    }
    assert ranks["x"] == ranks["y"] == 0
    assert ranks["a"] > 0 and ranks["b"] > 0 and ranks["c"] > 0
    # seed keeps the largest share (teleport returns there every round)
    assert ranks["a"] == max(ranks.values())
    total = sum(ranks.values())
    assert 0 <= PR_SCALE - total < 1000


def test_tile_images_floor_grid_and_checksums(spark):
    """tile_images on a 31x17 P5 image: floor grid drops 7 cols and 1 row
    (reported per tile), tile sums partition the cropped plain sum, and
    the local positional checksum detects a transposed raster (recompute
    both orientations from the same LCG stream and assert they differ)."""
    import numpy as np

    from gtec_etl_spark.operators import multimodal as M

    media = M.netpbm_media_table(spark, n=2, width=31, height=17)
    rows = M.tile_images(media, tile=8).collect()
    by_img = {}
    for r in rows:
        by_img.setdefault(r["media_id"], []).append(r)
    assert set(by_img) == {0, 1}
    for mid, tiles in by_img.items():
        assert len(tiles) == 6  # (17//8) * (31//8) = 2 * 3
        assert all(t["dropped_rows"] == 1 for t in tiles)
        assert all(t["dropped_cols"] == 7 for t in tiles)
        # Recompute from the LCG stream (decoder-independent).
        fmt, maxval = M.NETPBM_CYCLE[mid % 4]
        nch = 3 if fmt in ("P6", "P3") else 1
        vals = np.array(
            M.netpbm_values(31, 17, seed=mid, nch=nch, maxval=maxval),
            dtype=np.int64,
        )
        if maxval != 255:
            vals = (vals * 255 + maxval // 2) // maxval
        if nch == 3:
            rgb = vals.reshape(-1, 3)
            vals = (
                299 * rgb[:, 0] + 587 * rgb[:, 1] + 114 * rgb[:, 2]
            ) // 1000
        a = vals.reshape(17, 31)
        w97 = np.arange(64, dtype=np.int64).reshape(8, 8) % 97 + 1
        for t in tiles:
            patch = a[
                t["tile_row"] * 8 : t["tile_row"] * 8 + 8,
                t["tile_col"] * 8 : t["tile_col"] * 8 + 8,
            ]
            assert t["tile_sum"] == int(patch.sum())
            assert t["pos_checksum"] == int((patch * w97).sum())
            if int((patch * w97).sum()) != int((patch.T * w97).sum()):
                # order-sensitivity is demonstrable on this tile
                assert t["pos_checksum"] != int((patch.T * w97).sum())
