"""Ulp-boundary guards for the repo's single-transcendental parity paths
(ADVICE r7): `floor(ln(x) * 1e6 + 0.5)` (and the linear-counting
`floor(-m*ln(f) + 0.5)`) rely on DuckDB's and the JVM's libm agreeing on
ln to well under the quantization step. IEEE does not require correctly
rounded ln, so a 1-ulp divergence is possible — it only MATTERS if the
pre-floor value sits essentially ON a rounding boundary, where a 1-ulp
nudge flips the quantized integer and the ranked/hashed output becomes
flaky rather than wrong.

These tests enumerate every ln argument the gated queries evaluate on
the test corpora and assert the pre-floor value is not within EPS of an
integer boundary. A 1-ulp ln error perturbs ln(x)*1e6 by at most
~|ln(x)|*1e6 * 2^-52 ≈ 4e-9 for the magnitudes seen here, so EPS=1e-6
gives > 100x margin while being loose enough that a random corpus
essentially never trips it spuriously (P ~ 2e-6 per distinct value).
If a future corpus DOES trip this, the fix is to perturb the quantizer
(e.g. +0.5000001) in BOTH engines, not to loosen EPS.
"""

from __future__ import annotations

import math

import duckdb
import pytest

EPS = 1e-6

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def boundary_distance(pre_floor: float) -> float:
    """Distance of the pre-floor value from the nearest flip point."""
    frac = pre_floor - math.floor(pre_floor)
    return min(frac, 1.0 - frac)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_tfidf_idf_not_on_rounding_boundary(sf_dir):
    """Every distinct (n, df) pair of text_tfidf_topterms: the quantized
    idf_e6 = floor(ln(n/df)*1e6 + 0.5) must not sit on a flip point."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    pairs = con.execute(
        """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          FROM documents
        ),
        t AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
        df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY tok),
        nd AS (SELECT count(DISTINCT doc_id) AS n FROM t)
        SELECT DISTINCT n, df FROM df CROSS JOIN nd
        """
    ).fetchall()
    assert pairs
    worst = min(
        boundary_distance(math.log(n / df) * 1_000_000 + 0.5)
        for n, df in pairs
    )
    assert worst > EPS, (
        f"idf_e6 flip-point distance {worst:.3e} at {sf_dir} — quantized "
        f"idf is ulp-flaky on this corpus; perturb the quantizer in both "
        f"engines (see module docstring)"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_hll_fallback_not_on_rounding_boundary(sf_dir):
    """sketch_hll_distinct's only transcendental — the small-range
    linear-counting fallback m*ln(m/n_zero) — must not sit on a flip
    point when the corpus takes that branch (sf0.001 does; the raw
    harmonic-mean branch is integer-exact by construction and needs no
    guard)."""
    from gtec_etl_spark.functions.hashing import hash60_sql
    from gtec_etl_spark.plans.sketch_queries import (
        HLL_ALPHA,
        HLL_M,
        HLL_SCALE,
        HLL_W,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    h = hash60_sql("CAST(l_partkey AS VARCHAR)")
    mask = (1 << HLL_W) - 1
    s_present, n_present = con.execute(
        f"""
        WITH b AS (
          SELECT ({h}) >> {HLL_W} AS bucket,
                 CASE WHEN (({h}) & {mask}) = 0 THEN {HLL_W + 1}
                      ELSE {HLL_W} - length(bin(({h}) & {mask})) + 1
                 END AS rho
          FROM lineitem
        ),
        regs AS (SELECT bucket, max(rho) AS mj FROM b GROUP BY bucket)
        SELECT CAST(sum(CAST(1 AS BIGINT) << CAST(53 - mj AS INTEGER))
                    AS BIGINT),
               count(*)
        FROM regs
        """
    ).fetchone()
    s_int = s_present + (HLL_M - n_present) * (1 << 53)
    n_zero = HLL_M - n_present
    raw = HLL_ALPHA * HLL_SCALE / float(s_int)
    if raw <= 2.5 * HLL_M and n_zero > 0:
        dist = boundary_distance(HLL_M * math.log(HLL_M / n_zero) + 0.5)
        assert dist > EPS, (
            f"HLL fallback flip-point distance {dist:.3e} at {sf_dir} "
            f"(n_zero={n_zero})"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_linear_counting_estimate_not_on_rounding_boundary(sf_dir):
    """sketch_linear_distinct's single ln: est = floor(-m*ln((m-occ)/m)
    + 0.5) must not sit on a flip point for the corpus's occupancy."""
    from gtec_etl_spark.functions.hashing import hash60_sql
    from gtec_etl_spark.plans.sketch_queries import LC_M

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    occupied = con.execute(
        f"""
        SELECT count(DISTINCT ({hash60_sql('CAST(l_partkey AS VARCHAR)')})
                     % {LC_M})
        FROM lineitem
        """
    ).fetchone()[0]
    f = (LC_M - min(occupied, LC_M - 1)) / LC_M
    dist = boundary_distance(-LC_M * math.log(f) + 0.5)
    assert dist > EPS, (
        f"linear-counting flip-point distance {dist:.3e} at {sf_dir} "
        f"(occupied={occupied}, m={LC_M})"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_hll_grouped_fallback_not_on_rounding_boundary(sf_dir):
    """sketch_hll_grouped: every GROUP that takes the linear-counting
    fallback branch gets the same flip-point guard as the global sketch
    (one ln per group instead of one per corpus)."""
    from gtec_etl_spark.functions.hashing import hash60_sql
    from gtec_etl_spark.plans.sketch_queries import (
        HLL_ALPHA,
        HLL_M,
        HLL_SCALE,
        HLL_W,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    h = hash60_sql("CAST(l_partkey AS VARCHAR)")
    mask = (1 << HLL_W) - 1
    rows = con.execute(
        f"""
        WITH b AS (
          SELECT l_returnflag AS grp, ({h}) >> {HLL_W} AS bucket,
                 CASE WHEN (({h}) & {mask}) = 0 THEN {HLL_W + 1}
                      ELSE {HLL_W} - length(bin(({h}) & {mask})) + 1
                 END AS rho
          FROM lineitem
        ),
        regs AS (
          SELECT grp, bucket, max(rho) AS mj FROM b GROUP BY grp, bucket
        )
        SELECT grp,
               CAST(sum(CAST(1 AS BIGINT) << CAST(53 - mj AS INTEGER))
                    AS BIGINT),
               count(*)
        FROM regs GROUP BY grp
        """
    ).fetchall()
    for grp, s_present, n_present in rows:
        s_int = s_present + (HLL_M - n_present) * (1 << 53)
        n_zero = HLL_M - n_present
        raw = HLL_ALPHA * HLL_SCALE / float(s_int)
        if raw <= 2.5 * HLL_M and n_zero > 0:
            dist = boundary_distance(HLL_M * math.log(HLL_M / n_zero) + 0.5)
            assert dist > EPS, (
                f"grouped HLL fallback flip-point distance {dist:.3e} at "
                f"{sf_dir} (grp={grp!r}, n_zero={n_zero})"
            )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_kl_drift_lns_not_on_rounding_boundary(sf_dir):
    """text_kl_mixture_drift quantizes ln over four integer-argument
    families: n_a+1, n_b+1, T_a+V, T_b+V. Every distinct argument's
    pre-floor value must clear the flip point."""
    from gtec_etl_spark.plans.text_queries import TOKEN_RE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    args = con.execute(
        f"""
        WITH toks AS (
          SELECT doc_id % 2 AS part,
                 unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
          FROM documents),
        counts AS (SELECT token,
            CAST(sum(CASE WHEN part = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN part = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM toks GROUP BY token),
        scal AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
                        CAST(sum(n_b) AS BIGINT) AS tb,
                        CAST(count(*) AS BIGINT) AS v FROM counts)
        SELECT DISTINCT arg FROM (
          SELECT n_a + 1 AS arg FROM counts
          UNION SELECT n_b + 1 FROM counts
          UNION SELECT ta + v FROM scal
          UNION SELECT tb + v FROM scal)
        """
    ).fetchall()
    assert args
    worst = min(
        boundary_distance(math.log(a) * 1_000_000 + 0.5) for (a,) in args
    )
    assert worst > EPS, f"ln argument within {worst} of a flip point"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_column_entropy_lns_not_on_rounding_boundary(sf_dir):
    """prof_column_entropy quantizes ln over per-value counts and column
    totals; every distinct argument must clear the flip point."""
    from gtec_etl_spark.plans.profile_queries import ENTROPY_COLS

    con = duckdb.connect()
    args = set()
    for t, c in ENTROPY_COLS:
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
        rows = con.execute(
            f"SELECT CAST(count(*) AS BIGINT) FROM t GROUP BY {c}"
        ).fetchall()
        args.update(n for (n,) in rows)
        args.add(sum(n for (n,) in rows))
    assert args
    worst = min(boundary_distance(math.log(a) * 1_000_000 + 0.5) for a in args)
    assert worst > EPS, f"ln argument within {worst} of a flip point"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_stream_hll_fallback_not_on_rounding_boundary(sf_dir):
    """stream_hll_distinct shares sketch_hll_distinct's finalization but
    sketches events.user_id — its fallback ln argument set is guarded
    separately."""
    from gtec_etl_spark.functions.hashing import hash60_sql
    from gtec_etl_spark.plans.sketch_queries import (
        HLL_ALPHA,
        HLL_M,
        HLL_SCALE,
        HLL_W,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    h = hash60_sql("CAST(user_id AS VARCHAR)")
    mask = (1 << HLL_W) - 1
    s_present, n_present = con.execute(
        f"""
        WITH b AS (
          SELECT ({h}) >> {HLL_W} AS bucket,
                 CASE WHEN (({h}) & {mask}) = 0 THEN {HLL_W + 1}
                      ELSE {HLL_W} - length(bin(({h}) & {mask})) + 1
                 END AS rho
          FROM events
        ),
        regs AS (SELECT bucket, max(rho) AS mj FROM b GROUP BY bucket)
        SELECT CAST(sum(CAST(1 AS BIGINT) << CAST(53 - mj AS INTEGER))
                    AS BIGINT),
               count(*)
        FROM regs
        """
    ).fetchone()
    s_int = s_present + (HLL_M - n_present) * (1 << 53)
    n_zero = HLL_M - n_present
    raw = HLL_ALPHA * HLL_SCALE / float(s_int)
    if raw <= 2.5 * HLL_M and n_zero > 0:
        dist = boundary_distance(HLL_M * math.log(HLL_M / n_zero) + 0.5)
        assert dist > EPS, f"stream HLL fallback within {dist} of a flip point"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_unigram_lp_not_on_rounding_boundary(sf_dir):
    """text_unigram_em quantizes ln(cnt) and ln(total) (seed vocab) plus
    ln(em_count) and ln(em_total) (M-step) to micro-nats; every ln
    argument must sit clear of a flip point. Enumerates the seed-count
    domain and the totals; EM counts are sums of seed-path frequencies —
    covered by enumerating all BIGINTs up to the seed total would be
    loose, so this checks the exact argument sets both engines evaluate
    (vocab counts, both totals, and the realized em_counts from the
    oracle's own CTE chain)."""
    from gtec_etl_spark.plans import registry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oracle = registry.specs()["text_unigram_em"].oracle
    rows = con.execute(oracle).fetchall()
    assert rows
    args = set()
    seed_total = 0
    em_total = 0
    for piece, seed_count, _slp, em_count, _elp in rows:
        args.add(int(seed_count))
        seed_total += int(seed_count)
        if em_count:
            args.add(int(em_count))
            em_total += int(em_count)
    args.add(seed_total)
    args.add(em_total)
    worst = min(
        boundary_distance(math.log(a) * 1_000_000 + 0.5) for a in args if a > 0
    )
    assert worst > EPS, (
        f"unigram lp flip-point distance {worst:.3e} at {sf_dir}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_psi_drift_lns_not_on_rounding_boundary(sf_dir):
    """prof_drift_psi quantizes ln over four integer-argument families:
    n_a+1, n_b+1, T_a+V, T_b+V (the KL-drift decomposition). Every
    distinct argument's pre-floor value must clear the flip point."""
    from gtec_etl_spark.plans.profile_queries import (
        PSI_BUCKET_W,
        PSI_NBUCKETS,
        PSI_SPLIT_TS,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    args = con.execute(
        f"""
        WITH b AS (
          SELECT least(CAST(floor("value" / {PSI_BUCKET_W}) AS BIGINT),
                       {PSI_NBUCKETS - 1}) AS bucket,
                 CASE WHEN ts < TIMESTAMP '{PSI_SPLIT_TS}' THEN 0 ELSE 1
                 END AS w
          FROM events),
        counts AS (SELECT bucket,
            CAST(sum(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM b GROUP BY bucket),
        scal AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
                        CAST(sum(n_b) AS BIGINT) AS tb,
                        CAST(count(*) AS BIGINT) AS v FROM counts)
        SELECT DISTINCT arg FROM (
          SELECT n_a + 1 AS arg FROM counts
          UNION SELECT n_b + 1 FROM counts
          UNION SELECT ta + v FROM scal
          UNION SELECT tb + v FROM scal)
        """
    ).fetchall()
    assert args
    worst = min(
        boundary_distance(math.log(a) * 1_000_000 + 0.5) for (a,) in args
    )
    assert worst > EPS, f"psi ln argument within {worst} of a flip point"
