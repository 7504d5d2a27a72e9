"""Scale curves for the multimodal operator family.

The registered mm_* queries pin tiny fixtures (golden-oracle exactness),
so their wall time says nothing about scaling. This tool times the
OPERATOR pipelines on generated media tables at n and 10n rows in ONE
session (same-session pairing, the bench_scale.py discipline) and merges
`mm_*` entries into BENCH_sf1.json with ratio = t(10n)/t(n): ~linear
(<= 10) means the Arrow codec boundary and the downstream plan scale
with media count.

The near-dup entry runs the PRODUCTION shape — histogram signatures
bucketed by a hyperplane LSH, pairwise cosine only within buckets —
not the registered query's 16-row broadcast-loop fixture: this is the
curve that answers "would image dedup survive 100x media".

Usage: python tools/bench_multimodal_scale.py [--n 800] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402


def neardup_blocked(media, n_planes: int = 8, tau_e6: int = 999_990):
    """Histogram -> hyperplane-LSH bucket -> within-bucket pairwise
    integer cosine: the blocked candidate generator the registered
    query's docstring routes scale traffic through."""
    from gtec_etl_spark.operators import multimodal as M
    from gtec_etl_spark.operators import similarity as S

    h = (
        M.byte_histogram_counts(media, bins=16)
        .withColumn("n2", S.dot_int(F.col("hist"), F.col("hist")))
        .withColumn(
            "bucket", S.hyperplane_bucket(F.col("hist"), n_planes, 16)
        )
    )
    a = h.select(
        "bucket",
        F.col("media_id").alias("a_id"),
        F.col("hist").alias("a_h"),
        F.col("n2").alias("a_n2"),
    )
    b = h.select(
        "bucket",
        F.col("media_id").alias("b_id"),
        F.col("hist").alias("b_h"),
        F.col("n2").alias("b_n2"),
    )
    cos_scaled = S.dot_int(F.col("a_h"), F.col("b_h")).cast("double") / F.sqrt(
        F.col("a_n2").cast("double") * F.col("b_n2").cast("double")
    ) * F.lit(1_000_000) + F.lit(0.5)
    return (
        a.join(b, "bucket")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(cos_scaled >= F.lit(tau_e6))
        .select("a_id", "b_id")
    )


def distinct_media(spark, n: int, dup_frac: float = 0.01):
    """Media table of mostly-DISTINCT images with `dup_frac` planted exact
    duplicates: each seed's bytes land on a seed-hashed 4-bin support with
    seed-hashed weights (~12M signature classes), so near-dup pairs are
    the planted ones, not an artifact of every image colliding (the
    registered fixture's 12-seed cycle makes the whole corpus true
    duplicates — a quadratic OUTPUT no plan can make linear)."""
    import numpy as np

    from gtec_etl_spark.operators import multimodal as M

    n_dup = max(1, int(n * dup_frac))
    rows = []
    for i in range(n):
        seed = i if i < n - n_dup else i - (n - n_dup)
        raw = M.fake_image(32, 24, seed=seed)
        pix = np.frombuffer(raw[15:], dtype=np.uint8).astype(np.int32)
        h = (seed * 2654435761) & 0xFFFFFFFF
        bins = np.array([(h >> s) % 16 for s in (0, 7, 14, 21)])
        w = np.array([1 + ((h >> s) % 9) for s in (3, 9, 17, 25)])
        thresholds = np.cumsum(w) / w.sum() * 256.0
        j = np.clip(np.searchsorted(thresholds, pix, side="right"), 0, 3)
        pix2 = (bins[j] * 16 + 7).astype(np.uint8)
        rows.append(
            (
                i,
                "image",
                bytearray(raw[:15] + pix2.tobytes()),
                ("image/x-fake", f"mem://img/{i}"),
            )
        )
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=800,
                    help="baseline media count (scaled run uses 10x)")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="BENCH_sf1.json")
    args = ap.parse_args()

    from gtec_etl_spark.operators import multimodal as M
    from gtec_etl_spark.session import get_spark

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    spark = get_spark("bench-mm-scale")

    def build(kind: str, n: int):
        if kind == "ppm":
            return M.media_table(spark, n=n, width=32, height=24)
        if kind == "png":
            return M.png_media_table(spark, n=n, width=32, height=24)
        if kind == "netpbm":
            return M.netpbm_media_table(spark, n=n, width=31, height=17)
        if kind == "vadwav":
            return M.vad_wav_media_table(spark, n=n, n_frames=960)
        if kind == "distinct":
            return distinct_media(spark, n)
        return M.wav_media_table(spark, n=n, n_frames=480, sample_rate=8000)

    def vad_segments(media):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        rms = M.audio_rms_windows(media, window_frames=M.VAD_BLOCK)
        act = rms.filter(F.col("rms_e3") > 6_000_000).withColumn(
            "island",
            F.col("window_idx")
            - F.row_number().over(
                Window.partitionBy("media_id").orderBy("window_idx")
            ),
        )
        return act.groupBy("media_id", "island").count()

    # (entry name, media kind, pipeline builder)
    ops = [
        ("mm_decode_image", "ppm", lambda m: M.decode_image(m)),
        ("mm_decode_png", "png", lambda m: M.decode_image(m)),
        ("mm_byte_histogram", "ppm", lambda m: M.byte_histogram_counts(m)),
        ("mm_audio_rms_windows", "wav", lambda m: M.audio_rms_windows(m)),
        ("mm_image_neardup_blocked", "distinct", neardup_blocked),
        ("mm_image_tiles", "netpbm", lambda m: M.tile_images(m, tile=8)),
        ("mm_audio_vad", "vadwav", vad_segments),
    ]

    # Warm the Python-worker daemon + codegen (untimed): first Arrow
    # stage in a session pays ~4s of worker spawn that would otherwise
    # land on whichever op runs first.
    M.byte_histogram_counts(build("ppm", 64)).count()

    def best_of(fn, media) -> tuple[float, int]:
        best, rows = float("inf"), 0
        for _ in range(args.runs):
            t0 = time.perf_counter()
            rows = fn(media).count()
            best = min(best, time.perf_counter() - t0)
        return best, rows

    results: dict[str, dict] = {}
    for name, kind, fn in ops:
        # Media tables are driver-generated; localCheckpoint pins them on
        # executors so generation cost stays out of the timed window.
        small = build(kind, args.n).localCheckpoint(eager=True)
        big = build(kind, args.n * 10).localCheckpoint(eager=True)
        b, _ = best_of(fn, small)
        s, rows = best_of(fn, big)
        results[name] = {
            "sec": round(s, 3),
            "rows": rows,
            "base_sec": round(b, 3),
            "ratio": round(s / b, 2) if b else None,
            "note": f"media count {args.n} -> {args.n * 10} (not sf-dir data)",
        }
        print(
            f"# {name}: {s:.3f}s ({rows} rows, {results[name]['ratio']}x "
            f"for 10x media)",
            file=sys.stderr,
        )

    out_path = os.path.join(repo, args.out)
    with open(out_path) as fh:
        payload = json.load(fh)
    payload["queries"].update(results)
    payload["value"] = round(
        sum(q["sec"] for q in payload["queries"].values()), 3
    )
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps(
        {"metric": "mm_scale_wall_sec",
         "value": round(sum(r["sec"] for r in results.values()), 3),
         "n_ops": len(results)},
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
