"""SemDeDup K-scaling experiment: show that the cluster count K is the
control knob that keeps within-cluster pairwise work linear at scale.

sim_semdedup pins K=8 because its oracle unrolls the Lloyd's head at that
constant — at 10x data that FIXED K makes pairwise work grow ~quadratically
(the expected O(N^2/K) curve, the worst ratio in BENCH_sf1.json). The
production regime (Abbas et al. 2023) scales K with N so expected cluster
size stays constant; this tool runs the same pipeline at sf1 with K=8 vs
K=64 and records wall time + pair counts, demonstrating the knob works.

Writes SEMDEDUP_K.json. Usage:
  python tools/bench_semdedup_k.py [--sf-dir /tmp/sparkdata_sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkdata_sf1")
    ap.add_argument("--ks", default="8,64")
    ap.add_argument("--out", default="SEMDEDUP_K.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gtec_etl_spark import catalog
    from gtec_etl_spark.operators import similarity as S
    from gtec_etl_spark.plans.similarity_queries import (
        SEMDEDUP_TAU,
        _fullvec_centroids,
    )
    from gtec_etl_spark.session import get_spark

    spark = get_spark("bench-semdedup-k")
    emb = catalog.table(spark, args.sf_dir, "embeddings").withColumn(
        "qe", S.quantize_micros(F.col("embedding"))
    )
    n_vecs = emb.count()  # warm footers/codegen, untimed below

    results = {}
    for k in [int(x) for x in args.ks.split(",")]:
        t0 = time.perf_counter()
        cb = _fullvec_centroids(emb, k=k, sample=max(1024, 16 * k))
        assigned = (
            emb.select("vec_id", "qe")
            .crossJoin(F.broadcast(cb))
            .withColumn("__d", S.sqdist_int(F.col("qe"), F.col("c")))
            .groupBy("vec_id")
            .agg(
                F.min_by(
                    F.struct(F.col("r"), F.col("qe")),
                    F.struct(F.col("__d"), F.col("r")),
                ).alias("__a")
            )
            .select(
                "vec_id",
                F.col("__a.r").alias("cluster"),
                F.col("__a.qe").alias("qe"),
            )
            .withColumn("na2", S.dot_int(F.col("qe"), F.col("qe")))
        )
        a = assigned.select(
            "cluster", F.col("vec_id").alias("a_id"),
            F.col("qe").alias("a_qe"), F.col("na2").alias("a_na2"),
        )
        b = assigned.select(
            "cluster", F.col("vec_id").alias("b_id"),
            F.col("qe").alias("b_qe"), F.col("na2").alias("b_na2"),
        )
        cos = S.dot_int(F.col("a_qe"), F.col("b_qe")).cast("double") / F.sqrt(
            F.col("a_na2").cast("double") * F.col("b_na2").cast("double")
        )
        n_edges = (
            a.join(b, "cluster")
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(cos >= F.lit(SEMDEDUP_TAU))
            .count()
        )
        wall = time.perf_counter() - t0
        sizes = (
            assigned.groupBy("cluster").count().agg(
                F.max("count").alias("mx"), F.avg("count").alias("avg")
            ).collect()[0]
        )
        results[f"k={k}"] = {
            "wall_sec": round(wall, 2),
            "dup_edges": n_edges,
            "max_cluster": sizes["mx"],
            "avg_cluster": round(sizes["avg"], 1),
        }
        print(f"# k={k}: {wall:.1f}s, edges={n_edges}, "
              f"max_cluster={sizes['mx']}", file=sys.stderr)

    payload = {
        "n_vectors": n_vecs,
        "sf_dir": args.sf_dir,
        "note": (
            "same semdedup pipeline (train + assign + within-cluster "
            "pairwise >= tau), K varied; pairwise cost ~ sum(cluster^2) "
            "so scaling K with N is the linearity knob the registered "
            "query's docstring claims — the oracle pins K=8 only for "
            "unrolled-CTE tractability"
        ),
        "results": results,
    }
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", args.out
    )
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"file": args.out, **{k: v["wall_sec"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
