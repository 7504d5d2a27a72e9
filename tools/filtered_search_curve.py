"""Measure the pre-filter vs post-filter crossover for filtered vector
search (VERDICT r11 #7).

sim_filtered_search ships both strategies with a FIXED overfetch
(FILTER_OVERFETCH = 30): post-filter probes the best IVF cell, takes the
top-30 candidates, THEN applies the metadata predicate and cuts to 10.
When the predicate keeps fewer than ~10/30 of the cell, the overfetch
cannot contain 10 survivors and recall collapses — this tool measures
recall@10 of the post-filter arm against the exact filtered truth at a
ladder of predicate keep-rates (vec_id % m == 1 for several m), printing
the curve PERF.md records and the crossover rule the query docstring
states.

Usage: python tools/filtered_search_curve.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--moduli", default="2,3,5,10,30")
    args = ap.parse_args()

    from gtec_etl_spark import catalog
    from gtec_etl_spark.operators import similarity as S
    from gtec_etl_spark.plans.similarity_queries import FILTER_OVERFETCH
    from gtec_etl_spark.session import get_spark

    spark = get_spark("filtered-search-curve")
    emb = catalog.table(spark, args.sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    n_total = emb.count()

    # the post-filter arm's probed cell: nearest centroid to the query
    # (identical to sim_filtered_search's plan)
    dims = emb.select("label", F.posexplode("embedding").alias("d", "x"))
    cent = (
        dims.groupBy("label", "d")
        .agg(F.round(F.avg(F.col("x").cast("double")), 4).alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "cv"))).alias("pairs"))
        .select("label", F.expr("transform(pairs, p -> p.cv)").alias("centroid"))
    )
    best = (
        S.brute_force_topk(
            cent.select(F.col("label").alias("vec_id"), F.col("centroid").alias("embedding")),
            qv,
            1,
        )
        .select(F.col("vec_id").alias("label"))
    )
    cell = emb.join(F.broadcast(best), "label", "left_semi").filter(
        F.col("vec_id") != 0
    )
    over = (
        S.brute_force_topk(cell, qv, FILTER_OVERFETCH)
        .select("vec_id", "cosine")
        .localCheckpoint()  # one probe reused across every selectivity
    )
    cell_n = cell.count()

    results = []
    for m in [int(x) for x in args.moduli.split(",")]:
        pred = F.col("vec_id") % m == 1
        truth = set(
            r.vec_id
            for r in S.brute_force_topk(
                emb.filter(pred & (F.col("vec_id") != 0)), qv, args.k
            ).collect()
        )
        post = [
            r.vec_id
            for r in over.filter(pred)
            .orderBy(F.col("cosine").desc(), "vec_id")
            .limit(args.k)
            .collect()
        ]
        survivors = over.filter(pred).count()
        recall = len(set(post) & truth) / max(len(truth), 1)
        results.append(
            {
                "keep_rate": f"1/{m}",
                "n_pass_pred": n_total // m,
                "survivors_in_overfetch": survivors,
                "post_returned": len(post),
                "recall_at_k": round(recall, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    print()
    print(
        json.dumps(
            {
                "overfetch": FILTER_OVERFETCH,
                "k": args.k,
                "cell_rows": cell_n,
                "n_total": n_total,
                "rule": (
                    "post-filter needs E[survivors] = overfetch * keep_rate"
                    " >= k, i.e. keep_rate >= k/overfetch"
                    f" = {args.k}/{FILTER_OVERFETCH}; below that, pre-filter"
                    " (exact over predicate survivors) is both correct and"
                    " cheaper because the predicate already pruned the scan"
                ),
                "curve": results,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
