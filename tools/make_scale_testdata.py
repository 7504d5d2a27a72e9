"""Generate scaled-up test data for scale-stress benchmarking.

The driver ships sf0.001/0.01/0.1 only; the 100 TB design claims need a
scaling CURVE, not a single point. This tool replicates the sf0.1 tables
`factor`x (default 10 -> "sf1") entirely IN SPARK (explode over a replica
index — no driver-side loops), preserving the workload's shape:

- Foreign keys stay consistent: every table offsets its keys by
  replica * (max_key + 1), so replica i of orders joins replica i of
  customer/lineitem exactly like the original.
- documents: replica 0 is the original corpus; replicas 1..k salt every
  third word with the replica id, so replicas are NOT near-duplicates of
  each other and the near-dup rate per corpus stays at the sf0.1 rate
  (naive 10x copies would turn every doc into a 10-clique and distort the
  dedup benchmarks into a different workload).
- embeddings: replicas get a small deterministic per-dimension offset —
  new points, same cluster geometry.
- events: new disjoint event/user ids per replica (10x state keys for
  streaming ops); ts is re-written as TIMESTAMP(MICROS).
- region/nation: fixed dimensions, copied as-is.

Usage: python tools/make_scale_testdata.py [--out /tmp/sparkdata_sf1]
       [--src /root/testdata/sf0.1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

KEYS = {
    "orders": {"o_orderkey": "o_orderkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "customer": {"c_custkey": "c_custkey"},
    "part": {"p_partkey": "p_partkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
}
# orders.o_custkey offsets with the CUSTOMER key space.
KEYS["orders"]["o_custkey"] = "c_custkey"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sparkdata_sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from gtec_etl_spark.catalog import table as catalog_table
    from gtec_etl_spark.session import get_spark

    spark = get_spark("make-scale-testdata")
    k = args.factor
    replicas = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("__r")

    def read(name: str):
        # catalog.table handles the events ts-unit (footer-driven).
        return catalog_table(spark, args.src, name)

    # One key-space stride per ORIGINAL key domain, shared across tables.
    strides = {}
    for table, mapping in KEYS.items():
        df = read(table)
        for col, domain in mapping.items():
            if domain.startswith(table[0] + "_") and col == domain:
                strides[domain] = df.agg(F.max(col)).first()[0] + 1
    ev = read("events")
    strides["event_id"] = ev.agg(F.max("event_id")).first()[0] + 1
    strides["user_id"] = ev.agg(F.max("user_id")).first()[0] + 1
    docs = read("documents")
    strides["doc_id"] = docs.agg(F.max("doc_id")).first()[0] + 1
    emb = read("embeddings")
    strides["vec_id"] = emb.agg(F.max("vec_id")).first()[0] + 1

    os.makedirs(args.out, exist_ok=True)

    def write(df, name: str) -> None:
        # Mirror the driver's layout exactly: ONE parquet FILE named
        # <table>.parquet (the streaming source globs that filename; a
        # directory would silently feed it zero rows). Parquet row groups
        # keep single files splittable for parallel scans.
        import glob
        import shutil

        tmp = f"{args.out}/__tmp_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.replace(part, f"{args.out}/{name}.parquet")
        shutil.rmtree(tmp)
        print(f"{name}: {df.count()} rows")

    for name in ("region", "nation"):
        write(read(name), name)

    for table, mapping in KEYS.items():
        df = read(table).select("*", replicas)
        for col, domain in mapping.items():
            df = df.withColumn(
                col, F.col(col) + F.col("__r") * F.lit(strides[domain])
            )
        write(df.drop("__r"), table)

    # documents: salt every 3rd word with the replica id (replica 0 = the
    # original corpus) so cross-replica pairs are far below any Jaccard /
    # minhash / simhash near-dup threshold.
    d = docs.select("*", replicas)
    salted_words = F.transform(
        F.split("text", " "),
        lambda w, i: F.when(
            (F.col("__r") > 0) & ((i + F.col("__r")) % 3 == 0),
            F.concat(w, F.lit("x"), F.col("__r").cast("string")),
        ).otherwise(w),
    )
    d = d.select(
        (F.col("doc_id") + F.col("__r") * F.lit(strides["doc_id"])).alias("doc_id"),
        F.array_join(salted_words, " ").alias("text"),
        "lang",
        "source",
        "__r",
    ).withColumn("n_chars", F.length("text"))
    write(d.drop("__r"), "documents")

    # embeddings: deterministic small per-dimension offset for replicas>0.
    e = emb.select("*", replicas)
    perturbed = F.transform(
        "embedding",
        lambda x, i: (
            x + ((F.col("__r") * 37 + i) % 101 - 50).cast("float") / 1000.0
        ).cast("float"),
    )
    e = e.select(
        (F.col("vec_id") + F.col("__r") * F.lit(strides["vec_id"])).alias("vec_id"),
        F.when(F.col("__r") == 0, F.col("embedding"))
        .otherwise(perturbed)
        .alias("embedding"),
        "label",
        "__r",
    )
    write(e.drop("__r"), "embeddings")

    # events: disjoint ids and users per replica; ts is a real timestamp
    # and is written back as TIMESTAMP(MICROS) (session outputTimestampType).
    evs = ev.select("*", replicas).select(
        (F.col("event_id") + F.col("__r") * F.lit(strides["event_id"])).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("__r") * F.lit(strides["user_id"])).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )
    write(evs, "events")
    print(f"done -> {args.out}")


if __name__ == "__main__":
    main()
