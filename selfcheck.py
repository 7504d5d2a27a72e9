"""Self-run of the driver's correctness protocol under a VANILLA
SparkSession (no session.py configs — the environment the round driver
actually uses): every registered query on Spark vs its DuckDB oracle at
$SPARK_GRAFT_TEST_SF_DIR (default sf0.01), comparing row count, column
names, and order-insensitive canonicalized values.

Exists because round 1's CORRECTNESS file was truncated by a harness
error storm; this records the same per-query check locally so a driver
gap is distinguishable from a real regression. Output:
CORRECTNESS_self.json (one entry per query, driver-format keys).

Usage: python selfcheck.py [--sf-dir DIR] [-k SUBSTRING] [--only-unverified]
       [--rotation-prefix N] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gtec_etl_spark.parity import normalize  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument("-k", default="", help="only queries containing this substring")
    ap.add_argument(
        "--only-unverified",
        action="store_true",
        help="restrict to queries never seen in any driver CORRECTNESS_r*.json",
    )
    ap.add_argument(
        "--rotation-prefix",
        type=int,
        default=0,
        metavar="N",
        help=(
            "restrict to the first N queries of registry.ordered_specs() — "
            "the never-green-then-stalest prefix the next driver round will "
            "sample (VERDICT r13 #1: re-certify the stalest tail at a "
            "bigger --sf-dir before the driver does at sf0.01)"
        ),
    )
    ap.add_argument("--out", default="CORRECTNESS_self.json", help="output path")
    ap.add_argument(
        "--driver-memory",
        default="",
        help=(
            "JVM heap for the (otherwise vanilla) session, e.g. 8g. The "
            "default driver heap OOMs on the exact-triangle spec anchor at "
            "sf0.1+ (r14 sweep); the driver gate itself only runs sf0.01, "
            "so sizing the heap for a bigger --sf-dir doesn't change what "
            "the gate proves"
        ),
    )
    args = ap.parse_args()

    # A filtered run must not clobber the round-end full-registry
    # artifact (round 8's exact slip: a stale 1-query CORRECTNESS_self
    # got committed). Partial results go to a sibling file unless the
    # caller overrode --out explicitly.
    if (
        args.k or args.only_unverified or args.rotation_prefix
    ) and args.out == "CORRECTNESS_self.json":
        args.out = "CORRECTNESS_self_partial.json"

    import duckdb
    from pyspark.sql import SparkSession

    from gtec_etl_spark.plans import registry

    # Deliberately bare: the same session shape the driver builds. The
    # engine must be correct here without session.py's conveniences
    # (events reads use an explicit user schema, so no legacy conf is
    # needed; streaming queries pin their own state partitioning).
    def build_session():
        b = SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        ).appName("selfcheck")
        if args.driver_memory:
            b = b.config("spark.driver.memory", args.driver_memory)
        return b.getOrCreate()

    spark = build_session()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    results: dict[str, dict] = {}
    if args.rotation_prefix:
        names = list(registry.ordered_specs())[: args.rotation_prefix]
        names = [n for n in names if args.k in n]
    else:
        names = [n for n in sorted(registry.specs()) if args.k in n]
    if args.only_unverified:
        verified = registry._driver_verified_rounds()
        names = [n for n in names if n not in verified]
    n_pass = n_fail = 0
    for name in names:
        spec = registry.specs()[name]
        entry = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = spec.fn(spark, args.sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            entry["spark_rows"] = len(srows)
            if spec.oracle is None:
                entry["err"] = "no_oracle"
            else:
                res = con.sql(spec.oracle)
                dcols = list(res.columns)
                drows = res.fetchall()
                entry["oracle_rows"] = len(drows)
                entry["rows_match"] = len(srows) == len(drows)
                entry["schema_match"] = sorted(sdf.columns) == sorted(dcols)
                entry["hash_match"] = normalize(srows, list(sdf.columns)) == normalize(
                    drows, dcols
                )
            ok = entry["err"] == "no_oracle" or (
                entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
            )
        except Exception:
            entry["err"] = traceback.format_exc()[-1500:]
            ok = False
            # A JVM death (OOM on a heavy query) otherwise poisons every
            # remaining query in the sweep — the r14 sf0.1 run lost 28
            # cascade rows to one exact-triangle OOM. Probe the session
            # and rebuild it if dead, so each query's row reflects ITS
            # behavior.
            try:
                spark.sql("SELECT 1").collect()
            except Exception:
                print("## session dead — rebuilding", flush=True)
                try:
                    spark.stop()
                except Exception:
                    pass
                spark = build_session()
        n_pass += ok
        n_fail += not ok
        print(f"{'ok ' if ok else 'FAIL'} {name}", flush=True)
        results[name] = entry

    # Filtered runs MERGE into the existing partial file instead of
    # clobbering it, so mid-round coverage of query A survives a later
    # `-k B` run — the coverage preflight in tests/test_oracle_parity.py
    # requires every registered query to hold a green row somewhere in
    # the committed artifact union.
    if args.out == "CORRECTNESS_self_partial.json" and os.path.exists(args.out):
        try:
            with open(args.out) as fh:
                prior = json.load(fh)
        except (OSError, ValueError):
            prior = {}
        prior.pop("__meta__", None)
        prior.update(results)
        results = prior
        n_pass = sum(
            1
            for e in results.values()
            if e.get("err") == "no_oracle"
            or (e.get("rows_match") and e.get("schema_match") and e.get("hash_match"))
        )
        n_fail = len(results) - n_pass
    results["__meta__"] = {
        "sf_dir": args.sf_dir,
        "n_pass": n_pass,
        "n_fail": n_fail,
        "session": "vanilla (no session.py configs)"
        + (f" + driver-memory {args.driver_memory}" if args.driver_memory else ""),
        # VERDICT r13 #5: spec anchors are deliberately scale-unsafe
        # specification pins (each with a registered scale-safe twin);
        # listed here so correctness readers see them called out without
        # re-deriving why they're allowed to be slow.
        "spec_anchors": sorted(
            n for n, s in registry.specs().items() if "spec-anchor" in s.tags
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"\n{n_pass} pass, {n_fail} fail of {n_pass + n_fail} -> {args.out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
