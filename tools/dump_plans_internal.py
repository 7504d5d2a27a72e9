"""Dump `.explain("formatted")` for queries whose interesting plans are
INTERNAL (iterative fixpoints that return a checkpointed/collected result,
so the returned DataFrame's plan is just a LogicalRDD scan).

Works by spying on DataFrame.localCheckpoint / DataFrame.persist: every
plan that is about to be checkpointed or persisted while the query
function runs is captured IN ORDER and written to one file per query.
The query genuinely executes (at $SPARK_GRAFT_SF_DIR), so the captured
plans are the real ones, not reconstructions.

Usage:
    python tools/dump_plans_internal.py OUTDIR SUFFIX name1 name2 ...
Writes OUTDIR/<name>_<SUFFIX>.txt with a numbered section per captured
plan (checkpoint/persist call sites in execution order; repeated
fixpoint-round plans after round 2 are elided as "... N more rounds").
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: pyspark.sql.DataFrame is the abstract facade; runtime objects
# are the classic subclass, whose method OVERRIDES must be the patch target.
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from gtec_etl_spark.plans import registry  # noqa: E402
from gtec_etl_spark.session import get_spark  # noqa: E402


def _formatted(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("gtec_etl_spark-dump-plans-internal")
    specs = registry.specs()

    captured: list[tuple[str, str]] = []
    orig_ckpt = DataFrame.localCheckpoint
    orig_persist = DataFrame.persist
    orig_parquet = DataFrameWriter.parquet

    def spy_ckpt(self, eager=True):
        captured.append(("localCheckpoint", _formatted(self)))
        out = orig_ckpt(self, eager)
        # eager checkpoint has now EXECUTED this plan: re-explain shows the
        # final adaptive plan (isFinalPlan=true, AQEShuffleRead nodes,
        # exchanges elided above cached relations) — the shape that actually
        # ran, which the initial plan can hide for AQE-wrapped caches.
        captured.append(("localCheckpoint EXECUTED final plan", _formatted(self)))
        return out

    def spy_persist(self, *a, **kw):
        captured.append(("persist", _formatted(self)))
        return orig_persist(self, *a, **kw)

    def spy_parquet(self, *a, **kw):
        captured.append(("write.parquet", _formatted(self._df)))
        return orig_parquet(self, *a, **kw)

    DataFrame.localCheckpoint = spy_ckpt
    DataFrame.persist = spy_persist
    DataFrameWriter.parquet = spy_parquet
    try:
        for name in names:
            captured.clear()
            df = specs[name].fn(spark, sf_dir)
            final = _formatted(df)
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(
                    f"-- {name} ({suffix}) sf_dir={sf_dir}\n"
                    f"-- internal plans captured at localCheckpoint/persist"
                    f" call sites, in execution order\n"
                )
                seen: dict[str, int] = {}
                for i, (kind, plan) in enumerate(captured):
                    # Fixpoint rounds repeat the same shape; keep the first
                    # two occurrences of a shape, elide the rest.
                    shape = "".join(
                        ln.split("(", 1)[0]
                        for ln in plan.splitlines()
                        if ln.strip().startswith(("+-", ":-", "*("))
                    )
                    seen[shape] = seen.get(shape, 0) + 1
                    if seen[shape] > 2:
                        continue
                    fh.write(f"\n== [{i}] {kind} ==\n{plan}")
                fh.write(f"\n== final (returned DataFrame) ==\n{final}")
            print(f"wrote {path}", file=sys.stderr)
    finally:
        DataFrame.localCheckpoint = orig_ckpt
        DataFrame.persist = orig_persist
        DataFrameWriter.parquet = orig_parquet


if __name__ == "__main__":
    main()
