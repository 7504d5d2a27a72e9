"""Dynamic (data-dependent) pivot — SURVEY.md §7.4 hard-part #4.

The reference's tabular dump pivots on characteristic NAMES discovered from
the data (rdflib_tabular_dump.py:83,149,335-342): the output column set is
not known until runtime. The engine implements the standard two-pass
strategy: pass 1 collects the distinct pivot values (small — it is a
column-name set), pass 2 runs a values-bound pivot so the aggregation plan
is static. Column order is sorted for determinism.

Scale: pass 1 is a distinct over one column (map-side partial dedup); the
value list must be column-count-sized (bounded), which is exactly the
contract of a pivot — if values are unbounded you want a tall table, not a
wide one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def dynamic_pivot(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    agg: Column,
    fill=None,
) -> DataFrame:
    """Two-pass pivot on runtime-discovered values, sorted column order."""
    values = [
        r[0]
        for r in df.select(pivot_col).distinct().orderBy(pivot_col).collect()
        if r[0] is not None
    ]
    out = df.groupBy(*group_cols).pivot(pivot_col, values).agg(agg)
    if fill is not None:
        out = out.fillna(fill, subset=[str(v) for v in values])
    return out
