"""K3 denormalized TSV dump writer (sparql/v0.7/rdflib_tabular_dump.py:
334-418 in the reference) — deterministic multi-key ordering preserved.

The reference writes one TSV from a single process. At scale the dump is
written as sharded part files whose *content* is deterministic: rows are
range-partitioned by the sort key (orderBy produces a global sort), so the
concatenation of part files in filename order reproduces the reference's
single-file row order exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_tsv_dump(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    single_file: bool = False,
) -> None:
    """Write a deterministically-ordered TSV (header per part file).

    single_file=True coalesces to one partition — only for small exports
    (the reference's behavior); leave False at scale.
    """
    out = df.orderBy(*order_cols)
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .option("nullValue", "")
        .csv(path)
    )


def write_partitioned_json(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """K2 per-entity JSON writer: JSON-lines output partitioned by entity
    key columns (the scale-safe form of one-file-per-sample,
    ccmm/gtex/rna_extracts.py:167-191)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).json(path)
