"""Wide <-> long reshape (F13).

The reference converts PharmGKB's wide gene-haplotype matrices to long
(gene, haplotype, snp, allele) triples offline
(/root/reference/script/gene_haplotype_matrix_to_table.py:22-30) and
re-widens them for display (GeneHaplotypeMatrix.groovy:163-191).
Spark-native faces:

* :func:`melt` — wide -> long via the built-in ``unpivot`` (codegen'd
  Expand, map-side only; no shuffle).
* :func:`long_to_wide` — long -> wide via ``groupBy().pivot()`` with an
  explicit value list (one shuffle; supplying values skips the extra
  distinct-collection job and keeps the column order deterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long: one output row per (id, value column)."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        key_name,
        value_name,
    )


def long_to_wide(
    df: DataFrame,
    id_cols: Sequence[str],
    key_col: str,
    value_col: str,
    *,
    values: Sequence[str] | None = None,
) -> DataFrame:
    """Long -> wide: one column per distinct ``key_col`` value.

    ``values`` pins the output columns (and their order); when omitted
    they are collected from the data (sorted for determinism).
    """
    if values is None:
        values = [
            r[0]
            for r in df.select(key_col).distinct().orderBy(key_col).collect()
        ]
    return (
        df.groupBy(*id_cols)
        .pivot(key_col, list(values))
        .agg(F.first(value_col))
    )
