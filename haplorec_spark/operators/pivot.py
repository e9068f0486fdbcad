"""Ordered positional pivot: groups of rows → single wide rows.

Reproduces ``Sql.groupedRowsToColumns``
(/root/reference/src/groovy/haplorec/util/Sql.groovy:263-335):

Given rows grouped by ``group_by``, a ``column_map`` like
``{'x': 'x', 'y': ['y1', 'y2']}`` spreads the i-th row's ``y`` (in
``order_rows_by`` order) into the i-th target column; missing positions
are null-padded; single-target mappings take the value from the group's
first row; groups larger than the widest mapping are "bad" and are
dropped (reference passes them to a ``badGroup`` callback,
Sql.groovy:281-283 — expose them via ``bad_groups`` instead).

The reference implements this as a sort-based streaming pass over a
presorted cursor; in Spark one hash aggregation
(``collect_list(struct) + array_sort``) removes the global-sort
requirement entirely — groups are assembled shuffle-locally with partial
aggregation and ordered per-group, which is the plan that survives a
100× scale-up (no global ``ORDER BY``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Name of the packed rows column used internally.
_ROWS = "__rows"


def _packed_groups(
    df: DataFrame,
    group_by: Sequence[str],
    source_cols: Sequence[str],
    order_rows_by: Sequence[str] | None,
) -> DataFrame:
    """groupBy + collect rows as ordered array<struct>."""
    order_cols = list(order_rows_by or [])
    # Struct field order drives array_sort's lexicographic comparison, so
    # the ordering keys lead; remaining source columns follow.
    struct_fields = order_cols + [c for c in source_cols if c not in order_cols]
    packed = F.collect_list(F.struct(*[F.col(c) for c in struct_fields]))
    if order_cols:
        packed = F.array_sort(packed)
    return df.groupBy(*group_by).agg(packed.alias(_ROWS))


def grouped_rows_to_columns(
    df: DataFrame,
    group_by: Sequence[str],
    column_map: Mapping[str, str | Sequence[str]],
    order_rows_by: Sequence[str] | None = None,
) -> DataFrame:
    """Pivot groups of ≤N rows into single rows with positional columns.

    Returns a DataFrame with columns = flattened ``column_map`` targets.
    Groups with more rows than the widest mapping are dropped (reference
    badGroup semantics); use :func:`bad_groups` to inspect them.
    """
    group_by = list(group_by)
    source_cols = [c for c in column_map if c not in group_by] + [
        c for c in column_map if c in group_by
    ]
    max_group = max(
        (len(v) for v in column_map.values() if not isinstance(v, str)),
        default=1,
    )
    agg = _packed_groups(df, group_by, list(column_map), order_rows_by)
    agg = agg.filter(F.size(_ROWS) <= max_group)

    out_cols: list[Column] = []
    for src, target in column_map.items():
        if isinstance(target, str):
            # Single-target mapping: value from the group's first row
            # (Sql.groovy:289 — `i == 0`). Group keys are constant, so
            # this also covers the pass-through columns.
            if src in group_by:
                out_cols.append(F.col(src).alias(target))
            else:
                out_cols.append(F.get(_ROWS, 0)[src].alias(target))
        else:
            for i, tgt in enumerate(target):
                # Index may be out of range for groups smaller than the
                # widest mapping; F.get returns null there under BOTH
                # ANSI modes (plain getItem throws INVALID_ARRAY_INDEX
                # with spark.sql.ansi.enabled=true), matching the
                # reference's null padding.
                out_cols.append(F.get(_ROWS, i)[src].alias(tgt))
    return agg.select(*out_cols)


def bad_groups(
    df: DataFrame,
    group_by: Sequence[str],
    column_map: Mapping[str, str | Sequence[str]],
    order_rows_by: Sequence[str] | None = None,
) -> DataFrame:
    """The groups ``grouped_rows_to_columns`` drops (size > widest mapping).

    Returns group keys plus the packed offending rows, for the caller to
    log/route — the Spark-shaped equivalent of the ``badGroup`` callback.
    """
    max_group = max(
        (len(v) for v in column_map.values() if not isinstance(v, str)),
        default=1,
    )
    agg = _packed_groups(df, list(group_by), list(column_map), order_rows_by)
    return agg.filter(F.size(_ROWS) > max_group).withColumnRenamed(_ROWS, "rows")
