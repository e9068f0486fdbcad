"""Relational division (set-containment join) — the reference's signature
operator.

Semantics reproduced from ``Sql.intersectQuery`` /
``selectWhereSubsetOf`` / ``selectWhereEitherSubsetOf``
(/root/reference/src/groovy/haplorec/util/Sql.groovy:103-228 and
/root/reference/src/sql/mysql/subset_query.sql:1-12):

Given table A whose rows (a_group, set_columns) represent named sets
``a -> {set tuple}`` and table B representing ``b -> {set tuple}``:

* ``select_where_subset_of``        keeps (a, b) where  set(a) ⊆ set(b)
* ``select_where_either_subset_of`` keeps (a, b) where  set(a) ⊆ set(b)
                                                     or set(b) ⊆ set(a)

computed as: join A⋈B on the set columns, count matches per (a, b) group,
and keep groups whose intersection count equals |set(a)| (subset) or
``least(|set(a)|, |set(b)|)`` (either-subset).

Scale design (100 TB): one shuffle for the A⋈B join keyed on the set
columns, one partial-aggregated shuffle for the group counts. The
per-group size relations (the reference's correlated COUNT subqueries,
Sql.groovy:140-147) are decorrelated into standalone aggregates joined
back in; when A is a small dimension (the common haplorec case —
``gene_phenotype_drug_recommendation`` etc.) both A and its size table
take the broadcast path, so the only large shuffle is the group-by on B's
keys. Skewed set keys are handled by AQE skew-join splitting.

Duplicate rows in A or B inflate bag counts exactly as they would in the
reference's ``count(*)`` SQL; callers wanting set semantics should
``dropDuplicates`` first (the reference relies on primary keys for this).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _intersect_counts(
    table_a: DataFrame,
    table_b: DataFrame,
    set_columns: Sequence[str],
    a_group_by: Sequence[str],
    b_group_by: Sequence[str],
    broadcast_a: bool,
) -> DataFrame:
    """|set(a) ∩ set(b)| for every (a, b) pair that intersects at all.

    Mirrors the derived counts table of Sql.groovy:149-154.
    """
    a = table_a.select(*a_group_by, *set_columns)
    b = table_b.select(*b_group_by, *set_columns)
    if broadcast_a:
        a = F.broadcast(a)
    return (
        b.join(a, on=list(set_columns), how="inner")
        .groupBy(*a_group_by, *b_group_by)
        .agg(F.count(F.lit(1)).alias("group_count"))
    )


def _group_sizes(
    table: DataFrame, group_by: Sequence[str], alias: str
) -> DataFrame:
    return table.groupBy(*group_by).agg(F.count(F.lit(1)).alias(alias))


def _division(
    table_a: DataFrame,
    table_b: DataFrame,
    set_columns: Sequence[str],
    a_group_by: Sequence[str],
    b_group_by: Sequence[str],
    select: Sequence[str] | None,
    either: bool,
    broadcast_a: bool,
) -> DataFrame:
    overlap = set(a_group_by) & set(b_group_by)
    if overlap:
        raise ValueError(f"a_group_by and b_group_by overlap: {sorted(overlap)}")
    counts = _intersect_counts(
        table_a, table_b, set_columns, a_group_by, b_group_by, broadcast_a
    )
    a_sizes = _group_sizes(table_a, a_group_by, "_a_size")
    if broadcast_a:
        a_sizes = F.broadcast(a_sizes)
    out = counts.join(a_sizes, on=list(a_group_by), how="inner")
    if either:
        b_sizes = _group_sizes(table_b, b_group_by, "_b_size")
        out = out.join(b_sizes, on=list(b_group_by), how="inner")
        cond = F.col("group_count") == F.least(F.col("_a_size"), F.col("_b_size"))
    else:
        cond = F.col("group_count") == F.col("_a_size")
    cols = list(select) if select is not None else [*a_group_by, *b_group_by]
    return out.filter(cond).select(*cols).distinct()


def select_where_subset_of(
    table_a: DataFrame,
    table_b: DataFrame,
    set_columns: Sequence[str],
    *,
    a_group_by: Sequence[str],
    b_group_by: Sequence[str],
    select: Sequence[str] | None = None,
    broadcast_a: bool = False,
) -> DataFrame:
    """(a, b) pairs where A's set is a subset of B's set.

    Reference: Sql.selectWhereSubsetOf (Sql.groovy:220-228) — keep groups
    with ``|a ∩ b| = |a|``. Where-clauses (``tableAWhere``/``tableBWhere``
    in the reference) are expressed by pre-filtering the input DataFrames;
    Catalyst pushes the predicates into both the join and the size
    aggregates, which is exactly the hand-done pushdown of
    Sql.groovy:127-147.
    """
    return _division(
        table_a, table_b, set_columns, a_group_by, b_group_by,
        select, either=False, broadcast_a=broadcast_a,
    )


def select_where_either_subset_of(
    table_a: DataFrame,
    table_b: DataFrame,
    set_columns: Sequence[str],
    *,
    a_group_by: Sequence[str],
    b_group_by: Sequence[str],
    select: Sequence[str] | None = None,
    broadcast_a: bool = False,
) -> DataFrame:
    """(a, b) pairs where A's set ⊆ B's set or B's set ⊆ A's set.

    Reference: Sql.selectWhereEitherSubsetOf (Sql.groovy:198-207) — keep
    groups with ``|a ∩ b| = least(|a|, |b|)``.
    """
    return _division(
        table_a, table_b, set_columns, a_group_by, b_group_by,
        select, either=True, broadcast_a=broadcast_a,
    )
