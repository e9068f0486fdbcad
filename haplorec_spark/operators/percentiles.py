"""Exact interpolated group percentiles WITHOUT per-group value
buffers — the scale-safe replacement for Spark's ``percentile``
aggregate in this engine's reporting paths.

Spark's exact ``percentile`` (and ``percentile_approx``'s exact
cousin) buffers EVERY value of a group inside one aggregation buffer
on one task: correct, but a step-timings group holds every user who
reached that step, so at 10⁹ users a single reducer materializes a
~8 GB array before it can answer (the round-11 verdict's one found
scale-killer). The same answer falls out of a distinct-value
histogram — the repo's own AUC trick
(``training.evaluate_binary_classifier``): aggregate (group, value) →
count (map-side partial aggregation shrinks the shuffle to distinct
pairs), take a per-group cumulative-count window over the histogram
rows, and read each requested quantile's bracketing values straight
off the cumulative counts. Every buffer is then DISTINCT-VALUE-sized:
a billion users whose step gaps land on a million distinct
microsecond values cost a million histogram rows, not a billion
buffered doubles.

Semantics are ``quantile_cont`` / Spark ``percentile`` exactly
(continuous linear interpolation over the sorted multiset): for group
size n and quantile p, the 0-based fractional rank is
h = (n−1)·p, and the answer interpolates the values at ranks
⌊h⌋ and ⌈h⌉ with DuckDB's weighted spelling
(⌈h⌉−h)·v_lo + (h−⌊h⌋)·v_hi (reduces to v_lo when h is integral), so
the DuckDB oracles match bit-for-bit at the shared 6-decimal
rounding. A histogram row with count c ending at cumulative count
``cum`` covers 0-based ranks [cum−c, cum−1], so the value at rank r
is the first row with cum ≥ r+1 — values ascend with cum, making it
``min(value) FILTER (cum ≥ r+1)``: one ordinary aggregate per
quantile bound, no join.

Physical shape: one corpus-sized exchange (the histogram aggregate,
with map-side combine), then a histogram-sized exchange for the
group-keyed cumulative window, whose final groupBy reuses the same
hash partitioning (no third exchange — plan-pinned in
scripts/explain_audit.py: no ``percentile`` aggregate, no
ObjectHashAggregate over raw values, exactly two exchanges).

Nulls are ignored (both engines' convention); a group with ZERO
non-null values disappears from the output (callers that need the
empty group row left-join a group ladder, as
``funnel.funnel_step_timings`` does).

No reference counterpart (haplorec aggregates via MySQL GROUP BY
only); the pattern is the standard histogram-quantile rewrite every
OLAP engine documents publicly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "group_percentiles",
    "histogram_quantile_bound_aggs",
    "histogram_quantile_exprs",
]


def group_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str | Column,
    percentiles: Sequence[float],
    *,
    names: Sequence[str] | None = None,
    count_col: str | None = None,
    round_to: int | None = 6,
    pre_counted: str | None = None,
) -> DataFrame:
    """(group_cols..., [count_col,] <one column per percentile>):
    exact continuous-interpolation percentiles of ``value_col`` per
    group, computed from the distinct-value histogram (module
    docstring) — never from a per-group value buffer.

    ``names`` overrides the output column names (default
    ``p{int(p*100)}``); ``count_col`` additionally emits the group's
    non-null value count; ``round_to`` rounds the interpolated result
    (None = raw doubles). ``group_cols`` may be empty for a global
    one-row result (note: the global form emits its one row — with
    null percentiles — even when no non-null values exist, the SQL
    aggregate-without-GROUP-BY convention; keyed empty groups
    disappear).

    ``pre_counted`` names a count column when ``df`` is ALREADY a
    value histogram (one caller-side aggregation produced
    (group, value, count) rows — e.g. a profile that shares the
    histogram across many metrics): rows are weighted by that count
    instead of counted, skipping the corpus-sized aggregate here.
    Rows with the same (group, value) are safely re-summed; null
    values are ignored either way.
    """
    if not percentiles:
        raise ValueError("at least one percentile is required")
    for p in percentiles:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile out of range: {p}")
    if names is None:
        names = [f"p{int(round(p * 100))}" for p in percentiles]
    if len(names) != len(percentiles):
        raise ValueError(
            f"{len(percentiles)} percentiles but {len(names)} names"
        )
    groups = list(group_cols)
    val = (
        F.col(value_col) if isinstance(value_col, str) else value_col
    ).cast("double")

    hist = (
        df.filter(val.isNotNull())
        .groupBy(*groups, val.alias("__v"))
        .agg(
            F.count(F.lit(1)).alias("__c")
            if pre_counted is None
            else F.sum(pre_counted).alias("__c")
        )
    )
    wg = Window.partitionBy(*groups)
    cum = wg.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # __n via the same partition key: one exchange feeds both windows
    # and the final group aggregate
    h = hist.withColumn("__cum", F.sum("__c").over(cum)).withColumn(
        "__n", F.sum("__c").over(wg)
    )

    aggs: list[Column] = [F.max("__n").alias("__gn")]
    aggs.extend(histogram_quantile_bound_aggs(percentiles))
    post = list(
        zip(
            names,
            histogram_quantile_exprs(
                percentiles, F.col("__gn"), round_to=round_to
            ),
        )
    )

    out = h.groupBy(*groups).agg(*aggs)
    keep: list[Column] = [F.col(g) for g in groups]
    if count_col is not None:
        keep.append(F.col("__gn").alias(count_col))
    return out.select(
        *keep, *[expr.alias(name) for name, expr in post]
    )


def histogram_quantile_bound_aggs(
    percentiles: Sequence[float],
    *,
    value_col: str = "__v",
    cum_col: str = "__cum",
    n_col: str = "__n",
) -> list[Column]:
    """Aggregate expressions reading each quantile's BRACKETING values
    (``__lo{k}``/``__hi{k}``) off a cumulative-count histogram — the
    rank-reading half of the module's rewrite, exposed so operators
    that fold quantiles into a LARGER single aggregate (e.g. the
    corpus profile's one-row dashboard fold) share this exact
    spelling instead of hand-copying it. ``cum_col``/``n_col`` must
    count NON-NULL values only (the quantile_cont null convention —
    the caller owns that when it builds the windows itself)."""
    aggs: list[Column] = []
    for k, p in enumerate(percentiles):
        # 0-based fractional rank; constant within a group, so it is
        # safe inside the per-row aggregate conditions
        hk = (F.col(n_col) - F.lit(1)).cast("double") * F.lit(float(p))
        aggs.append(
            F.min(
                F.when(F.col(cum_col) >= F.floor(hk) + 1, F.col(value_col))
            ).alias(f"__lo{k}")
        )
        aggs.append(
            F.min(
                F.when(F.col(cum_col) >= F.ceil(hk) + 1, F.col(value_col))
            ).alias(f"__hi{k}")
        )
    return aggs


def histogram_quantile_exprs(
    percentiles: Sequence[float],
    n_expr: Column,
    *,
    round_to: int | None = 6,
) -> list[Column]:
    """The interpolation half: one Column per quantile combining the
    ``__lo{k}``/``__hi{k}`` bounds of
    :func:`histogram_quantile_bound_aggs` (same frame, post-agg) with
    DuckDB's weighted spelling — (CRN−RN)·lo + (RN−FRN)·hi, collapsing
    to lo when the rank is integral — so the oracles' last-bit
    arithmetic agrees. ``n_expr`` is the group's non-null value
    count in the post-aggregate frame."""
    exprs: list[Column] = []
    for k, p in enumerate(percentiles):
        rn = (n_expr - F.lit(1)).cast("double") * F.lit(float(p))
        frn = F.floor(rn).cast("double")
        crn = F.ceil(rn).cast("double")
        interp = F.when(crn == frn, F.col(f"__lo{k}")).otherwise(
            (crn - rn) * F.col(f"__lo{k}") + (rn - frn) * F.col(f"__hi{k}")
        )
        if round_to is not None:
            interp = F.round(interp, round_to)
        exprs.append(interp)
    return exprs
