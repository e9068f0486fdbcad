"""Ordered-funnel analytics over event streams: how far does each
user get through a required step sequence (view → click → purchase),
optionally within a time budget from the first matched step.

Scale shape: ONE shuffle. Events are filtered to the funnel's own
step types BEFORE anything groups (a user's unrelated activity never
crosses the wire — the per-user array is bounded by their funnel-step
events, not their total activity), collected per user, sorted
map-side, and the funnel depth computed by a single ``aggregate``
fold over the sorted array — no per-step join chain (the k-join
formulation re-shuffles the events k times and still mishandles
repeated steps), no Python.

Semantics (the product-analytics convention): steps must match in
order; a later step's event BEFORE its predecessor is ignored (it can
still match when it recurs after); repeated step types are fine (the
fold consumes the FIRST qualifying occurrence); ``within`` bounds the
WHOLE funnel from the first matched step. Two attempt semantics:

* ``retry=False`` (default): single attempt — the funnel starts at
  the FIRST step-1 event and an event past the budget cannot advance
  it; a fresh attempt is NOT re-tried from a later step-1 occurrence.
* ``retry=True`` (round 10): the other standard product-analytics
  semantics (ClickHouse ``windowFunnel``) — depth is the MAXIMUM over
  ALL in-order chains starting at ANY step-1 event whose last event
  is within ``within_seconds`` of the chain's start. Exact, not a
  greedy restart: the fold carries per-level the LATEST chain-start
  timestamp achieving that level (a later start can only make future
  budget checks easier, so the max-start representative dominates —
  the windowFunnel DP), still one shuffle and one map-side pass.

Ties on timestamp break by event id so reruns and engines agree.

No reference counterpart (haplorec has no event analytics); the
events table exists for exactly this operator family. DuckDB oracle:
the same fold via list_reduce in the rotated-out registry
(tests/test_registry.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel_depth", "funnel_counts"]


def _depth_fold_sql(steps: Sequence[str], within_seconds) -> str:
    """SQL computing struct(depth, t0) from the sorted (ts, type)
    struct array bound as ``evs``."""
    arr = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    budget = (
        "true"
        if within_seconds is None
        else (
            "(acc.t0 IS NULL OR unix_micros(e.ts) - unix_micros(acc.t0)"
            f" <= {int(within_seconds) * 1_000_000}L)"
        )
    )
    return (
        f"aggregate(evs,"
        f" struct(cast(0 as int) as depth,"
        f" cast(null as timestamp) as t0),"
        f" (acc, e) -> CASE WHEN acc.depth < {len(steps)}"
        f" AND e.et = element_at(array({arr}), acc.depth + 1)"
        f" AND {budget}"
        f" THEN struct(acc.depth + 1 as depth,"
        f" coalesce(acc.t0, e.ts) as t0)"
        f" ELSE acc END)"
    )


def _retry_fold_sql(steps: Sequence[str], within_seconds: int) -> str:
    """SQL computing the windowFunnel DP state from the sorted
    (ts, eid, et) struct array bound as ``evs``: an array of
    ``len(steps)`` timestamps where entry j (1-based) is the LATEST
    chain-start achieving depth j, or NULL if no in-order chain within
    budget reaches it. Transitions read the PREVIOUS accumulator only
    (``transform`` over ``acc``), so one event can never advance two
    levels, and the non-null entries always form a prefix (level j
    sets only when level j-1 was already set)."""
    arr = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    w_us = int(within_seconds) * 1_000_000
    return (
        f"aggregate(evs,"
        f" array_repeat(cast(null as timestamp), {len(steps)}),"
        f" (acc, e) -> transform(acc, (t, j) -> CASE"
        f" WHEN e.et != element_at(array({arr}), j + 1) THEN t"
        # step 1: a later start always dominates (sorted input)
        f" WHEN j = 0 THEN e.ts"
        # step j+1: extend the best depth-j chain if within budget
        f" WHEN element_at(acc, j) IS NOT NULL"
        f" AND unix_micros(e.ts) - unix_micros(element_at(acc, j))"
        f" <= {w_us}L"
        f" THEN CASE WHEN t IS NULL OR element_at(acc, j) > t"
        f" THEN element_at(acc, j) ELSE t END"
        f" ELSE t END))"
    )


def funnel_depth(
    events: DataFrame,
    steps: Sequence[str],
    *,
    within_seconds: int | None = None,
    retry: bool = False,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(user, depth, t_first): per-user funnel progress — ``depth`` =
    number of steps completed in order (0..len(steps)), ``t_first``
    the timestamp of the matched step-1 event (NULL at depth 0).
    Under ``retry=True`` (module docstring), ``depth`` is the max over
    all within-budget attempts and ``t_first`` the start of the
    LATEST attempt achieving it (the DP's deterministic witness).

    Only users with at least one funnel-step event appear (users with
    none are depth 0 by definition; left-join the user dimension if
    the zero row matters).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if retry and within_seconds is None:
        raise ValueError(
            "retry=True is meaningful only with a within_seconds "
            "budget — an unbudgeted funnel's first attempt already "
            "achieves the maximum depth"
        )
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"),
        F.struct(
            # NTZ parquet timestamps reject unix_micros; the session-tz
            # cast is a wall-clock no-op under the engine's pinned UTC
            F.col(ts_col).cast("timestamp").alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(type_col).alias("et"),
        ).alias("e"),
    )
    grouped = ev.groupBy("user_id").agg(
        F.expr("array_sort(collect_list(e))").alias("evs")
    )
    if retry:
        folded = grouped.withColumn(
            "_dp", F.expr(_retry_fold_sql(steps, within_seconds))
        )
        depth = F.expr("size(filter(_dp, x -> x IS NOT NULL))")
        return folded.select(
            "user_id",
            depth.cast("int").alias("depth"),
            # depth 0 must be guarded explicitly: element_at(_, 0) is
            # INVALID_INDEX_OF_ZERO — an error even for try_element_at,
            # which only forgives OUT-OF-RANGE indexes (review-caught,
            # round 10: any user with funnel-step events but no step-1
            # event crashed the whole query)
            F.expr(
                "CASE WHEN size(filter(_dp, x -> x IS NOT NULL)) = 0"
                " THEN CAST(NULL AS timestamp)"
                " ELSE element_at(_dp,"
                " size(filter(_dp, x -> x IS NOT NULL))) END"
            ).alias("t_first"),
        )
    folded = grouped.withColumn(
        "_f", F.expr(_depth_fold_sql(steps, within_seconds))
    )
    return folded.select(
        "user_id",
        F.col("_f.depth").alias("depth"),
        F.col("_f.t0").alias("t_first"),
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    *,
    within_seconds: int | None = None,
    retry: bool = False,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(step_ix, step, n_users, conversion): the funnel report —
    ``n_users`` who reached step_ix (1-based), ``conversion`` vs the
    previous step (round 6; step 1's conversion is 1.0). The step-key
    aggregate after :func:`funnel_depth` is steps-sized."""
    depths = funnel_depth(
        events, steps,
        within_seconds=within_seconds, retry=retry, user_col=user_col,
        ts_col=ts_col, type_col=type_col, id_col=id_col,
    )
    per_depth = depths.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows = []
    for i, s in enumerate(steps, start=1):
        rows.append((i, s))
    spark = events.sparkSession
    ladder = spark.createDataFrame(rows, "step_ix INT, step STRING")
    reached = (
        ladder.join(
            per_depth, per_depth.depth >= ladder.step_ix, "left"
        )
        .groupBy("step_ix", "step")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_users"))
    )
    # single-partition ordered window: safe ONLY because the frame is
    # steps-sized (the q_running_revenue justification)
    w = F.lag("n_users").over(Window.orderBy("step_ix"))
    return (
        reached.withColumn("_prev", w)
        .select(
            "step_ix",
            "step",
            "n_users",
            F.when(
                F.col("_prev").isNull(), F.lit(1.0)
            ).otherwise(
                F.when(F.col("_prev") > 0,
                       F.round(F.col("n_users") / F.col("_prev"), 6))
                .otherwise(F.lit(0.0))
            ).alias("conversion"),
        )
    )
