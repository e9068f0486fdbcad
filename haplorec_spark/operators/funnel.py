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

__all__ = ["funnel_depth", "funnel_counts", "funnel_step_timings"]


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


def _retry_fold_sql(
    steps: Sequence[str],
    within_seconds: int,
    init: str | None = None,
) -> str:
    """SQL computing the windowFunnel DP state from the sorted
    (ts, eid, et) struct array bound as ``evs``: an array of
    ``len(steps)`` timestamps where entry j (1-based) is the LATEST
    chain-start achieving depth j, or NULL if no in-order chain within
    budget reaches it. Transitions read the PREVIOUS accumulator only
    (``transform`` over ``acc``), so one event can never advance two
    levels, and the non-null entries always form a prefix (level j
    sets only when level j-1 was already set).

    ``init`` (a SQL expression for an array<timestamp> accumulator)
    CONTINUES the fold from stored state instead of starting empty —
    the DP is a left fold over time-ordered events, so folding a
    later batch onto a previous batch's final state is exactly one
    fold over the concatenation (the streaming twin's contract:
    events must arrive in non-decreasing (ts, event_id) order per
    user across batches)."""
    arr = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    w_us = int(within_seconds) * 1_000_000
    init_sql = (
        f"array_repeat(cast(null as timestamp), {len(steps)})"
        if init is None
        else init
    )
    return (
        f"aggregate(evs,"
        f" {init_sql},"
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


def _grouped_funnel_events(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    max_events_per_user: int | None,
) -> DataFrame:
    """(user_id, evs): each user's funnel-step events as ONE sorted
    struct array — the shared single-shuffle input of every funnel
    fold. ``max_events_per_user`` truncates to the first N events in
    (ts, event_id) order BEFORE the collect via a row_number window
    on the SAME key, so the guard adds a sort but no second exchange
    (the groupBy reuses the window's hash partitioning)."""
    if max_events_per_user is not None and max_events_per_user < 1:
        raise ValueError(
            f"max_events_per_user must be >= 1, got {max_events_per_user}"
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
    if max_events_per_user is not None:
        w = Window.partitionBy("user_id").orderBy(
            F.col("e.ts"), F.col("e.eid")
        )
        ev = (
            ev.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_events_per_user)
            .drop("_rn")
        )
    return ev.groupBy("user_id").agg(
        F.expr("array_sort(collect_list(e))").alias("evs")
    )


def funnel_depth(
    events: DataFrame,
    steps: Sequence[str],
    *,
    within_seconds: int | None = None,
    retry: bool = False,
    max_events_per_user: int | None = None,
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

    ``max_events_per_user`` is the volume guard: the per-user state is
    ONE collected array of that user's funnel-step events, so a bot
    with 10⁸ step events is a single aggregation row that can OOM an
    executor. With the cap set, each user keeps only their FIRST cap
    events in (ts, event_id) order — truncated BEFORE the collect (a
    same-key window, so no extra shuffle) — and the funnel is computed
    as if the user's activity ended there (documented
    head-truncation; events past the cap can only have extended the
    funnel LATER, so the reported depth is a lower bound). None
    (default) keeps the unbounded exact fold.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if retry and within_seconds is None:
        raise ValueError(
            "retry=True is meaningful only with a within_seconds "
            "budget — an unbudgeted funnel's first attempt already "
            "achieves the maximum depth"
        )
    grouped = _grouped_funnel_events(
        events, steps,
        user_col=user_col, ts_col=ts_col, type_col=type_col,
        id_col=id_col, max_events_per_user=max_events_per_user,
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


def _witness_fold_sql(
    steps: Sequence[str],
    within_seconds,
    init: str | None = None,
) -> str:
    """SQL computing the matched-timestamp PREFIX array from the
    sorted (ts, eid, et) struct array bound as ``evs`` — the
    single-attempt fold of :func:`_depth_fold_sql` with the full
    witness chain kept instead of only (depth, t0): entry j is the
    timestamp of the event that completed step j. ``init`` continues
    the fold from stored state (see :func:`_retry_fold_sql`)."""
    arr = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    budget = (
        "true"
        if within_seconds is None
        else (
            "(size(acc) = 0 OR unix_micros(e.ts)"
            " - unix_micros(element_at(acc, 1))"
            f" <= {int(within_seconds) * 1_000_000}L)"
        )
    )
    init_sql = (
        "cast(array() as array<timestamp>)" if init is None else init
    )
    return (
        f"aggregate(evs,"
        f" {init_sql},"
        f" (acc, e) -> CASE WHEN size(acc) < {len(steps)}"
        f" AND e.et = element_at(array({arr}), size(acc) + 1)"
        f" AND {budget}"
        f" THEN concat(acc, array(e.ts))"
        f" ELSE acc END)"
    )


#: the retry witness accumulator's element type — shared by the batch
#: fold and the streaming state store's schema guard
RETRY_WITNESS_ENTRY = "struct<t0: timestamp, ev: timestamp, gp: bigint>"


def _retry_witness_fold_sql(
    steps: Sequence[str],
    within_seconds: int,
    init: str | None = None,
) -> str:
    """:func:`_retry_fold_sql` widened to carry each level's witness:
    entry j is struct(t0 = the LATEST chain-start achieving depth j,
    ev = the step-j event timestamp of the FIRST chain with that
    start to reach it, gp = microseconds from that chain's step-(j−1)
    completion to ev). The max-start dominance argument is unchanged
    (a later start only loosens future budget checks); ev/gp follow
    deterministically because an entry is REPLACED only by a strictly
    later start, so the first in-order completion for the winning
    start is the one kept.

    ``init`` (a SQL expression for an array<RETRY_WITNESS_ENTRY>
    accumulator) CONTINUES the fold from stored state — like the
    narrow fold, this is a pure left fold over time-ordered events,
    so folding a later batch from a previous batch's final state
    equals one fold over the concatenation (round 12: the streaming
    funnel state stores THIS accumulator under ``retry=True`` so the
    state decodes both depths and step timings)."""
    arr = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    w_us = int(within_seconds) * 1_000_000
    entry = RETRY_WITNESS_ENTRY
    init_sql = (
        f"array_repeat(cast(null as {entry}), {len(steps)})"
        if init is None
        else init
    )
    return (
        f"aggregate(evs,"
        f" {init_sql},"
        f" (acc, e) -> transform(acc, (x, j) -> CASE"
        f" WHEN e.et != element_at(array({arr}), j + 1) THEN x"
        # step 1: a later start always dominates (sorted input)
        f" WHEN j = 0 THEN named_struct("
        f" 't0', e.ts, 'ev', e.ts, 'gp', 0L)"
        # step j+1: extend the best depth-j chain if within budget,
        # keeping the existing entry unless the start strictly grows
        f" WHEN element_at(acc, j) IS NOT NULL"
        f" AND unix_micros(e.ts) - unix_micros(element_at(acc, j).t0)"
        f" <= {w_us}L"
        f" THEN CASE WHEN x IS NULL OR element_at(acc, j).t0 > x.t0"
        f" THEN named_struct('t0', element_at(acc, j).t0, 'ev', e.ts,"
        f" 'gp', unix_micros(e.ts) - unix_micros(element_at(acc, j).ev))"
        f" ELSE x END"
        f" ELSE x END))"
    )


def funnel_step_timings(
    events: DataFrame,
    steps: Sequence[str],
    *,
    within_seconds: int | None = None,
    retry: bool = False,
    max_events_per_user: int | None = None,
    percentiles: Sequence[float] = (0.5, 0.9),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(step_ix, step, n_users, p<P>_seconds...): per-adjacent-step
    time-to-convert — for every user who reached step_ix (2-based:
    timings are BETWEEN steps), the seconds from their matched
    step_ix−1 event to their matched step_ix event, aggregated to
    exact interpolated percentiles (``percentiles`` → columns
    ``p50_seconds``, ``p90_seconds``, ...). The other half of the
    product-analytics funnel: :func:`funnel_counts` says where users
    stop, this says how long each conversion takes.

    The witnesses come from the SAME single-shuffle fold as
    :func:`funnel_depth` — no extra join, no second pass:

    * ``retry=False``: the matched chain is the fold's own prefix
      (first qualifying occurrence per step), so gap j is simply the
      difference of adjacent matched timestamps.
    * ``retry=True`` (windowFunnel semantics): each level reports the
      gap of its max-start representative chain — the LATEST
      within-budget attempt to achieve that depth, completed by its
      first in-order events (the deterministic witness convention
      ``funnel_depth`` already uses for ``t_first``). Levels are
      independent representatives: level 2's chain need not be the
      prefix of level 3's.

    Scale shape: the per-user state widens from (depth, t0) to a
    steps-sized array; one user-keyed shuffle plus the percentile
    aggregation, same as the depth query. Percentiles are exact
    (``quantile_cont`` semantics) but NEVER value-buffered: the
    (step, gap) distinct-value histogram + cumulative-window
    interpolation of :mod:`~haplorec_spark.operators.percentiles`
    bounds every buffer by distinct gap values — under a
    ``within_seconds`` budget at most budget-µs + 1 rows per step —
    instead of by users who reached the step (round 12; the
    value-buffering aggregate put ~8 GB on one reducer at 10⁹ users).
    ``max_events_per_user`` is :func:`funnel_depth`'s volume guard
    (documented head-truncation before the collect).
    """
    if not steps or len(steps) < 2:
        raise ValueError("step timings need at least two steps")
    if retry and within_seconds is None:
        raise ValueError(
            "retry=True is meaningful only with a within_seconds budget"
        )
    for p in percentiles:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile out of range: {p}")
    grouped = _grouped_funnel_events(
        events, steps,
        user_col=user_col, ts_col=ts_col, type_col=type_col,
        id_col=id_col, max_events_per_user=max_events_per_user,
    )
    if retry:
        folded = grouped.withColumn(
            "_w", F.expr(_retry_witness_fold_sql(steps, within_seconds))
        )
        # gaps for levels >= 2: the entry's own gp microseconds
        gaps = folded.select(
            "user_id",
            F.posexplode(
                F.expr(
                    "filter(transform(_w, (x, j) ->"
                    " CASE WHEN j >= 1 AND x IS NOT NULL"
                    " THEN x.gp ELSE CAST(NULL AS bigint) END),"
                    " g -> g IS NOT NULL)"
                )
            ).alias("_pos", "_gp"),
        )
    else:
        folded = grouped.withColumn(
            "_w", F.expr(_witness_fold_sql(steps, within_seconds))
        )
        gaps = folded.select(
            "user_id",
            F.posexplode(
                F.expr(
                    "transform(slice(_w, 2, greatest(size(_w) - 1, 0)),"
                    " (t, j) ->"
                    " unix_micros(t) - unix_micros(element_at(_w, j + 1)))"
                )
            ).alias("_pos", "_gp"),
        )
    return _step_timing_report(
        events.sparkSession, gaps, steps, percentiles
    )


def _step_timing_report(
    spark,
    gaps: DataFrame,
    steps: Sequence[str],
    percentiles: Sequence[float],
) -> DataFrame:
    """The shared tail of :func:`funnel_step_timings` and its
    streaming-state decoder: per-step exact interpolated percentiles
    over a (user_id, _pos, _gp) gap frame (``_pos`` 0-based from step
    2, ``_gp`` microseconds), left-joined onto the step ladder so
    unreached steps report n_users = 0 with null percentiles.

    Percentiles come from the distinct-value histogram
    (:func:`~haplorec_spark.operators.percentiles.group_percentiles`),
    NOT Spark's value-buffering ``percentile`` aggregate: a step's
    group holds every user who reached it, so the buffer would be
    user-sized on one task at scale (the round-11 verdict's one found
    scale-killer). The histogram is bounded by DISTINCT gap values —
    under a ``within_seconds`` budget that is at most budget-µs + 1
    regardless of user count — and matches ``quantile_cont``
    bit-for-bit at the shared 6-decimal rounding (test-pinned)."""
    from haplorec_spark.operators.percentiles import group_percentiles

    gaps = gaps.select(
        (F.col("_pos") + 2).alias("step_ix"),
        (F.col("_gp") / F.lit(1_000_000.0)).alias("_gap_s"),
    )
    ladder = spark.createDataFrame(
        [(i, s) for i, s in enumerate(steps, start=1) if i >= 2],
        "step_ix INT, step STRING",
    )
    timing = group_percentiles(
        gaps, ["step_ix"], "_gap_s", list(percentiles),
        names=[f"p{int(round(p * 100))}_seconds" for p in percentiles],
        count_col="n_users",
    )
    return (
        ladder.join(timing, on="step_ix", how="left")
        .withColumn("n_users", F.coalesce("n_users", F.lit(0)))
        .orderBy("step_ix")
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    *,
    within_seconds: int | None = None,
    retry: bool = False,
    max_events_per_user: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(step_ix, step, n_users, conversion): the funnel report —
    ``n_users`` who reached step_ix (1-based), ``conversion`` vs the
    previous step (round 6; step 1's conversion is 1.0). The step-key
    aggregate after :func:`funnel_depth` is steps-sized;
    ``max_events_per_user`` is that function's volume guard."""
    depths = funnel_depth(
        events, steps,
        within_seconds=within_seconds, retry=retry,
        max_events_per_user=max_events_per_user, user_col=user_col,
        ts_col=ts_col, type_col=type_col, id_col=id_col,
    )
    return _funnel_report(events.sparkSession, depths, steps)


def _funnel_report(spark, depths: DataFrame, steps: Sequence[str]) -> DataFrame:
    """The shared tail of :func:`funnel_counts` and its streaming-state
    decoder: the steps-sized reached/conversion ladder over a
    (user_id, depth, ...) frame."""
    per_depth = depths.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows = []
    for i, s in enumerate(steps, start=1):
        rows.append((i, s))
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
