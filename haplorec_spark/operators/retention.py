"""Cohort retention analysis over event streams: group users by the
period of their FIRST activity, then measure what fraction of each
cohort is active n periods later — the third member of the
event-analytics family (``q_sessionize``'s sessions, ``funnel.py``'s
ordered funnels, this module's cohort matrix).

Scale shape: ONE corpus scan, no joins. Activity first collapses to
DISTINCT (user, period) — the corpus's event granularity never
survives past that map-side-combined aggregate — then the cohort is
a per-user min() WINDOW over the distinct rows (a groupBy +
self-join spelling read the corpus twice more, because the pushed
join-key filters diverge and defeat exchange reuse), the
(cohort, period_ix) aggregate is calendar-sized, and cohort sizes
ride a cohort window over that aggregate's own ix-0 rows. Window
partitions are calendar-bounded per user, so no skew at any user
count. No Python.

Period arithmetic is engine-portable by construction: ``week``
truncation is ISO-Monday in both Spark and DuckDB, so the day
difference between two week starts is an exact multiple of 7, and
``month`` uses whole-month differences between month starts — the
DuckDB oracle (tests/test_registry.py) replays both exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["retention_cohorts"]

_PERIODS = {"week": 7, "month": None, "day": 1}


def _period_ix_expr(period: str, p_col: str = "p", cohort_col: str = "cohort"):
    """Periods elapsed from ``cohort_col`` to ``p_col`` (both already
    ``period``-truncated) — the one engine-portable calendar
    arithmetic, shared with the streaming decoder
    (:func:`~haplorec_spark.streaming.retention_state_cohorts`) so the
    subtle week/month spellings cannot drift between the two faces."""
    if period == "month":
        return F.expr(
            f"cast(round(months_between({p_col}, {cohort_col})) as int)"
        )
    days = _PERIODS[period]
    return (
        F.datediff(
            F.col(p_col).cast("date"), F.col(cohort_col).cast("date")
        )
        / days
    ).cast("int")


def retention_cohorts(
    events: DataFrame,
    *,
    period: str = "week",
    max_period_ix: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort, period_ix, n_active, n_cohort, retention): the cohort
    retention matrix in long form.

    ``cohort`` is the ``period``-truncated timestamp of the user's
    first event; ``period_ix`` counts periods since it (0 = the cohort
    period itself, whose retention is 1.0 by construction — kept as
    the standard sanity row). ``retention`` = n_active/n_cohort
    (round 6). ``max_period_ix`` drops the matrix's long tail when
    only the first n columns matter; None keeps everything.

    Events with a null timestamp carry no activity signal and are
    DROPPED up front (pinned convention, shared with the streaming
    face — a set-merge state store cannot hold a null period, so the
    explicit filter here is what keeps the two faces row-for-row
    equal on dirty inputs; a user whose events are all null-ts is
    absent from the matrix on both).
    """
    if period not in _PERIODS:
        raise ValueError(
            f"period must be one of {sorted(_PERIODS)}, got {period!r}"
        )
    ts = F.col(ts_col).cast("timestamp")
    ev = events.filter(ts.isNotNull()).select(
        F.col(user_col).alias("user_id"),
        F.date_trunc(period, ts).alias("p"),
    )
    # The cohort is a per-user min over the DISTINCT activity rows —
    # a window, not a groupBy + self-join: the join spelling read the
    # corpus in two (pushdown-divergent, so never exchange-reused)
    # subtrees and a third for cohort sizes. This shape scans the
    # corpus ONCE (plan-pinned); everything after the distinct
    # aggregate is distinct-activity-sized, and the per-user window
    # partition is calendar-bounded (≤ periods the stream spans), so
    # no skew at any user count.
    activity = ev.distinct()
    joined = activity.withColumn(
        "cohort", F.min("p").over(Window.partitionBy("user_id"))
    ).withColumn("period_ix", _period_ix_expr(period))
    if max_period_ix is not None:
        joined = joined.filter(F.col("period_ix") <= max_period_ix)
    return _retention_matrix(joined)


def _retention_matrix(joined: DataFrame) -> DataFrame:
    """The calendar-sized aggregate tail shared by the batch operator
    and the streaming state decoder: distinct per-(user, period) rows
    carrying (cohort, period_ix) → the long-form retention matrix.

    Cohort sizes come from the aggregate's OWN period_ix = 0 row —
    every user's cohort period is in their activity set by
    construction (the cohort IS the set's minimum), so n_active at
    ix 0 equals the cohort's user count exactly. Reading it with a
    cohort-partitioned window over the calendar-sized counts (rather
    than a separate per-user aggregate, or a self-join whose pushed
    filters defeat exchange reuse) keeps the whole tail on ONE
    lineage — no second corpus/state scan on either face. The ix-0
    row always survives a ``max_period_ix`` cut (ix ≥ 0 by
    construction)."""
    counts = joined.groupBy("cohort", "period_ix").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    n_cohort = F.max(
        F.when(F.col("period_ix") == 0, F.col("n_active"))
    ).over(Window.partitionBy("cohort"))
    return counts.withColumn("n_cohort", n_cohort).select(
        "cohort",
        "period_ix",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias(
            "retention"
        ),
    )
