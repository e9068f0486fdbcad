"""Ordered-funnel semantics on hand-built event sequences: order
matters, early later-step events are ignored (and can match on
recurrence), the time budget binds from the first matched step,
timestamp ties break by event id, and funnel_counts does the ladder
math."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from haplorec_spark.operators.funnel import funnel_counts, funnel_depth

STEPS = ["view", "click", "purchase"]
_BASE = datetime(2024, 1, 1)


def _events(spark, rows):
    # rows: (event_id, user_id, minute_offset, event_type)
    data = [
        (eid, _BASE + timedelta(minutes=minute), uid, et, 0.0, "{}")
        for eid, uid, minute, et in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )


def _depths(spark, rows, **kw):
    return {
        r["user_id"]: r["depth"]
        for r in funnel_depth(_events(spark, rows), STEPS, **kw).collect()
    }


def test_order_matters_and_recurrence_recovers(spark):
    rows = [
        # user 1: perfect order -> 3
        (1, 1, 0, "view"), (2, 1, 1, "click"), (3, 1, 2, "purchase"),
        # user 2: purchase BEFORE click -> stuck at 1... until a later
        # purchase recurs after the click -> 3
        (4, 2, 0, "view"), (5, 2, 1, "purchase"), (6, 2, 2, "click"),
        (7, 2, 3, "purchase"),
        # user 3: click before any view -> that click is ignored; no
        # later click -> depth 1 (the view)
        (8, 3, 0, "click"), (9, 3, 1, "view"),
        # user 4: only funnel-irrelevant progress (click, purchase,
        # never view) -> 0
        (10, 4, 0, "click"), (11, 4, 1, "purchase"),
    ]
    d = _depths(spark, rows)
    assert d == {1: 3, 2: 3, 3: 1, 4: 0}


def test_within_budget_binds_from_first_step(spark):
    rows = [
        # view at t0, click +1 min (in budget), purchase +90 min (OUT
        # of a 1-hour budget measured from the VIEW, though only 89
        # minutes after the click)
        (1, 1, 0, "view"), (2, 1, 1, "click"), (3, 1, 90, "purchase"),
        # user 2 completes within the hour
        (4, 2, 0, "view"), (5, 2, 10, "click"), (6, 2, 50, "purchase"),
    ]
    d = _depths(spark, rows, within_seconds=3600)
    assert d == {1: 2, 2: 3}
    # unbudgeted: both complete
    assert _depths(spark, rows) == {1: 3, 2: 3}


def test_timestamp_tie_breaks_by_event_id(spark):
    # view and click at the SAME timestamp: the click's higher event
    # id places it after the view in the sorted fold -> depth 2
    rows = [(1, 1, 0, "view"), (2, 1, 0, "click")]
    assert _depths(spark, rows) == {1: 2}
    # reversed ids: the click sorts BEFORE the view and is ignored
    rows2 = [(2, 1, 0, "view"), (1, 1, 0, "click")]
    assert _depths(spark, rows2) == {1: 1}


def test_t_first_is_matched_step_one_event(spark):
    rows = [(1, 1, 5, "view"), (2, 1, 6, "click")]
    out = funnel_depth(_events(spark, rows), STEPS).collect()[0]
    assert out["depth"] == 2
    assert out["t_first"] is not None


def test_funnel_counts_ladder(spark):
    rows = [
        (1, 1, 0, "view"), (2, 1, 1, "click"), (3, 1, 2, "purchase"),
        (4, 2, 0, "view"), (5, 2, 1, "click"),
        (6, 3, 0, "view"),
        (7, 4, 0, "click"),  # depth 0: appears in ladder denominators
    ]
    out = {
        r["step_ix"]: (r["step"], r["n_users"], r["conversion"])
        for r in funnel_counts(_events(spark, rows), STEPS).collect()
    }
    assert out[1] == ("view", 3, 1.0)
    assert out[2] == ("click", 2, round(2 / 3, 6))
    assert out[3] == ("purchase", 1, 0.5)


def test_empty_steps_raise(spark):
    with pytest.raises(ValueError, match="at least one step"):
        funnel_depth(_events(spark, [(1, 1, 0, "view")]), [])


def test_funnel_single_shuffle_plan(spark):
    """The events are filtered to step types BEFORE the one groupBy;
    no join, no second corpus exchange."""
    df = funnel_depth(
        _events(spark, [(1, 1, 0, "view"), (2, 1, 1, "click")]), STEPS
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# ---------------------------------------------- retry window (round 10)


def test_retry_restarts_after_budget_expiry(spark):
    """The verdict's expire-then-complete case: the first attempt's
    budget expires, a later step-1 occurrence completes — retry finds
    it, single-attempt stays stuck."""
    rows = [
        (1, 1, 0, "view"), (2, 1, 40, "click"),   # 40 min > 30 budget
        (3, 1, 50, "view"), (4, 1, 70, "click"),  # 20 min, in budget
    ]
    steps = ["view", "click"]
    ev = _events(spark, rows)
    single = {
        r["user_id"]: (r["depth"], r["t_first"])
        for r in funnel_depth(ev, steps, within_seconds=1800).collect()
    }
    retried = {
        r["user_id"]: (r["depth"], r["t_first"])
        for r in funnel_depth(
            ev, steps, within_seconds=1800, retry=True
        ).collect()
    }
    assert single == {1: (1, _BASE)}
    assert retried == {1: (2, _BASE + timedelta(minutes=50))}


def test_retry_is_exact_not_greedy(spark):
    """A case where a greedy restart-on-expiry fold undercounts: the
    depth-3 chain starts at the SECOND view while the first attempt is
    still in budget (events view@0 click@9 view@10 click@11
    purchase@18, budget 10) — the windowFunnel DP must report 3 with
    the second view as witness."""
    rows = [
        (1, 1, 0, "view"), (2, 1, 9, "click"),
        (3, 1, 10, "view"), (4, 1, 11, "click"), (5, 1, 18, "purchase"),
    ]
    ev = _events(spark, rows)
    got = funnel_depth(ev, STEPS, within_seconds=600, retry=True).collect()
    assert [(r["user_id"], r["depth"], r["t_first"]) for r in got] == [
        (1, 3, _BASE + timedelta(minutes=10))
    ]
    # single attempt: budget from view@0 kills purchase@18
    single = funnel_depth(ev, STEPS, within_seconds=600).collect()
    assert single[0]["depth"] == 2


def test_retry_t_first_is_latest_completing_attempt(spark):
    rows = [
        (1, 1, 0, "view"), (2, 1, 5, "click"),
        (3, 1, 10, "view"), (4, 1, 12, "click"),
    ]
    got = funnel_depth(
        _events(spark, rows), ["view", "click"],
        within_seconds=1800, retry=True,
    ).collect()
    assert got[0]["depth"] == 2
    assert got[0]["t_first"] == _BASE + timedelta(minutes=10)


def test_retry_cannot_advance_two_levels_on_one_event(spark):
    """Repeated step types: one event must advance at most one level
    (the fold reads the previous accumulator only)."""
    rows = [(1, 1, 0, "view"), (2, 1, 1, "view"), (3, 1, 2, "view")]
    got = funnel_depth(
        _events(spark, rows), ["view", "view", "view", "view"],
        within_seconds=3600, retry=True,
    ).collect()
    assert got[0]["depth"] == 3  # three events -> three levels, not four


def test_retry_requires_budget(spark):
    with pytest.raises(ValueError, match="within_seconds"):
        funnel_depth(_events(spark, [(1, 1, 0, "view")]), STEPS, retry=True)


def test_retry_funnel_counts_ladder(spark):
    rows = [
        # u1 completes only on retry; u2 completes first attempt
        (1, 1, 0, "view"), (2, 1, 40, "click"),
        (3, 1, 50, "view"), (4, 1, 60, "click"),
        (5, 2, 0, "view"), (6, 2, 5, "click"),
    ]
    got = {
        r["step_ix"]: r["n_users"]
        for r in funnel_counts(
            _events(spark, rows), ["view", "click"],
            within_seconds=1800, retry=True,
        ).collect()
    }
    assert got == {1: 2, 2: 2}


def test_retry_depth_zero_user_is_null_not_crash(spark):
    """Review-caught (round 10): a user with funnel-step events but no
    step-1 event has depth 0 — element_at(state, 0) is
    INVALID_INDEX_OF_ZERO (an error even for try_element_at), so the
    extraction must guard depth 0 explicitly."""
    rows = [(1, 4, 0, "click"), (2, 4, 1, "purchase")]
    got = funnel_depth(
        _events(spark, rows), STEPS, within_seconds=3600, retry=True
    ).collect()
    assert [(r["user_id"], r["depth"], r["t_first"]) for r in got] == [
        (4, 0, None)
    ]


# ------------------------------------------------ step timings (round 11)


def _timings(spark, rows, **kw):
    from haplorec_spark.operators.funnel import funnel_step_timings

    return {
        r["step_ix"]: (r["n_users"], r["p50_seconds"], r["p90_seconds"])
        for r in funnel_step_timings(
            _events(spark, rows), STEPS, **kw
        ).collect()
    }


def test_step_timings_golden_single_attempt(spark):
    """Adjacent gaps come from the fold's own matched chain (first
    qualifying occurrence per step): three users convert view→click in
    100/50/120 s... here minutes; exact interpolated percentiles."""
    rows = [
        (1, 1, 0, "view"), (2, 1, 10, "click"), (3, 1, 50, "purchase"),
        (4, 2, 0, "view"), (5, 2, 5, "click"),
        # user 3: click BEFORE view is ignored; later click matches
        (6, 3, 0, "click"), (7, 3, 1, "view"), (8, 3, 13, "click"),
    ]
    got = _timings(spark, rows)
    # gaps step2 (minutes->seconds): u1 600, u2 300, u3 720
    assert got[2] == (3, 600.0, pytest.approx(696.0))
    assert got[3] == (1, 2400.0, 2400.0)


def test_step_timings_respect_budget(spark):
    """An over-budget event cannot convert, so it contributes no gap
    (single-attempt semantics: the funnel binds from the first view)."""
    rows = [
        (1, 1, 0, "view"), (2, 1, 100, "click"),   # over 1-hour budget
        (3, 2, 0, "view"), (4, 2, 30, "click"),
    ]
    got = _timings(spark, rows, within_seconds=3600)
    assert got[2] == (1, 1800.0, 1800.0)
    assert got[3] == (0, None, None)


def test_step_timings_retry_reports_latest_attempt(spark):
    """Retry mode: the gap is the max-start representative chain's —
    the first attempt expires, the SECOND attempt (latest start
    reaching depth 2) converts in 10 minutes, and that is the gap
    reported (not the expired attempt's)."""
    rows = [
        (1, 1, 0, "view"), (2, 1, 100, "click"),   # attempt 1: expired
        (3, 1, 200, "view"), (4, 1, 210, "click"),  # attempt 2: converts
    ]
    got = _timings(spark, rows, within_seconds=3600, retry=True)
    assert got[2] == (1, 600.0, 600.0)
    # parity: depths agree with funnel_depth's retry DP
    assert _depths(spark, rows, within_seconds=3600, retry=True) == {1: 2}


def test_step_timings_retry_levels_are_independent_representatives(spark):
    """Level 3's chain starts at the latest view that completes the
    WHOLE funnel in budget; level 2's representative may start later
    (a deeper-reaching start can be older). Both gaps are their own
    chain's."""
    rows = [
        (1, 1, 0, "view"), (2, 1, 10, "click"), (3, 1, 40, "purchase"),
        (4, 1, 30, "view"), (5, 1, 50, "click"),
        # the 30-min view reaches depth 2 last (latest start, gap 20
        # min) but its click comes AFTER the purchase, so depth 3's
        # chain is the 0-min attempt (gap 40-10 = 30 min)
    ]
    got = _timings(spark, rows, within_seconds=3600, retry=True)
    assert got[2] == (1, 1200.0, 1200.0)  # latest depth-2 start: 30min view
    assert got[3] == (1, 1800.0, 1800.0)  # depth-3 chain: 0min view, 10->40
    assert _depths(spark, rows, within_seconds=3600, retry=True) == {1: 3}


def test_step_timings_validation(spark):
    from haplorec_spark.operators.funnel import funnel_step_timings

    with pytest.raises(ValueError, match="two steps"):
        funnel_step_timings(None, ["view"])
    with pytest.raises(ValueError, match="percentile"):
        funnel_step_timings(None, STEPS, percentiles=(1.5,))
    with pytest.raises(ValueError, match="within_seconds"):
        funnel_step_timings(None, STEPS, retry=True)


# ------------------------------------------- per-user volume guard


def test_max_events_per_user_truncates_head(spark):
    """The volume guard keeps each user's FIRST cap events in
    (ts, event_id) order: a user whose conversion happens at event 4
    reports depth 1 under cap=3 (documented head-truncation — a lower
    bound), while an under-cap user is unaffected."""
    rows = [
        (1, 1, 0, "view"), (2, 1, 1, "view"), (3, 1, 2, "view"),
        (4, 1, 3, "click"),
        (5, 2, 0, "view"), (6, 2, 1, "click"),
    ]
    assert _depths(spark, rows, max_events_per_user=3) == {1: 1, 2: 2}
    assert _depths(spark, rows) == {1: 2, 2: 2}
    # retry DP under the same guard
    assert _depths(
        spark, rows, within_seconds=3600, retry=True,
        max_events_per_user=3,
    ) == {1: 1, 2: 2}


def test_max_events_per_user_no_extra_shuffle(spark):
    """The guard's row_number window partitions by the SAME key as the
    fold's groupBy, so the capped plan must contain exactly as many
    Exchange operators as the uncapped one (one user-keyed shuffle)."""
    rows = [(i, i % 3, i, "view") for i in range(12)]
    ev = _events(spark, rows)

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange") - plan.count("ReusedExchange")

    base = funnel_depth(ev, STEPS)
    capped = funnel_depth(ev, STEPS, max_events_per_user=5)
    base.collect(), capped.collect()
    assert n_exchanges(capped) == n_exchanges(base)


def test_max_events_per_user_validation(spark):
    with pytest.raises(ValueError, match="max_events_per_user"):
        funnel_depth(None, STEPS, max_events_per_user=0)
