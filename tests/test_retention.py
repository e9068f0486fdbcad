"""Cohort retention on hand-built event sequences: cohort assignment
from the first event, period indexing for week/month/day, the
period-0 sanity row, the max_period_ix cut, and validation."""

from __future__ import annotations

from datetime import datetime

import pytest

from haplorec_spark.operators.retention import retention_cohorts


def _events(spark, rows):
    # rows: (user_id, iso_datetime_string)
    data = [
        (uid, datetime.fromisoformat(s)) for uid, s in rows
    ]
    return spark.createDataFrame(data, "user_id BIGINT, ts TIMESTAMP")


def _matrix(spark, rows, **kw):
    return {
        (r["cohort"].date().isoformat(), r["period_ix"]):
            (r["n_active"], r["n_cohort"], r["retention"])
        for r in retention_cohorts(_events(spark, rows), **kw).collect()
    }


def test_weekly_cohorts_golden(spark):
    rows = [
        # cohort week of Mon 2024-01-01: users 1, 2
        (1, "2024-01-02T10:00"), (2, "2024-01-05T09:00"),
        # user 1 returns in weeks +1 and +2; user 2 only in +2
        (1, "2024-01-09T10:00"), (1, "2024-01-16T10:00"),
        (2, "2024-01-17T12:00"),
        # cohort week of Mon 2024-01-08: user 3, never returns
        (3, "2024-01-10T08:00"),
    ]
    m = _matrix(spark, rows)
    assert m[("2024-01-01", 0)] == (2, 2, 1.0)
    assert m[("2024-01-01", 1)] == (1, 2, 0.5)
    assert m[("2024-01-01", 2)] == (2, 2, 1.0)
    assert m[("2024-01-08", 0)] == (1, 1, 1.0)
    assert ("2024-01-08", 1) not in m  # absent, not zero-row padded


def test_multiple_events_one_period_count_once(spark):
    rows = [
        (1, "2024-01-02T10:00"), (1, "2024-01-03T10:00"),
        (1, "2024-01-04T10:00"),
    ]
    m = _matrix(spark, rows)
    assert m == {("2024-01-01", 0): (1, 1, 1.0)}


def test_monthly_period_and_cut(spark):
    rows = [
        (1, "2024-01-15T00:00"), (1, "2024-02-20T00:00"),
        (1, "2024-05-01T00:00"),
        (2, "2024-01-31T00:00"),
    ]
    m = _matrix(spark, rows, period="month")
    assert m[("2024-01-01", 0)] == (2, 2, 1.0)
    assert m[("2024-01-01", 1)] == (1, 2, 0.5)
    assert m[("2024-01-01", 4)] == (1, 2, 0.5)
    cut = _matrix(spark, rows, period="month", max_period_ix=1)
    assert set(cut) == {("2024-01-01", 0), ("2024-01-01", 1)}


def test_invalid_period_raises(spark):
    with pytest.raises(ValueError, match="period"):
        retention_cohorts(
            _events(spark, [(1, "2024-01-01T00:00")]), period="fortnight"
        )


def test_null_ts_events_dropped_on_both_faces(spark, tmp_path):
    """Null-timestamp events carry no activity signal: the batch
    matrix drops them up front (no null-cohort or null-period_ix
    rows; an all-null-ts user is absent entirely), and the streaming
    state decode agrees row-for-row — the pinned dirty-input
    convention that keeps the two faces equal."""
    from haplorec_spark.streaming import (
        _retention_ingest_fn,
        retention_state_cohorts,
    )

    data = [
        (1, datetime.fromisoformat("2024-01-01T00:00")),
        (1, None),
        (1, datetime.fromisoformat("2024-01-09T00:00")),
        (2, datetime.fromisoformat("2024-01-02T00:00")),
        (3, None),  # all-null user: absent from the matrix
    ]
    events = spark.createDataFrame(
        data, "user_id BIGINT, ts TIMESTAMP"
    )
    got = retention_cohorts(events).collect()
    assert all(
        r["cohort"] is not None and r["period_ix"] is not None
        and r["n_cohort"] == 2 for r in got
    )
    assert {(r["period_ix"], r["n_active"]) for r in got} == {
        (0, 2), (1, 1)
    }

    state = str(tmp_path / "null_ts_state")
    ingest = _retention_ingest_fn(
        state_path=state, period="week", user_col="user_id",
        ts_col="ts",
    )
    ingest(events, 0)
    stored = spark.read.parquet(state)
    assert stored.filter("size(periods) = 0").count() == 0
    assert sorted(
        tuple(r) for r in retention_state_cohorts(spark, state).collect()
    ) == sorted(tuple(r) for r in got)

    # an ALL-null batch is a clean no-op (no marker, no partitions)
    only_null = spark.createDataFrame(
        [(9, None)], "user_id BIGINT, ts TIMESTAMP"
    )
    state2 = str(tmp_path / "null_only_state")
    _retention_ingest_fn(
        state_path=state2, period="week", user_col="user_id",
        ts_col="ts",
    )(only_null, 0)
    import os

    assert not os.path.exists(state2)
