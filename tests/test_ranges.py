"""interval_join: boundary inclusivity, bucket-spanning intervals,
equi-key restriction, and the no-nested-loop plan shape."""

from __future__ import annotations

from datetime import datetime

from haplorec_spark.operators.ranges import interval_join


def ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    intervals = spark.createDataFrame(
        [
            ("i1", 1, ts("2024-01-01T00:00:00"), ts("2024-01-03T00:00:00")),
            ("i2", 1, ts("2024-01-02T12:00:00"), ts("2024-01-02T13:00:00")),
            ("i3", 2, ts("2024-01-01T00:00:00"), ts("2024-01-03T00:00:00")),
        ],
        "iid string, key long, lo timestamp, hi timestamp",
    )
    points = spark.createDataFrame(
        [
            ("p1", 1, ts("2024-01-01T00:00:00")),  # lo boundary of i1
            ("p2", 1, ts("2024-01-03T00:00:00")),  # hi boundary of i1
            ("p3", 1, ts("2024-01-02T12:30:00")),  # inside i1 and i2
            ("p4", 1, ts("2024-01-05T00:00:00")),  # outside everything
            ("p5", 2, ts("2024-01-02T12:30:00")),  # key 2 -> i3 only
        ],
        "pid string, key long, p timestamp",
    )
    return points, intervals


def _pairs(out):
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def test_interval_join_keyed(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, point_ts="p", lo_ts="lo", hi_ts="hi",
        on=["key"], bucket_seconds=86400,
    )
    assert _pairs(out) == [
        ("p1", "i1"),  # inclusive lower bound
        ("p2", "i1"),  # inclusive upper bound (interval spans 3 buckets)
        ("p3", "i1"),
        ("p3", "i2"),  # one point, two containing intervals
        ("p5", "i3"),  # equi-key keeps key-2 point off key-1 intervals
    ]


def test_interval_join_unkeyed_and_small_buckets(spark):
    points, intervals = _frames(spark)
    # 1-hour buckets: i1 explodes into 49 buckets; results identical
    out = interval_join(
        points, intervals, point_ts="p", lo_ts="lo", hi_ts="hi",
        on=[], bucket_seconds=3600,
    )
    assert _pairs(out) == [
        ("p1", "i1"), ("p1", "i3"),
        ("p2", "i1"), ("p2", "i3"),
        ("p3", "i1"), ("p3", "i2"), ("p3", "i3"),
        ("p5", "i1"), ("p5", "i2"), ("p5", "i3"),
    ]


def test_inverted_interval_matches_nothing_cheaply(spark):
    """hi < lo: sequence(start, stop) would generate a DESCENDING bucket
    list, silently exploding an interval inverted by years into
    thousands of spurious rows; the pre-explode guard drops it instead
    (exact under inner-join semantics: it can contain no point)."""
    intervals = spark.createDataFrame(
        [("bad", 1, ts("2030-01-01T00:00:00"), ts("2024-01-01T00:00:00")),
         ("ok", 1, ts("2024-01-01T00:00:00"), ts("2024-01-02T00:00:00"))],
        "iid string, key long, lo timestamp, hi timestamp",
    )
    points = spark.createDataFrame(
        [("p1", 1, ts("2024-01-01T12:00:00"))],
        "pid string, key long, p timestamp",
    )
    out = interval_join(
        points, intervals, point_ts="p", lo_ts="lo", hi_ts="hi",
        on=["key"], bucket_seconds=86400,
    )
    assert _pairs(out) == [("p1", "ok")]


def test_interval_join_plan_has_no_nested_loop(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, point_ts="p", lo_ts="lo", hi_ts="hi",
        on=["key"], bucket_seconds=86400,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
