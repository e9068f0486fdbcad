"""asof_join: boundary inclusivity, no-match NULLs, NULL-key left-row
retention, value carry, and the single-shuffle plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from haplorec_spark.operators.asof import asof_join


def ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), 100.0),
            (1, ts("2024-01-01T10:05:00"), 101.0),
            (1, ts("2024-01-01T10:10:00"), 102.0),
            (2, ts("2024-01-01T09:00:00"), 50.0),
            (None, ts("2024-01-01T09:00:00"), -1.0),
        ],
        "key long, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("t1", 1, ts("2024-01-01T10:07:00")),   # between quotes -> 101.0
            ("t2", 1, ts("2024-01-01T10:05:00")),   # exactly at quote -> 101.0
            ("t3", 1, ts("2024-01-01T09:59:00")),   # before all -> NULL
            ("t4", 2, ts("2024-01-01T11:00:00")),   # latest for key 2 -> 50.0
            ("t5", 3, ts("2024-01-01T10:00:00")),   # key never quoted -> NULL
            ("t6", None, ts("2024-01-01T10:00:00")),  # NULL key: kept, no match
        ],
        "trade_id string, key long, tts timestamp",
    )
    return trades, quotes


def test_asof_semantics(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
        right_cols=["px"],
    )
    got = {r["trade_id"]: (r["asof_qts"], r["asof_px"]) for r in out.collect()}
    assert got == {
        "t1": (ts("2024-01-01T10:05:00"), 101.0),
        "t2": (ts("2024-01-01T10:05:00"), 101.0),  # inclusive boundary
        "t3": (None, None),
        "t4": (ts("2024-01-01T09:00:00"), 50.0),
        "t5": (None, None),
        # NULL key matches nothing (SQL equality) but the left row is
        # KEPT — DuckDB ASOF LEFT JOIN retains unmatched left rows.
        "t6": (None, None),
    }
    assert out.columns == ["trade_id", "key", "tts", "asof_qts", "asof_px"]


def test_asof_single_shuffle(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, on=["key"], left_ts="tts", right_ts="qts"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_matches_inequality_join_oracle(spark):
    # brute-force oracle: argmax over the inequality join, on random data
    import random

    rnd = random.Random(7)
    quotes = spark.createDataFrame(
        [
            (rnd.randrange(5), ts("2024-01-01T00:00:00").replace(
                hour=rnd.randrange(24), minute=rnd.randrange(60)), float(i))
            for i in range(60)
        ],
        "key long, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (f"t{i}", rnd.randrange(6), ts("2024-01-01T00:00:00").replace(
                hour=rnd.randrange(24), minute=rnd.randrange(60)))
            for i in range(40)
        ],
        "trade_id string, key long, tts timestamp",
    )
    got = {
        r["trade_id"]: r["asof_qts"]
        for r in asof_join(
            trades, quotes, on=["key"], left_ts="tts", right_ts="qts"
        ).collect()
    }
    oracle = {
        r["trade_id"]: r["best"]
        for r in trades.alias("t")
        .join(
            quotes.alias("q"),
            (F.col("t.key") == F.col("q.key"))
            & (F.col("q.qts") <= F.col("t.tts")),
            "left",
        )
        .groupBy("t.trade_id")
        .agg(F.max("q.qts").alias("best"))
        .collect()
    }
    assert got == oracle
