"""Skew/co-location operator tests: salted plans must produce exactly
the unsalted results, and bucketed joins must be shuffle-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from haplorec_spark.operators.scale import (
    read_bucketed,
    salted_aggregate,
    salted_join,
    write_bucketed,
)
from tests.conftest import rows


def _skewed(spark):
    # one hot key (k=0) holding ~90% of rows plus a long tail
    return spark.range(1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 7).alias("x"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    got = salted_aggregate(
        df,
        ["k"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "s": (F.sum("x"), F.sum("s")),
            "mx": (F.max("x"), F.max("mx")),
        },
        salt_buckets=8,
    )
    want = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.max("x").alias("mx"),
    )
    assert rows(got) == rows(want)


def test_salted_join_matches_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [(0, "hot"), (950, "cold")], "k long, label string"
    )
    got = salted_join(fact, dim, ["k"], salt_buckets=4)
    want = fact.join(dim, on="k")
    assert rows(got, "k", "x", "label") == rows(want, "k", "x", "label")
    assert got.count() == 901


def test_bucketed_join_is_shuffle_free(spark):
    left = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "t_bl", ["k"], num_buckets=4)
    write_bucketed(right, "t_br", ["k"], num_buckets=4)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = read_bucketed(spark, "t_bl").join(
                read_bucketed(spark, "t_br"), on="k"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 100
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE t_bl")
        spark.sql("DROP TABLE t_br")
