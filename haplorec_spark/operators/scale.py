"""Skew and co-location utilities for the 100 TB path.

AQE's skew-join splitting handles most runtime skew; these operators
cover the two cases it cannot:

* :func:`salted_aggregate` — two-phase aggregation for power-law group
  keys (a handful of keys holding most rows): rows first aggregate on
  (key, salt) — spreading each hot key over ``salt_buckets`` reducers —
  then the per-salt partials combine on the key alone. Count/sum/min/max
  compose exactly; avg must be derived as sum/count by the caller.
* :func:`salted_join` — fact-to-dimension equi-join where a *dimension*
  is too big to broadcast and the fact side's join key is skewed: the
  fact side gets a random salt in [0, n), the dimension side explodes
  n ways, and the join runs on (key, salt) — each hot key's rows spread
  over n tasks. Row multiplicity is unchanged (every fact row matches
  exactly its original dimension partners).
* :func:`write_bucketed` / :func:`read_bucketed` — persist both sides of
  a recurring join bucketed + sorted on the join key so the join is
  shuffle-free (SortMergeJoin with no Exchange). The reference got the
  same effect from B-tree indexes on every join column
  (haplorec.sql.jinja index DDL; SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _uniform_salt(salt_buckets: int) -> Column:
    """Salt independent of row content.

    Hashing the row's own columns would send fully-identical duplicate
    rows (a common real source of key skew) to the SAME bucket,
    defeating the spread entirely. The salt only needs to distribute
    rows — correctness of both salted operators holds for ANY salt
    assignment — so derive it from the row's physical position
    (partition-unique ids), which spreads duplicates uniformly and is
    deterministic within a run.
    """
    return F.pmod(
        F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)
    )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (partial_agg_expr, combine_agg_expr),
    e.g. ``{"n": (F.count(F.lit(1)), F.sum("n")), "s": (F.sum("x"),
    F.sum("s"))}`` — the partial runs per (keys, salt), the combiner per
    keys over the partials' column.
    """
    salted = df.withColumn("_salt", _uniform_salt(salt_buckets))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[comb.alias(name) for name, (_, comb) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    *,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-spreading equi-join: fact rows take a content-independent
    salt (see :func:`_uniform_salt`); the dimension replicates across
    all salts; the join keys become (on..., salt)."""
    fact_s = fact.withColumn("_salt", _uniform_salt(salt_buckets))
    spark = dim.sparkSession
    salts = spark.range(salt_buckets).select(
        F.col("id").cast("bigint").alias("_salt")
    )
    dim_s = dim.crossJoin(F.broadcast(salts))
    out = fact_s.join(dim_s, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    *,
    mode: str = "overwrite",
) -> None:
    """Persist bucketed + sorted on the join key: co-located joins
    between tables bucketed the same way need no shuffle."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(name)
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
