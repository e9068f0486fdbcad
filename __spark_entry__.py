"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated from the engine's query
registry (haplorec_spark.queries): every implemented operator from
SURVEY.md §2 — plus the training-data operators (dedup, similarity
search, text analysis) — registers a Spark DataFrame program and, where
SQL-expressible, an exact DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from haplorec_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the signature relational-division operator at sf0.001.

    Suppliers whose shipped-brand set covers every brand of a part type
    — the same set-containment join that drives the reference's
    genotype→drug-recommendation stage (Sql.groovy:103-228).
    """
    q = registry()["q_division_subset"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.sql for name, q in registry().items() if q.sql is not None
    }
