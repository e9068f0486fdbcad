"""Sink/materialization-mode tests (Sql.selectAs / insertIntoSql
semantics)."""

from __future__ import annotations

import pytest

from haplorec_spark.warehouse import (
    create_table_from,
    insert_into,
    materialize,
    table_columns,
)
from tests.conftest import rows


@pytest.fixture()
def base(spark):
    # saveAsTable writes under the session's static warehouse dir
    # (spark-warehouse/ in cwd, gitignored); tables are dropped per test.
    return spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )


def test_ctas_and_schema_only(spark, base):
    create_table_from(base, "t_ctas")
    assert rows(spark.table("t_ctas")) == [(1, "a"), (2, "b")]
    create_table_from(base, "t_empty", schema_only=True)
    assert spark.table("t_empty").columns == ["id", "v"]
    assert spark.table("t_empty").count() == 0
    spark.sql("DROP TABLE t_ctas")
    spark.sql("DROP TABLE t_empty")


def test_insert_into_duplicate_policies(spark, base):
    create_table_from(base, "t_ins")
    inc = spark.createDataFrame(
        [(2, "B"), (3, "c")], "id long, v string"
    )
    insert_into(spark, inc, "t_ins", on_duplicate="discard", key=["id"])
    assert rows(spark.table("t_ins")) == [(1, "a"), (2, "b"), (3, "c")]
    insert_into(spark, inc, "t_ins", on_duplicate="update", key=["id"])
    assert rows(spark.table("t_ins")) == [(1, "a"), (2, "B"), (3, "c")]
    insert_into(
        spark,
        spark.createDataFrame([(4, "d")], "id long, v string"),
        "t_ins",
    )
    assert rows(spark.table("t_ins")) == [
        (1, "a"), (2, "B"), (3, "c"), (4, "d")
    ]
    spark.sql("DROP TABLE t_ins")


def test_materialize_modes(spark, base, tmp_path):
    assert materialize(base) is base
    assert sorted(tuple(r) for r in materialize(base, as_="rows")) == [
        (1, "a"), (2, "b")
    ]
    assert sorted(tuple(r) for r in materialize(base, as_="iterator")) == [
        (1, "a"), (2, "b")
    ]
    materialize(base, as_="path", path=str(tmp_path / "p"))
    assert rows(spark.read.parquet(str(tmp_path / "p"))) == [
        (1, "a"), (2, "b")
    ]


def test_table_columns_metadata(spark, base):
    create_table_from(base, "job_patient_variant_like")
    meta = table_columns(spark, "job_patient_variant_like")
    assert meta["columns"] == ["id", "v"]
    spark.sql("DROP TABLE job_patient_variant_like")
