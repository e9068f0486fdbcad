"""Ordered pivot tests — semantics from SqlTest.groupedRowsToColumnsTest
(/root/reference/test/groovy/haplorec/test/util/SqlTest.groovy:33-167):
ordering via orderRowsBy, null padding for short groups, bad-group drop.
"""

from __future__ import annotations

from haplorec_spark.operators import grouped_rows_to_columns
from haplorec_spark.operators.pivot import bad_groups
from tests.conftest import rows


def test_pairs_ordered_and_padded(spark):
    df = spark.createDataFrame(
        [
            # group 1: two rows, out of order -> sorted into (2, 3)
            (1, 3), (1, 2),
            # group 2: single row -> (5, null)
            (2, 5),
        ],
        "x int, y int",
    )
    out = grouped_rows_to_columns(
        df, ["x"], {"x": "x", "y": ["y1", "y2"]}, order_rows_by=["y"]
    )
    assert out.columns == ["x", "y1", "y2"]
    assert rows(out) == [(1, 2, 3), (2, 5, None)]


def test_oversize_group_dropped_and_reported(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (2, 9)], "x int, y int"
    )
    cmap = {"x": "x", "y": ["y1", "y2"]}
    out = grouped_rows_to_columns(df, ["x"], cmap, order_rows_by=["y"])
    assert rows(out) == [(2, 9, None)]
    bad = bad_groups(df, ["x"], cmap, order_rows_by=["y"])
    assert [r["x"] for r in bad.collect()] == [1]


def test_singleton_mapping_takes_first_row(spark):
    # non-grouped single-target column takes the value from the group's
    # first row in orderRowsBy order (Sql.groovy:289)
    df = spark.createDataFrame(
        [(1, "b", 20), (1, "a", 10)], "x int, k string, v int"
    )
    out = grouped_rows_to_columns(
        df, ["x"], {"x": "x", "v": "v", "k": ["k1", "k2"]},
        order_rows_by=["k"],
    )
    assert rows(out) == [(1, 10, "a", "b")]


def test_no_order_single_column_group(spark):
    # maxGroupSize defaults to 1 when no list-valued mapping exists:
    # multi-row groups are all "bad" and dropped.
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 7)], "x int, y int")
    out = grouped_rows_to_columns(df, ["x"], {"x": "x", "y": "y"})
    assert rows(out) == [(2, 7)]
