"""Minimal-unique-key discovery goldens
(/root/reference/test/python/matrix_row_keys_test.py)."""

from __future__ import annotations

from haplorec_spark.matrix import (
    build_matrices,
    gene_matrix_row_keys,
    matrix_row_keys,
)


def cols(n):
    return [f"x{i}" for i in range(1, n + 1)]


def rows_(n):
    return [f"y{i}" for i in range(1, n + 1)]


def test_basic_1x1():
    assert matrix_row_keys(cols(1), rows_(1), [[1]]) == {
        "y1": {frozenset({("x1", 1)})},
    }


def test_single_keys():
    got = matrix_row_keys(cols(4), rows_(5), [
        [1, 2, 3, 4],
        [2, 2, 3, 4],
        [1, 2, 3, 5],
        [2, 2, 3, 5],
        [2, 3, 3, 5],
    ])
    assert got == {
        "y1": {frozenset({("x1", 1), ("x4", 4)})},
        "y2": {frozenset({("x1", 2), ("x4", 4)})},
        "y3": {frozenset({("x1", 1), ("x4", 5)})},
        "y4": {frozenset({("x1", 2), ("x2", 2), ("x4", 5)})},
        "y5": {frozenset({("x2", 3)})},
    }


def test_multiple_keys():
    got = matrix_row_keys(cols(4), rows_(3), [
        [1, 2, 1, 2],
        [1, 2, 3, 4],
        [3, 4, 1, 2],
    ])
    assert got == {
        "y1": {
            frozenset({("x1", 1), ("x3", 1)}),
            frozenset({("x2", 2), ("x4", 2)}),
            frozenset({("x2", 2), ("x3", 1)}),
            frozenset({("x1", 1), ("x4", 2)}),
        },
        "y2": {frozenset({("x3", 3)}), frozenset({("x4", 4)})},
        "y3": {frozenset({("x1", 3)}), frozenset({("x2", 4)})},
    }


def test_mutually_exclusive_keys():
    got = matrix_row_keys(cols(3), rows_(3), [
        [1, 1, 1],
        [2, 1, 2],
        [3, 3, 1],
    ])
    assert got == {
        "y1": {frozenset({("x1", 1)}),
               frozenset({("x2", 1), ("x3", 1)})},
        "y2": {frozenset({("x1", 2)}), frozenset({("x3", 2)})},
        "y3": {frozenset({("x1", 3)}), frozenset({("x2", 3)})},
    }


def test_gene_matrix_wrapper():
    m = build_matrices([
        ("g1", "*1", "rs1", "A"), ("g1", "*1", "rs2", "G"),
        ("g1", "*2", "rs1", "C"), ("g1", "*2", "rs2", "G"),
    ])["g1"]
    keys = gene_matrix_row_keys(m)
    assert keys == {
        "*1": {frozenset({("rs1", "A")})},
        "*2": {frozenset({("rs1", "C")})},
    }
