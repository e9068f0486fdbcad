"""Dependency DAG orchestrator tests — semantics from DependencyTest
(/root/reference/test/groovy/haplorec/test/util/dependency/DependencyTest.groovy):
post-order build, memoization across targets, cycle detection."""

from __future__ import annotations

import pytest

from haplorec_spark.plans.dependency import (
    DependencyCycleError,
    DependencyGraph,
)


def linear_graph(order):
    g = DependencyGraph()
    g.add("a", lambda: order.append("a"))
    g.add("b", lambda: order.append("b"), ["a"])
    g.add("c", lambda: order.append("c"), ["b"])
    g.add("d", lambda: order.append("d"), ["b"])
    return g


def test_post_order_build():
    order = []
    g = linear_graph(order)
    g.build("c")
    assert order == ["a", "b", "c"]


def test_memoized_across_targets():
    order = []
    g = linear_graph(order)
    g.build_all(["c", "d"])
    assert order == ["a", "b", "c", "d"]


def test_seeded_target_skips_subtree():
    order = []
    g = linear_graph(order)
    g.build("d", built={"b"})
    assert order == ["d"]


def test_cycle_detection():
    g = DependencyGraph()
    g.add("a", None, ["b"])
    g.add("b", None, ["a"])
    with pytest.raises(DependencyCycleError):
        g.build("a")


def test_leaf_dependants():
    g = linear_graph([])
    assert sorted(g.leaf_dependants("a")) == ["c", "d"]


def test_hooks_and_failure():
    seen = []
    g = DependencyGraph()
    g.add("a", lambda: seen.append("run-a"))

    def boom():
        raise RuntimeError("boom")

    g.add("b", boom, ["a"])
    g.before_build = lambda t: seen.append(f"before-{t}")
    g.on_fail = lambda t, e: seen.append(f"fail-{t}")
    with pytest.raises(RuntimeError):
        g.build("b")
    assert seen == ["before-a", "run-a", "before-b", "fail-b"]
