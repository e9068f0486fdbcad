"""bench.py --compare: host-normalized regression detection.

No Spark needed — compare_runs is pure arithmetic. The synthetic
cases pin the design claims: a uniform host slowdown flags NOTHING,
a real per-query regression is flagged through host swing in either
direction, and the small-query jitter guard holds.
"""

from __future__ import annotations

import json

from bench import compare_runs, load_bench_json


def test_uniform_host_slowdown_flags_nothing():
    prev = {f"q{i}": 1.0 + i * 0.1 for i in range(20)}
    cur = {q: t * 1.8 for q, t in prev.items()}  # host 1.8x slower
    out = compare_runs(cur, prev)
    assert out["median_ratio"] == 1.8
    assert out["normalized_regressions"] == []
    assert out["normalized_improvements"] == []


def test_synthetic_regression_detected_through_host_swing():
    prev = {f"q{i}": 2.0 for i in range(21)}
    cur = {q: t * 0.7 for q, t in prev.items()}  # host 30% FASTER
    cur["q7"] = prev["q7"] * 0.7 * 2.5  # ...but q7 regressed 2.5x
    out = compare_runs(cur, prev)
    assert out["median_ratio"] == 0.7
    names = [e["query"] for e in out["normalized_regressions"]]
    assert names == ["q7"]
    (e,) = out["normalized_regressions"]
    assert e["normalized_ratio"] == 2.5


def test_improvement_detected_and_small_queries_ignored():
    prev = {f"q{i}": 2.0 for i in range(21)}
    prev["tiny"] = 0.05
    cur = dict(prev)
    cur["q3"] = 0.8          # real 2.5x improvement
    cur["tiny"] = 0.02       # huge ratio, sub-threshold delta
    out = compare_runs(cur, prev)
    assert [e["query"] for e in out["normalized_improvements"]] == ["q3"]
    assert all(
        e["query"] != "tiny"
        for e in out["normalized_regressions"]
        + out["normalized_improvements"]
    )


def test_new_and_removed_queries_reported():
    out = compare_runs({"a": 1.0, "b": 1.0}, {"a": 1.0, "c": 2.0})
    assert out["new_queries"] == ["b"]
    assert out["removed_queries"] == ["c"]


def test_load_bench_json_accepts_driver_wrappers(tmp_path):
    bench = {"queries": {"q1": 1.0}, "value": 1.0}
    direct = tmp_path / "direct.json"
    direct.write_text(json.dumps(bench))
    assert load_bench_json(str(direct))["queries"] == {"q1": 1.0}

    wrapped = tmp_path / "wrapped.json"
    wrapped.write_text(json.dumps({"parsed": bench}))
    assert load_bench_json(str(wrapped))["queries"] == {"q1": 1.0}

    # the BENCH_r07-style wrapper: parsed null, JSON line in the tail
    tail = tmp_path / "tail.json"
    tail.write_text(json.dumps(
        {"parsed": None, "tail": "noise\n" + json.dumps(bench) + "\n"}
    ))
    assert load_bench_json(str(tail))["queries"] == {"q1": 1.0}
