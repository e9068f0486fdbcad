"""Interleaved A/B of selected queries between two source trees.

Usage:
  python scripts/ab_compare.py TREE_A TREE_B ROUNDS query [query ...]

Each round launches one fresh subprocess per tree (alternating order so
host drift cancels), which builds a new Spark session, warms each query
once, then times 3 steady noop-sink passes and prints per-query medians
as JSON. The parent aggregates the per-round medians and reports the
cross-round median per tree. Fresh subprocesses per round keep codegen
caches, JIT state, and block-manager contents from leaking between
trees — the methodology every optimization claim this round rides on
(two full-bench runs hours apart measure host load, not code).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
from haplorec_spark.queries import registry
from haplorec_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = sys.argv[2:]
spark = get_spark(
    app_name="ab_compare",
    extra_confs={
        "spark.sql.codegen.cache.maxEntries": "5000",
        "spark.ui.enabled": "false",
        "spark.sql.ui.retainedExecutions": "5",
    },
)
spark.sparkContext.setLogLevel("ERROR")
reg = registry()
out = {}
for name in names:
    q = reg[name]
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    out[name] = sorted(ts)[1]
print("ABRESULT " + json.dumps(out))
"""


def run_tree(tree: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    # The tree under test must be importable in the PYTHON WORKERS too
    # (grouped Arrow/pandas kernels pickle module functions by
    # reference); the env var reaches the pyspark.daemon the local-mode
    # JVM forks, where the driver-side sys.path insert does not.
    env["PYTHONPATH"] = tree
    p = subprocess.run(
        [sys.executable, "-c", CHILD, tree, *names],
        capture_output=True, text=True, env=env, cwd="/tmp",
    )
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"tree {tree} produced no result:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    tree_a, tree_b, rounds_s, *names = sys.argv[1:]
    rounds = int(rounds_s)
    acc: dict[str, dict[str, list[float]]] = {
        "A": {n: [] for n in names}, "B": {n: [] for n in names}
    }
    for r in range(rounds):
        order = [("A", tree_a), ("B", tree_b)]
        if r % 2:
            order.reverse()
        for label, tree in order:
            res = run_tree(tree, names)
            for n, v in res.items():
                acc[label][n].append(v)
            print(f"round {r} {label} ({tree}): "
                  + " ".join(f"{n}={v:.3f}" for n, v in res.items()),
                  flush=True)
    summary = {}
    for n in names:
        ma = statistics.median(acc["A"][n])
        mb = statistics.median(acc["B"][n])
        summary[n] = {
            "A_median": round(ma, 3),
            "B_median": round(mb, 3),
            "B_over_A": round(mb / ma, 3) if ma else None,
            "A_all": [round(x, 3) for x in acc["A"][n]],
            "B_all": [round(x, 3) for x in acc["B"][n]],
        }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
