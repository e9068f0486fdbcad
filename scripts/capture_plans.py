"""Dump .explain("formatted") for every registered query to plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt where <suffix> comes from
--suffix (default: the tag's own suffix convention, "before"/"after").
Planning only — nothing is executed, so this is cheap and safe to run
alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from haplorec_spark.queries import registry
from haplorec_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = "before"
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    tag = args[0] if args else "r12"
    only = set(args[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="haplorec_spark_plan_capture",
        master="local[4]",
        shuffle_partitions=8,
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, q in sorted(registry().items()):
        if only and name not in only:
            continue
        df = q.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
