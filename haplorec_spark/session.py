"""SparkSession construction with engine defaults.

Defaults are tuned for correctness-at-scale: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), broadcast threshold sized so
the small pharmacogenomic reference tables (≪10 MB) always broadcast,
and Arrow enabled for the few Pandas-UDF kernels.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONFS: dict[str, str] = {
    # Let Catalyst re-plan at runtime: coalesce small shuffle partitions,
    # split skewed ones, demote/promote join strategies.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE re-plan (coalesce/skew-split) INSIDE cached plans too: the
    # default pins a persisted subtree's exchange layout, so the
    # multi-persist operators (bounded star-verification, k-means
    # lineages) ran every post-shuffle stage at the static partition
    # count regardless of data size. Size-adaptive at any scale — the
    # same advisory-size coalescing as uncached plans; measured ~25%
    # off the verified-dedup gate at sf0.1.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # Reference tables (gene_haplotype_variant etc.) are tiny; dims in the
    # TPC-H-ish surface are small at any SF we test. 64 MB keeps them all
    # on the broadcast path without hinting.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow batches for applyInPandas / pandas_udf kernels.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Spark's 200-partition default swamps local multi-stage pipelines in
    # task overhead; 64 + AQE coalescing right-sizes every exchange at
    # runtime. Cluster deployments override per data volume.
    "spark.sql.shuffle.partitions": "64",
    # No ANSI override: the engine must be correct under the Spark 4
    # default (ansi=true, which the driver harness uses) AND under
    # ansi=false. Every operator is written mode-neutral (F.get for
    # positional indexing, no out-of-range element_at, no lossy casts),
    # and the test suite runs with the default.
    "spark.sql.session.timeZone": "UTC",
    # Local-mode driver heap: the driver also hosts all 32 executor
    # threads in local[N], so one JVM holds every shuffle buffer,
    # broadcast, and codegen cache. 4g made long multi-query runs
    # (bench's 50 queries in one session) GC-bound — heavy tail queries
    # measured 3-5x slower than in a fresh session. 16g keeps GC off
    # the critical path on the 128 GiB test hosts. Ignored when a
    # session already exists; overridable per call; cluster deployments
    # set executor memory their own way.
    "spark.driver.memory": "16g",
}


def get_spark(
    app_name: str = "haplorec_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback 32)
    so the same entry point works in the driver harness and in tests. On a
    real cluster, pass ``master=None`` with a pre-configured environment —
    existing sessions are reused untouched.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    confs = dict(ENGINE_CONFS)
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
