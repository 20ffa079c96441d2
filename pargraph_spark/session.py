"""SparkSession factory with scale-oriented defaults.

The reference picks its parallelism by swapping process-pool backends
(/root/reference/pargraph/engine/engine.py:22-40); here the analogue is the
master URL + shuffle partitioning, and everything else (DAG scheduling,
culling, fusion) is Catalyst's job.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def no_aqe(spark: SparkSession):
    """Disable adaptive query execution for a superstep loop, restoring
    the previous setting on exit.

    Why (r6, guide §2.4 — remove shuffles outright): ``localCheckpoint``
    records the materialized plan's outputPartitioning into its
    LogicalRDD, so a checkpointed state table partitioned on its key is
    probed IN PLACE by the next superstep's co-partitioned joins and
    aggregations. Under AQE the physical plan is an AdaptiveSparkPlan
    whose partitioning is reported as Unknown at checkpoint time, and
    every superstep silently re-exchanges the full state (measured: 2
    extra V-scale Exchanges per PageRank superstep, the same for every
    other fixpoint operator). Inside a superstep the plans are small and
    fixed-shape — partition counts are pinned to P by the operator, hub
    skew is absorbed by partial (map-side) aggregation — so AQE's runtime
    re-planning buys nothing there; it stays on for everything outside
    the loops (scans, one-shot queries, candidate joins)."""
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def default_cores() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = "pargraph-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for partition-parallel graph jobs.

    - AQE on (runtime coalesce + skew-join mitigation at scale).
    - Arrow on for every pandas/Arrow UDF crossing.
    - ``spark.sql.shuffle.partitions`` scales with cores (2x) unless pinned:
      supersteps are shuffle-bound, so partition count tracks parallelism.
    """
    cores = cores or default_cores()
    shuffle = shuffle_partitions or max(8, 2 * cores)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # localCheckpoint blocks are reclaimed by ContextCleaner only after a
        # JVM GC notices the dropped references; default periodicGC is 30min,
        # far too lazy for iterative jobs that retire a state DF per superstep
        .config("spark.cleaner.periodicGC.interval", "45s")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
