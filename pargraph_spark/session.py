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
def no_aqe(spark: SparkSession, shuffle_partitions: int | None = None):
    """Disable adaptive query execution for a superstep loop — and, when
    ``shuffle_partitions`` is given, pin the session's shuffle partition
    count to the operator's P for the loop's duration — restoring both on
    exit. Pinning matters once P is size-derived: groupBy/join exchanges
    inside the loop take their count from the session conf, and a conf
    value ≠ P would make every aggregate output partitioning incompatible
    with the P-partitioned state/edge tables, silently re-exchanging what
    the whole design keeps in place.

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
    skey = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    prev_shuffle = spark.conf.get(skey)
    spark.conf.set(key, "false")
    if shuffle_partitions is not None:
        spark.conf.set(skey, str(int(shuffle_partitions)))
    try:
        yield
    finally:
        spark.conf.set(key, prev)
        spark.conf.set(skey, prev_shuffle)


def size_based_partitions(df, cap: int) -> int:
    """Scale-adaptive partition count for an operator's edge/state tables
    (guide §2.2) — the AQE partition-coalescing rule applied manually,
    because the fixpoint loops run under ``no_aqe`` and pin one P for
    every co-partitioned probe: enough partitions for ~advisory bytes
    each, floored at the session's default parallelism (AQE's
    parallelismFirst semantics — never idle cores to make partitions
    bigger), capped at the caller's ``num_partitions``.

    The size comes from the optimizer's estimate of the INPUT relation
    (parquet file sizes, cache statistics) — no extra job. When the
    estimate is unusable (join-cardinality guesses, LogicalRDD default
    of 2^63) the caller's cap is returned unchanged, so this can only
    REDUCE task-count overhead, never mis-partition real volume.
    Advisory bytes: $SPARK_GRAFT_ADVISORY_BYTES (default 64 MiB, the AQE
    default)."""
    import math

    spark = df.sparkSession
    adv = int(os.environ.get("SPARK_GRAFT_ADVISORY_BYTES", str(64 << 20)))
    floor = max(1, min(cap, spark.sparkContext.defaultParallelism))
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return cap
    if size <= 0 or size >= (1 << 60):  # unknown/unusable estimate
        return cap
    return max(floor, min(cap, math.ceil(size / adv)))


def ckpt_state(df, P: int):
    """Partitioning-preserving eager localCheckpoint for iteration state.

    Materializes under ``no_aqe(P)`` so (a) the produced LogicalRDD
    RECORDS its hash partitioning — the next round's co-partitioned joins
    and aggregations then probe the state in place instead of re-
    exchanging it (see no_aqe) — and (b) every exchange inside this
    materialization uses the operator's P rather than the session's
    shuffle-partition count. Drop-in as ``df.transform(ckpt_state, P)``
    in place of ``df.localCheckpoint(eager=True)``; rows unchanged."""
    with no_aqe(df.sparkSession, P):
        return df.localCheckpoint(eager=True)


def ckpt_state_lazy(df, P: int):
    """``ckpt_state`` with a LAZY checkpoint (r6): for call sites that run
    a full-scan action (count / aggregate over every partition) on the
    result immediately afterwards — that action materializes the blocks in
    the SAME Spark job, halving the per-round job count. The partitioning
    is recorded at this call exactly as in ``ckpt_state`` (the physical
    plan is fixed here, not at materialization). Caller contract: the
    follow-up action must scan every partition (no limit/isEmpty — a
    partial first job breaks localCheckpoint's truncate-on-first-job
    semantics) and must run BEFORE any input of ``df`` is unpersisted."""
    with no_aqe(df.sparkSession, P):
        return df.localCheckpoint(eager=False)


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
