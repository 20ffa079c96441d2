"""Bucketed edge store: shuffle-free joins for repeated graph jobs.

At 100 TB the dominant fixed cost of every iterative job is the initial
repartition of the edge table onto its join key. Writing the edge table
ONCE as a bucketed table (hash-bucketed by src, Spark bucketBy) amortizes
that shuffle across every subsequent run: a scan of a bucketed table
reports outputPartitioning = hashpartitioning(src, buckets), so
edges ⋈ ranks on src needs no edge-side exchange in ANY job, ever —
co-location comes from the storage layout, not a per-run shuffle.

This is the storage-side counterpart of pagerank's in-session
`repartition(P, "src").persist()`: persist() amortizes within one session,
bucketing amortizes across sessions/jobs. (Bucketed tables need the
session catalog — bucketBy only works with saveAsTable.)

Plan contract (asserted in tests/test_edgestore.py): the bucketed scan
shows `Bucketed: true` and a join against it on src has NO Exchange on
the edge side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    num_buckets: int,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist edges(src, dst) hash-bucketed by src (sorted by src, dst
    within buckets — sorted buckets also skip the sort of a sort-merge
    join). `path` makes it an external table at that location (otherwise
    the session warehouse dir).

    Note Spark only *reads* bucketed when an operator exploits it: a plain
    scan reports `Bucketed: false (disabled by query planner)` on purpose
    (bucketed reading caps scan parallelism at the bucket count)."""
    w = edges.select("src", "dst").write.mode(mode)
    if path is not None:
        w = w.option("path", path)
    (
        w.bucketBy(num_buckets, "src")
        .sortBy("src", "dst")
        .format("parquet")
        .saveAsTable(table)
    )


def append_bucketed_edges(edges: DataFrame, table: str, num_buckets: int) -> None:
    """Incremental maintenance: append a new edge drop INTO the bucket
    layout (saveAsTable append validates the spec matches, so every file
    in the table stays bucket-consistent — insertInto would silently write
    unbucketed files and corrupt the layout). Duplicates across drops are
    allowed; dedupe on read stays shuffle-free (see read_bucketed_edges)."""
    (
        edges.select("src", "dst")
        .write.mode("append")
        .bucketBy(num_buckets, "src")
        .sortBy("src", "dst")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_edges(spark: SparkSession, table: str, dedupe: bool = False) -> DataFrame:
    """dedupe=True collapses duplicate (src, dst) rows from overlapping
    appended drops — WITHOUT a shuffle: HashPartitioning(src) from the
    bucket layout satisfies ClusteredDistribution(src, dst), so the
    distinct aggregates in place (plan-asserted in test_edgestore.py)."""
    df = spark.table(table).select("src", "dst")
    return df.distinct() if dedupe else df


def degrees_from_store(spark: SparkSession, table: str) -> DataFrame:
    """Out-degrees straight off the bucketed layout: the groupBy(src)
    aggregates within buckets — zero shuffle."""
    return (
        read_bucketed_edges(spark, table)
        .groupBy("src")
        .agg(F.count("*").alias("outdeg"))
    )
