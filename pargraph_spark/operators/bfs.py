"""Breadth-first distances from a seed set (k-hop neighborhoods).

The frontier-expansion pattern every link-graph engine needs (crawl-depth
analysis, neighborhood extraction, reachability): each round joins the
CURRENT frontier (small) against the once-partitioned edge table and
anti-joins the visited set — per round only frontier-sized id rows
shuffle, never the edge payload, and the edge side is probed in place
(pre-partitioned on the join key, same discipline as labelprop.py).

Unvisited vertices are absent from the output (not NULL/∞ rows): at web
scale most of the graph is outside a k-hop ball and materializing it
would dwarf the answer.

Determinism: distances are well-defined (min hops); no tie-breaks exist.
Rounds localCheckpoint to truncate lineage (ref-count-release analogue,
/root/reference/pargraph/engine/engine.py:63-76).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.session import ckpt_state, ckpt_state_lazy, size_based_partitions

from pargraph_spark.plans.metrics import JobMetrics, SuperstepMetric


@dataclass
class BfsResult:
    distances: DataFrame  # (id, dist int) — reached vertices only
    hops: int             # rounds actually expanded
    exhausted: bool       # True if the frontier emptied before max_hops
    metrics: JobMetrics = field(default_factory=lambda: JobMetrics("bfs"))


def bfs_distances(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 10,
    symmetric: bool = True,
    num_partitions: int | None = None,
) -> BfsResult:
    """edges(src,dst) + sources(id) → (id, dist ≤ max_hops).

    symmetric=True treats edges as undirected (the link-graph default);
    False follows src→dst direction only."""
    import time

    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    P = size_based_partitions(edges, P)  # guide §2.2, size-derived cap
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    adj = (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        if symmetric
        else fwd
    )
    adj = (
        adj.where(F.col("u") != F.col("v"))
        .distinct()
        .repartition(P, "u")
        .persist()
    )
    n_adj = adj.count()

    dist = (
        sources.select("id").distinct()
        .withColumn("dist", F.lit(0))
        .transform(ckpt_state, P)
    )
    frontier = dist.select("id")
    metrics = JobMetrics("bfs")
    hops, exhausted = 0, False
    for h in range(1, max_hops + 1):
        t0 = time.monotonic()
        nxt = (
            adj.join(frontier, adj["u"] == frontier["id"])
            .select(adj["v"].alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .withColumn("dist", F.lit(h))
            .transform(ckpt_state_lazy, P)  # materialized by the count below
        )
        n_new = nxt.count()
        metrics.add(SuperstepMetric(h, (time.monotonic() - t0) * 1000.0, n_adj, float(n_new)))
        if n_new == 0:
            exhausted = True
            break
        hops = h
        old = dist
        dist = dist.unionByName(nxt).transform(ckpt_state, P)
        old.unpersist()
        frontier = nxt.select("id")
    adj.unpersist()
    return BfsResult(dist, hops, exhausted, metrics)


@dataclass
class DiameterEstimate:
    lower_bound: int      # the double-sweep eccentricity (exact on trees)
    sweep1_far: int       # farthest vertex found by sweep 1 (the re-seed)
    n_reached: int        # vertices in the start vertex's component
    distances: DataFrame  # (id, dist) from the second sweep


def diameter_2sweep(
    spark: SparkSession,
    edges: DataFrame,
    start_id: int | None = None,
    max_hops: int = 64,
    num_partitions: int | None = None,
) -> DiameterEstimate:
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib 2009 —
    the standard cheap diameter estimator): BFS from an arbitrary start,
    re-seed from the farthest vertex found, and the second sweep's
    eccentricity lower-bounds the true diameter (exact on trees, within
    a small additive error on most real graphs). Two full BFS runs —
    2·diameter frontier rounds, each touching only frontier-sized rows.

    Determinism: the start defaults to the MINIMUM vertex id and the
    farthest-vertex re-seed tie-breaks on min id, so the estimate is a
    pure function of the graph. Covers the start vertex's component
    (web-graph usage: run on the giant component after
    connected_components)."""
    if start_id is None:
        start_id = edges.select(
            F.least(F.min("src"), F.min("dst")).alias("m")
        ).first()["m"]
        if start_id is None:
            raise ValueError("diameter_2sweep on an empty edge table")
    seeds = spark.createDataFrame([(int(start_id),)], "id long")
    first = bfs_distances(spark, edges, seeds, max_hops=max_hops,
                          num_partitions=num_partitions)
    far = (
        first.distances.orderBy(F.desc("dist"), F.asc("id")).limit(1).first()
    )
    second = bfs_distances(
        spark, edges,
        spark.createDataFrame([(int(far["id"]),)], "id long"),
        max_hops=max_hops,
        num_partitions=num_partitions,
    )
    ecc = second.distances.agg(F.max("dist")).first()[0]
    n = second.distances.count()
    return DiameterEstimate(int(ecc), int(far["id"]), n, second.distances)
