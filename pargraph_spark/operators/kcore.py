"""k-core decomposition (fixed k): iterative peel until fixpoint.

The k-core of a graph is the maximal subgraph where every vertex has
degree ≥ k (undirected) — the standard link-graph density/robustness
primitive (spam-farm and community-core detection on web graphs). The
peel is the classic fixpoint: repeatedly delete vertices of degree < k;
what survives is exactly the k-core, independent of deletion order, so
the result is deterministic and an unrolled round-by-round SQL oracle is
exact (rounds past convergence are identity, the lpa_full pattern).

Plan shape per round (the iterative-operator discipline shared with
pagerank/labelprop/bfs): the symmetrized edge table lives partitioned on
the probe key and is FILTERED each round by anti-joins against the
round's peeled set — co-partitioned on the u side, AQE-broadcast on the
v side once peeling localizes (after round 1 the peeled set is small);
degrees are one partial-combined aggregate; the loop localCheckpoints
the surviving edge set to truncate lineage
(ref-count-release analogue, /root/reference/pargraph/engine/
engine.py:63-76). At 10^12 edges the peel typically converges in tens of
rounds and every round's shuffle is bounded by the CURRENT survivor set,
which only shrinks.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.plans.metrics import JobMetrics, SuperstepMetric


@dataclass
class KCoreResult:
    vertices: DataFrame  # (id, deg) — k-core members with their core degree
    rounds: int
    metrics: JobMetrics = field(default_factory=lambda: JobMetrics("kcore"))


def kcore(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_rounds: int = 100,
    num_partitions: int | None = None,
) -> KCoreResult:
    """edges(src, dst) → the k-core's (id, deg) with deg = degree INSIDE
    the core. Edges are treated as undirected; self-loops and duplicates
    are dropped before peeling."""
    if k < 1:
        raise ValueError(f"kcore requires k >= 1, got {k}")
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    sym = (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .repartition(P, "u")
        .localCheckpoint(eager=True)
    )
    metrics = JobMetrics("kcore")
    rounds = 0
    for r in range(1, max_rounds + 1):
        t0 = time.monotonic()
        deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
        peeled = deg.where(F.col("deg") < k).select("u")
        # Drop edges touching THIS round's peeled vertices (equivalent to
        # keeping the survivors, but the peeled set is the small side after
        # the first round, so AQE turns the anti-joins into broadcasts; the
        # u-side is co-partitioned for free either way — peeled inherits
        # hash(u) from the groupBy, sym is partitioned on u).
        survived = (
            sym.join(peeled, "u", "left_anti")
            .join(peeled.select(F.col("u").alias("v")), "v", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_before = sym.count()
        n_after = survived.count()
        metrics.add(
            SuperstepMetric(r, (time.monotonic() - t0) * 1000.0, n_before,
                            float(n_before - n_after))
        )
        sym = survived
        if n_after == n_before:
            break
        rounds = r
        if n_after == 0:
            break
    core = sym.groupBy(F.col("u").alias("id")).agg(F.count("*").alias("deg"))
    return KCoreResult(core, rounds, metrics)
