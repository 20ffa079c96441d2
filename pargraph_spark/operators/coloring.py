"""Distributed greedy graph coloring (Jones-Plassmann rounds).

Jones & Plassmann (1993): fix one random priority per vertex; each round
every UNCOLORED vertex whose priority beats all uncolored neighbors
takes the smallest color absent from its already-colored neighborhood.
With the priorities fixed, the parallel schedule is just a topological
execution of the priority DAG, so the final coloring equals the
SEQUENTIAL greedy coloring in priority order — deterministic, at most
Δ+1 colors, pytest-pinned against that brute-force equivalence.

Priorities here are the mis.py total-order key md5("color|0|id")+id —
each round's winner set is EXACTLY a deterministic-Luby independent-set
selection (local priority minima among undecided vertices), the same
primitive maximal_independent_set iterates; coloring is "Luby rounds,
but winners pick a color and stay instead of deleting their
neighborhood".

Link-graph uses: conflict-free scheduling of vertex-local updates
(recrawl batches where neighbors must not refresh together), register
allocation-style partitioning of overlay maintenance, symmetry breaking
for parallel greedy heuristics.

Plan shape per round: the local-minima test is one aggregate over the
CURRENT uncolored subgraph (min neighbor priority, map-side partial
combine; the subgraph shrinks every round and is probed in place — it
stays partitioned on the aggregate key); the color choice joins winners
against the STATIC symmetric edge table (persisted once, partitioned on
the probe key) and the colored table, then takes the mex of a
collect_set bounded by the number of colors used so far (≤ rounds ≤
Δ+1), never by raw degree — a hub's adjacency reduces map-side to its
distinct neighbor colors. All JVM expressions; the mex is an
F.aggregate fold over the sorted distinct-color array.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.session import ckpt_state, size_based_partitions

from pargraph_spark.operators.edges import symmetrize
from pargraph_spark.operators.mis import _priority
from pargraph_spark.plans.metrics import JobMetrics, SuperstepMetric


@dataclass
class ColoringResult:
    colors: DataFrame  # (id, color) — colored vertices only
    rounds: int
    converged: bool
    metrics: JobMetrics = field(default_factory=lambda: JobMetrics("coloring"))


def _mex(arr):
    """Smallest non-negative int absent from a sorted distinct int array."""
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, x: F.when(x == acc, acc + F.lit(1)).otherwise(acc),
    )


def greedy_coloring(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 200,
    salt: str = "color",
    num_partitions: int | None = None,
    fixed_rounds: int | None = None,
) -> ColoringResult:
    """Deterministic Jones-Plassmann coloring of the undirected graph.

    Converged output is proper (no edge monochromatic), uses ≤ Δ+1
    colors, and equals the sequential greedy coloring in ascending
    md5-priority order. fixed_rounds runs exactly that many rounds with
    no convergence jobs (oracle parity): vertices still uncolored are
    simply absent from `colors`."""
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    P = size_based_partitions(edges, P)  # guide §2.2, size-derived cap
    # static full adjacency for the color-lookup join: persist partitioned
    # on u (probe side keyed by winner id) — retained outputPartitioning,
    # kcore.py:166-175 discipline
    sym_all = symmetrize(edges).repartition(P, "u").persist()
    sym_all.count()
    # shrinking uncolored subgraph for the local-minima test
    usym = sym_all.repartition(P, "v").persist()
    und = (
        sym_all.select(F.col("u").alias("id")).distinct()
        .transform(ckpt_state, P)
    )
    colored: DataFrame | None = None
    metrics = JobMetrics("coloring")
    converged = False
    rounds = 0
    n_rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for r in range(1, n_rounds + 1):
        t0 = time.monotonic()
        pk = und.select("id", _priority(F.col("id"), 0, salt).alias("pk"))
        nbrmin = (
            usym.join(
                pk.select(F.col("id").alias("v"), F.col("pk").alias("_pv")), "v"
            )
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("_pv").alias("_nmin"))
        )
        winners = (
            pk.join(nbrmin, "id", "left")
            .where(F.col("_nmin").isNull() | (F.col("pk") < F.col("_nmin")))
            .select("id")
        )
        if colored is None:
            wcol = winners.withColumn("color", F.lit(0))
        else:
            ncol = (
                sym_all.join(winners.select(F.col("id").alias("u")), "u")
                .join(
                    colored.select(
                        F.col("id").alias("v"), F.col("color").alias("_nc")
                    ),
                    "v",
                )
                .groupBy(F.col("u").alias("id"))
                .agg(F.array_sort(F.collect_set("_nc")).alias("_ncs"))
            )
            wcol = winners.join(ncol, "id", "left").select(
                "id",
                F.coalesce(_mex(F.col("_ncs")), F.lit(0)).alias("color"),
            )
        wcol = wcol.transform(ckpt_state, P)
        if colored is None:
            colored = wcol
        else:
            old_colored = colored
            colored = colored.unionByName(wcol).transform(ckpt_state, P)
            # release the superseded union checkpoint (the landmarks.py
            # growing-union discipline) — review r5: O(V) blocks per
            # round accumulated for the session lifetime otherwise
            old_colored.unpersist()
        new_und = und.join(wcol.select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
        wu = wcol.select(F.col("id").alias("u"))
        wv = wcol.select(F.col("id").alias("v"))
        new_usym = (
            usym.join(wu, "u", "left_anti")
            .join(wv, "v", "left_anti")
            .transform(ckpt_state, P)
        )
        und.unpersist()
        usym.unpersist()
        und, usym = new_und, new_usym
        rounds = r
        metrics.add(
            SuperstepMetric(r, (time.monotonic() - t0) * 1000.0, 0, float("nan"))
        )
        if fixed_rounds is None and und.limit(1).count() == 0:
            converged = True
            break
    sym_all.unpersist()
    if colored is None:
        colored = spark.createDataFrame([], "id long, color int")
    return ColoringResult(
        colored.select("id", F.col("color").cast("int").alias("color")),
        rounds,
        converged,
        metrics,
    )
