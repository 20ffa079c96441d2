"""Maximal matching + matching-based graph coarsening.

Distributed greedy maximal matching with deterministic hash priorities
(the Israeli-Itai symmetry-breaking idea in the engine's md5 idiom, the
mis.py sibling for EDGES): each round assigns every surviving edge the
priority md5("salt|round|u|v"), an edge joins the matching iff it is the
minimum-priority incident edge of BOTH endpoints, matched vertices leave
the graph, repeat. The globally-minimum surviving edge always matches,
so every round makes progress and the result is a maximal (not maximum —
greedy 1/2-approximation) matching, a pure function of (graph, salt).

Matching is the standard coarsening step of multilevel graph algorithms
(METIS-style partitioning, multilevel community detection, graph-drawing
pipelines): contract each matched pair into a super-vertex and recurse
on the ~half-size graph. `coarsen_graph` performs one contraction level
(super-vertex id = min of the pair, the engine-wide canonical-id rule).

Plan shape per round: priorities are pure JVM expressions over the
surviving edge set; the per-vertex minimum is ONE partial-combined
aggregate over the 2|E| incident list (min(struct) — the labelprop
tie-break discipline, hub-safe because partial aggregation caps map
output at one row per vertex per map task); the both-endpoints check is
two co-partitioned joins at matched-candidate scale; survivors shrink
geometrically (each round removes >= the matched vertex set). The edge
set is re-persisted partitioned on u each round at survivor scale, and
lineage is truncated per round.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.plans.metrics import JobMetrics, SuperstepMetric


@dataclass
class MatchingResult:
    matches: DataFrame  # (u, v) with u < v — the matched pairs
    rounds: int
    converged: bool     # True iff the surviving edge set emptied
    metrics: JobMetrics = field(default_factory=lambda: JobMetrics("matching"))


def maximal_matching(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 50,
    salt: str = "mm",
    num_partitions: int | None = None,
) -> MatchingResult:
    """edges(src, dst) treated undirected → deterministic greedy maximal
    matching (u, v). Every vertex appears in at most one output pair."""
    import time

    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    active = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .repartition(P, "u")
        .localCheckpoint(eager=True)
    )
    matches: DataFrame | None = None
    new_ms: list[DataFrame] = []  # per-round checkpoints, released at end
    metrics = JobMetrics("matching")
    rounds, converged = 0, False
    for r in range(1, max_rounds + 1):
        t0 = time.monotonic()
        n_act = active.count()
        if n_act == 0:
            converged = True
            break
        pri = active.select(
            "u", "v",
            F.md5(
                F.concat_ws(
                    "|", F.lit(salt), F.lit(str(r)),
                    F.col("u").cast("string"), F.col("v").cast("string"),
                ).cast("binary")
            ).alias("p"),
        )
        inc = pri.select(F.col("u").alias("x"), "p", "u", "v").unionByName(
            pri.select(F.col("v").alias("x"), "p", "u", "v")
        )
        best = (
            inc.groupBy("x")
            .agg(F.min(F.struct("p", "u", "v")).alias("b"))
            .select("x", F.col("b.p").alias("bp"),
                    F.col("b.u").alias("bu"), F.col("b.v").alias("bv"))
        )
        bu = best.select(F.col("x").alias("u"), F.col("bp").alias("_pu"),
                         F.col("bu").alias("_uu"), F.col("bv").alias("_uv"))
        bv = best.select(F.col("x").alias("v"), F.col("bp").alias("_pv"),
                         F.col("bu").alias("_vu"), F.col("bv").alias("_vv"))
        new_m = (
            pri.join(bu, "u").join(bv, "v")
            .where(
                (F.col("p") == F.col("_pu")) & (F.col("u") == F.col("_uu"))
                & (F.col("v") == F.col("_uv"))
                & (F.col("p") == F.col("_pv")) & (F.col("u") == F.col("_vu"))
                & (F.col("v") == F.col("_vv"))
            )
            .select("u", "v")
            # lazy (r6): the count below materializes in the same job
            .localCheckpoint(eager=False)
        )
        n_new = new_m.count()
        matched_verts = (
            new_m.select(F.col("u").alias("id"))
            .unionByName(new_m.select(F.col("v").alias("id")))
        )
        new_active = (
            active.join(matched_verts.withColumnRenamed("id", "u"), "u", "left_anti")
            .join(matched_verts.withColumnRenamed("id", "v"), "v", "left_anti")
            .select("u", "v")
            .repartition(P, "u")
            .localCheckpoint(eager=True)
        )
        matches = new_m if matches is None else matches.unionByName(new_m)
        new_ms.append(new_m)
        # the superseded E-scale active checkpoint is never probed again —
        # release it now (ADVICE r5: a max_rounds=50 run otherwise pinned
        # up to ~100 cached tables for the session; the mis.py/kcore idiom)
        active.unpersist()
        active = new_active
        rounds = r
        # engine convention (metrics.py): edges = rows processed this
        # superstep, delta = new rows — review r5 found these swapped,
        # which skewed cross-operator edges_per_sec comparisons
        metrics.add(SuperstepMetric(r, (time.monotonic() - t0) * 1000.0,
                                    n_act, float(n_new)))
    if matches is None:
        matches = spark.createDataFrame([], "u long, v long")
    out = matches.localCheckpoint(eager=True)
    # the final checkpoint copied every per-round new_m — release them and
    # the last (possibly empty) active table (ADVICE r5)
    active.unpersist()
    for df in new_ms:
        df.unpersist()
    return MatchingResult(out, rounds, converged, metrics)


def coarsen_graph(edges: DataFrame, matches: DataFrame) -> DataFrame:
    """One contraction level: map each matched pair to the super-vertex
    min(u, v), unmatched vertices map to themselves; returns the distinct
    contracted edge set (cu, cv) with cu < cv, self-loops dropped. The
    half of a multilevel V-cycle that halves the graph."""
    vmap = matches.select(
        F.col("u").alias("id"), F.col("u").alias("cid")
    ).unionByName(matches.select(F.col("v").alias("id"), F.col("u").alias("cid")))
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mapped = (
        und.join(vmap.withColumnRenamed("id", "u").withColumnRenamed("cid", "_cu"),
                 "u", "left")
        .join(vmap.withColumnRenamed("id", "v").withColumnRenamed("cid", "_cv"),
              "v", "left")
        .select(
            F.coalesce("_cu", F.col("u")).alias("a"),
            F.coalesce("_cv", F.col("v")).alias("b"),
        )
    )
    return (
        mapped.select(F.least("a", "b").alias("cu"), F.greatest("a", "b").alias("cv"))
        .where(F.col("cu") != F.col("cv"))
        .distinct()
    )
