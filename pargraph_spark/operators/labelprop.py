"""O8 — synchronous label propagation with deterministic tie-break.

Semantics (shared with tests/oracles.py::label_propagation_oracle):
- undirected neighborhood (symmetrized edges, self-loops dropped)
- label_0(v) = v
- label_{t+1}(v) = argmax over neighbor labels by count, ties broken by
  MIN label — encoded in ONE aggregate as min(struct(-cnt, label)), so
  the result is partition-order-independent (floating tie-breaks would
  make runs diverge, SURVEY.md §7.2.2)
- isolated vertices keep their own label
- stops when no label changes (or max_iter; synchronous LPA can 2-cycle
  on bipartite structures — max_iter is the documented guard, and the
  oracle applies the identical rule so results stay comparable).

Scale notes: the per-round plan is join(sym-edges, labels) →
groupBy(dst,label).count → groupBy(dst).min(struct) — all three partial-
aggregate map-side; hot (hub) vertices produce at most
num_map_partitions × |distinct neighbor labels| partial rows.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.plans.metrics import JobMetrics, SuperstepMetric


@dataclass
class LabelPropResult:
    labels: DataFrame  # (id: long, label: long)
    iterations: int
    converged: bool
    metrics: JobMetrics = field(default_factory=lambda: JobMetrics("labelprop"))


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 20,
    num_partitions: int | None = None,
) -> LabelPropResult:
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    sym = (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .repartition(P, "v")
        .persist()
    )
    all_vertices = (
        vertices.select("id")
        if vertices is not None
        else edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    ).persist()
    n_sym = sym.count()

    labels = all_vertices.withColumn("label", F.col("id")).localCheckpoint(eager=True)
    metrics = JobMetrics("labelprop")
    converged = False
    it = 0
    while it < max_iter:
        it += 1
        t0 = time.monotonic()
        # message: each vertex u sends its label to neighbor v
        nbr = sym.join(labels, sym["u"] == labels["id"]).select(
            sym["v"].alias("id"), F.col("label")
        )
        counted = nbr.groupBy("id", "label").agg(F.count("*").alias("cnt"))
        best = counted.groupBy("id").agg(
            F.min(F.struct((-F.col("cnt")).alias("negc"), F.col("label").alias("l"))).alias("b")
        ).select("id", F.col("b.l").alias("new_label"))
        new_labels = (
            labels.join(best, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(F.sum(F.col("_chg").cast("long"))).first()[0] or 0
        old = labels
        labels = new_labels.drop("_chg")
        old.unpersist()
        metrics.add(SuperstepMetric(it, (time.monotonic() - t0) * 1000.0, n_sym, float(changed)))
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    all_vertices.unpersist()
    return LabelPropResult(labels, it, converged, metrics)
