"""O9 — exact triangle counting, global + per-vertex.

Degree-ordered edge orientation (the standard compact-forward /
MapReduce "node-iterator++" scheme): direct each undirected edge from the
endpoint with smaller (degree, id) to the larger, so every wedge is
enumerated exactly once at its lowest-degree apex — this bounds the
self-join fan-out by Σ d_i^{O(1.5)} instead of Σ d_i², which is what makes
hub-heavy (Zipf) web graphs tractable: a degree-10^6 hub is never an apex.

Plan shape: two shuffles (wedge self-join on apex, closing semi-join on
(lo,hi)), then pure aggregation. Everything JVM-side, no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.operators.edges import canonical_undirected
from pargraph_spark.plans.metrics import JobMetrics, SuperstepMetric


@dataclass
class TriangleResult:
    total: int
    per_vertex: DataFrame  # (id: long, tri: long) — vertices in ≥1 triangle


def _oriented(edges: DataFrame) -> DataFrame:
    """(lo → hi) by (undirected degree, id) ordering; columns (s, t)."""
    und = canonical_undirected(edges)  # (a < b), distinct
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    j = und.join(da, "a").join(db, "b")
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    return j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("t"),
        F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias("degt"),
    )


def triangle_triples(edges: DataFrame) -> DataFrame:
    """(s, x, y) — every triangle exactly once, vertices in (deg,id) order."""
    o = _oriented(edges)
    e1 = o.select(F.col("s"), F.col("t").alias("x"), F.col("degt").alias("degx"))
    e2 = o.select(F.col("s"), F.col("t").alias("y"), F.col("degt").alias("degy"))
    # each unordered wedge once: (x before y) in the same (deg, id) order
    wedges = e1.join(e2, "s").where(
        (F.col("degx") < F.col("degy"))
        | ((F.col("degx") == F.col("degy")) & (F.col("x") < F.col("y")))
    ).select("s", "x", "y")
    closing = o.select(F.col("s").alias("x"), F.col("t").alias("y"))
    return wedges.join(closing, ["x", "y"], "inner").select("s", "x", "y")


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, tri) for every vertex in ≥1 triangle."""
    tris = triangle_triples(edges)
    return (
        tris.select(F.col("s").alias("id"))
        .unionByName(tris.select(F.col("x").alias("id")))
        .unionByName(tris.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("tri"))
    )


def triangles_global(edges: DataFrame) -> DataFrame:
    """Single row (n_triangles: long)."""
    return triangle_triples(edges).agg(F.count("*").alias("n_triangles"))


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, lcc) — local clustering coefficient over the undirected
    simple graph: lcc(v) = 2·T(v) / (d(v)·(d(v)−1)), 0.0 when d(v) < 2.

    Cross-engine exact: T and d are exact ints, 2.0·T is exact in double,
    and the single IEEE division is bit-identical across engines (the
    jaccard_verify float policy). Plan = the triangle pipeline plus one
    degree aggregate and a left join — no new shuffle classes."""
    und = canonical_undirected(edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    tri = triangles_per_vertex(edges)
    return deg.join(tri, "id", "left").select(
        "id",
        F.when(F.col("deg") < 2, F.lit(0.0))
        .otherwise(
            F.lit(2.0) * F.coalesce(F.col("tri"), F.lit(0))
            / (F.col("deg") * (F.col("deg") - 1))
        )
        .alias("lcc"),
    )


def triangle_count(spark: SparkSession, edges: DataFrame) -> TriangleResult:
    tris = triangle_triples(edges).persist()
    total = tris.count()
    per_vertex = (
        tris.select(F.col("s").alias("id"))
        .unionByName(tris.select(F.col("x").alias("id")))
        .unionByName(tris.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("tri"))
    )
    return TriangleResult(total, per_vertex)


@dataclass
class TrussResult:
    edges: DataFrame  # (a, b, support) — surviving canonical edges
    rounds: int
    metrics: JobMetrics = field(default_factory=lambda: JobMetrics("ktruss"))


def ktruss(
    spark,
    edges: DataFrame,
    k: int,
    max_rounds: int = 100,
    num_partitions: int | None = None,
    fixed_rounds: int | None = None,
) -> TrussResult:
    """k-truss decomposition (Cohen 2008): the maximal subgraph where
    every EDGE participates in ≥ k−2 triangles — the edge-cohesion
    primitive next to the vertex-level k-core (trusses are the standard
    community-core filter on web/social graphs; every k-truss sits inside
    the (k−1)-core but is strictly denser).

    Peel loop: each round counts per-edge triangle support over the
    CURRENT surviving edge set and drops every edge below k−2
    simultaneously; the fixpoint is the unique k-truss (simultaneous and
    sequential peeling converge to the same maximal subgraph), so rounds
    past convergence are identity and an unrolled SQL oracle is exact —
    support counts are enumeration-order-invariant, letting the Spark
    side use the degree-ordered orientation (each triangle enumerated
    once, wedge fan-out bounded by the SMALLER endpoint's degree — the
    triangles_global skew discipline) while the oracle enumerates a<b<c.

    Output edges carry their in-truss support (support measured on the
    fixpoint graph). Cost: one triangle enumeration per round — the
    expensive-but-honest formulation; rounds are typically few because
    support collapses fast once peers disappear.
    """
    if k < 3:
        raise ValueError(f"ktruss requires k >= 3, got {k}")
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    thresh = k - 2
    und = (
        canonical_undirected(edges)
        .repartition(P, "a")
        .localCheckpoint(eager=True)
    )
    metrics = JobMetrics("ktruss")
    rounds = 0
    n_before = und.count()
    kept = und.select("a", "b", F.lit(0).cast("long").alias("support"))
    n_rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for r in range(1, n_rounds + 1):
        t0 = time.monotonic()
        tri = triangle_triples(und.select(F.col("a").alias("src"),
                                          F.col("b").alias("dst")))
        sup = (
            tri.select(F.least("s", "x").alias("a"), F.greatest("s", "x").alias("b"))
            .unionByName(tri.select(F.least("s", "y").alias("a"),
                                    F.greatest("s", "y").alias("b")))
            .unionByName(tri.select(F.least("x", "y").alias("a"),
                                    F.greatest("x", "y").alias("b")))
            .groupBy("a", "b")
            .agg(F.count("*").alias("support"))
        )
        kept = (
            und.join(sup, ["a", "b"])
            .where(F.col("support") >= thresh)
            .localCheckpoint(eager=True)
        )
        n_after = kept.count()
        metrics.add(SuperstepMetric(r, (time.monotonic() - t0) * 1000.0,
                                    n_before, float(n_before - n_after)))
        und = kept.select("a", "b")
        rounds = r
        if fixed_rounds is None and n_after == n_before:
            break
        n_before = n_after
        if n_after == 0:
            break
    return TrussResult(kept, rounds, metrics)
