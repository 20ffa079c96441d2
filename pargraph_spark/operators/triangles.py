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

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.operators.edges import canonical_undirected


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
