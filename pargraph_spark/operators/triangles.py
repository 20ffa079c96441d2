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
    """(s, x, y) — every triangle exactly once, vertices in (deg,id) order.

    r6: the oriented edge list is materialized ONCE (eager localCheckpoint)
    — it feeds three consumers (both wedge sides and the closing probe),
    and as a plain subtree the whole orientation pipeline (distinct +
    degree aggregate + two joins, ~5 exchanges) re-executed for each; only
    identical Exchange nodes get runtime reuse, which the closing side's
    (x, y) keying defeats. Rows are unchanged — only evaluated once."""
    o = _oriented(edges).localCheckpoint(eager=True)
    e1 = o.select(F.col("s"), F.col("t").alias("x"), F.col("degt").alias("degx"))
    e2 = o.select(F.col("s"), F.col("t").alias("y"), F.col("degt").alias("degy"))
    # each unordered wedge once: (x before y) in the same (deg, id) order
    wedges = e1.join(e2, "s").where(
        (F.col("degx") < F.col("degy"))
        | ((F.col("degx") == F.col("degy")) & (F.col("x") < F.col("y")))
    ).select("s", "x", "y")
    closing = o.select(F.col("s").alias("x"), F.col("t").alias("y"))
    return wedges.join(closing, ["x", "y"], "inner").select("s", "x", "y")


def _per_vertex_from_triples(tris: DataFrame) -> DataFrame:
    return (
        tris.select(F.col("s").alias("id"))
        .unionByName(tris.select(F.col("x").alias("id")))
        .unionByName(tris.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("tri"))
    )


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, tri) for every vertex in ≥1 triangle."""
    return _per_vertex_from_triples(triangle_triples(edges))


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
    # materialize per_vertex so the E^1.5-scale triples cache can be
    # RELEASED before return (review r5: it leaked for the session) —
    # and reuse triangles_per_vertex's aggregation instead of a copy
    per_vertex = _per_vertex_from_triples(tris).localCheckpoint(eager=True)
    tris.unpersist()
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

    Peel loop with INCREMENTAL support maintenance (VERDICT r4 #4):
    triangles are enumerated exactly ONCE, up front, with the
    degree-ordered orientation (each triangle at its lowest-degree apex —
    the triangles_global skew discipline). Every subsequent round only
    touches the edges it removes: the triangles a removed edge (u,v)
    participated in are its common neighbors in the round-start graph (a
    wedge join of the removed set against the current adjacency),
    deduplicated per triangle, and each dead triangle decrements its
    surviving edges' support by one. Round cost is therefore
    proportional to removed-edge wedges, not to re-enumerating the whole
    graph's triangles — at 100 TB the peel tail (few removals per round)
    costs near zero instead of a full enumeration per round.

    The removal sequence is identical to recount-and-drop simultaneous
    peeling (support is maintained exactly, round by round), and the
    reported support is always measured on the CURRENT surviving graph —
    at convergence exactly the fixpoint-graph support the recount
    formulation's terminal identity round produced, so the unrolled
    recount SQL oracle matches bit-for-bit whenever its round count
    reaches convergence (rounds past it are identity). Support counts
    are enumeration-order-invariant, so the oracle's a<b<c enumeration
    agrees with the degree-ordered one.

    Rounds metric counts only EFFECTIVE rounds (ones that removed an
    edge); the terminal identity check is not a round — kcore /
    score_core semantics (ADVICE r4). fixed_rounds runs exactly that
    many removal steps with no convergence jobs (oracle parity; rounds
    past exhaustion are identity).
    """
    if k < 3:
        raise ValueError(f"ktruss requires k >= 3, got {k}")
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    thresh = k - 2
    und = canonical_undirected(edges)
    tri = triangle_triples(und.select(F.col("a").alias("src"),
                                      F.col("b").alias("dst")))
    sup0 = (
        tri.select(F.least("s", "x").alias("a"), F.greatest("s", "x").alias("b"))
        .unionByName(tri.select(F.least("s", "y").alias("a"),
                                F.greatest("s", "y").alias("b")))
        .unionByName(tri.select(F.least("x", "y").alias("a"),
                                F.greatest("x", "y").alias("b")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
    )
    # (a, b, support) over ALL edges — triangle-less edges carry 0 and
    # fall in round 1 (thresh = k-2 >= 1)
    cur = (
        und.join(sup0, ["a", "b"], "left")
        .select("a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support"))
        .repartition(P, "a")
        .localCheckpoint(eager=True)
    )
    metrics = JobMetrics("ktruss")
    rounds = 0
    kept = cur
    n_rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for r in range(1, n_rounds + 1):
        t0 = time.monotonic()
        removed = cur.where(F.col("support") < thresh).select("a", "b")
        if fixed_rounds is None and removed.limit(1).count() == 0:
            break  # identity round: not counted (kcore semantics)
        survivors = cur.where(F.col("support") >= thresh)
        # dead triangles = common neighbors of each removed edge in the
        # ROUND-START graph; a triangle holding 2-3 removed edges is
        # enumerated once per removed edge, so dedupe on the sorted triple
        sym = cur.select(F.col("a").alias("u"), F.col("b").alias("w")).unionByName(
            cur.select(F.col("b").alias("u"), F.col("a").alias("w"))
        )
        # fan out from each removed edge's LOWER-DEGREE endpoint, not its
        # min-ID one (review r5): a removed edge on a hub otherwise
        # enumerates hub-degree wedge candidates — the skew the initial
        # pass's degree orientation exists to avoid. One degree aggregate
        # over the (shrinking) round-start graph buys the bound.
        deg = sym.groupBy("u").agg(F.count("*").alias("_dg"))
        rem = (
            removed
            .join(deg.select(F.col("u").alias("a"), F.col("_dg").alias("_da")), "a")
            .join(deg.select(F.col("u").alias("b"), F.col("_dg").alias("_db")), "b")
            .select(
                F.when(F.col("_da") <= F.col("_db"), F.col("a"))
                .otherwise(F.col("b")).alias("p"),
                F.when(F.col("_da") <= F.col("_db"), F.col("b"))
                .otherwise(F.col("a")).alias("q"),
            )
        )
        dead = (
            rem
            .join(sym.select(F.col("u").alias("p"), "w"), "p")
            .join(sym.select(F.col("u").alias("q"), "w"), ["q", "w"])
            .select(F.array_sort(F.array("p", "q", "w")).alias("t"))
            .distinct()
        )
        dec = (
            dead.select(F.col("t")[0].alias("a"), F.col("t")[1].alias("b"))
            .unionByName(dead.select(F.col("t")[0].alias("a"), F.col("t")[2].alias("b")))
            .unionByName(dead.select(F.col("t")[1].alias("a"), F.col("t")[2].alias("b")))
            .groupBy("a", "b")
            .agg(F.count("*").alias("_d"))
        )
        cur = (
            survivors.join(dec, ["a", "b"], "left")
            .select(
                "a", "b",
                (F.col("support") - F.coalesce(F.col("_d"), F.lit(0))).alias("support"),
            )
            # lazy (r6): the count below materializes in the same job
            .localCheckpoint(eager=False)
        )
        kept = cur
        n_after = cur.count()
        metrics.add(SuperstepMetric(r, (time.monotonic() - t0) * 1000.0,
                                    n_after, float("nan")))
        rounds = r
        if n_after == 0:
            break
    return TrussResult(kept, rounds, metrics)


@dataclass
class TrussNumbersResult:
    trussness: DataFrame  # (a, b, truss) — max k such that the edge is in the k-truss
    rounds: int
    converged: bool
    metrics: JobMetrics = field(default_factory=lambda: JobMetrics("truss_numbers"))


def truss_numbers(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 100,
    num_partitions: int | None = None,
    fixed_rounds: int | None = None,
) -> TrussNumbersResult:
    """Full truss decomposition: every edge's truss number (the largest k
    such that the edge survives in the k-truss) — the EDGE analogue of
    core_numbers, answering all of `ktruss(k)` for every k in one job.

    Algorithm: the h-index fixpoint on triangle supports (the edge-level
    counterpart of the Lü et al. coreness H-iteration used by
    core_numbers): initialize t0(e) = support(e); each round, an edge
    looks at every triangle it belongs to, takes v = min of the OTHER
    two edges' current estimates, and updates to the h-index of its v
    multiset (largest h with ≥ h triangles of value ≥ h). Estimates are
    pointwise non-increasing and converge to exactly trussness − 2 (the
    peel-consistency argument mirrors the vertex case: a fixpoint value
    t certifies ≥ t triangles whose supporting edges all certify ≥ t);
    the pytest oracle cross-checks against a direct peel mirror.
    Triangle-less edges have trussness 2 by convention (every edge is in
    the 2-truss).

    Plan shape per round (single static triangle table, never
    re-enumerated): triangles are melted ONCE into (triple, edge) rows
    persisted partitioned on the edge key, so the per-round estimate
    join probes in place; the per-triangle gather exchanges 3-row groups
    keyed by the triple; the h-index uses core_numbers' two-level
    histogram — neighbor values CLAMP at the edge's own estimate before
    the (edge, value) combine, so the per-edge window runs over at most
    t(e)+1 rows, bounded by trussness, never by triangle count (a
    10^5-triangle edge contributes its triangles only to the map-side
    combine). Convergence detection = changed-estimate count; rounds
    counts only rounds that changed something. core_numbers' delta-round
    tail accelerator would port here verbatim if a long-tail graph needs
    it.
    """
    from pyspark.sql import Window

    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    und = canonical_undirected(edges)
    tri = triangle_triples(und.select(F.col("a").alias("src"),
                                      F.col("b").alias("dst")))
    t3 = tri.select(F.array_sort(F.array("s", "x", "y")).alias("t"))
    melt = (
        t3.select(
            "t",
            F.explode(
                F.array(
                    F.struct(F.col("t")[0].alias("a"), F.col("t")[1].alias("b")),
                    F.struct(F.col("t")[0].alias("a"), F.col("t")[2].alias("b")),
                    F.struct(F.col("t")[1].alias("a"), F.col("t")[2].alias("b")),
                )
            ).alias("e"),
        )
        .select("t", F.col("e.a").alias("a"), F.col("e.b").alias("b"))
        .repartition(P, "a", "b")
        .persist()
    )
    melt.count()
    est = (
        melt.groupBy("a", "b").agg(F.count("*").cast("long").alias("c"))
        .repartition(P, "a", "b")
        .localCheckpoint(eager=True)
    )
    metrics = JobMetrics("truss_numbers")
    w = Window.partitionBy("a", "b").orderBy(F.col("x").desc())
    rounds = 0
    converged = False
    # fixed_rounds: exactly that many rounds, no convergence jobs (oracle
    # parity — identity past the fixpoint, the core_numbers discipline)
    n_rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for r in range(1, n_rounds + 1):
        t0 = time.monotonic()
        j = melt.join(est, ["a", "b"])  # co-partitioned: no melt exchange
        g = j.groupBy("t").agg(
            F.array_sort(F.collect_list(F.struct("a", "b", "c"))).alias("es")
        )
        vals = None
        for i in range(3):
            o1, o2 = [x for x in range(3) if x != i]
            part = g.select(
                F.col("es")[i]["a"].alias("a"),
                F.col("es")[i]["b"].alias("b"),
                F.least(F.col("es")[o1]["c"], F.col("es")[o2]["c"]).alias("v"),
            )
            vals = part if vals is None else vals.unionByName(part)
        hist = (
            vals.join(est, ["a", "b"])
            .select("a", "b", F.least("v", "c").alias("x"))
            .groupBy("a", "b", "x")
            .agg(F.count("*").alias("cnt"))
        )
        new_est = (
            hist.withColumn("cum", F.sum("cnt").over(w))
            .groupBy("a", "b")
            .agg(F.max(F.least(F.col("cum"), F.col("x"))).cast("long").alias("c"))
            .repartition(P, "a", "b")
            .localCheckpoint(eager=True)
        )
        if fixed_rounds is None:
            n_changed = (
                new_est.join(est.select("a", "b", F.col("c").alias("_old")),
                             ["a", "b"])
                .where(F.col("c") != F.col("_old"))
                .count()
            )
        else:
            n_changed = float("nan")
        est.unpersist()
        est = new_est
        metrics.add(SuperstepMetric(r, (time.monotonic() - t0) * 1000.0,
                                    0, float(n_changed)))
        if fixed_rounds is None and n_changed == 0:
            converged = True
            break  # identity round: not counted (kcore semantics)
        rounds = r
    out = (
        und.join(est, ["a", "b"], "left")
        .select("a", "b", (F.coalesce(F.col("c"), F.lit(0)) + F.lit(2)).alias("truss"))
    )
    melt.unpersist()
    return TrussNumbersResult(out, rounds, converged, metrics)


def edge_neighborhood_jaccard(edges: DataFrame) -> DataFrame:
    """Per-edge neighborhood overlap: for every undirected edge (u, v),
    common = |Γ(u) ∩ Γ(v)| (triangles through the edge) and
    jac = common / (deg(u) + deg(v) − common), the Jaccard similarity of
    the endpoint neighborhoods — the standard tie-strength / link-spam
    signal (an edge inside a clique scores →1, a bridge scores 0).

    Exactness: common and both degrees are integers; jac is ONE IEEE
    division of exactly-converted ints — bit-identical across engines.

    Scale shape: reuses triangle_triples' degree-ordered orientation (the
    O9 wedge-bounding discipline — fan-out keyed on the LOWER-degree
    endpoint), projects each triangle onto its three edges and
    partial-combines the per-edge counts; then one V-scale degree join.
    """
    und = canonical_undirected(edges).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    )
    tris = triangle_triples(edges)
    pairs = (
        tris.select(F.col("s").alias("a"), F.col("x").alias("b"))
        .unionByName(tris.select(F.col("s").alias("a"), F.col("y").alias("b")))
        .unionByName(tris.select(F.col("x").alias("a"), F.col("y").alias("b")))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
    )
    supp = pairs.groupBy("u", "v").agg(F.count("*").alias("common"))
    sym = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("id")).agg(F.count("*").alias("deg"))
    return (
        und.join(supp, ["u", "v"], "left")
        .withColumn("common", F.coalesce("common", F.lit(0)))
        .join(deg.select(F.col("id").alias("u"), F.col("deg").alias("_du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("_dv")), "v")
        .select(
            "u",
            "v",
            F.col("common").cast("long").alias("common"),
            (
                F.col("common").cast("double")
                / (F.col("_du") + F.col("_dv") - F.col("common")).cast("double")
            ).alias("jac"),
        )
    )
