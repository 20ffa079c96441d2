"""Butterfly (bipartite 4-cycle) counting.

The butterfly — two left vertices sharing two right vertices — is the
smallest cohesive motif of a bipartite graph (Wang, Fu, Cheng, VLDB'14;
Sanei-Mehri, Sariyüce, Tirthapura, KDD'18): on web data the host↔page,
order↔part, or doc↔term incidence graphs, butterfly density is the
bipartite analogue of the clustering coefficient, and k-bitruss / dense
bipartite-community mining all start from per-edge or per-vertex
butterfly counts.

Counting identity: for each left pair (a, b), let c(a,b) = |Γ(a)∩Γ(b)|
(shared right vertices). Every butterfly is exactly one such pair with
two shared neighbors, so

    total = Σ_pairs C(c, 2);  per-left-vertex(v) = Σ_{pairs ∋ v} C(c, 2)

All counts are exact integers — no float policy at all — and the SQL
oracle is the verbatim identity.

Scale shape (the linkpred.py wedge discipline): the pair enumeration
fans out deg(w)² per RIGHT vertex w, so a 10^8-degree right hub is the
hazard; the declared hot_cap drops right vertices with degree > cap
BEFORE the self-join (exactly reproduced by the oracle — cap semantics,
not silent truncation; a right vertex shared by everything is
boilerplate by definition, the idf argument). The pair aggregate
partial-combines map-side; output is pair-scale, never wedge-scale.
Counts use BIGINT (c ≤ 2^31 shared neighbors per pair before C(c,2)
overflows — beyond any real corpus).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pargraph_spark.session import ckpt_state, ckpt_state_lazy

from pargraph_spark.plans.metrics import JobMetrics, SuperstepMetric


@dataclass
class ButterflyResult:
    total: int
    per_pair: DataFrame  # (a, b, c, bf) — left pairs with c >= 2 shared rights


def butterfly_counts(
    edges: DataFrame,
    left_col: str = "src",
    right_col: str = "dst",
    hot_cap: int | None = None,
) -> ButterflyResult:
    """edges(left, right) bipartite (duplicates deduped) → total butterfly
    count + the per-left-pair table (a < b, c shared rights, bf = C(c,2)).
    Right vertices with degree > hot_cap are excluded (None = exact)."""
    e = (
        edges.select(F.col(left_col).alias("u"), F.col(right_col).alias("w"))
        .distinct()
    )
    if hot_cap is not None:
        deg = e.groupBy("w").agg(F.count("*").alias("_d"))
        e = e.join(deg.where(F.col("_d") <= int(hot_cap)).select("w"), "w")
    a1 = e.select("w", F.col("u").alias("a"))
    a2 = e.select("w", F.col("u").alias("b"))
    pairs = (
        a1.join(a2, "w")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 2)
        .select(
            "a", "b", "c",
            # integer div: '/' is DOUBLE division in Spark and silently
            # rounds once c*(c-1) passes 2^53 — the module's exactness
            # claim held only up to c ~ 9.5e7 before this fix
            F.expr("c * (c - 1) div 2").alias("bf"),
        )
    )
    per_pair = pairs
    total_row = per_pair.agg(F.coalesce(F.sum("bf"), F.lit(0)).alias("t")).first()
    return ButterflyResult(int(total_row["t"]), per_pair)


@dataclass
class BitrussResult:
    edges: DataFrame  # (u, w, sup) — surviving bipartite edges + support
    rounds: int
    metrics: JobMetrics = field(default_factory=lambda: JobMetrics("bitruss"))


def _edge_supports(e: DataFrame) -> DataFrame:
    """(u, w) bipartite edges → (u, w, sup): per-edge butterfly support.

    sup(a, w) = Σ_{b ∈ Γ(w), b≠a} (c(a,b) − 1) with c = shared rights:
    each wedge row (a, b, w) joined to its pair count contributes (c−1)
    to BOTH endpoint edges at w. Pairs with c = 1 contribute 0 and are
    filtered before the join. Edges in no butterfly carry sup = 0."""
    a1 = e.select("w", F.col("u").alias("a"))
    a2 = e.select("w", F.col("u").alias("b"))
    wedges = a1.join(a2, "w").where(F.col("a") < F.col("b"))
    c = (
        wedges.groupBy("a", "b")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 2)
    )
    contrib = wedges.join(c, ["a", "b"]).select(
        "w", "a", "b", (F.col("c") - 1).alias("_g")
    )
    sup = (
        contrib.select(F.col("a").alias("u"), "w", "_g")
        .unionByName(contrib.select(F.col("b").alias("u"), "w", "_g"))
        .groupBy("u", "w")
        .agg(F.sum("_g").alias("sup"))
    )
    return (
        e.join(sup, ["u", "w"], "left")
        .select("u", "w", F.coalesce("sup", F.lit(0)).cast("long").alias("sup"))
    )


def bitruss(
    spark,
    edges: DataFrame,
    k: int,
    left_col: str = "src",
    right_col: str = "dst",
    hot_cap: int | None = None,
    max_rounds: int = 100,
    fixed_rounds: int | None = None,
) -> BitrussResult:
    """k-bitruss (Zou 2016; Wang, Lakshmanan et al.): the maximal
    bipartite subgraph where every EDGE participates in ≥ k butterflies —
    the edge-cohesion primitive of bipartite graphs, sitting next to
    k-truss exactly as the butterfly sits next to the triangle.

    Peel loop with INCREMENTAL support maintenance (the ktruss r5
    discipline, triangles.py:150-246): wedges are enumerated ONCE up
    front for the initial supports; every subsequent round enumerates
    only the butterflies its removed edges participate in (removed ⋈
    right-adjacency for the co-endpoint b, ⋈ left-adjacency for the
    second right w2, semi-checked against the round-start graph),
    deduplicated per canonical butterfly quadruple so a butterfly losing
    2+ edges in one round still decrements each survivor exactly once.
    Round cost is proportional to removed-edge butterflies, not a full
    re-enumeration — at 100 TB the peel tail costs near zero.

    hot_cap drops right vertices with initial degree > cap ONCE, before
    support computation (declared cap semantics, reproduced by the
    oracle; the wedge fan-out per right vertex is deg², so the cap is
    the 10^8-degree-hub guard). Support is maintained exactly on the
    CURRENT surviving graph, so the recount-formulation unrolled SQL
    oracle matches bit-for-bit once its round count passes convergence
    (rounds past it are identity). Rounds metric counts only effective
    (removing) rounds; the terminal identity check is not a round.
    fixed_rounds runs exactly that many removal steps with no
    convergence jobs (oracle parity)."""
    if k < 1:
        raise ValueError(f"bitruss requires k >= 1, got {k}")
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(F.col(left_col).alias("u"), F.col(right_col).alias("w"))
        .distinct()
    )
    if hot_cap is not None:
        deg = e.groupBy("w").agg(F.count("*").alias("_d"))
        e = e.join(deg.where(F.col("_d") <= int(hot_cap)).select("w"), "w")
    cur = (
        _edge_supports(e.repartition(P, "w"))
        .repartition(P, "w")
        .transform(ckpt_state, P)
    )
    metrics = JobMetrics("bitruss")
    rounds = 0
    n_rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for r in range(1, n_rounds + 1):
        t0 = time.monotonic()
        removed = cur.where(F.col("sup") < k).select("u", "w")
        if fixed_rounds is None and removed.limit(1).count() == 0:
            break  # identity round: not counted (kcore semantics)
        survivors = cur.where(F.col("sup") >= k)
        g = cur.select("u", "w")
        # dead butterflies through each removed edge (u, w1): co-endpoint
        # b ∈ Γ(w1)\{u}, second right w2 ∈ (Γ(u)∩Γ(b))\{w1}; canonical
        # quadruple dedupe handles butterflies holding 2-4 removed edges
        dead = (
            removed.withColumnRenamed("w", "w1")
            .join(g.select(F.col("u").alias("b"), F.col("w").alias("w1")), "w1")
            .where(F.col("b") != F.col("u"))
            .join(g.select("u", F.col("w").alias("w2")), "u")
            .where(F.col("w2") != F.col("w1"))
            .join(
                g.select(F.col("u").alias("b"), F.col("w").alias("w2")),
                ["b", "w2"],
                "leftsemi",
            )
            .select(
                F.least("u", "b").alias("a"),
                F.greatest("u", "b").alias("b"),
                F.least("w1", "w2").alias("x"),
                F.greatest("w1", "w2").alias("y"),
            )
            .distinct()
        )
        dec = (
            dead.select(F.col("a").alias("u"), F.col("x").alias("w"))
            .unionByName(dead.select(F.col("a").alias("u"), F.col("y").alias("w")))
            .unionByName(dead.select(F.col("b").alias("u"), F.col("x").alias("w")))
            .unionByName(dead.select(F.col("b").alias("u"), F.col("y").alias("w")))
            .groupBy("u", "w")
            .agg(F.count("*").alias("_d"))
        )
        cur = (
            survivors.join(dec, ["u", "w"], "left")
            .select(
                "u", "w",
                (F.col("sup") - F.coalesce(F.col("_d"), F.lit(0))).alias("sup"),
            )
            .repartition(P, "w")
            .transform(ckpt_state_lazy, P)  # materialized by the count below
        )
        n_after = cur.count()
        metrics.add(SuperstepMetric(r, (time.monotonic() - t0) * 1000.0,
                                    n_after, float("nan")))
        rounds = r
        if n_after == 0:
            break
    return BitrussResult(cur, rounds, metrics)
