"""Katz centrality — truncated power iteration over the directed graph.

Katz (1953) status index: x(v) = Σ_k α^k · |paths of length k ending at v|,
computed as the fixpoint of x ← β·1 + α·Aᵀx. The web-ranking sibling of
PageRank without the out-degree normalization — a hub passes its FULL
score to every target, so Katz rewards being linked from well-linked
pages regardless of how many other links those pages carry. Truncated at
a fixed iteration count the iterate is a polynomial in exact path counts,
deterministic for any α (the usual α < 1/λ_max convergence condition only
matters for the infinite sum), which is what makes the unrolled SQL
oracle exact to float-rounding noise.

Plan shape per superstep (the pagerank discipline, pagerank.py:270-300):
the edge table is persisted partitioned on src and probed in place by the
V-scale score vector; messages partial-combine map-side before the
dst-keyed shuffle; the score vector localCheckpoints each round (lineage
truncation). Zero E-scale exchanges per iteration.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.session import ckpt_state, size_based_partitions

from pargraph_spark.plans.metrics import JobMetrics


@dataclass
class KatzResult:
    scores: DataFrame  # (id, katz)
    iterations: int
    metrics: JobMetrics = field(default_factory=lambda: JobMetrics("katz"))


def katz_centrality(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.05,
    beta: float = 1.0,
    iters: int = 5,
    num_partitions: int | None = None,
    exact_denominator: int | None = None,
) -> KatzResult:
    """edges(src, dst) directed → (id, katz) after `iters` supersteps of
    x ← β + α·Σ_{u→v} x(u), from x₀ = β.

    exact_denominator=D (requires β=1) sets α=1/D and runs the EXACT
    integer recurrence on X_t = x_t·D^t:  X_{t+1}(v) = D^{t+1} + Σ X_t(u),
    X_0 = 1 — accumulated in decimal(38,0) (order-independent, exact), so
    the emitted katz = X_iters / D^iters is ONE correctly-rounded IEEE
    division of exactly-converted operands: bit-identical across engines
    with no rounding grid. The float path (exact_denominator=None) is the
    10^12-scale tier (X grows like Σ_k D^{iters-k}·|paths_k| and can pass
    decimal range on deep runs over hub-dense graphs); truncation depth
    and semantics are identical either way."""
    if exact_denominator is not None:
        if beta != 1.0:
            raise ValueError("exact_denominator requires beta == 1.0")
        alpha = 1.0 / exact_denominator
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    P = size_based_partitions(edges, P)  # guide §2.2, size-derived cap
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(P, "src")
        .persist()
    )
    e.count()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(P, "id")
    )
    if exact_denominator is not None:
        D = int(exact_denominator)
        x = verts.withColumn(
            "xs", F.lit(1).cast("decimal(38,0)")
        ).transform(ckpt_state, P)
        for t in range(1, iters + 1):
            msgs = (
                e.join(x.select(F.col("id").alias("src"), "xs"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("xs").alias("_s"))
            )
            x = (
                x.select("id")
                .join(msgs, "id", "left")
                .select(
                    "id",
                    # the coalesce covers "no in-edges" NULLs from the
                    # left join ONLY. Decimal-sum overflow past 38 digits
                    # THROWS under ANSI (this repo's default config) —
                    # never runs far enough to be masked here; a non-ANSI
                    # session would null-and-mask it, so exact-mode Katz
                    # requires ANSI on (review r5)
                    (
                        F.lit(D ** t).cast("decimal(38,0)")
                        + F.coalesce(
                            "_s", F.lit(0).cast("decimal(38,0)")
                        )
                    ).cast("decimal(38,0)").alias("xs"),
                )
                .repartition(P, "id")
                .transform(ckpt_state, P)
            )
        x = x.select(
            "id", (F.col("xs").cast("double") / F.lit(float(D ** iters))).alias("katz")
        )
    else:
        x = verts.withColumn("katz", F.lit(float(beta))).transform(ckpt_state, P)
        for _ in range(iters):
            msgs = (
                e.join(x.select(F.col("id").alias("src"), "katz"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("katz").alias("_s"))
            )
            x = (
                x.select("id")
                .join(msgs, "id", "left")
                .select(
                    "id",
                    (
                        F.lit(float(beta))
                        + F.lit(float(alpha)) * F.coalesce("_s", F.lit(0.0))
                    ).alias("katz"),
                )
                .repartition(P, "id")
                .transform(ckpt_state, P)
            )
    e.unpersist()
    return KatzResult(x, iters)
