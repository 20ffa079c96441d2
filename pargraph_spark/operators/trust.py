"""TrustRank & spam mass — link-spam demotion over the web graph.

TrustRank (Gyöngyi, Garcia-Molina, Pedersen, "Combating Web Spam with
TrustRank", VLDB'04) is PageRank personalized to a hand-vetted trusted
seed set: trust flows only along links reachable from good pages, so
spam farms — which attract rank through link exchange, not endorsement
from the reputable web — score near zero. Spam mass (Gyöngyi,
Berkhin, Garcia-Molina, Pedersen, "Link Spam Detection Based on Mass
Estimation", VLDB'06) turns the two scores into a per-page estimate of
HOW MUCH of a page's PageRank arrives via spam: with p = PageRank and
p' = TrustRank (both L1-normalized, so directly comparable), the
relative spam mass is

    m(v) = (p(v) - p'(v)) / p(v)

m ≈ 1 → virtually all of v's rank is unendorsed by the trusted core
(spam candidate); m ≈ 0 → rank fully accounted for by trusted flow;
m < 0 → v receives MORE trusted flow than raw rank (the seed
neighborhood itself).

This is a pure composition of the engine's exact PageRank machinery
(pagerank.py): one uniform run + one teleport-seeded run on the SAME
prepared edge table, then a V-scale join. Cross-engine determinism is
inherited — fixed iteration counts make both score vectors exact
polynomials mirrored by unrolled SQL CTE chains, and the final division
is a single IEEE op per row, so `round(m, 7)` matches the oracle
bit-for-bit at the same tolerance the pagerank queries use.

Scale shape: two pagerank runs (each zero E-scale exchanges per
superstep, src-partitioned persisted edges probed in place) + one
co-partitioned V-scale join. The seed set rides the teleport broadcast;
nothing new shuffles at E scale.

Reference parity note: the reference engine has no ranking operators —
this extends the §2.3 normative set (O6 family) with the standard
web-spam companion pair, per the round-5 web-graph charter.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.operators.pagerank import pagerank
from pargraph_spark.plans.metrics import JobMetrics


@dataclass
class SpamMassResult:
    scores: DataFrame  # (id, rank, trust, spam_mass)
    iterations: int    # supersteps run by EACH of the two inner runs
    metrics: JobMetrics = field(default_factory=lambda: JobMetrics("spam_mass"))


def trustrank(
    spark: SparkSession,
    edges: DataFrame,
    trusted: DataFrame,
    damping: float = 0.85,
    tol: float = 0.0,
    max_iter: int = 20,
    num_partitions: int | None = None,
):
    """PageRank personalized to the trusted seed set. `trusted` is
    (id[, w]) — rows without a weight column get weight 1 (uniform trust
    over the seeds, the VLDB'04 formulation)."""
    t = trusted
    if "w" not in t.columns:
        t = t.select("id", F.lit(1.0).alias("w"))
    return pagerank(
        spark,
        edges,
        damping=damping,
        tol=tol,
        max_iter=max_iter,
        teleport=t,
        num_partitions=num_partitions,
    )


def spam_mass(
    spark: SparkSession,
    edges: DataFrame,
    trusted: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    num_partitions: int | None = None,
) -> SpamMassResult:
    """Relative spam mass per vertex: (rank − trust)/rank with rank from
    uniform PageRank and trust from TrustRank over `trusted`, both run
    exactly `iterations` supersteps (tol=0 → deterministic, oracle-exact).
    Vertices with rank 0 (impossible under uniform teleport, but kept for
    subgraph callers) get spam_mass 0."""
    pr = pagerank(
        spark, edges, damping=damping, tol=0.0, max_iter=iterations,
        num_partitions=num_partitions,
    )
    tr = trustrank(
        spark, edges, trusted, damping=damping, tol=0.0, max_iter=iterations,
        num_partitions=num_partitions,
    )
    p = pr.ranks.select("id", F.col("rank"))
    t = tr.ranks.select("id", F.col("rank").alias("trust"))
    scores = (
        p.join(t, "id")
        .select(
            "id",
            "rank",
            "trust",
            F.when(
                F.col("rank") > 0,
                (F.col("rank") - F.col("trust")) / F.col("rank"),
            )
            .otherwise(F.lit(0.0))
            .alias("spam_mass"),
        )
    )
    m = JobMetrics("spam_mass")
    m.supersteps.extend(pr.metrics.supersteps)
    m.supersteps.extend(tr.metrics.supersteps)
    return SpamMassResult(scores, iterations, m)
