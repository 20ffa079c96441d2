"""HITS (Kleinberg hubs & authorities) — fixed-iteration power method.

    a_{t+1}(v) ∝ Σ_{u→v} h_t(u)        (authority = endorsed by hubs)
    h_{t+1}(u) ∝ Σ_{u→v} a_{t+1}(v)    (hub = endorses authorities)

Cross-engine determinism: after each half-step the scores are
L1-normalized and QUANTIZED to the binary grid 2^-30 — round(x·2^30)/2^30.
Power-of-two scaling and the final division are EXACT IEEE operations, so
a quantized value is bit-identical across engines whenever the engines
agree on round-to-integer — and they do except at exact .5 midpoints
(probability ~2^-23 per value; decimal round(x, k) by contrast diverges
whenever the shortest-decimal vs scaled-double rounding paths disagree,
observed at ~1e-3 per run). Normalized scores sum to 1, so the ~1e-16
absolute sum noise sits seven orders below the ~1e-9 grid quantum and can
never compound across iterations. Initial h_0 = 1/|V|. Outputs are the
grid values themselves — re-rounding them to fewer decimals would
reintroduce the midpoint pathology.
Vertices without in-edges get authority 0; without out-edges, hub 0.

Plan shape per iteration: two partial-combined aggregations (groupBy dst
sum, groupBy src sum) against the once-partitioned edge table + one
broadcast 1-row normalizer each — no driver collect in the loop,
localCheckpoint truncates lineage per superstep (same discipline as
pagerank.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

GRID = float(1 << 30)  # quantization grid 2^-30 (~1e-9)


def quantize(c: Column) -> Column:
    return F.round(c * F.lit(GRID)) / F.lit(GRID)


@dataclass
class HitsResult:
    scores: DataFrame  # (id, hub double, authority double)
    iterations: int


def hits(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    iterations: int = 5,
    num_partitions: int | None = None,
) -> HitsResult:
    if iterations < 1:
        raise ValueError(f"hits requires iterations >= 1, got {iterations}")
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .repartition(P, "src")
        .persist()
    )
    e.count()
    verts = (
        vertices.select("id")
        if vertices is not None
        else e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    ).repartition(P, "id").persist()
    n = verts.count()

    def _norm_quant(df: DataFrame, col: str) -> DataFrame:
        tot = df.agg(F.coalesce(F.sum(col), F.lit(0.0)).alias("_t"))
        return (
            df.crossJoin(F.broadcast(tot))
            .select(
                "id",
                quantize(
                    F.when(F.col("_t") > 0, F.col(col) / F.col("_t")).otherwise(F.lit(0.0))
                ).alias(col),
            )
        )

    h = verts.withColumn("hub", quantize(F.lit(1.0 / n))).localCheckpoint(eager=True)
    a = None
    for _ in range(iterations):
        a_raw = (
            e.join(h, e["src"] == h["id"])
            .groupBy(e["dst"].alias("vid"))
            .agg(F.sum("hub").alias("authority"))
        )
        a = _norm_quant(
            verts.join(a_raw, verts["id"] == a_raw["vid"], "left")
            .select("id", F.coalesce("authority", F.lit(0.0)).alias("authority")),
            "authority",
        ).localCheckpoint(eager=True)
        h_raw = (
            e.join(a, e["dst"] == a["id"])
            .groupBy(e["src"].alias("vid"))
            .agg(F.sum("authority").alias("hub"))
        )
        new_h = _norm_quant(
            verts.join(h_raw, verts["id"] == h_raw["vid"], "left")
            .select("id", F.coalesce("hub", F.lit(0.0)).alias("hub")),
            "hub",
        ).localCheckpoint(eager=True)
        h.unpersist()
        h = new_h
    out = h.join(a, "id").select("id", "hub", "authority")
    e.unpersist()
    verts.unpersist()
    return HitsResult(out, iterations)


@dataclass
class SalsaResult:
    scores: DataFrame  # (id, hub double, authority double)
    iterations: int


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    iterations: int = 5,
    num_partitions: int | None = None,
) -> SalsaResult:
    """SALSA (Lempel & Moran 2001): the random-walk cousin of HITS —
    contributions are DEGREE-NORMALIZED, so scores converge to the
    stationary distribution of the alternating bipartite walk instead of
    the dominant eigenvector, which famously resists HITS's
    tightly-knit-community (TKC) topic-drift:

        a_{t+1}(v) ∝ Σ_{u→v} h_t(u)/outdeg(u)
        h_{t+1}(u) ∝ Σ_{u→v} a_{t+1}(v)/indeg(v)

    Cross-engine determinism extends the HITS grid discipline one step:
    the PER-EDGE term h/outdeg is itself quantized to the 2^-30 grid
    before summing — grid multiples with total mass ≤ 1 sum EXACTLY in
    IEEE doubles (fixed-point in disguise), so the aggregate is
    order-independent and the unrolled SQL oracle matches bit-for-bit.
    Same plan discipline as hits(): degree columns joined into the edge
    table once, two partial-combined aggregates + one broadcast
    normalizer per iteration, localCheckpoint per half-step."""
    if iterations < 1:
        raise ValueError(f"salsa requires iterations >= 1, got {iterations}")
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    e0 = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    od = e0.groupBy("src").agg(F.count("*").alias("_od"))
    idg = e0.groupBy("dst").agg(F.count("*").alias("_id"))
    e = (
        e0.join(od, "src").join(idg, "dst")
        .repartition(P, "src")
        .persist()
    )
    e.count()
    verts = (
        vertices.select("id")
        if vertices is not None
        else e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    ).repartition(P, "id").persist()
    n = verts.count()

    def _norm_quant(df: DataFrame, col: str) -> DataFrame:
        tot = df.agg(F.coalesce(F.sum(col), F.lit(0.0)).alias("_t"))
        return (
            df.crossJoin(F.broadcast(tot))
            .select(
                "id",
                quantize(
                    F.when(F.col("_t") > 0, F.col(col) / F.col("_t")).otherwise(F.lit(0.0))
                ).alias(col),
            )
        )

    h = verts.withColumn("hub", quantize(F.lit(1.0 / n))).localCheckpoint(eager=True)
    a = None
    for _ in range(iterations):
        a_raw = (
            e.join(h, e["src"] == h["id"])
            .groupBy(e["dst"].alias("vid"))
            .agg(F.sum(quantize(F.col("hub") / F.col("_od"))).alias("authority"))
        )
        a = _norm_quant(
            verts.join(a_raw, verts["id"] == a_raw["vid"], "left")
            .select("id", F.coalesce("authority", F.lit(0.0)).alias("authority")),
            "authority",
        ).localCheckpoint(eager=True)
        h_raw = (
            e.join(a, e["dst"] == a["id"])
            .groupBy(e["src"].alias("vid"))
            .agg(F.sum(quantize(F.col("authority") / F.col("_id"))).alias("hub"))
        )
        new_h = _norm_quant(
            verts.join(h_raw, verts["id"] == h_raw["vid"], "left")
            .select("id", F.coalesce("hub", F.lit(0.0)).alias("hub")),
            "hub",
        ).localCheckpoint(eager=True)
        h.unpersist()
        h = new_h
    out = h.join(a, "id").select("id", "hub", "authority")
    e.unpersist()
    verts.unpersist()
    return SalsaResult(out, iterations)
