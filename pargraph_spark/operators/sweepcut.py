"""PPR sweep cut — local community detection (Andersen-Chung-Lang,
FOCS'06 PageRank-Nibble): order vertices by degree-normalized
personalized-PageRank score, sweep prefixes k = 1..N, and return the
prefix with minimum conductance

    phi(k) = cut(k) / min(vol(k), 2m - vol(k)),

cut(k) = #undirected edges with exactly one endpoint in the prefix,
vol(k) = sum of degrees in the prefix. The standard seed-expansion
primitive on a web graph: "the community around this page", mirror/
template clusters around a seed, spam farms around a known spam seed
(pairs with operators/trust.py's spam mass; reference pargraph has no
graph-algorithm library — engine extension).

Determinism: the sweep order is score/deg DESC with (score DESC, id
ASC) tie-breaks — a pure function of the inputs. cut/vol/2m are exact
integers; phi is ONE IEEE division of exact ints per prefix and the
argmin tie-breaks on smaller k, so the chosen community is stable
across runs/partitionings/engines for a given score table.

Scale shape: the candidate set is capped at `top_n` (PPR support is
already local; ACL's sweep only ever examines the pushed support) via a
global sort-limit (TakeOrderedAndProject — map-side partial top-n, no
full sort). Ranks, the per-prefix cut deltas, and both cumsums then
live on a MODEL-SIZED table (<= top_n rows; the single-partition window
is over that capped table only, the negative_samples vocab discipline).
E-scale work is ONE persisted distinct pass over the undirected edge
list, which then serves the 2m count, the degree aggregate, and the
single equi-join against the broadcast rank map that builds the +1/-1
cut deltas — no per-prefix pass over the graph, and every cache is
released before return (outputs are localCheckpoint-materialized).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import canonical_undirected


@dataclass
class SweepCutResult:
    members: DataFrame  # (id, rank, score) — the best prefix, rank 1..k
    sweep: DataFrame  # (rank, id, cut, vol, phi) — the full trajectory
    best_k: int
    best_phi: float
    cut: int
    vol: int
    two_m: int


def sweep_cut(
    edges: DataFrame,
    scores: DataFrame,
    top_n: int = 1000,
    score_col: str = "score",
) -> SweepCutResult:
    """Sweep the `top_n` highest score/degree vertices of `scores`
    (id, score — e.g. pagerank(..., teleport=seed).ranks) over the
    undirected view of `edges`; return the minimum-conductance prefix.

    Vertices in `scores` but not in the graph are ignored (degree 0
    cannot enter a cut). Prefixes with min(vol, 2m - vol) == 0 are
    skipped (empty or everything: conductance undefined).
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    spark = edges.sparkSession

    # ONE E-scale distinct pass: the persisted und serves the 2m count,
    # the degree aggregate (unpivot a/b), and the cut-delta join
    und = canonical_undirected(edges).persist()
    two_m = und.count() * 2
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )

    cand = (
        scores.select("id", F.col(score_col).cast("double").alias("score"))
        .join(deg, "id")
        .orderBy(
            (F.col("score") / F.col("deg")).desc(),
            F.col("score").desc(),
            F.col("id").asc(),
        )
        .limit(top_n)
    )
    from pyspark.sql import Window

    # capped table: every window below is over <= top_n rows
    order = Window.orderBy(
        (F.col("score") / F.col("deg")).desc(),
        F.col("score").desc(),
        F.col("id").asc(),
    )
    ranked = cand.withColumn("rank", F.row_number().over(order)).persist()
    rank_map = ranked.select("id", "rank")

    # cut deltas: an edge with endpoint ranks i < j is cut for prefixes
    # [i, j-1] -> +1 at i, -1 at j; an edge with one unranked endpoint
    # is cut from i on -> +1 at i only; both unranked: never cut
    ru = rank_map.select(F.col("id").alias("a"), F.col("rank").alias("_ra"))
    rv = rank_map.select(F.col("id").alias("b"), F.col("rank").alias("_rb"))
    e_ranked = (
        und.join(F.broadcast(ru), "a", "left")
        .join(F.broadcast(rv), "b", "left")
        .where(F.col("_ra").isNotNull() | F.col("_rb").isNotNull())
        .select(
            F.least("_ra", "_rb").alias("_lo"),
            F.greatest("_ra", "_rb").alias("_hi"),
            (F.col("_ra").isNotNull() & F.col("_rb").isNotNull()).alias("_both"),
        )
    )
    # when one side is null, least/greatest both return the ranked one
    plus = e_ranked.groupBy(F.col("_lo").alias("rank")).agg(
        F.count("*").alias("d")
    )
    minus = (
        e_ranked.where("_both")
        .groupBy(F.col("_hi").alias("rank"))
        .agg((-F.count("*")).alias("d"))
    )
    deltas = plus.unionByName(minus).groupBy("rank").agg(F.sum("d").alias("d"))

    wcum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(deltas, "rank", "left")
        .withColumn("d", F.coalesce("d", F.lit(0)))
        .select(
            "rank", "id", "score",
            F.sum("d").over(wcum).alias("cut"),
            F.sum("deg").over(wcum).alias("vol"),
        )
        .withColumn(
            "_den", F.least(F.col("vol"), F.lit(two_m) - F.col("vol"))
        )
        .withColumn(
            "phi",
            F.when(
                F.col("_den") > 0, F.col("cut") / F.col("_den")
            ).otherwise(F.lit(None)),
        )
        .drop("_den")
        # model-sized (<= top_n rows): materialize and release every
        # upstream cache — nothing E-scale stays pinned after return
        .localCheckpoint(eager=True)
    )
    ranked.unpersist()
    und.unpersist()
    best = (
        sweep.where(F.col("phi").isNotNull())
        .orderBy(F.col("phi").asc(), F.col("rank").asc())
        .limit(1)
        .collect()
    )
    if not best:
        return SweepCutResult(
            sweep.where(F.lit(False)).select("id", "rank", "score"),
            sweep.select("rank", "id", "cut", "vol", "phi"),
            0, float("nan"), 0, 0, two_m,
        )
    b = best[0]
    members = sweep.where(F.col("rank") <= b["rank"]).select(
        "id", "rank", "score"
    )
    return SweepCutResult(
        members,
        sweep.select("rank", "id", "cut", "vol", "phi"),
        int(b["rank"]), float(b["phi"]), int(b["cut"]), int(b["vol"]), two_m,
    )
