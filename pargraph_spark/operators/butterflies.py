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

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
            (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("bf"),
        )
    )
    per_pair = pairs
    total_row = per_pair.agg(F.coalesce(F.sum("bf"), F.lit(0)).alias("t")).first()
    return ButterflyResult(int(total_row["t"]), per_pair)
