"""Link prediction: common-neighbor top-k candidate pairs.

The classic structural link predictor (Liben-Nowell & Kleinberg, CIKM'03):
rank non-adjacent vertex pairs by |Γ(a) ∩ Γ(b)|. On a web graph this
surfaces pages that SHOULD be linked (related-page suggestion, spam-farm
stitching detection). Scores are pure integer counts, so the oracle is
exact with no float policy at all.

Scale shape — the wedge-enumeration problem has the same hub hazard as
triangle counting: a common neighbor w contributes deg(w)² candidate
pairs, so a 10^8-degree hub alone would emit 10^16 rows. The guard is
the engine's standard hot-key cap (dedup.py's hot-bucket discipline
applied to wedge centers): drop centers with deg(w) > hot_cap BEFORE the
self-join, bounding per-center fan-out at hot_cap² — the cap is part of
the operator's declared semantics (exactly reproduced by the oracle),
not a silent truncation, and mirrors how production similarity systems
treat stop-hubs (a w linked by everything carries no signal anyway —
inverse-frequency logic, same reason idf down-weights stop-words). The
candidate aggregation partial-combines map-side; the final per-source
top-k compiles to WindowGroupLimit (rank pushed below the shuffle —
map-side cut, the neighbor_sample_2hop pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def common_neighbors_topk(
    edges: DataFrame,
    k: int = 5,
    hot_cap: int | None = None,
) -> DataFrame:
    """edges(src, dst) treated undirected → (a, b, cn, rn): for each
    vertex a, its top-k non-adjacent partners b (a < b) by common-neighbor
    count cn, ranked rn = 1..k by (cn desc, b asc). Wedge centers with
    degree > hot_cap are excluded (declared cap semantics; None = exact)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    adj = sym.select(F.col("v").alias("w"), F.col("u").alias("x"))
    if hot_cap is not None:
        deg = sym.groupBy(F.col("u").alias("w")).agg(F.count("*").alias("_d"))
        adj = adj.join(deg.where(F.col("_d") <= int(hot_cap)).select("w"), "w")
    a1 = adj.select("w", F.col("x").alias("a"))
    a2 = adj.select("w", F.col("x").alias("b"))
    cn = (
        a1.join(a2, "w")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cn"))
    )
    cand = cn.join(
        und.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    win = Window.partitionBy("a").orderBy(F.desc("cn"), F.asc("b"))
    return (
        cand.withColumn("rn", F.row_number().over(win).cast("long"))
        .where(F.col("rn") <= int(k))
    )
