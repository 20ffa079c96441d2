"""Weisfeiler-Lehman color refinement (1-WL / color refinement, the
Weisfeiler-Leman 1968 canonical-role iteration and the expressiveness
ceiling of message-passing GNNs, Xu et al. ICLR'19).

Two vertices get the same color after t rounds iff their t-hop rooted
neighborhood trees are isomorphic — the standard vertex-role /
structural-equivalence signal (template pages, boilerplate nav hubs and
mirror sites land in one color class on a web graph) and the classic
cheap graph-isomorphism refutation: different color histograms =>
non-isomorphic.

Classic 1-WL rehashes label(v) | SORTED multiset of neighbor labels,
which needs a per-vertex collect_list — a hub vertex materializes its
whole neighbor list in one row (the O10 anti-pattern). This
implementation uses the commutative MULTISET-HASH form instead:

    color_{t+1}(v) = H( color_t(v), SUM_{u in N(v)} h(color_t(u)) mod M )

where h maps a color to a 60-bit md5 integer and the sum runs mod
M = 2^61 - 1. The modular SUM is commutative/associative, so Spark
partial-combines it map-side (partial_sum in the plan) and no row ever
holds a neighbor list: hub cost is the same as a degree count. A
multiset collision needs md5-60-bit sums to coincide — negligible, and
WRONG only toward coarser colors (never splits a true class).

Refinement invariant: colors only split, never merge, so the color
COUNT is monotone non-decreasing and the iteration stabilizes in at
most |V| rounds (diameter-ish in practice). Rounds past the stable
partition are identity — the fixed-round form is oracle-friendly (the
kcore/bitruss unrolled-CTE discipline).

Everything is integers + md5 — bit-identical in any engine with md5
(DuckDB oracle: the same conv/substr/md5 expressions; reference
pargraph has no graph-algorithm library — engine extension).

Scale shape per round: neighbor hash-sums probe a dst-partitioned
persisted edge copy in place (the r4 persist-not-localCheckpoint rule,
kcore.py:166); only the V-scale color table shuffles. One E-scale
exchange total, at build.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pargraph_spark.session import ckpt_state, ckpt_state_lazy, size_based_partitions

from .edges import symmetrize

# The multiset sum runs in DECIMAL(38,0): 60-bit terms over any real
# degree (d < 10^18) stay exact — a LONG sum would overflow at degree
# ~16 and Spark 4's ANSI mode throws on that. The aggregate still
# partial-combines (decimal sum is commutative/associative), and the
# final reduction mod a Mersenne modulus brings it back to int64
# identically on both engines.
_M = (1 << 61) - 1


def _h60(col) -> F.Column:
    """60-bit md5 integer of a column's STRING form (long -> '123', so
    the bytes match str(x).encode() / DuckDB's VARCHAR cast exactly) —
    always < 2^60 < M."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")


@dataclass
class WLResult:
    colors: DataFrame  # (id, color) — 60-bit integer color ids
    rounds: int
    n_colors: int  # distinct colors at the final round
    converged: bool  # True iff the last round split nothing


def wl_colors(
    edges: DataFrame,
    rounds: int,
    init: DataFrame | None = None,
    num_partitions: int | None = None,
    check_convergence: bool = True,
) -> WLResult:
    """Run `rounds` rounds of 1-WL color refinement over the undirected
    view of `edges`; `init` is an optional (id, color) seed labeling
    (string or integer colors — attributes, degrees, page types),
    default all-equal. Returns 60-bit integer colors; equal color ==
    equal t-hop neighborhood tree (up to md5 multiset collision).

    check_convergence=False skips the per-round distinct-count job
    (oracle parity mode: rounds past stabilization are identity).
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    spark = edges.sparkSession
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    P = size_based_partitions(edges, P)  # guide §2.2, size-derived cap

    # partitioned on the JOIN key u — the per-round colors join probes
    # the persisted copy in place (the core_numbers/r4 discipline; a
    # v-partitioned copy would re-exchange the E-scale table every round)
    sym = symmetrize(edges).repartition(P, "u").persist()
    verts = sym.select(F.col("u").alias("id")).distinct()
    if init is not None:
        colors = verts.join(
            init.select("id", F.col("color").cast("string").alias("_c0")),
            "id", "left",
        ).select(
            "id", _h60(F.coalesce(F.col("_c0"), F.lit("_"))).alias("color")
        )
    else:
        colors = verts.select("id", _h60(F.lit("_")).alias("color"))
    # V-scale state: localCheckpoint per round (the labelprop idiom) —
    # colors feeds TWO consumers per round (the neighbor-sum join and the
    # rehash join), so un-truncated lineage doubles every round and the
    # driver OOMs just printing the plan by round ~10
    # with convergence checking on, the distinct-count that follows each
    # checkpoint is a full scan — lazy fuses materialization into it (r6);
    # without it no action follows, so the checkpoint must stay eager
    _ck = ckpt_state_lazy if check_convergence else ckpt_state
    colors = colors.transform(_ck, P)
    n_colors = colors.select("color").distinct().count() if check_convergence else -1

    r, converged = 0, False
    for t in range(1, rounds + 1):
        # neighbor multiset hash-sum: probe the dst(v)-partitioned edges
        # in place, partial-combine the modular sum map-side
        nbr = (
            sym.join(colors.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(
                (F.sum(_h60(F.col("color")).cast("decimal(38,0)")) % _M)
                .cast("long")
                .alias("_ns")
            )
        )
        new = (
            colors.join(nbr, "id", "left")
            .select(
                "id",
                _h60(
                    F.concat_ws(
                        "|",
                        F.col("color").cast("string"),
                        F.coalesce(F.col("_ns"), F.lit(-1)).cast("string"),
                    )
                ).alias("color"),
            )
            .transform(_ck, P)
        )
        colors, r = new, t
        if check_convergence:
            nc = colors.select("color").distinct().count()
            if nc == n_colors:
                converged = True
                n_colors = nc
                break
            n_colors = nc
    if not check_convergence:
        n_colors = colors.select("color").distinct().count()
    sym.unpersist()
    return WLResult(colors, r, n_colors, converged)


def wl_histogram(res: WLResult) -> DataFrame:
    """Color-class size histogram (color, n) — compare two graphs'
    histograms: any difference refutes isomorphism at the WL level."""
    return res.colors.groupBy("color").agg(F.count("*").alias("n"))
