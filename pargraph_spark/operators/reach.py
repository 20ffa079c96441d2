"""Approximate per-vertex neighborhood function via deterministic
k-minimum-values sketches — the HyperANF class of algorithm (Boldi &
Vigna 2011) with a KMV estimator (Bar-Yossef et al. 2002) instead of
HyperLogLog registers.

What it computes: for every vertex, an estimate of |ball(v, t)| — the
number of distinct vertices within t hops — after t sketch-propagation
rounds. Summed over vertices this is the neighborhood function N(t),
whose saturation point is the graph's effective diameter; per-vertex it
ranks pages by how much of the web they can reach in t clicks (a
centrality signal PageRank doesn't give you).

Why KMV instead of HLL here: a KMV sketch is just the k smallest
values of a uniform hash over the ball — with md5 as the hash it is a
PURE function of the reachable set, so the whole computation is
bit-deterministic and carries an exact DuckDB value-oracle (the driver
gate), which register-based HLL can never do cross-engine. Accuracy is
the standard KMV bound (relative s.d. ≈ 1/√(k−2)); balls smaller than k
are EXACT (the sketch holds the whole ball).

Scale shape per round: sketch rows (v, h) live hash-partitioned; the
propagation join sym⋈rows is one co-partitionable exchange; the
(v, h)-keyed distinct partial-combines map-side; the per-vertex top-k
compiles to WindowGroupLimit, whose Partial stage bounds what a
10^8-degree hub ships to k rows per map task BEFORE the exchange to v.
State per vertex is ≤ k rows × 16 B — 10^12 vertices × k=8 ≈ the size
of one rank vector, not of the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.operators.edges import symmetrize
from pargraph_spark.plans.debug import dump_plan
from pargraph_spark.session import no_aqe, size_based_partitions

_HEX_BITS = 60  # 15 hex chars of md5 — fits BIGINT exactly in both engines


def _h15(col):
    """15-hex-char md5 prefix: fixed-width lowercase hex, so LEXICOGRAPHIC
    order == numeric order (sketches sort as strings; only the final
    estimator parses the k-th value to an integer)."""
    return F.substring(F.md5(col.cast("string").cast("binary")), 1, 15)


def _h60(col):
    """The same 60-bit hash as a BIGINT. r6 (guide §2.3, narrower types):
    sketch rows used to carry the 15-char hex STRING through every
    propagation exchange (~23 B + offsets per value); as a long they are
    8 B and compare as integers. Fixed-width lowercase hex sorts
    lexicographically exactly as the integer sorts numerically, so min/
    max/top-k over the long sketch select the SAME values and the final
    estimator sees identical operands — outputs are bit-identical."""
    return F.conv(_h15(col), 16, 10).cast("bigint")


def _propagate(spark, edges, hops: int, k: int, P: int,
               keep_all: bool = False):
    """Run the KMV sketch-propagation loop; returns the final sketch rows
    (v, h), or a list [rows_0 .. rows_hops] when keep_all (each
    localCheckpoint-materialized — intermediate hops stay valid)."""
    from pyspark.sql import Window

    P = size_based_partitions(edges, P)  # guide §2.2, size-derived cap
    # persist retains hash(u) outputPartitioning across hops; a
    # localCheckpoint scan under AQE would report unknown partitioning and
    # force an E-scale exchange of sym every hop (the core_numbers r4 fix)
    sym = symmetrize(edges).repartition(P, "u").persist()
    sym.count()
    with no_aqe(spark, P):
        verts = sym.select(F.col("u").alias("v")).distinct()
        rows = verts.select("v", _h60(F.col("v")).alias("h")).repartition(P, "v")
        rows = rows.localCheckpoint(eager=True)
        all_rows = [rows]
        w = Window.partitionBy("v").orderBy("h")
        for _ in range(hops):
            # rows is checkpointed hash(v, P); renamed to u it co-partitions
            # with sym, so the propagation join runs in place (shuffle_hash:
            # build the V·k sketch side, never sort the E-scale sym table)
            msgs = sym.join(rows.withColumnRenamed("v", "u").withColumnRenamed(
                "h", "_h").hint("shuffle_hash"), "u").select(
                "v", F.col("_h").alias("h"))
            merged = (
                rows.unionByName(msgs)
                .distinct()  # (v,h)-keyed: partial-combines map-side
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= k)
                .drop("_rn")
                # no trailing repartition: the window's exchange already
                # leaves hash(v, P), which the checkpoint records (no_aqe)
            )
            old = rows
            dump_plan(merged, "kmv_reach_hop")
            rows = merged.localCheckpoint(eager=True)
            if not keep_all:
                old.unpersist()
            all_rows.append(rows)
    sym.unpersist()  # sketch rows are localCheckpoint-materialized
    return all_rows if keep_all else rows


def _estimate(rows: DataFrame, k: int) -> DataFrame:
    """(id, sketch_n, est) from sketch rows: exact count below k, else
    the KMV estimator (k−1)·2^60 / h_(k) — a single division of exactly-
    derived operands, bit-identical across engines."""
    num = float((k - 1) << _HEX_BITS)  # exact: (k-1) * 2^60 is a binary value
    agg = rows.groupBy(F.col("v").alias("id")).agg(
        F.count("*").alias("sketch_n"), F.max("h").alias("_hk")
    )
    hk = F.col("_hk").cast("double")  # h is already the 60-bit BIGINT
    return agg.select(
        "id",
        "sketch_n",
        F.when(F.col("sketch_n") < k, F.col("sketch_n").cast("double"))
        .otherwise(F.lit(num) / hk)
        .alias("est"),
    )


def kmv_reach(
    spark: SparkSession,
    edges: DataFrame,
    hops: int,
    k: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, sketch_n, est): estimated |ball(id, hops)| on the undirected
    graph. sketch_n < k means the ball is smaller than the sketch and
    `est` is its EXACT size; otherwise est = (k−1)·2^60 / h_(k), the KMV
    estimator on the k-th smallest hash. Deterministic: same graph, same
    k, same hops → identical output on any engine (md5 + exact IEEE
    ops), which is what makes the DuckDB oracle exact."""
    if hops < 0 or k < 2:
        raise ValueError(f"need hops >= 0 and k >= 2, got {hops=}, {k=}")
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    return _estimate(_propagate(spark, edges, hops, k, P), k)


def harmonic_centrality_kmv(
    spark: SparkSession,
    edges: DataFrame,
    max_hops: int,
    k: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Approximate harmonic centrality truncated at max_hops — the
    application HyperBall was built for (Boldi & Vigna 2014, "Axioms for
    centrality"): cent(v) = Σ_u 1/d(v,u) ≈ Σ_{t=1..T} (|B(v,t)| −
    |B(v,t−1)|)/t, with ball sizes from the same deterministic KMV
    sketches as kmv_reach — so this too carries an exact DuckDB oracle
    (the float combination is a FIXED left-associated chain of exact-
    operand IEEE ops, mirrored verbatim in the SQL).

    Output (id, cent): closeness-style importance that, unlike PageRank,
    counts how NEAR everything is rather than how much rank flows in —
    the standard second centrality on web graphs. Truncation at T is the
    honest scale choice: each extra hop is one more propagation round,
    and on small-diameter web graphs T≈6 captures nearly all mass."""
    if max_hops < 1 or k < 2:
        raise ValueError(f"need max_hops >= 1 and k >= 2, got {max_hops=}, {k=}")
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    hop_rows = _propagate(spark, edges, max_hops, k, P, keep_all=True)
    ests = [_estimate(r, k) for r in hop_rows]
    out = ests[0].select("id", F.col("est").alias("e0"))
    for t in range(1, max_hops + 1):
        out = out.join(
            ests[t].select("id", F.col("est").alias(f"e{t}")), "id"
        )
    # fixed left-assoc chain: ((e1-e0)/1 + (e2-e1)/2) + ... — mirrored
    # exactly in the oracle SQL so every float op sees identical operands
    cent = (F.col("e1") - F.col("e0")) / F.lit(1.0)
    for t in range(2, max_hops + 1):
        cent = cent + (F.col(f"e{t}") - F.col(f"e{t-1}")) / F.lit(float(t))
    # materialize the V-scale result, then release the max_hops+1 per-hop
    # sketch tables keep_all left pinned (review r5: a lazy return kept
    # (T+1)·V·k rows alive for the session — the effective_diameter
    # release, applied here)
    res = out.select("id", cent.alias("cent")).localCheckpoint(eager=True)
    for r in hop_rows:
        r.unpersist()
    return res


def neighborhood_function(reach: DataFrame) -> DataFrame:
    """N(t) = Σ_v est(v, t): one row (n_vertices, n_reachable_pairs_est).
    Run kmv_reach at increasing t; the t where this saturates (≥90% of
    the final value) is the effective diameter. NOTE: the float sum is
    order-dependent (not cross-engine-hashable — this is a summary
    convenience, deliberately not an oracled query; the per-vertex
    kmv_reach output is the deterministic artifact)."""
    return reach.agg(
        F.count("*").alias("n_vertices"),
        F.sum("est").alias("n_reachable_pairs_est"),
    )


# ---- HyperBall tier: HLL registers (Boldi & Vigna 2011) -------------------

def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_reach(
    spark: SparkSession,
    edges: DataFrame,
    hops: int,
    b: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, est): HyperBall proper — per-vertex |ball(id, hops)| estimates
    with HyperLogLog registers instead of kmv_reach's k-min values.

    Tier relationship (both are the HyperANF sketch-propagation loop):
    kmv_reach is the ORACLED tier — md5 k-min sketches are a pure
    function of the reachable set, so the driver gate hash-checks it
    exactly; this HLL tier is the MEMORY tier — state is exactly
    m = 2^b registers (≤ 6 bits each) per vertex regardless of ball
    size, merge is an elementwise max (associative + idempotent, so
    partial aggregation is lossless), and relative s.d. ≈ 1.04/√m
    (b=6 → ~13%). Estimates are engine-deterministic (md5 bucketing,
    integer bit-length ranks, fixed-shape float chain) but carry the
    usual HLL bias, so correctness is tolerance-gated in pytest against
    exact BFS ball sizes, deliberately not a value-oracle query.

    Plan shape per hop: registers ride as m integer COLUMNS (not an
    array), so the merge is a groupBy(v) of m max() aggregates — fully
    partial-combined map-side, meaning a 10^8-degree hub reduces to one
    m-register row per map task before the exchange; no explode, no
    UDF, no per-row Python. The symmetric edge table is persisted
    partitioned on the probe key and reused every hop.
    """
    if hops < 0 or not (2 <= b <= 12):
        raise ValueError(f"need hops >= 0 and 2 <= b <= 12, got {hops=}, {b=}")
    m = 1 << b
    rem_bits = _HEX_BITS - b
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    regs_cols = [f"r{i}" for i in range(m)]

    sym = symmetrize(edges).repartition(P, "u").persist()
    sym.count()
    verts = sym.select(F.col("u").alias("v")).distinct()
    h = F.conv(_h15(F.col("v")), 16, 10).cast("bigint")
    bucket = F.shiftright(h, rem_bits)
    rem = h - F.shiftleft(bucket, rem_bits)
    # rank = leading zeros in the remaining bits + 1, via integer
    # bit-length (length of the binary string; bin(0) = "0" needs the
    # explicit branch) — no float log anywhere
    rank = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits) - F.length(F.bin(rem)) + 1
    )
    regs = verts.select(
        "v",
        *[
            F.when(bucket == i, rank).otherwise(F.lit(0)).cast("int").alias(c)
            for i, c in enumerate(regs_cols)
        ],
    ).repartition(P, "v").localCheckpoint(eager=True)
    for _ in range(hops):
        msgs = sym.join(regs.withColumnRenamed("v", "u"), "u").select(
            "v", *regs_cols
        )
        merged = (
            regs.unionByName(msgs)
            .groupBy("v")
            .agg(*[F.max(c).alias(c) for c in regs_cols])
            .repartition(P, "v")
        )
        old = regs
        regs = merged.localCheckpoint(eager=True)
        old.unpersist()
    sym.unpersist()
    alpha = _hll_alpha(m)
    inv_sum = sum(
        (F.pow(F.lit(2.0), -F.col(c)) for c in regs_cols[1:]),
        F.pow(F.lit(2.0), -F.col(regs_cols[0])),
    )
    zeros = sum(
        (F.when(F.col(c) == 0, 1).otherwise(0) for c in regs_cols[1:]),
        F.when(F.col(regs_cols[0]) == 0, 1).otherwise(0),
    )
    raw = F.lit(alpha * m * m) / inv_sum
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return regs.select(F.col("v").alias("id"), est.alias("est"))


def effective_diameter(
    spark: SparkSession,
    edges: DataFrame,
    max_hops: int,
    k: int = 8,
    q: float = 0.9,
    num_partitions: int | None = None,
) -> dict:
    """HyperANF-style effective diameter (Palmer/ANF KDD'02, Boldi &
    Vigna WWW'11): the smallest t where the neighborhood function
    N(t) = Σ_v |ball(v, t)| reaches q (default 90%) of N(max_hops), with
    the standard linear interpolation between the straddling hops —
    "90% of connected pairs are within ~d hops", the classic
    small-world summary of a web graph.

    Returns {"effective_diameter": float, "saturated": bool,
    "nf": [N(0)..N(max_hops)]}. saturated=False means N was still
    growing at max_hops (N(max)-N(max-1) > 0.1% of N(max)) and the
    figure is a lower bound — raise max_hops.

    Determinism: per-vertex KMV estimates are engine-exact (kmv_reach);
    the N(t) totals sum floats in aggregation order, so this is a
    SUMMARY convenience like neighborhood_function, deliberately not an
    oracled query (pytest tolerance only).

    Scale shape: one propagation run reusing _propagate(keep_all=True)
    — per-hop sketch tables are localCheckpoint-materialized (<= k
    rows/vertex), per-hop totals are 1-row aggregates; the driver holds
    max_hops+1 scalars.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    P = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    per_hop = _propagate(spark, edges, max_hops, k, P, keep_all=True)
    nf = [
        float(
            _estimate(rows, k).agg(F.sum("est")).collect()[0][0] or 0.0
        )
        for rows in per_hop
    ]
    # only scalars leave this function: release the max_hops+1
    # materialized per-hop sketch tables (keep_all skips the loop's own
    # unpersist) so a long session doesn't hold V*k rows per hop forever
    for rows in per_hop:
        rows.unpersist()
    target = q * nf[-1]
    saturated = nf[-1] - nf[-2] <= 0.001 * nf[-1]
    eff = float(max_hops)
    for t in range(max_hops + 1):
        if nf[t] >= target:
            if t == 0 or nf[t] == nf[t - 1]:
                eff = float(t)
            else:
                # linear interpolation inside hop (t-1, t], ANF-style
                eff = (t - 1) + (target - nf[t - 1]) / (nf[t] - nf[t - 1])
            break
    return {"effective_diameter": eff, "saturated": saturated, "nf": nf}
