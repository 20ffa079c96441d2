from __future__ import annotations

import random
from collections import defaultdict

from pargraph_spark.operators.temporal import earliest_arrival, handoff_edges

TE_SCHEMA = "src long, dst long, t long"


def _oracle(tedges, seeds):
    """Brute-force earliest arrival: Bellman-Ford-style fixpoint."""
    arr = dict(seeds)
    out = defaultdict(list)
    for s, d, t in tedges:
        out[s].append((d, t))
    changed = True
    while changed:
        changed = False
        for u, a in list(arr.items()):
            for v, t in out[u]:
                if t >= a and (v not in arr or t < arr[v]):
                    arr[v] = t
                    changed = True
    return arr


def test_earliest_arrival_vs_brute(spark):
    rng = random.Random(23)
    tedges = [
        (rng.randrange(30), rng.randrange(30), rng.randrange(100))
        for _ in range(150)
    ]
    seeds = [(0, 0), (7, 10)]
    res = earliest_arrival(
        spark,
        spark.createDataFrame(tedges, TE_SCHEMA),
        spark.createDataFrame(seeds, "id long, arr long"),
    )
    assert res.converged
    got = {r["id"]: r["arr"] for r in res.arrivals.collect()}
    assert got == _oracle(tedges, seeds)


def test_earliest_arrival_respects_time_order(spark):
    # 1 -(t=5)-> 2 -(t=3)-> 3: the 2->3 edge fires BEFORE arrival at 2,
    # so 3 is unreachable; a later 2->3 edge at t=9 is usable
    tedges = [(1, 2, 5), (2, 3, 3), (2, 3, 9)]
    res = earliest_arrival(
        spark,
        spark.createDataFrame(tedges, TE_SCHEMA),
        spark.createDataFrame([(1,)], "id long"),
    )
    got = {r["id"]: r["arr"] for r in res.arrivals.collect()}
    assert got == {1: 0, 2: 5, 3: 9}


def test_earliest_arrival_fixed_rounds_identity(spark):
    tedges = [(i, i + 1, 10 * i) for i in range(6)]
    df = spark.createDataFrame(tedges, TE_SCHEMA)
    seeds = spark.createDataFrame([(0,)], "id long")
    full = earliest_arrival(spark, df, seeds)
    fixed = earliest_arrival(spark, df, seeds, fixed_rounds=full.rounds + 2)
    want = {r["id"]: r["arr"] for r in full.arrivals.collect()}
    got = {r["id"]: r["arr"] for r in fixed.arrivals.collect()}
    assert got == want and full.converged and not fixed.converged


def test_handoff_edges_linear_chain(spark):
    rows = [
        # key 1: users 10 -> 20 -> 10; key 2: users 30 -> 40
        (1, 10, "2024-01-01 00:00:00", 100),
        (1, 20, "2024-01-01 00:01:00", 101),
        (1, 10, "2024-01-01 00:02:00", 102),
        (2, 30, "2024-01-01 00:00:30", 103),
        (2, 40, "2024-01-01 00:03:00", 104),
    ]
    df = spark.createDataFrame(
        rows, "k long, user long, ts string, event_id long"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    got = sorted(
        (r["src"], r["dst"]) for r in
        handoff_edges(df, "k", "user", "ts", tiebreak_col="event_id").collect()
    )
    assert got == [(10, 20), (20, 10), (30, 40)]


def _motif_oracle(tedges, delta, motif):
    """Brute-force: enumerate ordered edge triples."""
    from collections import Counter

    counts = Counter()
    es = [(s, d, t) for s, d, t in tedges if s != d]
    for u, v, t1 in es:
        for v2, w, t2 in es:
            if v2 != v or not (t1 < t2 <= t1 + delta) or w == u:
                continue
            for a, b, t3 in es:
                if not (t2 < t3 <= t1 + delta):
                    continue
                if motif == "cycle" and (a, b) == (w, u):
                    counts[u] += 1
                if motif == "ffl" and (a, b) == (u, w):
                    counts[u] += 1
    return dict(counts)


def test_temporal_motifs_vs_brute(spark):
    from pargraph_spark.operators.temporal import temporal_motifs

    rng = random.Random(31)
    tedges = [
        (rng.randrange(12), rng.randrange(12), rng.randrange(40))
        for _ in range(120)
    ]
    df = spark.createDataFrame(tedges, TE_SCHEMA)
    for motif in ("cycle", "ffl"):
        got = {
            r["id"]: r["motifs"]
            for r in temporal_motifs(spark, df, delta=15, motif=motif).collect()
        }
        assert got == _motif_oracle(tedges, 15, motif), motif


def test_temporal_motifs_hot_cap_drops_hub_motifs(spark):
    from pargraph_spark.operators.temporal import temporal_motifs

    # hub 0 participates in every edge; capping its temporal degree
    # removes all motifs through it but keeps the disjoint triangle
    tedges = [(0, i, i) for i in range(1, 8)] + [(i, 0, 10 + i) for i in range(1, 8)]
    tedges += [(20, 21, 1), (21, 22, 2), (22, 20, 3)]
    df = spark.createDataFrame(tedges, TE_SCHEMA)
    full = {
        r["id"]: r["motifs"]
        for r in temporal_motifs(spark, df, delta=30, motif="cycle").collect()
    }
    capped = {
        r["id"]: r["motifs"]
        for r in temporal_motifs(
            spark, df, delta=30, motif="cycle", hot_cap=5
        ).collect()
    }
    assert full == _motif_oracle(tedges, 30, "cycle")
    assert capped == {20: 1}


def test_earliest_arrival_timestamp_times(spark):
    # the entry path: TIMESTAMP times end-to-end, no epoch casts
    from pyspark.sql import functions as F

    rows = [
        (1, 10, "2024-01-01 00:00:00", 100),
        (1, 20, "2024-01-01 00:01:00", 101),
        (1, 30, "2024-01-01 00:02:00", 102),
        (1, 20, "2024-01-01 00:03:00", 103),
    ]
    ev = spark.createDataFrame(
        rows, "k long, user long, ts string, event_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    te = handoff_edges(ev, "k", "user", "ts", tiebreak_col="event_id")
    seeds = ev.select(F.col("user").alias("id")).where(F.col("id") == 10).withColumn(
        "arr", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    res = earliest_arrival(spark, te, seeds, fixed_rounds=3)
    got = {r["id"]: str(r["arr"]) for r in res.arrivals.collect()}
    # 10 seeds at t0; 10->20 at 00:01, 20->30 at 00:02, 30->20 at 00:03
    assert got == {
        10: "2024-01-01 00:00:00",
        20: "2024-01-01 00:01:00",
        30: "2024-01-01 00:02:00",
    }


def test_earliest_arrival_incremental_warm_start(spark):
    # append edges, warm-start from the previous arrivals: identical
    # fixpoint, fewer rounds (the cc_incremental warm == cold pattern)
    rng = random.Random(41)
    base = [
        (rng.randrange(25), rng.randrange(25), rng.randrange(80))
        for _ in range(120)
    ]
    delta = [
        (rng.randrange(25), 25 + rng.randrange(5), 80 + rng.randrange(20))
        for _ in range(30)
    ]
    seeds = spark.createDataFrame([(0,), (3,)], "id long")
    prev = earliest_arrival(spark, spark.createDataFrame(base, TE_SCHEMA), seeds)
    full_df = spark.createDataFrame(base + delta, TE_SCHEMA)
    cold = earliest_arrival(spark, full_df, seeds)
    warm_seeds = prev.arrivals.unionByName(
        seeds.withColumn("arr", __import__("pyspark.sql.functions",
                                           fromlist=["F"]).lit(0).cast("long"))
    )
    warm = earliest_arrival(spark, full_df, warm_seeds)
    want = {r["id"]: r["arr"] for r in cold.arrivals.collect()}
    got = {r["id"]: r["arr"] for r in warm.arrivals.collect()}
    assert got == want
    assert warm.rounds <= cold.rounds


def test_temporal_motifs_edges_probed_in_place(spark):
    # r5 review fix: each of the three join roles probes its own
    # co-partitioned persisted copy — no E-scale Exchange above any
    # InMemoryTableScan in the executed plan
    import datetime

    from pargraph_spark.operators.temporal import temporal_motifs

    t0 = datetime.datetime(2026, 1, 1)
    te = spark.createDataFrame(
        [(i % 7, (i + 1) % 7, t0 + datetime.timedelta(minutes=i)) for i in range(30)],
        "src long, dst long, t timestamp",
    )
    out = temporal_motifs(spark, te, delta=datetime.timedelta(hours=2))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every scan of a persisted copy must be exchange-free on its side:
    # an Exchange directly over an InMemoryTableScan means a copy was
    # partitioned on the wrong key
    import re

    for mth in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)[^\n]*\n(?:\s*\+- )?\s*\*?\(?\d*\)? ?InMemoryTableScan", plan):
        raise AssertionError("E-scale re-exchange over a persisted copy:\n" + mth.group(0))
    assert plan.count("InMemoryTableScan") >= 3, plan
