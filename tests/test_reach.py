"""KMV reach sketches vs python mirror + exact small-ball semantics."""

from __future__ import annotations

import hashlib
import random

EDGE_SCHEMA = "src long, dst long"


def _h15(x: int) -> str:
    return hashlib.md5(str(x).encode()).hexdigest()[:15]


def _py_kmv(edges, hops, k):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    sk = {v: {_h15(v)} for v in adj}
    for _ in range(hops):
        nxt = {}
        for v in adj:
            merged = set(sk[v])
            for u in adj[v]:
                merged |= sk[u]
            nxt[v] = set(sorted(merged)[:k])
        sk = nxt
    out = {}
    for v, hs in sk.items():
        n = len(hs)
        if n < k:
            out[v] = (n, float(n))
        else:
            hk = int(max(hs), 16)
            out[v] = (n, float((k - 1) << 60) / float(hk))
    return out


def _ball(edges, v, t):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    cur = {v}
    for _ in range(t):
        cur = cur | {w for u in cur for w in adj.get(u, ())}
    return cur


def test_kmv_reach_matches_python_mirror(spark):
    from pargraph_spark.operators.reach import kmv_reach

    rng = random.Random(23)
    edges = [(s, d) for s, d in
             {(rng.randrange(40), rng.randrange(40)) for _ in range(120)}
             if s != d]
    expect = _py_kmv(edges, hops=2, k=4)
    got = {r["id"]: (r["sketch_n"], r["est"]) for r in kmv_reach(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA), hops=2, k=4,
        num_partitions=4).collect()}
    assert got.keys() == expect.keys()
    for v in expect:
        assert got[v][0] == expect[v][0], v
        assert abs(got[v][1] - expect[v][1]) < 1e-9, v


def test_kmv_reach_small_balls_exact(spark):
    # a path graph: every 2-hop ball has <= 5 vertices < k=8 -> exact
    from pargraph_spark.operators.reach import kmv_reach

    edges = [(i, i + 1) for i in range(12)]
    got = {r["id"]: r["est"] for r in kmv_reach(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA), hops=2, k=8,
        num_partitions=4).collect()}
    for v, est in got.items():
        assert est == float(len(_ball(edges, v, 2))), v


def test_kmv_reach_estimates_within_tolerance(spark):
    # dense random graph, k=32: KMV rsd ~ 1/sqrt(30) ~ 18%; gate at 4x
    from pargraph_spark.operators.reach import kmv_reach

    rng = random.Random(41)
    edges = [(s, d) for s, d in
             {(rng.randrange(300), rng.randrange(300)) for _ in range(1200)}
             if s != d]
    got = {r["id"]: r["est"] for r in kmv_reach(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA), hops=2, k=32,
        num_partitions=4).collect()}
    errs = []
    for v, est in got.items():
        true = len(_ball(edges, v, 2))
        if true >= 32:
            errs.append(abs(est - true) / true)
    assert errs
    assert sum(errs) / len(errs) < 0.25  # mean |rel err| well under 4x rsd


def test_harmonic_centrality_matches_python_mirror(spark):
    # mirror: same KMV sketches per hop, same (e_t - e_{t-1})/t chain
    from pargraph_spark.operators.reach import harmonic_centrality_kmv

    rng = random.Random(53)
    edges = [(s, d) for s, d in
             {(rng.randrange(30), rng.randrange(30)) for _ in range(90)}
             if s != d]
    K, T = 4, 3

    def sketches(hops):
        adj: dict[int, set[int]] = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        sk = {v: {_h15(v)} for v in adj}
        outs = [dict(sk)]
        for _ in range(hops):
            nxt = {}
            for v in adj:
                merged = set(sk[v])
                for u in adj[v]:
                    merged |= sk[u]
                nxt[v] = set(sorted(merged)[:K])
            sk = nxt
            outs.append(dict(sk))
        return outs

    def est(hs):
        n = len(hs)
        if n < K:
            return float(n)
        return float((K - 1) << 60) / float(int(max(hs), 16))

    per_hop = sketches(T)
    expect = {}
    for v in per_hop[0]:
        es = [est(per_hop[t][v]) for t in range(T + 1)]
        c = (es[1] - es[0]) / 1.0
        for t in range(2, T + 1):
            c = c + (es[t] - es[t - 1]) / float(t)
        expect[v] = c

    got = {r["id"]: r["cent"] for r in harmonic_centrality_kmv(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA), max_hops=T, k=K,
        num_partitions=4).collect()}
    assert got.keys() == expect.keys()
    for v in expect:
        assert abs(got[v] - expect[v]) < 1e-9, v


def test_harmonic_centrality_star_center_highest(spark):
    from pargraph_spark.operators.reach import harmonic_centrality_kmv

    edges = [(0, i) for i in range(1, 9)]
    got = {r["id"]: r["cent"] for r in harmonic_centrality_kmv(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA), max_hops=2, k=32,
        num_partitions=4).collect()}
    # k=32 > ball sizes: exact. center: 8 at dist 1 = 8.0;
    # leaves: 1 at dist 1 + 7 at dist 2 = 1 + 3.5 = 4.5
    assert got[0] == 8.0
    for v in range(1, 9):
        assert got[v] == 4.5


def test_hll_reach_tolerance_vs_exact_balls(spark):
    # HyperBall HLL tier: per-vertex 2-hop ball estimates within the
    # standard HLL error envelope of exact BFS ball sizes (b=6 -> ~13%
    # relative s.d.; gate on median/mean, loose on the max)
    import statistics

    from pargraph_spark.operators.reach import hll_reach

    rng = random.Random(7)
    n = 300
    edges = [(s, d) for s, d in
             {(rng.randrange(n), rng.randrange(n)) for _ in range(900)}
             if s != d]
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    exact = {}
    for v in adj:
        ball = {v}
        frontier = {v}
        for _ in range(2):
            frontier = {w for u in frontier for w in adj.get(u, ())} - ball
            ball |= frontier
        exact[v] = len(ball)

    got = {
        r["id"]: r["est"]
        for r in hll_reach(spark,
                           spark.createDataFrame(edges, "src long, dst long"),
                           hops=2, b=6, num_partitions=4).collect()
    }
    assert set(got) == set(exact)
    rel = [abs(got[v] - exact[v]) / exact[v] for v in exact]
    assert statistics.median(rel) < 0.15, statistics.median(rel)
    assert statistics.fmean(rel) < 0.2, statistics.fmean(rel)
    assert max(rel) < 0.6, max(rel)


def test_hll_reach_hop0_small_range(spark):
    # at 0 hops every ball is {v}: the small-range (linear counting)
    # branch must return ~1 for every vertex
    from pargraph_spark.operators.reach import hll_reach

    edges = [(i, i + 1) for i in range(20)]
    out = hll_reach(spark, spark.createDataFrame(edges, "src long, dst long"),
                    hops=0, b=4, num_partitions=4).collect()
    for r in out:
        assert 0.5 < r["est"] < 2.0, r
