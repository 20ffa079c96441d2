"""Degree assortativity + knn profile vs pure-python oracles."""

from __future__ import annotations

import math
import random

EDGE_SCHEMA = "src long, dst long"


def _sym(edges):
    s = set()
    for u, v in edges:
        if u != v:
            s.add((u, v))
            s.add((v, u))
    return s


def _py_assortativity(edges):
    sym = _sym(edges)
    deg = {}
    for u, _ in sym:
        deg[u] = deg.get(u, 0) + 1
    xs = [(deg[u], deg[v]) for u, v in sym]
    m = len(xs)
    sx = sum(x for x, _ in xs)
    sy = sum(y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs)
    syy = sum(y * y for _, y in xs)
    num = m * sxy - sx * sy
    den = math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    return m, num / den


def test_assortativity_star_is_negative(spark):
    # a star is maximally disassortative: hub deg n, leaves deg 1 -> r = -1
    from pargraph_spark.operators.graphstats import degree_assortativity

    edges = [(0, i) for i in range(1, 8)]
    row = degree_assortativity(
        spark.createDataFrame(edges, EDGE_SCHEMA)
    ).collect()[0]
    assert row["n_edges_directed"] == 14
    assert abs(row["rq"] - (-1.0)) < 1e-9


def test_assortativity_random_matches_python(spark):
    from pargraph_spark.operators.graphstats import degree_assortativity

    rng = random.Random(5)
    edges = [(s, d) for s, d in
             {(rng.randrange(40), rng.randrange(40)) for _ in range(200)}
             if s != d]
    m, r = _py_assortativity(edges)
    row = degree_assortativity(
        spark.createDataFrame(edges, EDGE_SCHEMA)
    ).collect()[0]
    assert row["n_edges_directed"] == m
    assert abs(row["rq"] - r) < 1e-8


def test_knn_profile_matches_python(spark):
    from pargraph_spark.operators.graphstats import avg_neighbor_degree_profile

    rng = random.Random(17)
    edges = [(s, d) for s, d in
             {(rng.randrange(25), rng.randrange(25)) for _ in range(120)}
             if s != d]
    sym = _sym(edges)
    deg = {}
    for u, _ in sym:
        deg[u] = deg.get(u, 0) + 1
    byk = {}
    for u, v in sym:
        byk.setdefault(deg[u], []).append(deg[v])
    got = {r["deg"]: (r["n_endpoints"], r["knnq"]) for r in
           avg_neighbor_degree_profile(
               spark.createDataFrame(edges, EDGE_SCHEMA)).collect()}
    assert set(got) == set(byk)
    for k, vs in byk.items():
        n, knn = got[k]
        assert n == len(vs)
        assert abs(knn - sum(vs) / len(vs)) < 1e-8


def test_reciprocity(spark):
    from pargraph_spark.operators.graphstats import reciprocity

    # 1->2 and 2->1 reciprocal; 2->3 one-way; 3->3 loop ignored;
    # duplicate 1->2 rows collapse
    e = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (2, 3), (3, 3)], "src long, dst long"
    )
    r = reciprocity(e).collect()[0]
    assert r["n_edges"] == 3 and r["n_reciprocal"] == 2
    assert r["reciprocity"] == 2 / 3


def test_effective_diameter_path_graph(spark):
    from pargraph_spark.operators.reach import effective_diameter

    # path 0-1-2-3-4: exact N(t) is computable by hand with k large
    # enough that every sketch stays exact (ball sizes <= 5 < k)
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src long, dst long"
    )
    out = effective_diameter(spark, e, max_hops=4, k=8, q=0.9)
    # exact tier: N = [5, 13, 19, 23, 25]; target 22.5 lands in hop 3..4
    assert out["nf"] == [5.0, 13.0, 19.0, 23.0, 25.0]
    assert out["saturated"] is False or out["nf"][-1] == out["nf"][-2]
    # target 22.5 straddles hops 2..3: 2 + (22.5 - 19) / (23 - 19)
    assert out["effective_diameter"] == 2.875
    # q at 50%: target 12.5 straddles hops 0..1: (12.5 - 5) / (13 - 5)
    lo = effective_diameter(spark, e, max_hops=4, k=8, q=0.5)
    assert lo["effective_diameter"] == 0.9375


def test_reciprocity_degenerate_graphs(spark):
    from pargraph_spark.operators.graphstats import reciprocity

    loops = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    r = reciprocity(loops).collect()[0]
    assert r["n_edges"] == 0 and r["reciprocity"] == 0.0
