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
