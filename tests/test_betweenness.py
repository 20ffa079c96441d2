from __future__ import annotations

import math
from collections import defaultdict

import pytest

from pargraph_spark.operators.betweenness import betweenness

EDGE_SCHEMA = "src long, dst long"
G = float(1 << 30)


def _q(x: float) -> float:
    # HALF_UP on the 2^-30 grid (Spark F.round / DuckDB round for x >= 0);
    # python round() is banker's and would diverge at exact midpoints,
    # which sigma ratios like 1/2 hit structurally often
    return math.floor(x * G + 0.5) / G


def _brandes_bounded(edges, sources, h, directed=True):
    """Truncated Brandes with the operator's exact grid quantization."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            if not directed:
                adj[d].add(s)
    verts = set(adj)
    for s in list(adj):
        verts |= adj[s]
    bc = {v: 0.0 for v in verts}
    for s in sources:
        # forward
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for d in range(h):
            nxt = defaultdict(int)
            for v in levels[-1]:
                for w in adj[v]:
                    if w not in dist or dist.get(w) == d + 1:
                        nxt[w] += sigma[v]
            frontier = [w for w in nxt if w not in dist]
            if not frontier:
                break
            for w in frontier:
                dist[w] = d + 1
                sigma[w] = nxt[w]
            levels.append(sorted(frontier))
        # backward
        delta = {v: 0.0 for v in dist}
        for d in range(len(levels) - 2, 0, -1):
            for v in levels[d]:
                acc = 0.0
                for w in adj[v]:
                    if dist.get(w) == d + 1:
                        acc += _q(sigma[v] / sigma[w] * (1.0 + delta[w]))
                delta[v] = acc
                bc[v] += acc
    return bc


def _path_graph():
    return [(i, i + 1) for i in range(6)]


def test_betweenness_path_exact(spark):
    # undirected path 0-1-...-6, h large enough to be exact:
    # BC(v) for interior v of an n-path = (v)(n-1-v) pairs, each direction
    edges = _path_graph()
    res = betweenness(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA),
        max_depth=6, directed=False, num_partitions=4,
    )
    got = {r["id"]: r["bc"] for r in res.scores.collect()}
    for v in range(7):
        assert got[v] == float(v * (6 - v) * 2), v
    assert res.n_sources == 7


@pytest.mark.parametrize("seed,n,m,h", [(5, 40, 140, 3), (9, 60, 260, 4)])
def test_betweenness_random_vs_brute(spark, seed, n, m, h):
    import random

    rng = random.Random(seed)
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    edges = [(a, b) for a, b in edges if a != b]
    sources = [v for v in range(n) if v % 3 == 0]
    sdf = spark.createDataFrame([(v,) for v in sources], "id long")
    res = betweenness(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA), sources=sdf,
        max_depth=h, directed=True, num_partitions=4,
    )
    got = {r["id"]: r["bc"] for r in res.scores.collect()}
    want = _brandes_bounded(edges, [s for s in sources if s in got], h)
    assert set(got) == set(want)
    for v in got:
        # grid-exact: bit-identical, no tolerance
        assert got[v] == want[v], (v, got[v], want[v])


def test_betweenness_star_center(spark):
    # undirected star: all shortest paths route through the hub
    edges = [(0, i) for i in range(1, 9)]
    res = betweenness(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA),
        max_depth=2, directed=False, num_partitions=4,
    )
    got = {r["id"]: r["bc"] for r in res.scores.collect()}
    # 8 leaves: each ordered leaf pair (8*7) routes via hub once
    assert got[0] == float(8 * 7)
    assert all(got[v] == 0.0 for v in range(1, 9))
