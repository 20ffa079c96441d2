"""Weighted shortest paths: frontier Bellman-Ford vs pure-python oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pargraph_spark.operators.sssp import sssp

EDGE_SCHEMA = "src long, dst long, w long"


def _py_sssp(edges, sources, rounds, symmetric=True):
    """Full Bellman-Ford relaxation limited to `rounds` rounds: after k
    rounds d(v) = min weight over paths of <= k edges (the same contract
    the frontier implementation guarantees)."""
    adj = {}
    for s, d, w in edges:
        if s == d:
            continue
        pairs = [(s, d), (d, s)] if symmetric else [(s, d)]
        for a, b in pairs:
            k = (a, b)
            adj[k] = min(adj[k], w) if k in adj else w
    dist = {v: 0 for v in sources}
    for _ in range(rounds):
        new = dict(dist)
        for (a, b), w in adj.items():
            if a in dist and (b not in new or dist[a] + w < new[b]):
                new[b] = dist[a] + w
        dist = new
    return dist


def _run(spark, edges, sources, rounds, symmetric=True):
    edf = spark.createDataFrame(edges, EDGE_SCHEMA)
    sdf = spark.createDataFrame([(v,) for v in sources], "id long")
    res = sssp(spark, edf, sdf, weight_col="w", max_rounds=rounds,
               symmetric=symmetric, num_partitions=4)
    return {r["id"]: r["dist"] for r in res.distances.collect()}, res


def test_line_graph_exact(spark):
    edges = [(0, 1, 5), (1, 2, 1), (2, 3, 1), (0, 3, 10)]
    got, res = _run(spark, edges, [0], rounds=10)
    assert got == {0: 0, 1: 5, 2: 6, 3: 7}  # 3 via the 3-hop path, not 0->3
    assert res.exhausted


def test_round_limit_is_path_length_bound(spark):
    # after 1 round only direct edges; the cheaper 3-hop path needs 3 rounds
    edges = [(0, 1, 5), (1, 2, 1), (2, 3, 1), (0, 3, 10)]
    got1, _ = _run(spark, edges, [0], rounds=1)
    assert got1 == {0: 0, 1: 5, 3: 10}
    got3, _ = _run(spark, edges, [0], rounds=3)
    assert got3[3] == 7


@pytest.mark.parametrize("symmetric", [True, False])
@pytest.mark.parametrize("rounds", [2, 4, 50])
def test_random_graph_matches_python(spark, symmetric, rounds):
    rng = random.Random(42)
    n = 50
    edges = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(1, 20))
        for _ in range(180)
    ]
    sources = [0, 1, 2]
    got, res = _run(spark, edges, sources, rounds, symmetric=symmetric)
    want = _py_sssp(edges, sources, rounds, symmetric=symmetric)
    assert got == want
    if rounds == 50:
        assert res.exhausted  # frontier must drain well before 50 rounds


def test_parallel_edges_keep_min_weight(spark):
    edges = [(0, 1, 9), (0, 1, 2), (1, 0, 7)]
    got, _ = _run(spark, edges, [0], rounds=2)
    assert got[1] == 2  # min across parallel + symmetrized duplicates
