"""k-core peel vs pure-python oracle."""

from __future__ import annotations

import random

import pytest

from pargraph_spark.operators.kcore import kcore

EDGE_SCHEMA = "src long, dst long"


def _py_kcore(edges, k):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for n in adj[v]:
                    adj[n].discard(v)
                del adj[v]
                changed = True
    return {v: len(ns) for v, ns in adj.items()}


def _run(spark, edges, k, **kw):
    edf = spark.createDataFrame(edges, EDGE_SCHEMA)
    res = kcore(spark, edf, k, num_partitions=4, **kw)
    return {r["id"]: r["deg"] for r in res.vertices.collect()}, res


def test_triangle_plus_tail(spark):
    # triangle (2-core) with a dangling tail that peels away
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    got, res = _run(spark, edges, 2)
    assert got == {0: 2, 1: 2, 2: 2}
    assert res.rounds >= 1


def test_whole_graph_survives_k1(spark):
    edges = [(0, 1), (1, 2)]
    got, _ = _run(spark, edges, 1)
    assert got == {0: 1, 1: 2, 2: 1}


def test_empty_core(spark):
    edges = [(0, 1), (1, 2), (2, 3)]  # path: no 2-core
    got, _ = _run(spark, edges, 2)
    assert got == {}


@pytest.mark.parametrize("k", [2, 3, 4])
def test_random_graph_matches_python(spark, k):
    rng = random.Random(7)
    n = 60
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(220)})
    got, _ = _run(spark, edges, k)
    assert got == _py_kcore(edges, k)


def test_validates_k(spark):
    edf = spark.createDataFrame([(0, 1)], EDGE_SCHEMA)
    with pytest.raises(ValueError, match="k >= 1"):
        kcore(spark, edf, 0)
