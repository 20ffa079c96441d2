from __future__ import annotations

import hashlib
import random
from collections import defaultdict

from pargraph_spark.operators.coloring import greedy_coloring

EDGE_SCHEMA = "src long, dst long"


def _pk(v, salt="color"):
    h = hashlib.md5(f"{salt}|0|{v}".encode()).hexdigest()[:16]
    return f"{h}-{v:020d}"


def _greedy_oracle(edges, salt="color"):
    """Sequential greedy coloring in ascending md5-priority order —
    provably what Jones-Plassmann with fixed priorities computes."""
    nbr = defaultdict(set)
    for u, v in edges:
        if u != v:
            nbr[u].add(v)
            nbr[v].add(u)
    color = {}
    for v in sorted(nbr, key=lambda x: _pk(x, salt)):
        used = {color[u] for u in nbr[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color


def _run(spark, edges, **kw):
    res = greedy_coloring(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA), **kw
    )
    return {r["id"]: r["color"] for r in res.colors.collect()}, res


def test_coloring_matches_sequential_greedy(spark):
    rng = random.Random(17)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(60), rng.randrange(60)) for _ in range(150))
            if a != b
        }
    )
    got, res = _run(spark, edges)
    assert res.converged
    assert got == _greedy_oracle(edges)
    # proper coloring
    for u, v in edges:
        if u != v:
            assert got[u] != got[v]


def test_coloring_clique_uses_exactly_n_colors(spark):
    k = [(a, b) for a in range(6) for b in range(6) if a < b]
    got, res = _run(spark, k)
    assert sorted(got.values()) == list(range(6))
    assert res.converged


def test_coloring_fixed_rounds_prefix(spark):
    # fixed_rounds output is a prefix of the converged coloring: every
    # vertex colored by round r keeps that color at convergence
    rng = random.Random(3)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(40), rng.randrange(40)) for _ in range(90))
            if a != b
        }
    )
    part, pres = _run(spark, edges, fixed_rounds=2)
    full, fres = _run(spark, edges)
    assert not pres.converged and fres.converged
    assert part  # round 2 colored someone
    for v, c in part.items():
        assert full[v] == c
