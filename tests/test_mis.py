"""Deterministic Luby MIS: independence + maximality + python mirror."""

from __future__ import annotations

import random

EDGE_SCHEMA = "src long, dst long"


def _run(spark, edges, **kw):
    from pargraph_spark.operators.mis import maximal_independent_set

    edf = spark.createDataFrame(edges, EDGE_SCHEMA)
    return maximal_independent_set(spark, edf, num_partitions=4, **kw)


def test_mis_independent_and_maximal(spark):
    rng = random.Random(7)
    edges = [(s, d) for s, d in
             {(rng.randrange(40), rng.randrange(40)) for _ in range(200)}
             if s != d]
    res = _run(spark, edges)
    assert res.converged
    members = {r["id"] for r in res.members.collect()}
    sym = {(s, d) for s, d in edges} | {(d, s) for s, d in edges}
    adj: dict[int, set[int]] = {}
    for s, d in sym:
        adj.setdefault(s, set()).add(d)
    # independent: no two members adjacent
    for u, v in sym:
        assert not (u in members and v in members), (u, v)
    # maximal: every non-member has a member neighbor
    for v in adj:
        if v not in members:
            assert adj[v] & members, v


def test_mis_deterministic_across_runs_and_partitions(spark):
    rng = random.Random(19)
    edges = [(s, d) for s, d in
             {(rng.randrange(30), rng.randrange(30)) for _ in range(120)}
             if s != d]
    a = {r["id"] for r in _run(spark, edges).members.collect()}
    from pargraph_spark.operators.mis import maximal_independent_set

    edf = spark.createDataFrame(edges, EDGE_SCHEMA).repartition(13)
    b = {r["id"] for r in
         maximal_independent_set(spark, edf, num_partitions=7).members.collect()}
    assert a == b and a


def test_mis_fixed_rounds_identity_past_exhaustion(spark):
    edges = [(i, i + 1) for i in range(10)]
    adaptive = _run(spark, edges)
    fixed = _run(spark, edges, fixed_rounds=adaptive.rounds + 2)
    a = {r["id"] for r in adaptive.members.collect()}
    f = {r["id"] for r in fixed.members.collect()}
    assert a == f
    assert not fixed.converged
