from __future__ import annotations

import math

from pargraph_spark.operators.trust import spam_mass, trustrank

from .oracles import pagerank_oracle, ppr_oracle

EDGE_SCHEMA = "src long, dst long"


def _spam_farm_graph():
    """Trusted core (0-4, densely linked) + honest tail (5-14, linked from
    the core) + an isolated spam farm (100-107, only interlinking itself)."""
    core = [(a, b) for a in range(5) for b in range(5) if a != b]
    tail = [(i % 5, 5 + i) for i in range(10)] + [(5 + i, (i + 1) % 5) for i in range(10)]
    farm = [(a, b) for a in range(100, 108) for b in range(100, 108) if a != b]
    return core + tail + farm


def test_trustrank_matches_ppr_oracle(spark):
    edges = _spam_farm_graph()
    verts = sorted({v for e in edges for v in e})
    seeds = spark.createDataFrame([(v,) for v in range(5)], "id long")
    res = trustrank(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA), seeds,
        tol=0.0, max_iter=8, num_partitions=4,
    )
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    want = ppr_oracle(edges, verts, {v: 1.0 for v in range(5)}, iterations=8)
    assert set(got) == set(want)
    for v in verts:
        assert math.isclose(got[v], want[v], abs_tol=1e-9), v
    # trust never reaches the farm: zero teleport + zero inbound trusted flow
    assert all(got[v] == 0.0 for v in range(100, 108))


def test_spam_mass_flags_farm_not_core(spark):
    edges = _spam_farm_graph()
    verts = sorted({v for e in edges for v in e})
    seeds = spark.createDataFrame([(v,) for v in range(5)], "id long")
    res = spam_mass(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA), seeds,
        iterations=8, num_partitions=4,
    )
    rows = {r["id"]: r for r in res.scores.collect()}
    pr = pagerank_oracle(edges, verts, tol=-1.0, max_iter=8)
    tr = ppr_oracle(edges, verts, {v: 1.0 for v in range(5)}, iterations=8)
    for v in verts:
        want = (pr[v] - tr[v]) / pr[v]
        assert math.isclose(rows[v]["spam_mass"], want, abs_tol=1e-9), v
    # farm pages: virtually all rank is unendorsed by the trusted core
    assert all(rows[v]["spam_mass"] > 0.95 for v in range(100, 108))
    # trusted core: trusted flow covers (more than) their raw rank
    assert all(rows[v]["spam_mass"] < 0.0 for v in range(5))
    # metrics carry both inner runs
    assert len(res.metrics.supersteps) == 16
