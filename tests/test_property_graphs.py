"""Property-based conformance: random small graphs, Spark vs pure-Python
oracles — the reference's generated-structure testing pattern
(/root/reference/tests/test_engine.py:13-30 generates binary trees with a
closed-form oracle) generalized with hypothesis."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pargraph_spark.operators.components import connected_components
from pargraph_spark.operators.pagerank import pagerank
from pargraph_spark.operators.triangles import triangle_count

from .oracles import components_oracle, pagerank_oracle, triangles_oracle

EDGE_SCHEMA = "src long, dst long"

edge_lists = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=30,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(edges=edge_lists)
@settings(**_SETTINGS)
def test_components_match_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    verts = sorted({v for e in edges for v in e})
    res = connected_components(
        spark.sparkSession if hasattr(spark, "sparkSession") else spark,
        spark.createDataFrame(edges, EDGE_SCHEMA),
        num_partitions=3,
    )
    got = {r["id"]: r["component"] for r in res.components.collect()}
    assert got == components_oracle(edges, verts)


@given(edges=edge_lists)
@settings(**_SETTINGS)
def test_triangles_match_bruteforce(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    total, per = triangles_oracle(edges)
    res = triangle_count(spark, spark.createDataFrame(edges, EDGE_SCHEMA))
    assert res.total == total
    assert {r["id"]: r["tri"] for r in res.per_vertex.collect()} == per


@given(edges=edge_lists)
@settings(**_SETTINGS)
def test_pagerank_matches_numpy(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    verts = sorted({v for e in edges for v in e})
    res = pagerank(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA),
        tol=1e-10, max_iter=150, num_partitions=3,
    )
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    oracle = pagerank_oracle(edges, verts, tol=1e-12, max_iter=300)
    assert set(got) == set(oracle)
    for v in verts:
        assert math.isclose(got[v], oracle[v], abs_tol=1e-6), v
