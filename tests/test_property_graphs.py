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


@given(edges=edge_lists)
@settings(**_SETTINGS)
def test_labelprop_matches_python_oracle(spark, edges):
    from pargraph_spark.operators.labelprop import label_propagation

    from .oracles import label_propagation_oracle

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    verts = sorted({v for e in edges for v in e})
    res = label_propagation(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA),
        max_iter=8, num_partitions=3,
    )
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got == label_propagation_oracle(edges, verts, max_iter=8)


event_lists = st.lists(
    st.tuples(
        st.integers(0, 5),            # user_id
        st.integers(0, 10_000),       # offset seconds
        st.integers(-100, 100),       # value scaled by /4 (exact quarters)
    ),
    min_size=1,
    max_size=40,
)


@given(rows=event_lists)
@settings(**_SETTINGS)
def test_sessionize_matches_python_oracle(spark, rows):
    from datetime import datetime, timedelta

    from pargraph_spark.operators.events import sessionize

    from .test_events import _py_sessionize

    t0 = datetime(2024, 1, 1)
    data = [
        (i, t0 + timedelta(seconds=sec), uid, "e", v / 4.0, "{}")
        for i, (uid, sec, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"], r["total_value6"],
        )
        for r in sessionize(df, gap_minutes=30).collect()
    }
    ref = _py_sessionize(
        [{"user_id": u, "ts": ts, "event_id": e, "value": v}
         for (e, ts, u, _t, v, _p) in data],
        gap_minutes=30,
    )
    assert set(got) == set(ref)
    for k, (start, end, n, total) in ref.items():
        gs, ge, gn, gt = got[k]
        assert (gs, ge, gn) == (start, end, n), k
        assert abs(gt - total) < 1e-9, k
