from __future__ import annotations

import math

import pytest

from pargraph_spark.operators.hits import GRID, hits


def _py_hits(edges, iterations):
    """Independent reference of the pinned (grid-quantized) algorithm."""
    verts = sorted({v for e in edges for v in e})
    q = lambda x: round(x * GRID) / GRID  # noqa: E731

    def norm_quant(vec):
        t = sum(vec.values())
        return {v: (q(vec[v] / t) if t > 0 else 0.0) for v in vec}

    h = {v: q(1.0 / len(verts)) for v in verts}
    a = None
    for _ in range(iterations):
        raw_a = {v: 0.0 for v in verts}
        for s, d in edges:
            raw_a[d] += h[s]
        a = norm_quant(raw_a)
        raw_h = {v: 0.0 for v in verts}
        for s, d in edges:
            raw_h[s] += a[d]
        h = norm_quant(raw_h)
    return h, a


@pytest.mark.parametrize("iterations", [1, 4])
def test_hits_matches_python(spark, iterations):
    edges = [(1, 2), (1, 3), (2, 3), (4, 3), (4, 2), (5, 1), (3, 5)]
    res = hits(spark, spark.createDataFrame(edges, "src long, dst long"),
               iterations=iterations, num_partitions=4)
    got = {r["id"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
    rh, ra = _py_hits(edges, iterations)
    assert set(got) == set(rh)
    for v in rh:
        assert math.isclose(got[v][0], rh[v], abs_tol=1e-9), v
        assert math.isclose(got[v][1], ra[v], abs_tol=1e-9), v
    # L1 normalized
    assert math.isclose(sum(x for x, _ in got.values()), 1.0, abs_tol=1e-6)
    assert math.isclose(sum(y for _, y in got.values()), 1.0, abs_tol=1e-6)
    # vertex 3 has the most in-links from good hubs -> top authority
    assert max(got, key=lambda v: got[v][1]) == 3


def test_hits_rejects_zero_iterations(spark):
    # ADVICE r2: iterations=0 used to crash opaquely at h.join(a, ...)
    edf = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        hits(spark, edf, iterations=0)


def test_salsa_degree_normalized_vs_python(spark):
    # mirror the grid-quantized iteration in python and compare exactly
    from pargraph_spark.operators.hits import salsa

    edges = [(1, 2), (1, 3), (2, 3), (4, 3), (4, 2), (5, 1)]
    G = float(1 << 30)

    def q(x):
        # HALF_UP like Spark/DuckDB round() — python round() is half-EVEN
        # and this tiny graph actually hits exact grid midpoints
        import math

        return math.floor(x * G + 0.5) / G

    verts = sorted({v for e in edges for v in e})
    od = {}
    idg = {}
    for s, d in edges:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    h = {v: q(1.0 / len(verts)) for v in verts}
    a = {}
    for _ in range(5):
        a_raw = {v: 0.0 for v in verts}
        for s, d in edges:
            a_raw[d] += q(h[s] / od[s])
        t = sum(a_raw.values())
        a = {v: q(a_raw[v] / t if t > 0 else 0.0) for v in verts}
        h_raw = {v: 0.0 for v in verts}
        for s, d in edges:
            h_raw[s] += q(a[d] / idg[d])
        t = sum(h_raw.values())
        h = {v: q(h_raw[v] / t if t > 0 else 0.0) for v in verts}

    res = salsa(spark, spark.createDataFrame(edges, "src long, dst long"),
                iterations=5, num_partitions=4)
    got = {r["id"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
    for v in verts:
        assert got[v] == (h[v], a[v]), v
    # sanity: vertex 3 (most endorsed) is the top authority
    assert max(got, key=lambda v: got[v][1]) == 3
