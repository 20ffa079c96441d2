from __future__ import annotations

import hashlib
import random
from collections import deque

from pargraph_spark.operators.landmarks import (
    estimate_distances,
    landmark_distances,
)

EDGE_SCHEMA = "src long, dst long"


def _pick_landmarks(verts, salt, L):
    key = lambda v: (hashlib.md5(f"{salt}|{v}".encode()).hexdigest(), v)
    return sorted(sorted(verts, key=key)[:L])


def _bfs(nbr, src, max_hops):
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in nbr[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _oracle(edges, salt, L, max_hops):
    nbr = {}
    for u, v in edges:
        if u != v:
            nbr.setdefault(u, set()).add(v)
            nbr.setdefault(v, set()).add(u)
    lms = _pick_landmarks(nbr.keys(), salt, L)
    out = {}
    for l in lms:
        for v, d in _bfs(nbr, l, max_hops).items():
            out[(l, v)] = d
    return lms, out


def test_landmarks_vs_brute(spark):
    rng = random.Random(7)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(80), rng.randrange(80)) for _ in range(160)
            )
            if a != b
        }
    )
    res = landmark_distances(
        spark,
        spark.createDataFrame(edges, EDGE_SCHEMA),
        num_landmarks=6,
        max_hops=4,
        salt="lm",
    )
    want_lms, want = _oracle(edges, "lm", 6, 4)
    assert sorted(r["id"] for r in res.landmarks.collect()) == want_lms
    got = {
        (r["landmark"], r["id"]): r["dist"] for r in res.distances.collect()
    }
    assert got == want


def test_landmarks_estimate_upper_bound(spark):
    # path 0-1-2-...-9 plus a chord: estimates are valid upper bounds and
    # exact when a landmark sits on a shortest path
    edges = [(i, i + 1) for i in range(9)] + [(0, 5)]
    res = landmark_distances(
        spark,
        spark.createDataFrame(edges, EDGE_SCHEMA),
        num_landmarks=10,  # every vertex a landmark -> estimates exact
        max_hops=10,
    )
    pairs = spark.createDataFrame([(0, 9), (2, 7), (4, 6)], "a long, b long")
    got = {
        (r["a"], r["b"]): r["est"]
        for r in estimate_distances(res.distances, pairs).collect()
    }
    nbr = {}
    for u, v in edges:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    for (a, b), est in got.items():
        assert est == _bfs(nbr, a, 10)[b]


def test_landmarks_exhausted_disconnected(spark):
    # two components: sketch never crosses; exhausted with small hop cap
    edges = [(0, 1), (1, 2), (10, 11)]
    res = landmark_distances(
        spark,
        spark.createDataFrame(edges, EDGE_SCHEMA),
        num_landmarks=5,
        max_hops=8,
    )
    assert res.exhausted
    comp = {0: 0, 1: 0, 2: 0, 10: 1, 11: 1}
    for r in res.distances.collect():
        assert comp[r["landmark"]] == comp[r["id"]]
