from __future__ import annotations

from collections import deque

from pargraph_spark.operators.bfs import bfs_distances


def _py_bfs(edges, seeds, symmetric=True, max_hops=100):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        if symmetric:
            adj.setdefault(d, set()).add(s)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):  # noqa: B905
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_matches_python(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 6), (7, 8), (9, 9)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (7,)], "id long")
    res = bfs_distances(spark, edf, seeds, max_hops=10, num_partitions=4)
    got = {r["id"]: r["dist"] for r in res.distances.collect()}
    assert got == _py_bfs(edges, [1, 7])
    assert res.exhausted  # frontier drains before 10 hops
    # unreached vertex 9 (self-loop only) absent, not infinite
    assert 9 not in got


def test_bfs_hop_cap_and_direction(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "id long")
    capped = bfs_distances(spark, edf, seeds, max_hops=2, num_partitions=4)
    got = {r["id"]: r["dist"] for r in capped.distances.collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2}  # symmetric: 4 is one hop back
    directed = bfs_distances(spark, edf, seeds, max_hops=2, symmetric=False,
                             num_partitions=4)
    gd = {r["id"]: r["dist"] for r in directed.distances.collect()}
    assert gd == {1: 0, 2: 1, 3: 2}


def test_diameter_2sweep_path_graph_exact(spark):
    from pargraph_spark.operators.bfs import diameter_2sweep

    edges = [(i, i + 1) for i in range(9)]  # path: diameter 9
    est = diameter_2sweep(spark, spark.createDataFrame(edges, "src long, dst long"))
    assert est.lower_bound == 9
    assert est.n_reached == 10


def test_diameter_2sweep_lower_bounds_true_diameter(spark):
    import random

    from pargraph_spark.operators.bfs import diameter_2sweep

    rng = random.Random(47)
    edges = [(s, d) for s, d in
             {(rng.randrange(30), rng.randrange(30)) for _ in range(60)}
             if s != d]

    # true diameter of the component containing min vertex, via python BFS
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)

    def bfs(s0):
        dist = {s0: 0}
        q = [s0]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nq.append(w)
            q = nq
        return dist

    comp = bfs(min(adj))
    true_diam = max(max(bfs(v).values()) for v in comp)
    est = diameter_2sweep(spark, spark.createDataFrame(edges, "src long, dst long"))
    assert est.lower_bound <= true_diam
    assert est.lower_bound >= max(bfs(min(adj)).values())  # >= first ecc
