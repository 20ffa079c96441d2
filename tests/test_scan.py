from __future__ import annotations

import random
from collections import defaultdict

from pargraph_spark.operators.scan import scan_clusters

EDGE_SCHEMA = "src long, dst long"


def _scan_oracle(edges, p, q, mu):
    """Brute-force SCAN: returns {id: (cluster, role)}."""
    nbr = defaultdict(set)
    for u, v in edges:
        if u != v:
            nbr[u].add(v)
            nbr[v].add(u)
    verts = sorted(nbr)
    und = {(min(u, v), max(u, v)) for u in nbr for v in nbr[u]}

    def is_eps(u, v):
        c = len(nbr[u] & nbr[v])
        return p * (len(nbr[u]) + 1) * (len(nbr[v]) + 1) <= q * (c + 2) ** 2

    eps = {(a, b) for a, b in und if is_eps(a, b)}
    epsn = defaultdict(set)
    for a, b in eps:
        epsn[a].add(b)
        epsn[b].add(a)
    cores = {v for v in verts if len(epsn[v]) + 1 >= mu}
    # clusters: CC of cores under eps edges, label = min member id
    cluster = {}
    for seed in sorted(cores):
        if seed in cluster:
            continue
        comp, stack = [], [seed]
        seen = {seed}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in epsn[x]:
                if y in cores and y not in seen:
                    seen.add(y)
                    stack.append(y)
        lab = min(comp)
        for x in comp:
            cluster[x] = lab
    out = {v: (cluster[v], "core") for v in cores}
    for v in verts:
        if v in cores:
            continue
        cands = [cluster[u] for u in epsn[v] if u in cores]
        if cands:
            out[v] = (min(cands), "member")
    assigned = dict(out)  # cores + members only — hubs never count as a cluster
    for v in verts:
        if v in assigned:
            continue
        ncl = {assigned[u][0] for u in nbr[v] if u in assigned}
        out[v] = (-1, "hub" if len(ncl) >= 2 else "outlier")
    return out


def _got(spark, edges, eps2, mu):
    res = scan_clusters(
        spark, spark.createDataFrame(edges, EDGE_SCHEMA), eps2=eps2, mu=mu
    )
    return {r["id"]: (r["cluster"], r["role"])
            for r in res.assignments.collect()}, res


def test_scan_two_cliques_bridge_hub(spark):
    # two 4-cliques joined through vertex 100: cliques are core clusters,
    # 100 bridges both -> hub; pendant 200 off one clique -> outlier
    k1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    k2 = [(a, b) for a in (11, 12, 13, 14) for b in (11, 12, 13, 14) if a < b]
    edges = k1 + k2 + [(1, 100), (11, 100), (4, 200)]
    got, res = _got(spark, edges, (1, 2), 3)
    want = _scan_oracle(edges, 1, 2, 3)
    assert got == want
    assert got[100] == (-1, "hub")
    assert {got[v] for v in (1, 2, 3)} == {(1, "core")}
    assert {got[v] for v in (11, 12, 13, 14)} == {(11, "core")}
    assert res.n_clusters == 2


def test_scan_random_vs_brute(spark):
    rng = random.Random(31)
    # planted communities + noise edges
    edges = set()
    for base in (0, 20, 40):
        mem = list(range(base, base + 8))
        for a in mem:
            for b in mem:
                if a < b and rng.random() < 0.75:
                    edges.add((a, b))
    for _ in range(25):
        a, b = rng.randrange(60), rng.randrange(60)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    for eps2, mu in (((1, 2), 3), ((9, 16), 4), ((1, 4), 2)):
        got, _ = _got(spark, edges, eps2, mu)
        want = _scan_oracle(edges, eps2[0], eps2[1], mu)
        assert got == want, (eps2, mu)


def test_scan_isolated_core_singleton_cluster(spark):
    # a triangle whose edges all pass eps but whose vertices have only
    # mu-1 eps-neighbors stays non-core; a 5-clique core with NO core
    # eps-edge to anything else forms its own cluster
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    tri = [(10, 11), (11, 12), (10, 12)]
    edges = k5 + tri
    got, _ = _got(spark, edges, (1, 2), 4)
    want = _scan_oracle(edges, 1, 2, 4)
    assert got == want
