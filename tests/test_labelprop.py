from __future__ import annotations

from pargraph_spark.operators.edges import build_edges
from pargraph_spark.operators.extract_links import extract_links
from pargraph_spark.operators.labelprop import label_propagation
from pargraph_spark.sources.pages import latest_pages
from pargraph_spark.synth import pages_df_local

from .oracles import label_propagation_oracle

EDGE_SCHEMA = "src long, dst long"


def _lpa(spark, edges, vertices=None, max_iter=20):
    edf = spark.createDataFrame(edges, EDGE_SCHEMA)
    vdf = (
        spark.createDataFrame([(v,) for v in vertices], "id long")
        if vertices is not None
        else None
    )
    res = label_propagation(spark, edf, vdf, max_iter=max_iter, num_partitions=4)
    return {r["id"]: r["label"] for r in res.labels.collect()}, res


def test_cliques_converge_to_min_labels(spark):
    edges = []
    for k in range(3):
        base = k * 100
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    got, res = _lpa(spark, edges)
    oracle = label_propagation_oracle(edges, sorted({v for e in edges for v in e}))
    assert got == oracle
    assert res.converged
    # each clique collapses to one label
    assert len({got[k * 100 + i] for k in range(3) for i in range(5)}) == 3


def test_isolated_keep_own_label(spark):
    got, _ = _lpa(spark, [(1, 2)], vertices=[1, 2, 7])
    assert got[7] == 7


def test_synth_graph_matches_oracle_per_iteration(spark):
    pages = pages_df_local(spark, 200)
    ext = extract_links(latest_pages(pages))
    edf = build_edges(ext).cache()
    edges = [(r["src"], r["dst"]) for r in edf.collect()]
    verts = sorted({v for e in edges for v in e})
    # bounded iterations: oracle applies the identical synchronous rule,
    # so results match exactly even if LPA hasn't converged
    for iters in (1, 3):
        res = label_propagation(spark, edf, max_iter=iters, num_partitions=4)
        got = {r["id"]: r["label"] for r in res.labels.collect()}
        oracle = label_propagation_oracle(edges, verts, max_iter=iters)
        assert got == oracle, f"divergence at iter={iters}"


def test_weighted_lpa_matches_python(spark):
    # weighted votes: heavy edge to a small label must outvote many light
    # edges; python oracle mirrors the weighted argmax + min tie-break
    import random

    rng = random.Random(3)
    n = 30
    edges = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(1, 6))
        for _ in range(90)
    ]
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    res = label_propagation(spark, edf, max_iter=3, num_partitions=4,
                            weight_col="w")
    got = {r["id"]: r["label"] for r in res.labels.collect()}

    # python mirror
    wadj: dict[tuple[int, int], int] = {}
    for s, d, w in edges:
        if s == d:
            continue
        wadj[(s, d)] = wadj.get((s, d), 0) + w
        wadj[(d, s)] = wadj.get((d, s), 0) + w
    verts = sorted({v for e in wadj for v in e})
    lab = {v: v for v in verts}
    for _ in range(3):
        votes: dict[int, dict[int, int]] = {}
        for (u, v), w in wadj.items():
            votes.setdefault(v, {}).setdefault(lab[u], 0)
            votes[v][lab[u]] += w
        new = dict(lab)
        for v, vv in votes.items():
            best = min(((-c, l) for l, c in vv.items()))
            new[v] = best[1]
        lab = new
    assert got == lab


def test_weighted_lpa_heavy_edge_dominates(spark):
    # star: center 5 connects to 1,2,3 with w=1 and to 0 with w=10 —
    # round 1 must relabel the center to 0 despite three light votes
    edges = [(5, 1, 1), (5, 2, 1), (5, 3, 1), (5, 0, 10)]
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    res = label_propagation(spark, edf, max_iter=1, num_partitions=4,
                            weight_col="w")
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got[5] == 0


def _slpa_oracle(edges, seeds, max_iter):
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in set(edges):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    verts = set(adj) | {v for vs in adj.values() for v in vs} | set(seeds)
    labels = {v: seeds.get(v) for v in verts}
    it, converged = 0, False
    while it < max_iter:
        it += 1
        new = {}
        for v in verts:
            if v in seeds:
                new[v] = seeds[v]
                continue
            votes = defaultdict(int)
            for u in adj[v]:
                if labels[u] is not None:
                    votes[labels[u]] += 1
            if votes:
                new[v] = min(votes, key=lambda l: (-votes[l], l))
            else:
                new[v] = labels[v]
        if new == labels:
            labels, converged = new, True
            break
        labels = new
    return labels, it, converged


def test_seeded_labelprop_matches_oracle(spark):
    import random

    from pargraph_spark.operators.labelprop import seeded_label_propagation

    rng = random.Random(17)
    n, m = 40, 90
    edges = [(a, b) for a, b in {(rng.randrange(n), rng.randrange(n))
                                 for _ in range(m)} if a != b]
    seeds = {0: 100, 5: 200, 9: 100}
    res = seeded_label_propagation(
        spark,
        spark.createDataFrame(edges, "src long, dst long"),
        spark.createDataFrame(list(seeds.items()), "id long, label long"),
        max_iter=8, num_partitions=4,
    )
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    want, it, conv = _slpa_oracle(edges, seeds, 8)
    assert got == want
    assert (res.iterations, res.converged) == (it, conv)
    # clamp held
    for v, l in seeds.items():
        assert got[v] == l


def test_seeded_labelprop_disconnected_stays_null(spark):
    from pargraph_spark.operators.labelprop import seeded_label_propagation

    # two components; seeds only in the first -> second stays NULL
    edges = [(1, 2), (2, 3), (10, 11)]
    res = seeded_label_propagation(
        spark,
        spark.createDataFrame(edges, "src long, dst long"),
        spark.createDataFrame([(1, 7)], "id long, label long"),
        max_iter=6, num_partitions=4,
    )
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got == {1: 7, 2: 7, 3: 7, 10: None, 11: None}
    assert res.converged
