from __future__ import annotations


from pargraph_spark.operators.sweepcut import sweep_cut


def _brute(edge_list, score_map, top_n):
    """Direct conductance sweep — the semantic oracle."""
    und = set()
    for s, d in edge_list:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    two_m = 2 * len(und)
    cand = [
        (v, s) for v, s in score_map.items() if v in deg
    ]
    cand.sort(key=lambda vs: (-vs[1] / deg[vs[0]], -vs[1], vs[0]))
    cand = cand[:top_n]
    rows, prefix, vol = [], set(), 0
    for k, (v, s) in enumerate(cand, start=1):
        prefix.add(v)
        vol += deg[v]
        cut = sum(1 for a, b in und if (a in prefix) != (b in prefix))
        den = min(vol, two_m - vol)
        phi = cut / den if den > 0 else None
        rows.append((k, v, cut, vol, phi))
    best = min(
        ((r[4], r[0]) for r in rows if r[4] is not None), default=None
    )
    return rows, best, two_m


BARBELL = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    + [(4, 10)]
)


def test_sweep_cut_recovers_clique(spark):
    # seed-side clique scores dominate; a couple of far-side vertices
    # also appear in the candidate set and must not enter the best cut
    scores = {v: 100.0 - v for v in range(5)}
    scores.update({10: 1.0, 11: 0.5})
    e = spark.createDataFrame(BARBELL, "src long, dst long")
    sdf = spark.createDataFrame(list(scores.items()), "id long, score double")
    res = sweep_cut(e, sdf, top_n=10)
    assert {r["id"] for r in res.members.collect()} == {0, 1, 2, 3, 4}
    assert res.best_k == 5 and res.cut == 1 and res.vol == 21
    assert res.two_m == 42
    assert res.best_phi == 1 / 21  # one IEEE division of exact ints


def test_sweep_trajectory_matches_brute(spark):
    scores = {0: 9.0, 1: 7.0, 2: 6.5, 3: 3.0, 4: 8.0, 10: 2.0, 12: 1.5, 14: 4.0}
    e = spark.createDataFrame(BARBELL, "src long, dst long")
    sdf = spark.createDataFrame(list(scores.items()), "id long, score double")
    res = sweep_cut(e, sdf, top_n=6)
    got = sorted(
        (r["rank"], r["id"], r["cut"], r["vol"], r["phi"])
        for r in res.sweep.collect()
    )
    ref, best, two_m = _brute(BARBELL, scores, top_n=6)
    assert got == ref
    assert res.two_m == two_m
    assert (res.best_phi, res.best_k) == best


def test_sweep_cut_ignores_nongraph_vertices(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    sdf = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (99, 100.0)], "id long, score double"
    )
    res = sweep_cut(e, sdf, top_n=10)
    ids = {r["id"] for r in res.sweep.collect()}
    assert 99 not in ids
    ref, best, _ = _brute([(1, 2), (2, 3)], {1: 5.0, 2: 4.0, 99: 100.0}, 10)
    assert (res.best_phi, res.best_k) == best
