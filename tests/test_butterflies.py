from __future__ import annotations

import random
from collections import defaultdict
from itertools import combinations

from pargraph_spark.operators.butterflies import butterfly_counts

EDGE_SCHEMA = "src long, dst long"


def _bf_oracle(edges, cap=None):
    nbr = defaultdict(set)   # right -> lefts
    for u, w in set(edges):
        nbr[w].add(u)
    if cap is not None:
        nbr = {w: s for w, s in nbr.items() if len(s) <= cap}
    c = defaultdict(int)
    for w, lefts in nbr.items():
        for a, b in combinations(sorted(lefts), 2):
            c[(a, b)] += 1
    per = {(a, b): (k, k * (k - 1) // 2) for (a, b), k in c.items() if k >= 2}
    total = sum(bf for _, bf in per.values())
    return total, per


def test_butterfly_square(spark):
    # K(2,2) = exactly one butterfly
    edges = [(1, 10), (1, 11), (2, 10), (2, 11)]
    res = butterfly_counts(spark.createDataFrame(edges, EDGE_SCHEMA))
    assert res.total == 1
    rows = res.per_pair.collect()
    assert len(rows) == 1 and (rows[0]["a"], rows[0]["b"], rows[0]["c"], rows[0]["bf"]) == (1, 2, 2, 1)


def test_butterfly_k23(spark):
    # K(2,3): C(3,2) = 3 butterflies on the single left pair
    edges = [(a, w) for a in (1, 2) for w in (10, 11, 12)]
    res = butterfly_counts(spark.createDataFrame(edges, EDGE_SCHEMA))
    assert res.total == 3


def test_butterfly_random_vs_brute(spark):
    rng = random.Random(23)
    edges = list({(rng.randrange(25), 100 + rng.randrange(15))
                  for _ in range(120)})
    for cap in (None, 6):
        res = butterfly_counts(
            spark.createDataFrame(edges, EDGE_SCHEMA), hot_cap=cap
        )
        total, per = _bf_oracle(edges, cap)
        assert res.total == total, cap
        got = {(r["a"], r["b"]): (r["c"], r["bf"])
               for r in res.per_pair.collect()}
        assert got == per, cap
