from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from pargraph_spark.operators.heavyhitters import frequent_items


def _check_guarantee(rows, true_counts, n, k):
    got = {r["item"]: (r["count_lb"], r["count_ub"]) for r in rows}
    thresh = n / (k + 1)
    # every true heavy hitter is present
    for it, c in true_counts.items():
        if c > thresh:
            assert it in got, (it, c, thresh)
    # bounds bracket the truth for every returned item; none invented
    for it, (lb, ub) in got.items():
        assert it in true_counts
        assert lb <= true_counts[it] <= ub, (it, lb, true_counts[it], ub)
        assert lb >= 1


def test_frequent_items_guarantee_skewed(spark):
    rng = random.Random(7)
    # zipf-ish: a few hot items over a long tail
    items = (
        ["hot_a"] * 4000 + ["hot_b"] * 2500 + ["warm"] * 900
        + [f"tail_{rng.randrange(5000)}" for _ in range(6000)]
    )
    rng.shuffle(items)
    df = spark.createDataFrame([(x,) for x in items], "item string").repartition(8)
    k = 32
    rows = frequent_items(df, "item", k=k).collect()
    _check_guarantee(rows, Counter(items), len(items), k)
    got = {r["item"] for r in rows}
    assert {"hot_a", "hot_b", "warm"} <= got


def test_frequent_items_small_exact(spark):
    # when distinct items <= k, no decrements ever fire: lb == ub == truth
    items = ["x"] * 5 + ["y"] * 3 + ["z"] * 2
    df = spark.createDataFrame([(x,) for x in items], "item string").repartition(4)
    rows = frequent_items(df, "item", k=16).collect()
    got = {r["item"]: (r["count_lb"], r["count_ub"]) for r in rows}
    assert got == {"x": (5, 5), "y": (3, 3), "z": (2, 2)}


def test_frequent_items_long_bigint_items(spark):
    rng = random.Random(11)
    vals = [1] * 500 + [2] * 300 + [rng.randrange(10_000) + 10 for _ in range(800)]
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "item long").repartition(4)
    k = 16
    rows = frequent_items(df, "item", k=k, item_type="long").collect()
    _check_guarantee(rows, Counter(vals), len(vals), k)
    assert {1, 2} <= {r["item"] for r in rows}


def test_frequent_items_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], "item string"
    )
    rows = frequent_items(df, "item", k=4).collect()
    got = {r["item"]: r["count_lb"] for r in rows}
    assert got == {"a": 2, "b": 1}
