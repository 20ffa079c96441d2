from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pargraph_spark.operators.sampling import (
    deterministic_sample,
    fraction_threshold_hex,
    keep_fraction,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(4000).select(F.col("id"))


def _py_keep(key, fraction, salt=""):
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8]
    return h < fraction_threshold_hex(fraction)


def test_matches_python_and_fraction(spark, ids):
    got = {r["id"] for r in deterministic_sample(ids, "id", 0.25, "s1").collect()}
    ref = {i for i in range(4000) if _py_keep(i, 0.25, "s1")}
    assert got == ref
    assert abs(len(got) / 4000 - 0.25) < 0.03  # md5 uniformity


def test_invariant_under_repartitioning(spark, ids):
    a = {r["id"] for r in deterministic_sample(ids.repartition(3), "id", 0.1, "x").collect()}
    b = {r["id"] for r in deterministic_sample(ids.repartition(17, "id"), "id", 0.1, "x").collect()}
    assert a == b


def test_salts_give_independent_samples(spark, ids):
    a = {r["id"] for r in deterministic_sample(ids, "id", 0.5, "train").collect()}
    b = {r["id"] for r in deterministic_sample(ids, "id", 0.5, "val").collect()}
    assert a != b
    # independence: overlap ≈ 0.25 of the universe
    assert abs(len(a & b) / 4000 - 0.25) < 0.05


def test_nested_fractions_are_subsets(spark, ids):
    # same salt: the kept set at a smaller fraction is a SUBSET of the kept
    # set at a larger one (threshold semantics) — stable incremental growth
    small = {r["id"] for r in deterministic_sample(ids, "id", 0.1, "s").collect()}
    large = {r["id"] for r in deterministic_sample(ids, "id", 0.3, "s").collect()}
    assert small <= large


def test_stratified_per_stratum_fractions(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(6000)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = stratified_sample(df, "s", {"a": 0.5, "b": 0.1}, key_col="id", salt="z")
    got = out.groupBy("s").count().collect()
    counts = {r["s"]: r["count"] for r in got}
    assert abs(counts.get("a", 0) / 2000 - 0.5) < 0.05
    assert abs(counts.get("b", 0) / 2000 - 0.1) < 0.03
    assert "c" not in counts  # default fraction 0
    # and the kept 'a' rows are exactly the keep_fraction set
    ref = {
        i for i in range(6000)
        if i % 3 == 0 and _py_keep(i, 0.5, "z")
    }
    a_rows = {r["id"] for r in out.where("s = 'a'").collect()}
    assert a_rows == ref


def test_neighbor_sample_matches_python_oracle(spark):
    import hashlib
    import random

    from pargraph_spark.operators.sampling import neighbor_sample

    rng = random.Random(11)
    edges = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(150)})
    edges = [(s, d) for s, d in edges if s != d]
    seeds = [0, 3, 7]
    fanouts = [3, 2]

    def rk(s, d, hop):
        return hashlib.md5(f"gs|{s}|{d}|{hop}".encode()).hexdigest()

    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    expect = set()
    frontier = set(seeds)
    for hop, fan in enumerate(fanouts):
        nxt = set()
        for s in frontier:
            picked = sorted(adj.get(s, []), key=lambda d: (rk(s, d, hop), d))[:fan]
            for d in picked:
                expect.add((hop, s, d))
                nxt.add(d)
        frontier = nxt

    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {(r["hop"], r["src"], r["dst"])
           for r in neighbor_sample(edf, sdf, fanouts).collect()}
    assert got == expect


def test_neighbor_sample_stable_under_repartition(spark):
    from pargraph_spark.operators.sampling import neighbor_sample

    edges = [(i, (i * 7 + j) % 40) for i in range(40) for j in range(5)]
    edges = [(s, d) for s, d in edges if s != d]
    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(1,), (2,)], "id long")
    a = {(r["hop"], r["src"], r["dst"])
         for r in neighbor_sample(edf, sdf, [4, 3]).collect()}
    b = {(r["hop"], r["src"], r["dst"])
         for r in neighbor_sample(edf.repartition(13), sdf, [4, 3]).collect()}
    assert a == b and a
    # fanout respected per frontier vertex per hop
    from collections import Counter

    per_src_h0 = Counter(s for h, s, d in a if h == 0)
    assert all(c <= 4 for c in per_src_h0.values())


def test_neighbor_sample_independent_salts_differ(spark):
    from pargraph_spark.operators.sampling import neighbor_sample

    edges = [(0, d) for d in range(1, 60)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(0,)], "id long")
    a = {r["dst"] for r in neighbor_sample(edf, sdf, [8], salt="s1").collect()}
    b = {r["dst"] for r in neighbor_sample(edf, sdf, [8], salt="s2").collect()}
    assert len(a) == 8 and len(b) == 8
    assert a != b  # 60-choose-8 collision odds are negligible


def test_random_walks_matches_python_oracle(spark):
    import hashlib
    import random

    from pargraph_spark.operators.sampling import random_walks

    rng = random.Random(31)
    edges = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(80)})
    edges = [(s, d) for s, d in edges if s != d]
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    seeds = [0, 1, 2]

    def pick(seed, walk, t, cur):
        outs = adj.get(cur, [])
        if not outs:
            return None
        return min(outs, key=lambda d: (
            hashlib.md5(f"rw|{seed}|{walk}|{t}|{d}".encode()).hexdigest(), d))

    expect = set()
    for s in seeds:
        for wk in range(2):
            cur = s
            expect.add((s, wk, 0, s))
            for t in range(1, 4):
                cur = pick(s, wk, t, cur)
                if cur is None:
                    break
                expect.add((s, wk, t, cur))

    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {(r["seed_id"], r["walk"], r["step"], r["vertex"])
           for r in random_walks(edf, sdf, num_walks=2, length=3).collect()}
    assert got == expect


def test_random_walks_stop_at_sinks(spark):
    from pargraph_spark.operators.sampling import random_walks

    edf = spark.createDataFrame([(1, 2)], "src long, dst long")  # 2 is a sink
    sdf = spark.createDataFrame([(1,)], "id long")
    rows = random_walks(edf, sdf, num_walks=1, length=5).collect()
    steps = sorted(r["step"] for r in rows)
    assert steps == [0, 1]  # walk: 1 -> 2, then stops


def test_skipgram_pairs_vs_brute(spark):
    from collections import Counter

    from pargraph_spark.operators.sampling import skipgram_pairs

    # hand walk corpus with a revisit (vertex 7 twice in one walk)
    rows = [
        (1, 0, 0, 7), (1, 0, 1, 8), (1, 0, 2, 7), (1, 0, 3, 9),
        (2, 0, 0, 8), (2, 0, 1, 9),
        (2, 1, 0, 8), (2, 1, 1, 7), (2, 1, 2, 8),
    ]
    walks = spark.createDataFrame(
        rows, "seed_id long, walk long, step long, vertex long"
    )
    W = 2
    brute = Counter()
    by_walk = {}
    for s, w, i, v in rows:
        by_walk.setdefault((s, w), []).append((i, v))
    for seq in by_walk.values():
        for i, c in seq:
            for j, x in seq:
                if i != j and abs(i - j) <= W:
                    brute[(c, x)] += 1
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(walks, window=W).collect()
    }
    assert got == dict(brute)
    raw = skipgram_pairs(walks, window=W, count_pairs=False)
    assert raw.count() == sum(brute.values())


def test_skipgram_pairs_from_random_walks(spark):
    from pargraph_spark.operators.sampling import random_walks, skipgram_pairs

    e = spark.createDataFrame(
        [(i, (i + 1) % 8) for i in range(8)] + [(i, (i + 3) % 8) for i in range(8)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,), (4,)], "id long")
    walks = random_walks(e, seeds, num_walks=2, length=4)
    pairs = skipgram_pairs(walks, window=2)
    rows = pairs.collect()
    assert len(rows) > 0
    # symmetric multiset: (a,b) and (b,a) counts are equal by construction
    got = {(r["center"], r["context"]): r["cnt"] for r in rows}
    assert all(got[(b, a)] == n for (a, b), n in got.items())


def _py_negatives(pair_rows, vocab_counts, n_neg, salt="neg", max_vocab=10**6):
    """Exact Python replica of negative_samples (md5 + integer intervals)."""
    top = sorted(vocab_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    top = [(v, c) for v, c in top if c > 0]
    cum, lo = [], 0
    for v, c in sorted(top):  # intervals laid out ordered by vertex id
        cum.append((v, lo, lo + c))
        lo += c
    W = lo
    out = []
    for c, x in pair_rows:
        for i in range(n_neg):
            h = hashlib.md5(f"{salt}|{c}|{x}|{i}".encode()).hexdigest()[:15]
            u = int(h, 16) % W
            for v, a, b in cum:
                if a <= u < b:
                    out.append((c, x, i, v))
                    break
    return sorted(out)


def test_negative_samples_exact_vs_python(spark):
    from collections import Counter

    from pargraph_spark.operators.sampling import negative_samples

    vocab_counts = {1: 50, 2: 25, 3: 12, 4: 6, 5: 3, 6: 2, 7: 1, 8: 1}
    pair_rows = [(a, b) for a in range(1, 9) for b in range(1, 9) if a != b]
    pairs = spark.createDataFrame(pair_rows, "center long, context long")
    vocab = spark.createDataFrame(
        list(vocab_counts.items()), "vertex long, cnt long"
    )
    got = sorted(
        (r["center"], r["context"], r["neg_idx"], r["negative"])
        for r in negative_samples(pairs, vocab, n_neg=5).collect()
    )
    ref = _py_negatives(pair_rows, vocab_counts, n_neg=5)
    assert got == ref
    # every (pair, i) produced exactly one negative (interval cover is exact)
    assert len(got) == len(pair_rows) * 5
    # distribution sanity: the hottest token dominates the draw counts
    freq = Counter(v for *_k, v in got)
    assert freq[1] > freq[3] > freq[8]


def test_negative_samples_vocab_cap_and_collisions(spark):
    from pargraph_spark.operators.sampling import negative_samples

    vocab_counts = {i: 100 - i for i in range(1, 21)}
    pair_rows = [(1, 2), (2, 3), (19, 20)]
    pairs = spark.createDataFrame(pair_rows, "center long, context long")
    vocab = spark.createDataFrame(
        list(vocab_counts.items()), "vertex long, cnt long"
    )
    got = sorted(
        (r["center"], r["context"], r["neg_idx"], r["negative"])
        for r in negative_samples(pairs, vocab, n_neg=8, max_vocab=5).collect()
    )
    ref = _py_negatives(pair_rows, vocab_counts, n_neg=8, max_vocab=5)
    assert got == ref
    assert {v for *_k, v in got} <= {1, 2, 3, 4, 5}  # cap really applied
    dropped = negative_samples(
        pairs, vocab, n_neg=8, max_vocab=5, drop_collisions=True
    ).collect()
    kept = {(r["center"], r["context"], r["neg_idx"], r["negative"])
            for r in dropped}
    assert kept == {t for t in got if t[3] != t[0] and t[3] != t[1]}


def test_sgns_examples_shape(spark):
    from pargraph_spark.operators.sampling import sgns_examples

    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "center long, context long"
    )
    vocab = spark.createDataFrame(
        [(1, 10), (2, 5), (3, 2)], "vertex long, cnt long"
    )
    rows = sgns_examples(pairs, vocab, n_neg=3).collect()
    pos = [r for r in rows if r["label"] == 1]
    neg = [r for r in rows if r["label"] == 0]
    assert len(pos) == 3 and len(neg) == 9
    assert {(r["center"], r["context"]) for r in pos} == {(1, 2), (2, 1), (1, 3)}
    assert all(r["context"] in (1, 2, 3) for r in neg)


def test_negative_samples_plan_broadcast_equijoin(spark):
    from pargraph_spark.operators.sampling import negative_samples

    pairs = spark.createDataFrame([(1, 2)], "center long, context long")
    vocab = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "vertex long, cnt long"
    )
    plan = (
        negative_samples(pairs, vocab, n_neg=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # interval lookup must be a broadcast HASH join on the bucket key,
    # never a nested-loop range join over the vocab
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_budget_mixture_deterministic_and_budgeted(spark):
    import hashlib as _hl

    from pargraph_spark.operators.sampling import (
        budget_mixture,
        fraction_threshold_hex,
    )

    rows = [
        (i, "web", 100) for i in range(400)
    ] + [
        (i + 1000, "code", 50) for i in range(200)
    ] + [
        (i + 5000, "books", 80) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    targets = {"web": 10_000, "code": 10_000, "books": 10_000_000}
    kept, summary = budget_mixture(df, targets)
    got = {(r["doc_id"], r["source"]) for r in kept.collect()}
    # exact python replica of the keep rule
    rates = {"web": 10_000 / 40_000, "code": 1.0, "books": 1.0}
    ref = set()
    for i, s, _t in rows:
        h = _hl.md5(f"mix|{s}:{i}".encode()).hexdigest()[:8]
        if h < fraction_threshold_hex(rates[s]):
            ref.add((i, s))
    assert got == ref
    # under-budget sources pass through whole
    assert sum(1 for _, s in got if s == "books") == 10
    assert sum(1 for _, s in got if s == "code") == 200
    sm = {r["source"]: r.asDict() for r in summary.collect()}
    assert sm["web"]["total_tokens"] == 40_000 and sm["web"]["rate"] == 0.25
    # achieved ~ budget in expectation (md5 uniformity, 400 docs)
    assert abs(sm["web"]["kept_tokens"] - 10_000) < 3_000
    assert sm["books"]["kept_docs"] == 10 and sm["books"]["rate"] == 1.0
    # repartition-stable
    kept2, _ = budget_mixture(df.repartition(7), targets)
    assert {(r["doc_id"], r["source"]) for r in kept2.collect()} == got


def test_budget_mixture_rejects_unknown_source(spark):
    import pytest

    from pargraph_spark.operators.sampling import budget_mixture

    df = spark.createDataFrame(
        [(1, "web", 10)], "doc_id long, source string, n_tokens int"
    )
    with pytest.raises(ValueError, match="absent sources"):
        budget_mixture(df, {"web": 5, "nope": 5})
