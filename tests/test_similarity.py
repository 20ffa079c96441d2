from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pargraph_spark.operators.similarity import (
    _plane_matrix,
    cosine_near_dup_bucketed,
    cosine_near_dup_pairs,
    cosine_topk,
    hyperplane_signatures,
    lsh_ann_topk,
    plane_signs,
)

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"
K = 5
NQ = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _numpy_topk(rows, k=K, nq=NQ):
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    out = {}
    for qi in range(len(ids)):
        if ids[qi] >= nq:
            continue
        cos = Vn @ Vn[qi]
        order = sorted(
            (int(i) for i in range(len(ids)) if i != qi),
            key=lambda i: (-cos[i], ids[i]),
        )[:k]
        out[int(ids[qi])] = [(int(ids[i]), float(cos[i])) for i in order]
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    queries = emb.where(F.col("vec_id") < NQ)
    got_rows = cosine_topk(emb, queries, k=K).collect()
    oracle = _numpy_topk(emb.collect())
    got: dict[int, list] = {}
    for r in sorted(got_rows, key=lambda r: (r["query_id"], -r["cos"], r["neighbor_id"])):
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cos"]))
    assert set(got) == set(oracle)
    for q in oracle:
        assert [n for n, _ in got[q]] == [n for n, _ in oracle[q]], q
        for (_, c1), (_, c2) in zip(got[q], oracle[q]):
            assert math.isclose(c1, c2, abs_tol=1e-6)


def test_plane_signs_never_cycle():
    # round-1 bug: one md5 digest reused cyclically past dim 128 correlated
    # plane components; the block-chained derivation must not repeat.
    s = plane_signs(0, 0, 512)
    assert s[:128] != s[128:256]  # a cycle would make these identical
    assert set(s) == {1.0, -1.0}
    # deterministic and prefix-stable across dims
    assert plane_signs(3, 2, 64) == plane_signs(3, 2, 256)[:64]


def test_hyperplane_signatures_match_numpy(spark, emb):
    L, r = 4, 6
    rows = emb.collect()
    ids = np.array([x["vec_id"] for x in rows])
    V = np.array([x["embedding"] for x in rows], dtype=np.float64)
    M = _plane_matrix(64, L, r)
    bits = (V @ M) > 0
    expected = {
        (int(ids[j]), t): int((bits[j, t * r: (t + 1) * r] * (1 << np.arange(r))).sum())
        for j in range(len(ids))
        for t in range(L)
    }
    got = {
        (x["vec_id"], x["t"]): x["sig"]
        for x in hyperplane_signatures(emb, 64, L, r).collect()
    }
    assert got == expected


def test_lsh_ann_recall_against_brute_sf001(spark):
    # VERDICT r1 gate: recall >= 0.9 vs brute at sf0.01 (was a 0.15 floor).
    emb01 = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet").cache()
    queries = emb01.where(F.col("vec_id") < 50)
    brute = cosine_topk(emb01, queries, k=K).collect()
    ann = lsh_ann_topk(emb01, queries, k=K, dim=64,
                       num_tables=8, planes_per_table=6, multiprobe_bits=1).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    aset = {(r["query_id"], r["neighbor_id"]) for r in ann}
    by_q: dict[int, int] = {}
    for q, n in aset:
        by_q[q] = by_q.get(q, 0) + 1
    assert all(v <= K for v in by_q.values())
    recall = len(aset & bset) / len(bset)
    assert recall >= 0.9, f"recall below gate: {recall}"
    # ANN cosines are exact (same scoring expression as brute)
    bmap = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in brute}
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        if key in bmap:
            assert math.isclose(r["cos"], bmap[key], abs_tol=1e-12)
    emb01.unpersist()


def test_near_dup_bucketed_equals_brute_weak_threshold(spark, emb):
    # fixture vectors are quasi-random: pairs at >= 0.4 are barely
    # correlated, so completeness needs coarse bands (r=2, L=16 -> >0.999
    # per-pair recall at cos 0.4). Set-equality, not just recall.
    brute = {
        (r["a"], r["b"], round(r["cos"], 9))
        for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    bucketed = {
        (r["a"], r["b"], round(r["cos"], 9))
        for r in cosine_near_dup_bucketed(
            emb, threshold=0.4, dim=64, num_tables=16, planes_per_table=2
        ).collect()
    }
    assert brute and bucketed == brute


def test_near_dup_bucketed_equals_brute_selective(spark, emb):
    # the production shape: true near-dups (deterministic perturbed copies
    # at cos ~0.99) found at threshold 0.9 with SELECTIVE bands (r=8 -> 256
    # buckets/table); candidate count stays a small fraction of all pairs.
    import __spark_entry__ as em

    corpus = em._near_dup_corpus(spark, SF_DIR)
    brute = {
        (r["a"], r["b"]) for r in cosine_near_dup_pairs(corpus, threshold=0.9).collect()
    }
    bucketed = {
        (r["a"], r["b"])
        for r in cosine_near_dup_bucketed(
            corpus, threshold=0.9, dim=64, num_tables=8, planes_per_table=8
        ).collect()
    }
    assert len(brute) == 50  # exactly the perturbed-original pairs
    assert bucketed == brute


def test_partial_topk_plan_and_identity(spark, emb):
    # the map-side partial cut must appear in the plan (MapInPandas) and
    # must not change results vs a plain global window.
    from pyspark.sql import Window

    queries = emb.where(F.col("vec_id") < NQ)
    df = cosine_topk(emb, queries, k=K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan

    from pargraph_spark.operators.similarity import cosine

    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    plain = (
        scored.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= K).drop("_rn")
    )
    got = {(r["query_id"], r["neighbor_id"], r["cos"]) for r in df.collect()}
    ref = {(r["query_id"], r["neighbor_id"], r["cos"]) for r in plain.collect()}
    assert got == ref  # byte-identical: cos is a float64 passthrough


def test_ivf_topk_candidates_and_exact_scores(spark):
    from pargraph_spark.operators.similarity import ivf_topk

    emb01 = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet").cache()
    queries = emb01.where(F.col("vec_id") < 50)
    brute = cosine_topk(emb01, queries, k=K).collect()
    ivf = ivf_topk(emb01, queries, k=K, num_centroids=16, nprobe=4).collect()
    bmap = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in brute}
    by_q: dict[int, int] = {}
    for r in ivf:
        by_q[r["query_id"]] = by_q.get(r["query_id"], 0) + 1
        key = (r["query_id"], r["neighbor_id"])
        if key in bmap:  # scores are the same exact expression
            assert math.isclose(r["cos"], bmap[key], abs_tol=1e-12)
    assert all(v <= K for v in by_q.values())
    # nprobe=4 of 16 cells touches ~25% of a quasi-random corpus: recall
    # floor is modest by design — IVF shines on clustered data
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    iset = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(bset & iset) / len(bset)
    assert recall >= 0.25, recall
    emb01.unpersist()
