from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pargraph_spark.operators.similarity import cosine_topk, lsh_ann_topk

SF_DIR = "/root/testdata/sf0.001"
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


def test_lsh_ann_recall_against_brute(spark, emb):
    queries = emb.where(F.col("vec_id") < 50)
    brute = cosine_topk(emb, queries, k=K).collect()
    ann = lsh_ann_topk(emb, queries, k=K, dim=64, num_planes=4).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    aset = {(r["query_id"], r["neighbor_id"]) for r in ann}
    # every ANN hit must be a real neighbor from the same bucket with exact cosine
    by_q: dict[int, int] = {}
    for q, n in aset:
        by_q[q] = by_q.get(q, 0) + 1
    assert all(v <= K for v in by_q.values())
    recall = len(aset & bset) / len(bset)
    assert recall > 0.15, f"recall collapsed: {recall}"
    # and ANN cosines are exact (same scoring expression)
    bmap = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in brute}
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        if key in bmap:
            assert math.isclose(r["cos"], bmap[key], abs_tol=1e-12)
