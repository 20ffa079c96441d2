from __future__ import annotations

import numpy as np
import pytest

from pargraph_spark.operators.clustering import QUANT, cluster_sizes, kmeans_cosine

SF_DIR = "/root/testdata/sf0.001"


def _numpy_kmeans(ids, V, k=8, iterations=3):
    """Independent reference of the pinned algorithm."""
    order = np.argsort(ids)
    seeds = order[:k]
    C = np.round(V[seeds], QUANT)
    assign = None
    for it in range(iterations):
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        sims = np.round(Vn @ Cn.T, QUANT)
        assign = np.argmax(sims, axis=1)
        if it == iterations - 1:
            break
        newC = C.copy()
        for j in range(k):
            members = V[assign == j]
            if len(members):
                newC[j] = np.round(members.mean(axis=0), QUANT)
        C = newC
    return {int(ids[i]): int(assign[i]) for i in range(len(ids))}


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_kmeans_matches_numpy(spark, emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ref = _numpy_kmeans(ids, V)
    res = kmeans_cosine(emb, k=8, iterations=3)
    got = {r["id"]: r["cluster"] for r in res.assignments.collect()}
    assert got == ref
    assert res.centroids.shape == (8, 64)
    sizes = {r["cluster"]: r["n"] for r in cluster_sizes(res.assignments).collect()}
    assert sum(sizes.values()) == len(ids)
    assert len(sizes) > 1  # quasi-random data spreads over clusters


def test_kmeans_partition_invariant(spark, emb):
    a = {
        r["id"]: r["cluster"]
        for r in kmeans_cosine(emb.repartition(3), k=4, iterations=2).assignments.collect()
    }
    b = {
        r["id"]: r["cluster"]
        for r in kmeans_cosine(emb.repartition(11, "vec_id"), k=4, iterations=2).assignments.collect()
    }
    assert a == b


def test_kmeans_validates_inputs(spark, emb):
    # ADVICE r2: k < 1 and empty corpus used to die with opaque IndexError
    with pytest.raises(ValueError, match="k >= 1"):
        kmeans_cosine(emb, k=0)
    empty = emb.where("vec_id < 0")
    with pytest.raises(ValueError, match="non-empty"):
        kmeans_cosine(empty, k=2)
