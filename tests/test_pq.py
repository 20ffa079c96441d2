from __future__ import annotations

import numpy as np
import pytest

from pargraph_spark.operators.pq import pq_adc_topk, pq_encode, pq_train

Q = 12


def _mk_corpus(n=60, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    V = np.round(rng.randn(n, dim), 6)
    return [(i, V[i].tolist()) for i in range(n)], V


def _train_oracle(V, m, k, iterations):
    n, dim = V.shape
    dsub = dim // m
    S = np.round(V[:k], Q)
    C = np.stack([S[:, j * dsub:(j + 1) * dsub] for j in range(m)])
    for it in range(iterations - 1):
        codes = _encode_oracle(V, C)
        newC = C.copy()
        for j in range(m):
            Vj = V[:, j * dsub:(j + 1) * dsub]
            for c in range(k):
                sel = Vj[codes[:, j] == c]
                if len(sel):
                    newC[j, c] = np.round(sel.mean(axis=0), Q)
        C = newC
    return C


def _encode_oracle(V, C):
    m, k, dsub = C.shape
    codes = np.zeros((len(V), m), dtype=int)
    for j in range(m):
        Vj = V[:, j * dsub:(j + 1) * dsub]
        d2 = np.round(((Vj[:, None, :] - C[j][None, :, :]) ** 2).sum(axis=2), Q)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def test_pq_train_encode_match_oracle(spark):
    rows, V = _mk_corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m, k, iters = 4, 8, 3
    model = pq_train(df, m=m, k=k, iterations=iters)
    C_want = _train_oracle(V, m, k, iters)
    assert model.codebooks.shape == (m, k, 4)
    assert np.array_equal(model.codebooks, C_want)
    got = {r["id"]: r["codes"] for r in pq_encode(df, model).collect()}
    want = _encode_oracle(V, C_want)
    assert set(got) == set(range(len(V)))
    for i in range(len(V)):
        assert got[i] == want[i].tolist(), i


def test_pq_adc_topk_matches_bruteforce_tables(spark):
    rows, V = _mk_corpus(n=80)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m, k = 4, 8
    model = pq_train(df, m=m, k=k, iterations=2)
    codes_df = pq_encode(df, model)
    queries = df.where("vec_id % 19 = 0")
    res = pq_adc_topk(codes_df, queries, model, topk=5).collect()
    # oracle: exact table lookups with fixed-order accumulation
    C = model.codebooks
    dsub = V.shape[1] // m
    codes = _encode_oracle(V, C)
    for qid in [i for i in range(len(V)) if i % 19 == 0]:
        T = np.round(
            np.array([V[qid, j * dsub:(j + 1) * dsub] @ C[j].T for j in range(m)]),
            Q,
        )
        acc = T[0][codes[:, 0]].copy()
        for j in range(1, m):
            acc = acc + T[j][codes[:, j]]
        s9 = np.round(acc, 9)
        order = sorted(range(len(V)), key=lambda i: (-s9[i], i))[:5]
        got = sorted(
            (r["rn"], r["id"], r["score9"]) for r in res if r["qid"] == qid
        )
        want = [(rn + 1, i, s9[i]) for rn, i in enumerate(order)]
        assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want], qid
        for (_, _, gs), (_, _, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=2e-9)


def test_pq_rejects_bad_shapes(spark):
    rows, _ = _mk_corpus(n=10, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        pq_train(df, m=5, k=4)   # 16 % 5 != 0
    with pytest.raises(ValueError):
        pq_train(df, m=4, k=64)  # fewer vectors than k
