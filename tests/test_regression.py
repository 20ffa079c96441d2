from __future__ import annotations

import random

import numpy as np
import pytest

from pargraph_spark.operators.regression import (
    _int_det,
    ridge_fit,
    ridge_predict,
)


def test_int_det_matches_numpy():
    rng = random.Random(5)
    for n in (1, 2, 3, 4, 5):
        m = [[rng.randrange(-9, 10) for _ in range(n)] for _ in range(n)]
        assert _int_det(m) == round(np.linalg.det(np.array(m, dtype=float)))


def test_ridge_fit_matches_numpy_solve(spark):
    rng = random.Random(11)
    rows = [
        (i, x1, x2, 3 + 2 * x1 - x2 + rng.randrange(-4, 5))
        for i, (x1, x2) in enumerate(
            (rng.randrange(0, 50), rng.randrange(0, 30)) for _ in range(200)
        )
    ]
    df = spark.createDataFrame(rows, "id long, x1 long, x2 long, y long")
    lam = 2
    res = ridge_fit(spark, df, ["x1", "x2"], "y", lam=lam)
    X = np.array([[1, r[1], r[2]] for r in rows], dtype=float)
    y = np.array([r[3] for r in rows], dtype=float)
    want = np.linalg.solve(X.T @ X + lam * np.eye(3), X.T @ y)
    assert np.allclose(res.coefficients, want, rtol=1e-9, atol=1e-9)
    assert res.n == 200
    got = {r["feature"]: r["coef"] for r in res.model.collect()}
    assert got == dict(zip(res.features, res.coefficients))


def test_ridge_fit_deterministic_across_runs(spark):
    rows = [(i, i % 7, (i * 13) % 11, (i * i) % 23) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, x1 long, x2 long, y long")
    a = ridge_fit(spark, df.repartition(8), ["x1", "x2"], "y")
    b = ridge_fit(spark, df.repartition(3), ["x1", "x2"], "y")
    # bit-identical regardless of partitioning: the sums are exact ints
    assert a.coefficients == b.coefficients
    assert a.det == b.det


def test_ridge_predict_exact_fit(spark):
    # noiseless data with lam=0 recovers the plane and predicts exactly
    rows = [(i, x1, x2, 7 + 3 * x1 + 5 * x2)
            for i, (x1, x2) in enumerate((a, b) for a in range(6) for b in range(6))]
    df = spark.createDataFrame(rows, "id long, x1 long, x2 long, y long")
    res = ridge_fit(spark, df, ["x1", "x2"], "y", lam=0)
    assert np.allclose(res.coefficients, [7.0, 3.0, 5.0], atol=1e-9)
    pred = ridge_predict(df, ["x1", "x2"], res.coefficients)
    for r in pred.collect():
        assert r["prediction"] == pytest.approx(r["y"], abs=1e-6)


def test_ridge_singular_raises(spark):
    df = spark.createDataFrame(
        [(i, 2, 4, 1) for i in range(10)], "id long, x1 long, x2 long, y long"
    )
    # x2 = 2*x1 constant columns: singular at lam=0
    with pytest.raises(ValueError):
        ridge_fit(spark, df, ["x1", "x2"], "y", lam=0)
    # ridge term rescues it
    res = ridge_fit(spark, df, ["x1", "x2"], "y", lam=1)
    assert res.det > 0


def test_ridge_fit_large_values_no_overflow(spark):
    from pargraph_spark.operators.regression import ridge_fit

    # x ~ 4e9: x*x ~ 1.6e19 > int64 max — products must run in decimal
    big = 4_000_000_000
    rows = [(big + i, 2 * (big + i) + 7) for i in range(6)]
    df = spark.createDataFrame(rows, "x long, y long")
    res = ridge_fit(spark, df, ["x"], "y", lam=0)
    assert res.n == 6
    assert abs(res.coefficients[1] - 2.0) < 1e-6
    assert abs(res.coefficients[0] - 7.0) < 1e-2  # intercept, huge det


def test_ridge_fit_drops_null_rows_whole(spark):
    from pargraph_spark.operators.regression import ridge_fit

    rows = [(1, 1, 3), (2, 1, 5), (3, 1, 7), (None, 1, 999), (4, None, 9)]
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    res = ridge_fit(spark, df, ["x1", "x2"], "y", lam=1)
    # only the 3 fully-non-null rows count; the 999 outlier never enters
    assert res.n == 3
    clean = spark.createDataFrame(
        [r for r in rows if None not in r], "x1 int, x2 int, y int"
    )
    ref = ridge_fit(spark, clean, ["x1", "x2"], "y", lam=1)
    assert res.coefficients == ref.coefficients
