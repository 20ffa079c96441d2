"""Distributed ridge regression via exact integer normal equations.

The training-data-pipeline fit (quality-score weights, token-budget
predictors): solve  θ = (XᵀX + λI)⁻¹ Xᵀy  for integer-valued features.
The distributed part is ONE pass of partial-combine sums — the
(p+1)(p+2)/2 + (p+1) moment sums XᵀX and Xᵀy — aggregated as
decimal(38,0) so they are EXACT integers at any scale (a 10^12-row
table only grows the sums, never the solve). The (p+1)×(p+1) solve is
O(1) on the driver with arbitrary-precision integer arithmetic:
fraction-free Bareiss determinants give exact integer det(A) and
det(A_i), and each coefficient is the SINGLE IEEE division
float(det_i)/float(det) — deterministic across engines (int→double
rounds to nearest in both; the repo's float-policy tier 2), which is
what makes the DuckDB oracle an exact hash match without tolerance.

Scale shape: one shuffle-free global aggregate (partial sums
map-side, one final reduce of a constant-width row). No UDFs, no
collect of data rows — only the constant-size moment row reaches the
driver. Prediction is a pure JVM expression column.

Reference frame: pargraph has no model-fitting operator; this extends
the LLM-pipeline family (quality scoring functions/text.py, kmeans
clustering.py) with the supervised fit those features feed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _int_det(m: list[list[int]]) -> int:
    """Exact integer determinant (fraction-free Bareiss)."""
    m = [row[:] for row in m]
    n = len(m)
    sign, prev = 1, 1
    for k in range(n - 1):
        if m[k][k] == 0:
            for i in range(k + 1, n):
                if m[i][k] != 0:
                    m[k], m[i] = m[i], m[k]
                    sign = -sign
                    break
            else:
                return 0
        for i in range(k + 1, n):
            for j in range(k + 1, n):
                m[i][j] = (m[i][j] * m[k][k] - m[i][k] * m[k][j]) // prev
        prev = m[k][k]
    return sign * m[n - 1][n - 1]


@dataclass
class RidgeResult:
    coefficients: list[float]  # [intercept, θ_1, ..., θ_p]
    features: list[str]
    n: int
    det: int                   # det(XᵀX + λI) — exact integer
    model: DataFrame           # (feature, coef) rows, intercept first


def ridge_fit(
    spark: SparkSession,
    df: DataFrame,
    features: list[str | Column],
    target: str | Column,
    lam: int = 1,
    feature_names: list[str] | None = None,
) -> RidgeResult:
    """Fit y ≈ θ₀ + Σ θ_i·x_i over INTEGER-valued feature/target
    expressions. lam ≥ 0 is the integer ridge term added to every
    diagonal entry of XᵀX (including the intercept's — symmetric and
    keeps the system nonsingular even on degenerate fixtures). Raises
    if the regularized system is still singular."""
    cols = [F.lit(1).alias("_x0")] + [
        (F.col(c) if isinstance(c, str) else c).cast("long").alias(f"_x{i+1}")
        for i, c in enumerate(features)
    ]
    names = ["intercept"] + (
        feature_names
        if feature_names is not None
        else [c if isinstance(c, str) else f"f{i+1}" for i, c in enumerate(features)]
    )
    ycol = (F.col(target) if isinstance(target, str) else target).cast("long")
    p1 = len(cols)
    base = df.select(*cols, ycol.alias("_y"))
    # rows with ANY null among the used columns are dropped WHOLE before
    # the moments: per-moment null-skipping would build XtX/Xty over
    # inconsistent row subsets and solve to silently wrong coefficients
    cond = F.col("_y").isNotNull()
    for i in range(p1):
        cond = cond & F.col(f"_x{i}").isNotNull()
    base = base.where(cond)
    # operands cast to decimal BEFORE the product: a long*long per-row
    # product overflows int64 at |x| ~ 3e9 (ANSI mode throws; non-ANSI
    # silently wraps) — the wl.py decimal-aggregation discipline
    d = lambda name: F.col(name).cast(_DEC)
    aggs = []
    for i in range(p1):
        for j in range(i, p1):
            aggs.append(
                F.sum(d(f"_x{i}") * d(f"_x{j}")).alias(f"s_{i}_{j}")
            )
        aggs.append(F.sum(d(f"_x{i}") * d("_y")).alias(f"sy_{i}"))
    row = base.agg(*aggs).first()
    s = lambda i, j: int(row[f"s_{min(i,j)}_{max(i,j)}"] or 0)
    a = [
        [s(i, j) + (int(lam) if i == j else 0) for j in range(p1)]
        for i in range(p1)
    ]
    b = [int(row[f"sy_{i}"] or 0) for i in range(p1)]
    det = _int_det(a)
    if det == 0:
        raise ValueError("singular normal equations; raise lam")
    thetas = []
    for i in range(p1):
        ai = [[b[k] if j == i else a[k][j] for j in range(p1)] for k in range(p1)]
        thetas.append(float(_int_det(ai)) / float(det))
    model = spark.createDataFrame(
        list(zip(names, thetas)), "feature string, coef double"
    )
    n = int(row["s_0_0"] or 0)
    return RidgeResult(thetas, names, n, det, model)


def ridge_predict(
    df: DataFrame,
    features: list[str | Column],
    coefficients: list[float],
    out: str = "prediction",
) -> DataFrame:
    """Append θ₀ + Σ θ_i·x_i as a pure JVM expression column."""
    expr = F.lit(float(coefficients[0]))
    for c, t in zip(features, coefficients[1:]):
        col = F.col(c) if isinstance(c, str) else c
        expr = expr + col.cast("double") * F.lit(float(t))
    return df.withColumn(out, expr)
