"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force top-k — the correctness baseline. The dot
  product is F.zip_with + F.aggregate (ordered left-to-right fold, JVM
  expression codegen — no Python). Queries are broadcast: candidates
  never shuffle, so the plan is a single scan of the corpus per batch of
  queries. This is the right brute-force shape at any scale; cost is
  O(|Q|·|C|·d) compute, not shuffle.

- lsh_ann_topk: the scale path — random-hyperplane LSH. Hyperplane b's
  component i is ±1 derived from bit of md5("b:i"), so the planes are
  deterministic, engine-independent, and need no stored model. Vectors
  land in 2^num_planes buckets; top-k runs per bucket (optionally with
  multi-probe by flipping low-confidence bits — not implemented).
  Recall < 1 by design; tested against the brute-force baseline.

At 10^12-scale both paths want a pre-normalized corpus (store unit
vectors + norms once) and IVF-style bucketing so each query touches a
bounded candidate set; lsh_ann_topk is exactly that with hash buckets.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    # Cast to double BEFORE multiplying: a float32×float32 product is exact
    # in double (24+24 ≤ 53 mantissa bits), so the per-element products are
    # engine-independent and only the (tiny) summation-order effect remains.
    # Ordered left-to-right fold => deterministic result for a given pair.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos) — exact top-k by cosine, self excluded.

    Deterministic ranking: (cos DESC, neighbor_id ASC). Queries are
    broadcast; corpus is scanned once.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a < b, cos ≥ threshold).

    Brute-force all-pairs — the correctness tier; the scale path buckets
    by hyperplane_sign_bits first (near-dups share buckets with high
    probability) and verifies within buckets, same shape as MinHash→LSH→
    Jaccard for text.
    """
    a = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def hyperplane_sign_bits(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """LSH bucket id: Σ_b [dot(vec, plane_b) > 0] << b, planes ±1-valued
    from md5 bits (deterministic, no stored model)."""
    bucket = F.lit(0)
    for b in range(num_planes):
        digest = hashlib.md5(f"plane:{b}".encode()).digest()
        signs = [
            1.0 if (digest[(i // 8) % 16] >> (i % 8)) & 1 else -1.0
            for i in range(dim)
        ]
        plane = F.array(*[F.lit(s) for s in signs])
        d = _dot(vec, plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    bucket = hyperplane_sign_bits(F.col(vec_col), dim, num_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), bucket.alias("bkt")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), bucket.alias("bkt")
    )
    scored = (
        c.join(F.broadcast(q), "bkt")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
