"""Repeated n-gram span detection — substring-level training-data dedup.

Document-level dedup (exact / MinHash / SimHash, dedup.py) misses the
dominant contamination mode in web corpora: BOILERPLATE — navigation
chrome, license blocks, quoted snippets — repeated VERBATIM inside
otherwise-distinct documents. Lee et al., "Deduplicating Training Data
Makes Language Models Better" (ACL'22) showed removing repeated ~50-token
substrings beats document-level dedup for LM quality; their exact tool is
a single-machine suffix array, which does not shard. The MapReduce-scale
equivalent is HASHED n-GRAM SPANS: slide an n-token window over each
document, hash each window, and find hashes occurring more than once
across the corpus — every repeated substring of length ≥ n is covered by
at least one repeated n-gram, so the recall story of the suffix-array
method survives sharding (precision differs only by md5 collisions,
~2^-128).

Tokenization is the engine's standard whitespace normalization
(functions.text.tokens — lowercase, collapsed whitespace), so spans, doc
fingerprints, and winnowing all agree on what a token is, and the DuckDB
oracle reproduces the span keys exactly (md5 of the space-joined window).

Plan shape at 100 TB: span extraction is a zero-shuffle JVM projection
(transform/sequence/slice — no Python, no explode of intermediate
arrays until the single posting explode); the corpus-frequency aggregate
is ONE shuffle of (span_key, doc_id) postings partial-combined map-side;
md5 keys hash uniformly so the shuffle has no inherent skew — a
boilerplate span repeated 10^9 times lands as ONE reduce-side counter,
not a fan-out (count, not join). The per-doc stats pass joins postings
to span counts on the same span-partitioned layout, then re-aggregates
by doc — two T-scale shuffles total (T = token count), the floor for
any corpus-frequency signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pargraph_spark.functions.text import tokens


def ngram_spans(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8
) -> DataFrame:
    """(doc_id, pos, span): one row per n-token window; pos is the
    1-based token index of the window start; span = md5 of the
    space-joined window. Documents shorter than n tokens emit nothing."""
    if n < 1:
        raise ValueError(f"ngram_spans requires n >= 1, got {n}")
    t = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    return (
        t.where(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {n} + 1), "
                    f"i -> struct(cast(i as long) as pos, "
                    f"md5(cast(concat_ws(' ', slice(toks, i, {n})) as binary)) as span))"
                )
            ).alias("ps"),
        )
        .select("doc_id", F.col("ps.pos").alias("pos"), F.col("ps.span").alias("span"))
    )


def repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """(span, n_occurrences, n_docs) for every n-gram span occurring at
    least min_count times across the corpus — the removal list of the
    Lee-et-al. procedure."""
    s = ngram_spans(docs, id_col, text_col, n)
    return (
        s.groupBy("span")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occurrences") >= int(min_count))
    )


def span_dup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplication profile: (doc_id, n_spans, n_dup_spans,
    dup_frac) where n_dup_spans counts windows whose span occurs ≥
    min_count times corpus-wide and dup_frac = n_dup_spans/n_spans (one
    IEEE division of exact ints; 0.0 for docs shorter than n tokens).
    The standard filter drops or trims documents with high dup_frac."""
    s = ngram_spans(docs, id_col, text_col, n)
    counts = s.groupBy("span").agg(F.count("*").alias("_c"))
    per_doc = (
        s.join(counts, "span")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(
                F.when(F.col("_c") >= int(min_count), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup_spans"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.when(
                F.coalesce(F.col("n_spans"), F.lit(0)) > 0,
                F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )
