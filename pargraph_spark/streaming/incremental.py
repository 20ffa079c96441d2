"""Incremental page ingest via Structured Streaming.

The reference is batch-only (its DAG must be acyclic and fully known,
/root/reference/pargraph/engine/engine.py:108-109, and SURVEY.md §2.2 notes
no streaming counterpart), so this module is deliberately thin: a
crawl-drop directory is consumed as a parquet file stream and each
micro-batch runs the SAME batch operators (latest-crawl semantics are
enforced at read time downstream; extraction/edge-build are pure per-row)
and writes to the edge table. Iterative algorithms then run batch over the
accumulated edges — the standard lambda-style split for iterative graph
jobs, since a PageRank fixpoint is not expressible as a streaming aggregate.

Delivery semantics — effectively-once via an IDEMPOTENT sink:
foreachBatch itself is at-least-once (a batch retried after a partial
write replays), so the sink writes each micro-batch to its own
``batch_id=<N>`` partition with dynamic partition overwrite. A replayed
batch re-derives the same batch_id from the stream checkpoint log and
overwrites ONLY its own partition, so the edge set after any number of
retries equals the edge set of a clean run (asserted in
tests/test_streaming.py). Plain ``mode("append")`` would duplicate rows
on retry — the round-1 bug.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pargraph_spark.operators.edges import build_edges
from pargraph_spark.operators.extract_links import extract_links
from pargraph_spark.synth import PAGES_SCHEMA


def stream_edges(
    spark: SparkSession,
    input_dir: str,
    edges_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream pages parquet drops from input_dir → write extracted distinct
    edges to edges_dir/batch_id=N (idempotent per batch). Returns the
    StreamingQuery (already started).

    available_now=True drains what exists and stops (test/backfill mode);
    False runs continuously per micro-batch trigger.
    """
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)

    def _sink(batch_df, batch_id: int) -> None:
        edges = build_edges(extract_links(batch_df))
        (
            edges.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(edges_dir)
        )

    writer = pages.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_streamed_edges(spark: SparkSession, edges_dir: str) -> DataFrame:
    """Read the accumulated edge table (drops the batch_id bookkeeping
    partition column) for downstream batch algorithms."""
    return spark.read.parquet(edges_dir).drop("batch_id")


def stream_dedup_docs(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, ts timestamp, text string",
    watermark: str = "1 hour",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming EXACT dedupe of a document feed: emit each distinct
    content fingerprint once (first arrival wins), duplicates within the
    watermark horizon dropped — the ingest-side dedup step of a training
    pipeline, running ahead of the batch MinHash/winnowing passes.

    Built on ``dropDuplicatesWithinWatermark`` over the md5 content
    fingerprint: Spark keeps one state row per fingerprint and EVICTS it
    once the watermark passes that event's time + the delay, so state is
    bounded by the dedup window, not the stream length — the only
    formulation that survives an unbounded feed. (Plain
    ``dropDuplicates(["fp"])`` under a watermark does NOT evict — the
    event-time column isn't part of the key — and grows with every
    distinct fingerprint ever seen; the round-3 bug.) A duplicate
    arriving LATER than the watermark horizon re-emits (the documented,
    bounded-state tradeoff, asserted in tests/test_streaming.py; the
    batch exact_dedup pass is the backstop). Appends (doc_id, fp, ts)
    to out_dir; exactly-once via the file-sink commit log."""
    from pargraph_spark.functions.text import fingerprint

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    docs = reader.parquet(input_dir)
    deduped = (
        docs.select("doc_id", "ts", fingerprint(F.col("text")).alias("fp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_span_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 8,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    min_count: int = 2,
    schema: str = "doc_id long, ts timestamp, text string",
    available_now: bool = True,
):
    """Streaming boilerplate detector: per event-time window, the n-gram
    spans (operators/spans.py hashing, identical keys to the batch
    repeated_spans pass) that occur >= min_count times — the ingest-side
    early warning for template/license-block floods, ahead of the batch
    substring-dedup pass.

    State discipline (the round-3/4 lesson): a GLOBAL span counter would
    keep one state row per distinct span ever seen — unbounded on an
    unbounded feed. Windowed aggregation under a watermark is the
    bounded-state formulation: state = spans per open window, evicted
    when the watermark closes the window, at which point the window's
    verdict appends exactly once (file-sink commit log). Cross-window
    repetition is the BATCH pass's job (span_dup_stats); the stream's
    contract is repetition WITHIN the window, and the two compose.

    Appends (window_start, window_end, span, n_occurrences, n_docs)."""
    from pargraph_spark.functions.text import tokens

    docs = spark.readStream.schema(schema).parquet(input_dir)
    # same span keys as operators/spans.py (ngram_spans), with ts carried
    # through; sequence() descends when stop < start, so short docs are
    # size-guarded to an empty window list rather than clamped
    spans = (
        docs.select("doc_id", "ts", tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") >= n)
        .select(
            "doc_id", "ts",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {n} + 1), "
                    f"i -> md5(cast(concat_ws(' ', slice(toks, i, {n})) as binary)))"
                )
            ).alias("span"),
        )
    )
    counted = (
        spans.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "span")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.approx_count_distinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occurrences") >= int(min_count))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "span", "n_occurrences", "n_docs",
        )
    )
    writer = (
        counted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_HH_OUT_SCHEMA = "bucket int, item string, count_lb long, dec long, n long"
_HH_STATE_SCHEMA = "items array<string>, counts array<long>, dec long, n long"


def streaming_frequent_items(items: DataFrame, item_col: str = "item",
                             k: int = 64, buckets: int = 32) -> DataFrame:
    """Streaming Misra-Gries heavy hitters: bounded state over an unbounded
    item stream (the stream-native tier of operators/heavyhitters.py).

    Items are hash-partitioned into `buckets` groups (pmod(xxhash64(item),
    buckets)); each group keeps ONE Misra-Gries summary of budget k as
    GroupState, so total state is exactly buckets*k counters regardless of
    stream length or distinct-item count. Because the bucket is a function
    of the item, each item's entire sub-stream hits one summary, and the
    classic MG guarantee holds PER BUCKET with certified bounds:

      - every item whose true count exceeds n_bucket/(k+1) is reported;
      - count_lb <= true count <= count_lb + dec (that bucket's decrement
        total), both maintained exactly in state, not estimated.

    Each trigger emits a full snapshot of every updated bucket (update
    mode); `n` is monotone per bucket, so the latest snapshot for a bucket
    is its rows with the maximal n — `latest_frequent_items_snapshot`
    does that selection on the drained sink table.

    Scale: state buckets*(k) rows; per-trigger work is one dict pass per
    Arrow batch; no shuffle beyond the bucket hash exchange. Reference has
    no streaming surface (SURVEY.md section 2.2) — engine extension.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        bucket = int(key[0])
        if state.exists:
            s_items, s_counts, dec, n = state.get
            counters = dict(zip(list(s_items), [int(c) for c in s_counts]))
            dec, n = int(dec), int(n)
        else:
            counters, dec, n = {}, 0, 0
        n0 = n
        for pdf in pdfs:
            for it in pdf["item"]:
                if it is None:
                    continue
                n += 1
                if it in counters:
                    counters[it] += 1
                elif len(counters) < k:
                    counters[it] = 1
                else:
                    dec += 1
                    dead = []
                    for ky in counters:
                        counters[ky] -= 1
                        if counters[ky] == 0:
                            dead.append(ky)
                    for ky in dead:
                        del counters[ky]
        # a batch with ZERO non-null items for an existing bucket (null
        # items route to a real bucket — xxhash64(NULL) is the seed
        # hash) must not re-emit: n is unchanged, so a second same-n
        # snapshot would duplicate every row under the max-n reducer
        if state.exists and n == n0:
            return
        state.update((list(counters.keys()), list(counters.values()), dec, n))
        m = len(counters)
        yield pd.DataFrame(
            {
                "bucket": [bucket] * (m + 1),
                "item": list(counters.keys()) + [None],
                "count_lb": list(counters.values()) + [0],
                "dec": [dec] * (m + 1),
                "n": [n] * (m + 1),
            }
        )

    return (
        items.select(
            F.pmod(F.xxhash64(F.col(item_col)), F.lit(buckets))
            .cast("int")
            .alias("bucket"),
            F.col(item_col).cast("string").alias("item"),
        )
        .groupBy("bucket")
        .applyInPandasWithState(
            fn,
            outputStructType=_HH_OUT_SCHEMA,
            stateStructType=_HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def latest_frequent_items_snapshot(sink_df: DataFrame) -> DataFrame:
    """Reduce a drained update-mode sink table to the final summary: per
    bucket keep the snapshot with the maximal n (n is monotone per bucket),
    and expose the certified bounds (count_ub = count_lb + bucket dec)."""
    from pyspark.sql import Window

    w = Window.partitionBy("bucket")
    return (
        sink_df.withColumn("_mx", F.max("n").over(w))
        .where((F.col("n") == F.col("_mx")) & F.col("item").isNotNull())
        .select(
            "bucket",
            "item",
            "count_lb",
            (F.col("count_lb") + F.col("dec")).alias("count_ub"),
            F.col("n").alias("bucket_n"),
        )
    )
