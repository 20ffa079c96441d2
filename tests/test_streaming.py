from __future__ import annotations

import os

from pargraph_spark.operators.edges import build_edges
from pargraph_spark.operators.extract_links import extract_links
from pargraph_spark.streaming.incremental import stream_edges
from pargraph_spark.synth import pages_df_local


def test_stream_edges_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "drops")
    edges_dir = str(tmp_path / "edges")
    ck = str(tmp_path / "ck")
    os.makedirs(in_dir)

    # two crawl drops
    pages_df_local(spark, 80).write.parquet(f"{in_dir}/drop0")
    # move files up: file stream wants files in the dir tree; parquet subdirs OK
    q = stream_edges(spark, f"{in_dir}/*", edges_dir, ck, available_now=True)
    q.awaitTermination(120)

    got = {
        (r["src"], r["dst"])
        for r in spark.read.parquet(edges_dir).collect()
    }
    batch = {
        (r["src"], r["dst"])
        for r in build_edges(extract_links(pages_df_local(spark, 80))).collect()
    }
    # streaming path ran per micro-batch over ALL page rows (no latest-crawl
    # dedupe inside the stream) => superset of batch-latest edges
    assert batch and got >= batch


def test_replayed_batch_is_idempotent(spark, tmp_path):
    # foreachBatch is at-least-once: simulate a replay by re-running the
    # same drop with a FRESH stream checkpoint (batch_id restarts at 0) —
    # the per-batch_id dynamic-overwrite sink must leave the edge table
    # byte-identical, including row COUNT (append-mode duplicated rows).
    from pargraph_spark.streaming.incremental import read_streamed_edges

    in_dir = str(tmp_path / "drops")
    edges_dir = str(tmp_path / "edges")
    os.makedirs(in_dir)
    pages_df_local(spark, 60).write.parquet(f"{in_dir}/drop0")

    q = stream_edges(spark, f"{in_dir}/*", edges_dir, str(tmp_path / "ck1"),
                     available_now=True)
    q.awaitTermination(120)
    first = read_streamed_edges(spark, edges_dir)
    n1, set1 = first.count(), {(r["src"], r["dst"]) for r in first.collect()}

    q = stream_edges(spark, f"{in_dir}/*", edges_dir, str(tmp_path / "ck2"),
                     available_now=True)
    q.awaitTermination(120)
    again = read_streamed_edges(spark, edges_dir)
    n2, set2 = again.count(), {(r["src"], r["dst"]) for r in again.collect()}
    assert n1 == n2 and set1 == set2
    assert n1 == len(set1)  # no duplicate rows anywhere


def test_stream_dedup_docs_first_arrival_wins(spark, tmp_path):
    from datetime import datetime

    from pargraph_spark.streaming.incremental import stream_dedup_docs

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "docs_out")
    ck = str(tmp_path / "ck")
    os.makedirs(in_dir, exist_ok=True)

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def drop(name, rows):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(in_dir, name))

    # two drops: doc 2 duplicates doc 1's content; doc 4 duplicates too
    drop("d1", [(1, t0, "alpha beta gamma"), (2, t0, "alpha beta gamma"),
                (3, t0, "something else entirely")])
    drop("d2", [(4, t0, "alpha beta gamma"), (5, t0, "fresh new content")])

    q = stream_dedup_docs(
        spark, in_dir + "/*", out_dir, ck, watermark="1 hour",
        available_now=True,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir).collect()
    by_fp = {}
    for r in out:
        by_fp.setdefault(r["fp"], []).append(r["doc_id"])
    # one row per distinct content; the duplicate ids 2 and 4 never emit
    assert all(len(v) == 1 for v in by_fp.values()), by_fp
    emitted = {r["doc_id"] for r in out}
    assert 3 in emitted and 5 in emitted
    assert len(emitted & {1, 2, 4}) == 1  # exactly one of the triplicate

    # a replayed/new duplicate within the watermark still dropped
    drop("d3", [(6, t0, "alpha beta gamma")])
    q2 = stream_dedup_docs(
        spark, in_dir + "/*", out_dir, ck, watermark="1 hour",
        available_now=True,
    )
    q2.awaitTermination(120)
    out2 = spark.read.parquet(out_dir).collect()
    assert 6 not in {r["doc_id"] for r in out2}
    assert len(out2) == len(out)


def test_stream_dedup_docs_reemits_past_watermark_horizon(spark, tmp_path):
    """State-eviction semantics: a duplicate whose event time lies beyond
    the watermark horizon of the original arrives AFTER the state row was
    evicted and re-emits (the documented bounded-state tradeoff).

    Drops are mtime-ordered with maxFilesPerTrigger=1 so the watermark
    advances between micro-batches. The guarantee is one-sided AND
    eviction runs at end-of-batch (after the state lookup), so TWO
    advancer batches sit between the original and the late duplicate:
    batch 2 advances the watermark past the original's expiry, batch 3
    runs with that watermark and evicts the state row at its end, and
    only then does the duplicate in batch 4 find no state and re-emit
    (verified against the checkpoint offsets' batchWatermarkMs)."""
    import time
    from datetime import datetime, timedelta

    from pargraph_spark.streaming.incremental import stream_dedup_docs

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "docs_out")
    ck = str(tmp_path / "ck")
    os.makedirs(in_dir, exist_ok=True)

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def drop(name, rows):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(in_dir, name))
        time.sleep(1.1)  # distinct mtimes => deterministic batch order

    # batch 1: original content X at t0 -> emits, state expires at t0+1h
    drop("d1", [(1, t0, "duplicate me")])
    # batch 2: advancer at t0+4h -> watermark after this batch is t0+3h
    drop("d2", [(2, t0 + timedelta(hours=4), "watermark advancer")])
    # batch 3: runs WITH watermark t0+3h > t0+1h -> X's state row is
    # evicted at this batch's end
    drop("d3", [(9, t0 + timedelta(hours=4), "second advancer")])
    # batch 4: duplicate of X, state gone -> re-emits
    drop("d4", [(3, t0 + timedelta(hours=4), "duplicate me")])

    q = stream_dedup_docs(
        spark, in_dir + "/*", out_dir, ck, watermark="1 hour",
        available_now=True, max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    out = spark.read.parquet(out_dir).collect()
    emitted = sorted(r["doc_id"] for r in out)
    # 1 emitted, advancers emitted, post-horizon duplicate 3 RE-emitted
    assert emitted == [1, 2, 3, 9], emitted
    fps = [r["fp"] for r in out if r["doc_id"] in (1, 3)]
    assert fps[0] == fps[1]  # same content fingerprint, emitted twice


def test_stream_span_counts_windowed(spark, tmp_path):
    import hashlib
    from datetime import datetime

    from pargraph_spark.streaming.incremental import stream_span_counts

    in_dir = str(tmp_path / "sp_in")
    out_dir = str(tmp_path / "sp_out")
    ck = str(tmp_path / "sp_ck")
    os.makedirs(in_dir, exist_ok=True)

    t0 = datetime(2026, 1, 1, 12, 10, 0)
    t1 = datetime(2026, 1, 1, 13, 10, 0)  # next hour window
    boiler = "all rights reserved contact the site owner"

    def drop(name, rows):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(in_dir, name))

    drop("d1", [
        (1, t0, f"intro words {boiler} tail one"),
        (2, t0, f"other preamble {boiler} different tail"),
        (3, t0, "no repeated content in this one at all"),
        # next window: boilerplate appears only once -> below min_count
        (4, t1, f"late {boiler} again"),
    ])
    q = stream_span_counts(
        spark, in_dir + "/*", out_dir, ck, n=4,
        window="1 hour", watermark="10 minutes", min_count=2,
        available_now=True,
    )
    q.awaitTermination(180)
    out = spark.read.parquet(out_dir).collect()
    # windows only close once the watermark passes them; the t0 window
    # closes thanks to the t1 events advancing the watermark
    by_span = {(r["span"], r["window_start"].hour): r for r in out}
    btoks = boiler.split()
    for i in range(len(btoks) - 4 + 1):
        key = hashlib.md5(" ".join(btoks[i:i + 4]).encode()).hexdigest()
        row = by_span.get((key, 12))
        assert row is not None, (i, sorted(by_span))
        assert row["n_occurrences"] == 2
    # t1 window: nothing repeated, and it may not even have closed
    assert all(h == 12 for (_, h) in by_span)


def test_streaming_frequent_items_guarantee(spark, tmp_path):
    import random
    from collections import Counter

    from pyspark.sql import functions as F

    from pargraph_spark.streaming.events import run_to_memory
    from pargraph_spark.streaming.incremental import (
        latest_frequent_items_snapshot,
        streaming_frequent_items,
    )

    in_dir = str(tmp_path / "hh_in")
    ck = str(tmp_path / "hh_ck")
    os.makedirs(in_dir, exist_ok=True)

    rng = random.Random(11)
    all_items: list[str] = []

    def drop(name, items):
        all_items.extend(items)
        spark.createDataFrame(
            [(x,) for x in items], "item string"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(in_dir, name))

    # three triggers of skewed traffic; hot items recur across triggers
    for i in range(3):
        batch = (
            ["hot_a"] * 1200 + ["hot_b"] * 700
            + [f"tail_{rng.randrange(3000)}" for _ in range(2000)]
        )
        rng.shuffle(batch)
        drop(f"b{i}", batch)

    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/*")
    )
    k, buckets = 16, 8
    run_to_memory(
        streaming_frequent_items(stream, "item", k=k, buckets=buckets),
        "hh_sink", ck, output_mode="update",
    )
    snap = latest_frequent_items_snapshot(spark.table("hh_sink")).collect()

    truth = Counter(all_items)
    # bucket assignment must match the operator's hash exactly — derive it
    # with the same Spark expression
    item_bucket = {
        r["item"]: r["b"]
        for r in spark.createDataFrame(
            [(x,) for x in set(all_items)], "item string"
        ).select(
            "item",
            F.pmod(F.xxhash64("item"), F.lit(buckets)).cast("int").alias("b"),
        ).collect()
    }
    bucket_n = Counter()
    for it, c in truth.items():
        bucket_n[item_bucket[it]] += c
    got = {r["item"]: r for r in snap}
    # state really is bounded: at most k survivors per bucket
    per_bucket = Counter(r["bucket"] for r in snap)
    assert all(v <= k for v in per_bucket.values()), per_bucket
    # per-bucket totals in the snapshot equal the true bucket sizes
    for r in snap:
        assert r["bucket_n"] == bucket_n[r["bucket"]], r
    # MG guarantee per bucket: every item above n_bucket/(k+1) reported
    for it, c in truth.items():
        b = item_bucket[it]
        if c > bucket_n[b] / (k + 1):
            assert it in got, (it, c, bucket_n[b])
    # certified bounds bracket the truth; nothing invented
    for it, r in got.items():
        assert it in truth
        assert r["count_lb"] <= truth[it] <= r["count_ub"], (it, dict(r.asDict()))
        assert r["count_lb"] >= 1
    assert {"hot_a", "hot_b"} <= set(got)


def test_streaming_frequent_items_allnull_batch_no_duplicates(spark, tmp_path):
    from pargraph_spark.streaming.events import run_to_memory
    from pargraph_spark.streaming.incremental import (
        latest_frequent_items_snapshot,
        streaming_frequent_items,
    )

    in_dir = str(tmp_path / "hhn_in")
    ck = str(tmp_path / "hhn_ck")
    os.makedirs(in_dir, exist_ok=True)

    def drop(name, items):
        spark.createDataFrame(
            [(x,) for x in items], "item string"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(in_dir, name))

    drop("b0", ["x"] * 5 + ["y"] * 2)
    # a batch of ONLY nulls: routes to real buckets (xxhash64(NULL) is
    # the seed hash) but adds no items — must not re-emit a same-n
    # snapshot that the max-n reducer would keep alongside the first
    drop("b1", [None, None, None])
    drop("b2", ["x"] * 3)

    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/*")
    )
    run_to_memory(
        streaming_frequent_items(stream, "item", k=4, buckets=2),
        "hhn_sink", ck, output_mode="update",
    )
    snap = latest_frequent_items_snapshot(spark.table("hhn_sink")).collect()
    rows_x = [r for r in snap if r["item"] == "x"]
    rows_y = [r for r in snap if r["item"] == "y"]
    assert len(rows_x) == 1 and len(rows_y) == 1, snap
    assert rows_x[0]["count_lb"] == 8 and rows_y[0]["count_lb"] == 2
