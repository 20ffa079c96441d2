"""Incremental page ingest via Structured Streaming.

The reference is batch-only (its DAG must be acyclic and fully known,
/root/reference/pargraph/engine/engine.py:108-109, and SURVEY.md §2.2 notes
no streaming counterpart), so this module is deliberately thin: a
crawl-drop directory is consumed as a parquet file stream and each
micro-batch runs the SAME batch operators (latest-crawl semantics are
enforced at read time downstream; extraction/edge-build are pure per-row)
and appends to the edge table. Iterative algorithms then run batch over the
accumulated edges — the standard lambda-style split for iterative graph
jobs, since a PageRank fixpoint is not expressible as a streaming aggregate.

foreachBatch (not a streaming join) keeps exactly-once append semantics via
the checkpointLocation commit log.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

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
    """Stream pages parquet drops from input_dir → append extracted distinct
    edges to edges_dir. Returns the StreamingQuery (already started).

    available_now=True drains what exists and stops (test/backfill mode);
    False runs continuously per micro-batch trigger.
    """
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)

    def _sink(batch_df, batch_id: int) -> None:
        edges = build_edges(extract_links(batch_df))
        edges.write.mode("append").parquet(edges_dir)

    writer = pages.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
