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
