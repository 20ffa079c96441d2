from __future__ import annotations

import json
import math
import os

from pargraph_spark.operators.edges import build_edges
from pargraph_spark.operators.extract_links import extract_links
from pargraph_spark.operators.pagerank import pagerank
from pargraph_spark.plans.checkpoint import CheckpointManager
from pargraph_spark.sources.pages import latest_pages
from pargraph_spark.synth import pages_df_local


def _edges(spark, n=150):
    pages = pages_df_local(spark, n)
    return build_edges(extract_links(latest_pages(pages))).cache()


def test_resume_equals_uninterrupted(spark, tmp_path):
    edf = _edges(spark)
    full = pagerank(spark, edf, tol=1e-8, num_partitions=4)
    ref = {r["id"]: r["rank"] for r in full.ranks.collect()}

    ckpt_dir = str(tmp_path / "ck")
    # "killed" run: stop after 4 supersteps (checkpoint_every=2 → superstep 4 committed)
    part = pagerank(spark, edf, tol=1e-8, num_partitions=4,
                    checkpoint_dir=ckpt_dir, checkpoint_every=2, max_iter=4)
    assert not part.converged
    m = CheckpointManager(ckpt_dir, "pagerank").latest()
    assert m is not None and m["superstep"] == 4
    assert m["rows"] > 0 and m["partitions"], "per-partition lineage recorded"
    assert sum(p["rows"] for p in m["partitions"]) == m["rows"]

    resumed = pagerank(spark, edf, tol=1e-8, num_partitions=4,
                       checkpoint_dir=ckpt_dir, checkpoint_every=2, resume=True)
    assert resumed.converged
    got = {r["id"]: r["rank"] for r in resumed.ranks.collect()}
    assert set(got) == set(ref)
    for v in ref:
        assert math.isclose(got[v], ref[v], abs_tol=1e-9), v
    # resumed run did fewer supersteps than the full one
    assert resumed.iterations == full.iterations


def test_halfwritten_checkpoint_invisible(tmp_path, spark):
    ckpt = CheckpointManager(str(tmp_path), "j")
    assert ckpt.latest() is None
    # simulate a crash between parquet write and manifest rename
    os.makedirs(os.path.join(str(tmp_path), "j", "state_000003.parquet"), exist_ok=True)
    with open(os.path.join(str(tmp_path), "j", "manifest_000003.json.tmp"), "w") as f:
        json.dump({"superstep": 3}, f)
    assert ckpt.latest() is None  # .tmp never counts

    df = spark.range(10).selectExpr("id", "cast(id as double) as rank", "0 as outdeg")
    man = ckpt.save(df, 5, {"dangling_mass": 0.0})
    assert ckpt.latest()["superstep"] == 5
    assert man["rows"] == 10
    back = ckpt.load(spark, 5)
    assert back.count() == 10
