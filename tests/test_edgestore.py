from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pargraph_spark.sources.edgestore import (
    degrees_from_store,
    read_bucketed_edges,
    write_bucketed_edges,
)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    edges = spark.createDataFrame(
        [(i % 200, (i * 13) % 200) for i in range(5000)], "src long, dst long"
    ).where("src != dst").distinct()
    path = str(tmp_path_factory.mktemp("edgestore") / "edges_bucketed")
    write_bucketed_edges(edges, "edges_bucketed", num_buckets=8, path=path)
    yield "edges_bucketed"
    spark.sql("DROP TABLE IF EXISTS edges_bucketed")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucket_spec_recorded_in_catalog(spark, store):
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE EXTENDED {store}").collect()
    }
    assert desc.get("Num Buckets") == "8", desc
    assert desc.get("Bucket Columns") == "[`src`]", desc


def test_join_on_bucket_key_has_no_edge_side_exchange(spark, store):
    # the 100-TB contract: edges ⋈ ranks on src must not exchange the
    # edge side — co-location comes from the storage layout
    edges = read_bucketed_edges(spark, store)
    ranks = spark.range(200).select(
        F.col("id"), (F.col("id") * 0.001).alias("rank")
    )
    # disable broadcast so the join actually needs co-partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = edges.join(ranks, edges["src"] == ranks["id"])
        plan = _plan(joined)
        # edge side (left, printed first) must reach its FileScan with no
        # Exchange; the ranks side may exchange
        prefix = plan.split("FileScan", 1)[0]
        assert "Exchange" not in prefix, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_degrees_from_store_no_shuffle_and_correct(spark, store):
    df = degrees_from_store(spark, store)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    got = {r["src"]: r["outdeg"] for r in df.collect()}
    ref = {
        r["src"]: r["n"]
        for r in read_bucketed_edges(spark, store)
        .groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert got == ref and len(got) > 0


def test_append_preserves_layout_and_dedupe_is_shuffle_free(spark, tmp_path):
    from pargraph_spark.sources.edgestore import append_bucketed_edges

    drop1 = spark.createDataFrame([(i % 20, (i * 3) % 20) for i in range(300)],
                                  "src long, dst long").where("src != dst").distinct()
    drop2 = spark.createDataFrame([(i % 20, (i * 7) % 20) for i in range(300)],
                                  "src long, dst long").where("src != dst").distinct()
    path = str(tmp_path / "t2")
    write_bucketed_edges(drop1, "edges_app", num_buckets=4, path=path)
    append_bucketed_edges(drop2, "edges_app", num_buckets=4)
    try:
        # layout preserved: the bucket-key join is still exchange-free
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        edges = read_bucketed_edges(spark, "edges_app", dedupe=True)
        ranks = spark.range(20).select(F.col("id"), (F.col("id") * 1.0).alias("r"))
        plan = _plan(edges.join(ranks, edges["src"] == ranks["id"]))
        prefix = plan.split("FileScan", 1)[0]
        assert "Exchange" not in prefix, plan
        # dedupe itself added no shuffle either
        dplan = _plan(edges)
        assert "Exchange" not in dplan, dplan
        # content = set union of the drops
        got = {(r["src"], r["dst"]) for r in edges.collect()}
        ref = {(r["src"], r["dst"]) for r in drop1.collect()} | {
            (r["src"], r["dst"]) for r in drop2.collect()
        }
        assert got == ref
        assert edges.count() == len(ref)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS edges_app")
