from __future__ import annotations

import math

import pytest

from pargraph_spark.operators.edges import build_edges
from pargraph_spark.operators.extract_links import extract_links
from pargraph_spark.operators.pagerank import pagerank
from pargraph_spark.sources.pages import latest_pages
from pargraph_spark.synth import pages_df_local

from .oracles import pagerank_oracle

EDGE_SCHEMA = "src long, dst long"


def _run(spark, edges, vertices=None, mode="dataframe", **kw):
    vdf = (
        spark.createDataFrame([(v,) for v in vertices], "id long")
        if vertices is not None
        else None
    )
    edf = spark.createDataFrame(edges, EDGE_SCHEMA)
    res = pagerank(spark, edf, vdf, mode=mode, num_partitions=4, **kw)
    return {r["id"]: r["rank"] for r in res.ranks.collect()}, res


@pytest.mark.parametrize("mode", ["dataframe", "csr"])
def test_ring_uniform(spark, mode):
    n = 10
    edges = [(i, (i + 1) % n) for i in range(n)]
    got, res = _run(spark, edges, mode=mode)
    assert res.converged
    for v, r in got.items():
        assert math.isclose(r, 1.0 / n, abs_tol=1e-9), (v, r)
    assert abs(sum(got.values()) - 1.0) < 1e-9


@pytest.mark.parametrize("mode", ["dataframe", "csr"])
def test_star_matches_oracle(spark, mode):
    n = 11
    edges = [(i, 0) for i in range(1, n)]  # spokes -> hub; hub is dangling
    got, res = _run(spark, edges, mode=mode)
    oracle = pagerank_oracle(edges, list(range(n)))
    for v in range(n):
        assert math.isclose(got[v], oracle[v], abs_tol=1e-6), v
    assert abs(sum(got.values()) - 1.0) < 1e-6


@pytest.mark.parametrize("mode", ["dataframe", "csr"])
def test_synth_graph_matches_oracle(spark, mode):
    pages = pages_df_local(spark, 300)
    ext = extract_links(latest_pages(pages))
    edf = build_edges(ext).cache()
    edges = [(r["src"], r["dst"]) for r in edf.collect()]
    vertices = sorted({v for e in edges for v in e})
    res = pagerank(spark, edf, mode=mode, num_partitions=4, tol=1e-9)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    oracle = pagerank_oracle(edges, vertices, tol=1e-12)
    assert set(got) == set(oracle)
    for v in vertices:
        assert math.isclose(got[v], oracle[v], abs_tol=1e-6), v
    assert res.converged
    assert res.metrics.supersteps[0].edges == len(edges)


def test_modes_agree(spark):
    pages = pages_df_local(spark, 150)
    ext = extract_links(latest_pages(pages))
    edf = build_edges(ext).cache()
    r1 = pagerank(spark, edf, mode="dataframe", num_partitions=4, tol=1e-8)
    r2 = pagerank(spark, edf, mode="csr", num_partitions=4, tol=1e-8)
    g1 = {r["id"]: r["rank"] for r in r1.ranks.collect()}
    g2 = {r["id"]: r["rank"] for r in r2.ranks.collect()}
    assert set(g1) == set(g2)
    for v in g1:
        assert math.isclose(g1[v], g2[v], abs_tol=1e-9), v


def test_partition_count_invariance(spark):
    # SURVEY.md §5.2.2: results must not depend on physical partitioning
    pages = pages_df_local(spark, 150)
    ext = extract_links(latest_pages(pages))
    edf = build_edges(ext).cache()
    ranks = {}
    for parts in (1, 7):
        res = pagerank(spark, edf, mode="dataframe", num_partitions=parts, tol=1e-9)
        ranks[parts] = {r["id"]: r["rank"] for r in res.ranks.collect()}
    assert set(ranks[1]) == set(ranks[7])
    for v in ranks[1]:
        # only float-summation-order noise may differ across partitionings
        assert math.isclose(ranks[1][v], ranks[7][v], abs_tol=1e-12), v


def test_isolated_vertices_and_empty(spark):
    # extra vertices with no edges still get teleport mass
    edges = [(1, 2)]
    got, res = _run(spark, edges, vertices=[1, 2, 3, 4])
    oracle = pagerank_oracle(edges, [1, 2, 3, 4])
    for v in oracle:
        assert math.isclose(got[v], oracle[v], abs_tol=1e-9)
    empty = pagerank(
        spark, spark.createDataFrame([], EDGE_SCHEMA), num_partitions=2
    )
    assert empty.ranks.count() == 0 and empty.converged


def test_personalized_pagerank_matches_python(spark):
    import math

    from pyspark.sql import functions as F

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (7, 1)]
    verts = sorted({v for e in edges for v in e})
    seeds = [1, 2]
    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s, 1.0) for s in seeds], "id long, w double")
    res = pagerank(spark, edf, damping=0.85, tol=0.0, max_iter=12,
                   num_partitions=4, teleport=sdf)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}

    # pure-python PPR with identical semantics
    tw = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in verts}
    outdeg = {v: 0 for v in verts}
    for s, _d in edges:
        outdeg[s] += 1
    r = dict(tw)
    for _ in range(12):
        dang = sum(r[v] for v in verts if outdeg[v] == 0)
        msg = {v: 0.0 for v in verts}
        for s, d in edges:
            msg[d] += r[s] / outdeg[s]
        r = {v: 0.15 * tw[v] + 0.85 * (msg[v] + dang * tw[v]) for v in verts}
    assert set(got) == set(r)
    for v in verts:
        assert math.isclose(got[v], r[v], abs_tol=1e-12), v
    # PPR conserves mass and concentrates rank near the seeds
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)
    uniform = pagerank(spark, edf, damping=0.85, tol=0.0, max_iter=12,
                       num_partitions=4)
    gu = {x["id"]: x["rank"] for x in uniform.ranks.collect()}
    assert got[1] + got[2] > gu[1] + gu[2]


def test_weighted_pagerank_matches_python(spark):
    import math

    edges = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 1, 5.0)]
    verts = sorted({v for s, d, _ in edges for v in (s, d)})
    edf = spark.createDataFrame(edges, "src long, dst long, w double")
    res = pagerank(spark, edf, damping=0.85, tol=0.0, max_iter=10,
                   num_partitions=4, weight_col="w")
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}

    outw = {v: 0.0 for v in verts}
    for s, _d, w in edges:
        outw[s] += w
    n = len(verts)
    r = {v: 1.0 / n for v in verts}
    for _ in range(10):
        dang = sum(r[v] for v in verts if outw[v] == 0)
        msg = {v: 0.0 for v in verts}
        for s, d, w in edges:
            msg[d] += (r[s] / outw[s]) * w
        r = {v: 0.15 * (1.0 / n) + 0.85 * (msg[v] + dang * (1.0 / n)) for v in verts}
    for v in verts:
        assert math.isclose(got[v], r[v], abs_tol=1e-12), v
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)
    # duplicate edges combine by summing weights
    dup = spark.createDataFrame(edges + [(1, 2, 1.0)], "src long, dst long, w double")
    res2 = pagerank(spark, dup, damping=0.85, tol=0.0, max_iter=10,
                    num_partitions=4, weight_col="w")
    merged = spark.createDataFrame(
        [(1, 2, 4.0)] + [e for e in edges if (e[0], e[1]) != (1, 2)],
        "src long, dst long, w double",
    )
    res3 = pagerank(spark, merged, damping=0.85, tol=0.0, max_iter=10,
                    num_partitions=4, weight_col="w")
    g2 = {r["id"]: r["rank"] for r in res2.ranks.collect()}
    g3 = {r["id"]: r["rank"] for r in res3.ranks.collect()}
    for v in verts:
        assert math.isclose(g2[v], g3[v], abs_tol=1e-12), v


def test_ppr_unknown_teleport_id_keeps_mass(spark):
    # ADVICE r2: teleport weight on an id absent from the graph must not
    # leak rank mass — normalization intersects with the vertex set first
    n = 8
    edges = [(i, (i + 1) % n) for i in range(n)]
    edf = spark.createDataFrame(edges, EDGE_SCHEMA)
    seeds = spark.createDataFrame([(0, 1.0), (999, 5.0)], "id long, w double")
    res = pagerank(spark, edf, teleport=seeds, num_partitions=4,
                   max_iter=30, tol=1e-10)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-6
    seeds2 = spark.createDataFrame([(0, 1.0)], "id long, w double")
    res2 = pagerank(spark, edf, teleport=seeds2, num_partitions=4,
                    max_iter=30, tol=1e-10)
    got2 = {r["id"]: r["rank"] for r in res2.ranks.collect()}
    for v in got:
        assert math.isclose(got[v], got2[v], abs_tol=1e-9), v


def _write_fake_csr_store(root, blocks_by_pid):
    """Hand-build the pid-partitioned parquet layout spmv_from_store reads
    (store/pid=K/part.parquet + _SUCCESS), no Spark needed."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    for pid, rows in blocks_by_pid.items():
        d = os.path.join(root, f"pid={pid}")
        os.makedirs(d, exist_ok=True)
        t = pa.table(
            {
                "srcs": pa.array([r[0] for r in rows], pa.list_(pa.int64())),
                "indptr": pa.array([r[1] for r in rows], pa.list_(pa.int64())),
                "dsts": pa.array([r[2] for r in rows], pa.list_(pa.int64())),
            }
        )
        pq.write_table(t, os.path.join(d, "part-0.parquet"))
    open(os.path.join(root, "_SUCCESS"), "w").close()


def test_spmv_from_store_all_masked_srcs_returns_empty(tmp_path):
    # ADVICE r2 (ported from the deleted spmv_messages kernel): a pid whose
    # every block src is absent from the rank vector must yield an empty
    # frame, not crash np.concatenate([])
    import pandas as pd

    from pargraph_spark.operators.csr import spmv_from_store

    store = str(tmp_path / "store")
    _write_fake_csr_store(store, {0: [([1, 2], [0, 1, 2], [3, 4])]})
    ranks = pd.DataFrame({"id": [7, 8], "rank": [0.5, 0.5]})
    out = spmv_from_store(store, 0, ranks)
    assert out.empty
    assert list(out.columns) == ["dst", "msg"]


def test_spmv_from_store_messages_and_partial_mask(tmp_path):
    # kernel values: msg[dst] = sum rank[src]/outdeg[src]; src 2 masked out
    import pandas as pd

    from pargraph_spark.operators.csr import spmv_from_store

    store = str(tmp_path / "store")
    # src 1 -> {3,4} (deg 2), src 2 -> {3} (deg 1)
    _write_fake_csr_store(store, {0: [([1, 2], [0, 2, 3], [3, 4, 3])]})
    ranks = pd.DataFrame({"id": [1], "rank": [0.6]})  # src 2 absent
    out = spmv_from_store(store, 0, ranks).sort_values("dst")
    got = dict(zip(out["dst"], out["msg"]))
    assert got == {3: 0.3, 4: 0.3}


def test_spmv_from_store_missing_store_raises(tmp_path):
    # ADVICE r3: an invisible/half-written store must FAIL loudly, not
    # cache an empty block list and converge to the teleport vector
    import pandas as pd
    import pytest

    from pargraph_spark.operators.csr import spmv_from_store

    ranks = pd.DataFrame({"id": [1], "rank": [1.0]})
    with pytest.raises(FileNotFoundError, match="_SUCCESS"):
        spmv_from_store(str(tmp_path / "nope"), 0, ranks)


def test_spmv_from_store_rewrite_busts_worker_cache(tmp_path):
    # ADVICE r3: rewriting a store at the SAME path must not serve the old
    # blocks from the worker LRU — the generation (_SUCCESS mtime) keys it
    import os
    import shutil
    import time

    import pandas as pd

    from pargraph_spark.operators.csr import spmv_from_store

    store = str(tmp_path / "store")
    _write_fake_csr_store(store, {0: [([1], [0, 1], [3])]})
    ranks = pd.DataFrame({"id": [1], "rank": [1.0]})
    out1 = spmv_from_store(store, 0, ranks)
    assert dict(zip(out1["dst"], out1["msg"])) == {3: 1.0}

    shutil.rmtree(store)
    time.sleep(0.01)  # ensure a distinct _SUCCESS mtime_ns
    _write_fake_csr_store(store, {0: [([1], [0, 1], [9])]})
    out2 = spmv_from_store(store, 0, ranks)
    # same path, new generation: messages reflect the NEW edge 1->9
    assert dict(zip(out2["dst"], out2["msg"])) == {9: 1.0}


def test_csr_store_rejects_remote_uri(spark):
    import pytest

    from pargraph_spark.operators.csr import write_csr_store

    edf = spark.createDataFrame([(1, 2)], EDGE_SCHEMA)
    with pytest.raises(ValueError, match="POSIX"):
        write_csr_store(edf, 2, "s3a://bucket/store")


def test_csr_store_file_uri_normalizes(spark, tmp_path):
    # ADVICE r4: a 'file:'-scheme path used to pass validation, write via
    # Spark, then fail every executor read with a misleading
    # missing-_SUCCESS error. Now both writer and reader normalize it.
    import pytest

    from pargraph_spark.operators.csr import _check_local_store_path

    assert _check_local_store_path("/tmp/x") == "/tmp/x"
    assert _check_local_store_path("file:/tmp/x") == "/tmp/x"
    assert _check_local_store_path("file:///tmp/x") == "/tmp/x"
    assert _check_local_store_path("file://localhost/tmp/x") == "/tmp/x"
    with pytest.raises(ValueError, match="remote host"):
        _check_local_store_path("file://otherhost/tmp/x")
    with pytest.raises(ValueError, match="non-local URI scheme"):
        _check_local_store_path("hdfs://nn/tmp/x")
    with pytest.raises(ValueError, match="not absolute"):
        _check_local_store_path("file:tmp/x")
