from __future__ import annotations

from pargraph_spark.operators.edges import build_edges
from pargraph_spark.operators.extract_links import extract_links
from pargraph_spark.operators.labelprop import label_propagation
from pargraph_spark.sources.pages import latest_pages
from pargraph_spark.synth import pages_df_local

from .oracles import label_propagation_oracle

EDGE_SCHEMA = "src long, dst long"


def _lpa(spark, edges, vertices=None, max_iter=20):
    edf = spark.createDataFrame(edges, EDGE_SCHEMA)
    vdf = (
        spark.createDataFrame([(v,) for v in vertices], "id long")
        if vertices is not None
        else None
    )
    res = label_propagation(spark, edf, vdf, max_iter=max_iter, num_partitions=4)
    return {r["id"]: r["label"] for r in res.labels.collect()}, res


def test_cliques_converge_to_min_labels(spark):
    edges = []
    for k in range(3):
        base = k * 100
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    got, res = _lpa(spark, edges)
    oracle = label_propagation_oracle(edges, sorted({v for e in edges for v in e}))
    assert got == oracle
    assert res.converged
    # each clique collapses to one label
    assert len({got[k * 100 + i] for k in range(3) for i in range(5)}) == 3


def test_isolated_keep_own_label(spark):
    got, _ = _lpa(spark, [(1, 2)], vertices=[1, 2, 7])
    assert got[7] == 7


def test_synth_graph_matches_oracle_per_iteration(spark):
    pages = pages_df_local(spark, 200)
    ext = extract_links(latest_pages(pages))
    edf = build_edges(ext).cache()
    edges = [(r["src"], r["dst"]) for r in edf.collect()]
    verts = sorted({v for e in edges for v in e})
    # bounded iterations: oracle applies the identical synchronous rule,
    # so results match exactly even if LPA hasn't converged
    for iters in (1, 3):
        res = label_propagation(spark, edf, max_iter=iters, num_partitions=4)
        got = {r["id"]: r["label"] for r in res.labels.collect()}
        oracle = label_propagation_oracle(edges, verts, max_iter=iters)
        assert got == oracle, f"divergence at iter={iters}"
