"""Benchmark runner — prints ONE JSON line for the driver (BENCH_r{N}.json).

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and reports per-query
wall seconds plus PageRank throughput detail (edges-processed/sec per
superstep, iterations-to-convergence — the BASELINE.json primary metric).

Scaling-efficiency evidence (N vs 4N cores) is produced by
BENCH/run_scaling.py, which shells out to fresh processes per parallelism
level; this file is the single-level per-round probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from pargraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    shuffle = max(8, 2 * cpus)
    spark = get_spark("pargraph-bench", cores=cpus, shuffle_partitions=shuffle,
                      extra_conf={"spark.ui.enabled": "false"})
    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or sf_dir

    import __spark_entry__ as entrymod
    from pargraph_spark.operators.components import connected_components
    from pargraph_spark.operators.dedup import minhash_dedup_pairs
    from pargraph_spark.operators.labelprop import label_propagation
    from pargraph_spark.operators.pagerank import pagerank
    from pargraph_spark.operators.similarity import cosine_topk
    from pargraph_spark.operators.triangles import triangles_global

    timings: dict[str, float] = {}
    extra: dict[str, object] = {}

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    edges = entrymod._co_edges(spark, sf_dir).persist()
    n_edges = timed("edge_build", lambda: edges.count())
    extra["n_edges"] = n_edges

    pr = timed(
        "pagerank",
        lambda: pagerank(spark, edges, tol=1e-6, max_iter=60, mode="dataframe",
                         num_partitions=shuffle),
    )
    pr.ranks.count()
    extra["pagerank"] = {
        "iterations": pr.iterations,
        "converged": pr.converged,
        "edges_per_sec_mean": round(pr.metrics.steady_state_edges_per_sec(), 1),
    }

    pr_csr = timed(
        "pagerank_csr",
        lambda: pagerank(spark, edges, tol=1e-6, max_iter=60, mode="csr",
                         num_partitions=shuffle),
    )
    extra["pagerank_csr"] = {
        "iterations": pr_csr.iterations,
        "edges_per_sec_mean": round(pr_csr.metrics.steady_state_edges_per_sec(), 1),
    }

    cc = timed("connected_components",
               lambda: connected_components(spark, edges, num_partitions=shuffle))
    cc.components.count()
    extra["cc_rounds"] = cc.rounds

    lp = timed("label_propagation",
               lambda: label_propagation(spark, edges, max_iter=5, num_partitions=shuffle))
    lp.labels.count()

    timed("triangle_count", lambda: triangles_global(edges).first())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # shingle_size=2: the synthetic corpus shares a ~40-word vocab, so
    # 1-gram LSH marks nearly every pair a candidate (quadratic verify);
    # bigram shingles give a realistic candidate density.
    timed("minhash_dedup",
          lambda: minhash_dedup_pairs(docs, "doc_id", "text", shingle_size=2,
                                      threshold=0.5).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    emb.count()
    timed("cosine_topk",
          lambda: cosine_topk(emb, emb.where(F.col("vec_id") < 50), k=10).count())

    from pargraph_spark.operators.similarity import (
        cosine_near_dup_bucketed,
        lsh_ann_topk,
    )

    timed("ann_lsh",
          lambda: lsh_ann_topk(emb, emb.where(F.col("vec_id") < 50), k=10, dim=64,
                               num_tables=8, planes_per_table=6,
                               multiprobe_bits=1).count())
    near_dup_corpus = entrymod._near_dup_corpus(spark, sf_dir)
    timed("embedding_near_dup_bucketed",
          lambda: cosine_near_dup_bucketed(near_dup_corpus, threshold=0.9, dim=64,
                                           num_tables=8, planes_per_table=8).count())

    spark.stop()
    print(json.dumps({
        "metric": "headline operator wall seconds (pagerank/cc/lpa/triangles/dedup/ann) "
                  "+ pagerank edges-per-sec per superstep",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_label,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
