"""O5 — per-partition CSR blocks for partition-local SpMV.

Distributed decomposition of the reference's GraphBLAS sparse boolean
adjacency (/root/reference/pargraph/utility/graphlib_graphblas.py:20-23,
one in-memory gb.Matrix): the edge table is bucketed by ``pid =
pmod(src, P)`` and each bucket is packed into ONE row of array columns
(srcs, indptr, dsts) — a CSR block. Blocks are built once, cached, and
re-read every superstep; only the (small) rank vector and the (combined)
messages move per iteration.

Local indices are per-block (srcs is the block's own sorted vocabulary),
NOT a global dense id space: a global zipWithIndex would add a full-pass
barrier and break determinism across partition counts (SURVEY.md §7.2.6).

Scale sizing: one block row holds ~E/P edges × 8 B; pick P so blocks stay
≲ 64–128 MB (Arrow row limit is 2 GB — size P with headroom, e.g.
P = E × 8 B / 64 MB). Because pid is a pure function of src, ALL
out-edges of a vertex land in one block, so per-block indptr degrees are
true out-degrees.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CSR_SCHEMA = "pid int, srcs array<long>, indptr array<long>, dsts array<long>"

# Per-Python-worker LRU over decoded CSR blocks, keyed by (store, pid).
# Spark reuses Python workers across tasks (spark.python.worker.reuse), so
# after the first superstep most lookups hit this cache and the E-scale
# block arrays never cross Arrow again — only the V-scale rank vector does.
# The cap bounds worker memory when a worker ends up serving many pids;
# a miss re-reads one pid's parquet from the shared store (cheap, local or
# HDFS/S3-cached on a cluster).
CSR_CACHE_BLOCKS = 16
_BLOCK_CACHE: "OrderedDict[tuple[str, int], list[tuple[np.ndarray, np.ndarray, np.ndarray]]]" = OrderedDict()


def _pack_csr(pdf: pd.DataFrame) -> pd.DataFrame:
    if pdf.empty:
        return pd.DataFrame(columns=["pid", "srcs", "indptr", "dsts"])
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    order = np.lexsort((dst, src))  # deterministic layout: by (src, dst)
    src, dst = src[order], dst[order]
    srcs, counts = np.unique(src, return_counts=True)
    indptr = np.zeros(len(srcs) + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return pd.DataFrame(
        {
            "pid": [int(pdf["pid"].iloc[0])],
            "srcs": [srcs],
            "indptr": [indptr],
            "dsts": [dst],
        }
    )


def with_pid(df: DataFrame, id_col: str, num_blocks: int) -> DataFrame:
    return df.withColumn("pid", F.pmod(F.col(id_col), F.lit(num_blocks)).cast("int"))


def build_csr_blocks(edges: DataFrame, num_blocks: int) -> DataFrame:
    """edges(src,dst) → one CSR block row per pid (pid = pmod(src, P))."""
    return (
        with_pid(edges, "src", num_blocks)
        .groupBy("pid")
        .applyInPandas(lambda pdf: _pack_csr(pdf), schema=CSR_SCHEMA)
    )


def write_csr_store(edges: DataFrame, num_blocks: int, path: str) -> None:
    """Materialize the CSR blocks ONCE as a pid-partitioned parquet store
    (path/pid=K/...). Supersteps then ship only the rank vector through
    Arrow and workers pull their pid's block lazily from the store,
    caching it process-side (see spmv_from_store) — the fix for round 2's
    CSR-mode bottleneck, where the cogroup re-sent the E-scale block
    arrays through Arrow every superstep. On a cluster the store lives on
    shared storage (HDFS/S3); locally, any temp dir."""
    (
        build_csr_blocks(edges, num_blocks)
        .repartition(num_blocks, "pid")
        .write.mode("overwrite")
        .partitionBy("pid")
        .parquet(path)
    )


def _prep_block(srcs, indptr, dsts) -> dict:
    """One-time per-block precompute, cached with the block: out-degrees
    and the (uniq dsts, inverse index) pair that turns the per-superstep
    dst-combine into a single linear np.bincount. Without this the kernel
    re-sorted the E-scale dst array (np.unique) EVERY superstep — the
    dominant Python cost once block shipping was gone."""
    srcs = np.asarray(srcs, dtype=np.int64)
    indptr = np.asarray(indptr, dtype=np.int64)
    dsts = np.asarray(dsts, dtype=np.int64)
    uniq, inv = np.unique(dsts, return_inverse=True)
    return {
        "srcs": srcs,
        "deg": np.diff(indptr),
        "uniq": uniq,
        "inv": inv,
    }


def _load_blocks(store: str, pid: int) -> list[dict]:
    """This pid's prepped blocks, via the worker LRU."""
    key = (store, pid)
    hit = _BLOCK_CACHE.get(key)
    if hit is not None:
        _BLOCK_CACHE.move_to_end(key)
        return hit
    import pyarrow.parquet as pq

    part = os.path.join(store, f"pid={pid}")
    blocks: list[dict] = []
    if os.path.isdir(part):
        pdf = pq.read_table(part, columns=["srcs", "indptr", "dsts"]).to_pandas()
        blocks = [
            _prep_block(s, i, d)
            for s, i, d in zip(pdf["srcs"], pdf["indptr"], pdf["dsts"])
        ]
    _BLOCK_CACHE[key] = blocks
    while len(_BLOCK_CACHE) > CSR_CACHE_BLOCKS:
        _BLOCK_CACHE.popitem(last=False)
    return blocks


_EMPTY_MSGS = {"dst": pd.Series(dtype="int64"), "msg": pd.Series(dtype="float64")}


def spmv_from_store(store: str, pid: int, ranks: pd.DataFrame) -> pd.DataFrame:
    """Superstep kernel against the block store: this pid's messages,
    pre-combined per block via the cached inverse index (semantically
    identical to spmv_messages — same masking of srcs absent from the
    rank vector, same per-dst partial sums; cross-block-row sums are left
    to the JVM-side final aggregate)."""
    blocks = _load_blocks(store, pid)
    if not blocks or ranks.empty:
        return pd.DataFrame(_EMPTY_MSGS)
    ids = ranks["id"].to_numpy(dtype=np.int64)
    rs = ranks["rank"].to_numpy(dtype=np.float64)
    sort = np.argsort(ids, kind="stable")
    ids, rs = ids[sort], rs[sort]
    out = []
    for b in blocks:
        srcs, deg = b["srcs"], b["deg"]
        pos = np.searchsorted(ids, srcs)
        in_range = pos < len(ids)
        pos_safe = np.where(in_range, pos, 0)
        valid = in_range & (ids[pos_safe] == srcs)
        rank_src = np.where(valid, rs[pos_safe], 0.0)
        per_src = rank_src / deg.astype(np.float64)
        per_edge = np.repeat(per_src, deg)
        inv, uniq = b["inv"], b["uniq"]
        if not valid.all():
            edge_mask = np.repeat(valid, deg)
            sums = np.bincount(inv[edge_mask], weights=per_edge[edge_mask],
                               minlength=len(uniq))
        else:
            sums = np.bincount(inv, weights=per_edge, minlength=len(uniq))
        nz = np.nonzero(sums)[0]
        if nz.size:
            out.append(pd.DataFrame({"dst": uniq[nz], "msg": sums[nz]}))
    if not out:
        return pd.DataFrame(_EMPTY_MSGS)
    return pd.concat(out, ignore_index=True)


def spmv_messages(rank_pdfs: Iterable[pd.DataFrame], block_pdfs: Iterable[pd.DataFrame]):
    """Partition-local gather+scatter kernel (cogroup side).

    Given this pid's ranks (id, rank) and its CSR block, compute the
    block's PageRank messages pre-combined by dst:
        msg[dst] = Σ_{src→dst in block} rank[src] / outdeg[src]
    The in-block combine (np.unique + bincount) is the map-side combine
    that shrinks the shuffle from E rows to Σ_blocks |unique dsts| — the
    distributed analogue of the reference's masked semiring SpMV
    (graphlib_graphblas.py:156-167).
    """
    ranks = pd.concat(list(rank_pdfs), ignore_index=True) if rank_pdfs else pd.DataFrame()
    blocks = [b for b in block_pdfs if not b.empty]
    if not blocks or ranks.empty:
        return pd.DataFrame({"dst": pd.Series(dtype="int64"), "msg": pd.Series(dtype="float64")})
    ids = ranks["id"].to_numpy(dtype=np.int64)
    rs = ranks["rank"].to_numpy(dtype=np.float64)
    sort = np.argsort(ids, kind="stable")
    ids, rs = ids[sort], rs[sort]
    out_dst: list[np.ndarray] = []
    out_msg: list[np.ndarray] = []
    for b in blocks:
        for srcs, indptr, dsts in zip(b["srcs"], b["indptr"], b["dsts"]):
            srcs = np.asarray(srcs, dtype=np.int64)
            indptr = np.asarray(indptr, dtype=np.int64)
            dsts = np.asarray(dsts, dtype=np.int64)
            pos = np.searchsorted(ids, srcs)
            # Guard the lookup: an explicit `vertices` DataFrame may omit an
            # edge src, in which case pos is out of range or points at a
            # different id. Dataframe mode drops such edges (inner join on
            # src==id); mask them here so both modes agree (ADVICE r1).
            deg = np.diff(indptr)
            in_range = pos < len(ids)
            pos_safe = np.where(in_range, pos, 0)
            valid = in_range & (ids[pos_safe] == srcs)
            rank_src = np.where(valid, rs[pos_safe], 0.0)
            outdeg = deg.astype(np.float64)
            per_src = rank_src / outdeg
            per_edge = np.repeat(per_src, deg)
            if not valid.all():
                edge_mask = np.repeat(valid, deg)
                dsts = dsts[edge_mask]
                per_edge = per_edge[edge_mask]
                if dsts.size == 0:
                    continue
            uniq, inv = np.unique(dsts, return_inverse=True)
            sums = np.bincount(inv, weights=per_edge)
            out_dst.append(uniq)
            out_msg.append(sums)
    if not out_dst:
        # every block row of this pid was masked away (explicit-vertices
        # scenario: all srcs absent from the rank vector) — np.concatenate
        # on an empty list would raise (ADVICE r2)
        return pd.DataFrame({"dst": pd.Series(dtype="int64"), "msg": pd.Series(dtype="float64")})
    dst = np.concatenate(out_dst)
    msg = np.concatenate(out_msg)
    if len(out_dst) > 1:  # combine across multiple block rows of one pid
        uniq, inv = np.unique(dst, return_inverse=True)
        msg = np.bincount(inv, weights=msg)
        dst = uniq
    return pd.DataFrame({"dst": dst, "msg": msg})
