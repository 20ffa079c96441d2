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

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CSR_SCHEMA = "pid int, srcs array<long>, indptr array<long>, dsts array<long>"


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
