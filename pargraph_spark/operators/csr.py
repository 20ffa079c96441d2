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
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CSR_SCHEMA = "pid int, srcs array<long>, indptr array<long>, dsts array<long>"

# Per-Python-worker LRU over decoded CSR blocks, keyed by
# (store, generation, pid) where generation is the _SUCCESS marker's mtime:
# rewriting a store at the SAME path (e.g. two csr runs in one Spark app)
# changes the generation and busts stale entries — without it, reused
# Python workers served the previous run's blocks and returned silently
# wrong ranks (ADVICE r3). Spark reuses Python workers across tasks
# (spark.python.worker.reuse), so after the first superstep most lookups
# hit this cache and the E-scale block arrays never cross Arrow again —
# only the V-scale rank vector does. The cap bounds worker memory when a
# worker ends up serving many pids; a miss re-reads one pid's parquet from
# the store (cheap: local NVMe or a shared mount).
CSR_CACHE_BLOCKS = 16
_BLOCK_CACHE: "OrderedDict[tuple[str, int, int], list[dict]]" = OrderedDict()


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
    arrays through Arrow every superstep.

    Constraint (ADVICE r3): readers use plain POSIX file I/O (os.stat +
    local pyarrow), so ``path`` must be visible at the same path on every
    executor — any temp dir in local mode, a shared mount (NFS / fuse-
    mounted object store) on a cluster. URI schemes (hdfs://, s3a://) are
    rejected up front rather than silently resolving to zero blocks."""
    path = _check_local_store_path(path)
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


def _check_local_store_path(path: str) -> str:
    """Validate AND normalize a store path to plain POSIX form.

    'file:'-scheme URIs are accepted but stripped (ADVICE r4: they used
    to pass validation, Spark would write to the POSIX path, and then
    every executor read failed os.stat on the literal 'file:/...' string
    with a misleading missing-_SUCCESS error). Non-local schemes and
    non-local file:// hosts are rejected up front."""
    if "://" in path and not path.startswith("file:"):
        raise ValueError(
            f"CSR store path {path!r} has a non-local URI scheme; the block "
            "store requires a POSIX-visible path (executors read it with "
            "os.stat + local pyarrow). Use a shared mount on a cluster."
        )
    if path.startswith("file:"):
        rest = path[len("file:"):]
        if rest.startswith("//"):
            rest = rest[2:]
            slash = rest.find("/")
            host = rest[:slash] if slash >= 0 else rest
            if host not in ("", "localhost"):
                raise ValueError(
                    f"CSR store path {path!r} names remote host {host!r}; "
                    "executors read the store with local POSIX I/O."
                )
            rest = rest[slash:] if slash >= 0 else ""
        if not rest.startswith("/"):
            raise ValueError(f"file: CSR store path {path!r} is not absolute")
        return rest
    return path


def _load_blocks(store: str, pid: int) -> list[dict]:
    """This pid's prepped blocks, via the worker LRU.

    Raises if the store root is missing its parquet ``_SUCCESS`` marker —
    an invisible or half-written store must FAIL, not silently cache an
    empty block list and converge PageRank to the teleport vector
    (ADVICE r3). A missing pid=K partition under a valid root is fine:
    a pid no src hashes to legitimately has zero blocks."""
    store = _check_local_store_path(store)
    success = os.path.join(store, "_SUCCESS")
    try:
        gen = os.stat(success).st_mtime_ns
    except OSError:
        raise FileNotFoundError(
            f"CSR store at {store!r} is missing its _SUCCESS marker — the "
            "store was never written, is half-written, or is not visible "
            "from this executor (it must be a shared POSIX path; see "
            "write_csr_store)."
        )
    key = (store, gen, pid)
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
    """Partition-local gather+scatter superstep kernel against the block
    store: this pid's PageRank messages
        msg[dst] = Σ_{src→dst in block} rank[src] / outdeg[src]
    pre-combined per block via the cached inverse index — the map-side
    combine that shrinks the shuffle from E rows to Σ_blocks |unique
    dsts|, the distributed analogue of the reference's masked semiring
    SpMV (graphlib_graphblas.py:156-167). Srcs absent from the rank
    vector are masked (an explicit `vertices` DataFrame may omit an edge
    src; dataframe mode drops such edges via its inner join, so both
    modes agree — ADVICE r1). Cross-block-row sums are left to the
    JVM-side final aggregate."""
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
