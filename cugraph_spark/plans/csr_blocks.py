"""Packed per-partition CSR blocks shared by the iterative operators.

The reference keeps the CSR resident on-GPU across supersteps for EVERY
algorithm (``python/pylibcugraph/graphs.pyx:52-224`` builds ``graph_t``
CSR partitions once; all of ``per_v_transform_reduce_incoming_e`` reuses
them). The Spark analog, proven out by round 4's csr PageRank (1.36-1.9×
the dataframe plan per superstep): hash-partition the edges by
``pid = pmod(hash(src), P)`` ONCE, pack each partition into mmap-able
``.npy`` arrays on shared storage, and let every superstep ship ONLY the
O(V) vertex-state vector through the Arrow boundary — the O(E) side
never crosses again (``np.load(mmap_mode='r')`` reads the page-cache-
resident block, shared between the worker processes of one box).

Block layout (src-sorted CSR):

- ``su``     unique srcs in the block, ascending;
- ``indptr`` ``len(su)+1`` int64 — edge range of ``su[i]`` is
  ``indptr[i]:indptr[i+1]`` (edges stored grouped by src);
- dst side, TWO formats chosen at pack time (``meta.json: ids``):
  - ``ids="dense"`` (compact id spaces, e.g. renumbered graphs or RMAT
    — the reference's case: renumbering to a dense id range is
    mandatory in cugraph): ``dr`` = raw dst per edge. Per-dst reduce
    kernels index a ``hi+1``-sized scratch array directly — NO per-
    block dst dictionary, which removes the pack-time ``np.unique``
    sort over E (measured ~half the pack wall at RMAT-23);
  - ``ids="dict"`` (sparse/arbitrary id spaces): ``du`` = unique dsts +
    ``dc`` = int32 code per edge; kernels reduce into ``len(du)`` and
    emit through the dictionary.
- ``w``      float64 edge weights, same order (weighted blocks only).

The src sort buys two things: a per-vertex value expands to per-edge
with ``np.repeat(vals, np.diff(indptr))`` (no E-sized gather), and a
FRONTIER superstep becomes a true frontier-sized lookup —
``searchsorted(su, frontier)`` + indptr slices touch only
frontier-adjacent edges (the analog of the reference's
``transform_reduce_v_frontier_outgoing_e_by_dst.cuh`` prims),
eliminating the O(E) probe scan the dataframe frontier mode pays.

``meta.json`` records {P, ids, hi1, weighted, manifest} and readers
VALIDATE P against the current run — a reused block_dir from a
different graph or partition count fails loudly, never silently
(ADVICE r4). The packer returns a driver-side MANIFEST ``{pid:
n_edges}``; a manifest-listed pid whose block file is missing at read
time is a torn deployment (non-shared ``block_dir``, partial pack) and
raises — it must never contribute silent zeros. Only pids absent from
the manifest legitimately have no edges (hash gaps at small E).

Scale notes: blocks are written once per run (one Spark job), read
mmap'd P times per superstep; at 100 TB the block set is
O(E/P · 4-12 bytes) per executor on shared storage (HDFS-fuse/NFS/EFS)
and the per-superstep network traffic is the O(V) state exchange only.
The dense format's scratch arrays cost O(hi) per concurrent task —
callers gate it via ``dense_limit`` (default 2^26 ids ⇒ ≤256 MB of
int32 scratch per task) and fall back to ``dict``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DENSE_IDS_LIMIT = 1 << 26  # max hi+1 for the dense-id block format


def _pack_fn(block_dir: str, weighted: bool, dense: bool, check_pid: bool = False):
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["pid"].iloc[0])
        if check_pid and (pdf["pid"].to_numpy() != pid).any():
            raise RuntimeError(
                "pack_edges(pre_partitioned=True): a physical partition "
                "contains more than one pid — the edge frame is NOT "
                "hash-partitioned by pmod(hash(src), P) into exactly P "
                "partitions; drop pre_partitioned to pack via shuffle"
            )
        src = pdf["src"].to_numpy()
        dst = pdf["dst"].to_numpy()
        order = np.argsort(src, kind="stable")  # radix on int32/64
        src, dst = src[order], dst[order]
        su, counts = np.unique(src, return_counts=True)
        indptr = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        base = os.path.join(block_dir, str(pid))
        np.save(base + ".su.npy", su)
        np.save(base + ".indptr.npy", indptr)
        if dense:
            np.save(base + ".dr.npy", dst)
        else:
            du, dc = np.unique(dst, return_inverse=True)
            np.save(base + ".du.npy", du)
            np.save(base + ".dc.npy", dc.astype(np.int32))
        if weighted:
            np.save(base + ".w.npy", pdf["weight"].to_numpy(np.float64)[order])
        return pd.DataFrame({"pid": [pid], "n": [len(src)]})

    return pack


def pack_edges(
    edges: DataFrame,
    block_dir: str,
    P: int,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    id_bounds: tuple | None = None,
    dense_limit: int = DENSE_IDS_LIMIT,
    hash_type: str | None = None,
    pre_partitioned: bool = False,
) -> dict[int, int]:
    """Pack ``edges`` into per-pid CSR blocks under ``block_dir`` (ONE
    Spark job) and return the manifest ``{pid: n_edges}``. ``pid`` is
    ``pmod(hash(src CAST hash_type), P)`` — the SAME Catalyst
    expression readers use to route the vertex-state vector, so a
    block's srcs are exactly the state rows its pid receives.
    ``hash_type`` (default: the src column's current type) pins the
    hash input dtype: Murmur3 of int and long DIFFER for equal values,
    so writer and readers must hash the same width — it is recorded in
    meta.json and readers route with it.

    ``id_bounds=(lo, hi)`` (from ``Graph.vertex_stats``) selects the
    dense format when ``0 <= lo`` and ``hi < dense_limit``; the id
    columns are also narrowed to int32 in the pack transfer when they
    fit (halves the Arrow bytes of the one O(E) transfer).

    ``pre_partitioned=True``: the edge frame is ALREADY hash-
    partitioned into exactly P partitions on ``hash(src) % P`` (e.g. a
    bucketed table or a loop-prepped ``repartition(P, src)`` cache) —
    pack streams each partition through ``mapInPandas`` with NO
    shuffle; physical partition index ≡ pid under Spark's
    HashPartitioning. The claim is verified fail-loud: every row of a
    partition must carry the partition's pid, else the pack raises
    (and a wrong claim that somehow passed would still be caught by
    the readers' src-coverage check at the first superstep)."""
    os.makedirs(block_dir, exist_ok=True)
    dense = False
    hi1 = 0
    narrow = False
    if id_bounds is not None:
        lo, hi = id_bounds
        if isinstance(lo, int) and isinstance(hi, int):
            dense = 0 <= lo and hi < dense_limit
            hi1 = hi + 1 if dense else 0
            narrow = -(2**31) < lo and hi < 2**31 - 1
    if hash_type is None:
        hash_type = edges.schema[src].dataType.simpleString()

    def _id(c):
        col = F.col(c)
        return col.cast("int") if narrow else col

    cols = [
        F.pmod(F.hash(F.col(src).cast(hash_type)), F.lit(P)).alias("pid"),
        _id(src).alias("src"),
        _id(dst).alias("dst"),
    ]
    if weight is not None:
        cols.append(F.col(weight).cast("double").alias("weight"))
    sel = edges.select(*cols)
    if pre_partitioned:
        fn = _pack_fn(block_dir, weight is not None, dense, check_pid=True)

        def gen(batches):
            pdfs = list(batches)
            if not pdfs:
                return
            yield fn(pd.concat(pdfs, ignore_index=True))

        rows = sel.mapInPandas(gen, schema="pid long, n long").collect()
    else:
        rows = (
            sel.groupBy("pid")
            .applyInPandas(
                _pack_fn(block_dir, weight is not None, dense),
                schema="pid long, n long",
            )
            .collect()
        )
    manifest = {int(r["pid"]): int(r["n"]) for r in rows}
    with open(os.path.join(block_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "P": P,
                "ids": "dense" if dense else "dict",
                "narrow": narrow,
                "hi1": hi1,
                "weighted": weight is not None,
                "hash_t": hash_type,
                "manifest": {str(k): v for k, v in manifest.items()},
            },
            f,
        )
    return manifest


def read_meta(block_dir: str, expect_P: int | None = None) -> dict:
    """Load and validate block metadata. ``expect_P`` mismatch raises:
    the writer and readers key on ``hash(·) % P``, so a different P
    means the routing is silently wrong for every vertex."""
    with open(os.path.join(block_dir, "meta.json")) as f:
        meta = json.load(f)
    if expect_P is not None and meta["P"] != expect_P:
        raise RuntimeError(
            f"CSR block_dir {block_dir} was packed with P={meta['P']} but "
            f"this run uses P={expect_P} — stale/reused block directory"
        )
    return meta


def load_block(block_dir: str, pid: int, meta: dict):
    """mmap-load one packed block → dict of arrays (keys: su, indptr,
    and dr [dense] or du+dc [dict], plus w when weighted).

    Raises RuntimeError on a missing file: callers only ask for pids
    the manifest lists, so absence means a torn deployment (non-shared
    block_dir or a task placed on a node without the file) — silently
    returning empty would silently corrupt every downstream result
    (ADVICE r4: the round-4 pagerank reader did exactly that)."""
    names = ["su", "indptr"]
    names += ["dr"] if meta["ids"] == "dense" else ["du", "dc"]
    if meta.get("weighted"):
        names.append("w")
    base = os.path.join(block_dir, str(pid))
    out = {}
    for name in names:
        path = f"{base}.{name}.npy"
        try:
            out[name] = np.load(path, mmap_mode="r")
        except FileNotFoundError:
            raise RuntimeError(
                f"CSR block file missing: {path} — the pack manifest lists "
                f"pid {pid}, so block_dir is not shared storage visible to "
                "this executor (or the pack was torn). Refusing to "
                "contribute silent zeros."
            ) from None
    return out


def state_values_for_srcs(pdf_vertex, pdf_value, su, torn_check: bool = True):
    """Map a pid's incoming state slice onto the block's src dictionary
    (one searchsorted). Every block src hashes to this pid, so it MUST
    be present in the slice; a mismatch means corrupted/stale blocks
    (reused block_dir from a different graph or P) and raises instead
    of substituting zeros (ADVICE r4)."""
    order = np.argsort(pdf_vertex, kind="stable")
    vs = pdf_vertex[order]
    pos = np.searchsorted(vs, su)
    if torn_check:
        if len(vs) == 0 or pos.max(initial=0) >= len(vs) or not np.array_equal(
            vs[np.minimum(pos, len(vs) - 1)], su
        ):
            raise RuntimeError(
                "CSR block src dictionary does not match the incoming "
                "vertex-state slice — stale/corrupt blocks (block_dir "
                "reused from a different graph or partition count?)"
            )
    return pdf_value[order][pos]


def scatter_state_for_srcs(pdf_vertex, pdf_value, su, hi1: int):
    """Dense-id variant of :func:`state_values_for_srcs`: scatter the
    slice into an O(hi) scratch array and gather at ``su`` — no sort,
    no searchsorted. Presence is verified with a boolean scatter (the
    same torn-block contract)."""
    arr = np.empty(hi1, dtype=pdf_value.dtype)
    arr[pdf_vertex] = pdf_value
    mark = np.zeros(hi1, dtype=np.bool_)
    mark[pdf_vertex] = True
    if not mark[su].all():
        raise RuntimeError(
            "CSR block src dictionary does not match the incoming "
            "vertex-state slice — stale/corrupt blocks (block_dir "
            "reused from a different graph or partition count?)"
        )
    return arr[su]
