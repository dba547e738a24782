"""Deterministic distributed RMAT edge generator (Graph500 parameters).

Recreates the reference's benchmark input generator
(``generators/rmat.py``, 788 LoC python; CUDA
``cpp/src/generators/generate_rmat_edgelist.cu``, 324 LoC): recursive
quadrant descent with a=0.57, b=0.19, c=0.19 (d=0.05), seeded, with
optional vertex-id scrambling — the same regime the reference benches
with (``benchmarks/cugraph/pytest-based/bench_algos.py:56-90``).

Spark-first design: ``spark.range(n_edges)`` + ``mapInPandas``; every
edge is a pure function of (seed, edge_index, level) via a vectorized
splitmix64 counter-based hash, so the output is **partition-count
invariant** — the same edge list on local[8], local[32], or a
1000-executor cluster, which is what makes the two-parallelism scaling
benchmark an apples-to-apples comparison. No driver-side loops; memory
per task is O(batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    z = (x + _SM_GAMMA).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform(seed: int, idx: np.ndarray, stream: int) -> np.ndarray:
    """U[0,1) as a pure function of (seed, edge index, stream)."""
    stream_off = np.uint64((stream * 0x9E3779B97F4A7C15) % (1 << 64))
    key = (
        idx.astype(np.uint64)
        * np.uint64(0x100000001B3)  # FNV prime spreads the index
        + np.uint64(seed)
        + stream_off
    )
    return (_splitmix64(key) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edgefactor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    scramble_vertex_ids: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (src: long, dst: long, weight: double=1.0) with
    2^scale vertices and edgefactor·2^scale edges."""
    n_edges = edgefactor << scale
    n_verts = 1 << scale
    parts = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.int64)
            src = np.zeros(len(idx), dtype=np.int64)
            dst = np.zeros(len(idx), dtype=np.int64)
            for level in range(scale):
                u = _uniform(seed, idx, level)
                src_bit = (u >= a + b).astype(np.int64)
                dst_bit = ((u >= a) & (u < a + b) | (u >= a + b + c)).astype(np.int64)
                src = (src << 1) | src_bit
                dst = (dst << 1) | dst_bit
            if scramble_vertex_ids:
                mask = np.uint64(n_verts - 1)
                src = (_splitmix64(src.astype(np.uint64) + np.uint64(seed)) & mask).astype(np.int64)
                dst = (_splitmix64(dst.astype(np.uint64) + np.uint64(seed)) & mask).astype(np.int64)
            yield pd.DataFrame(
                {"src": src, "dst": dst, "weight": np.ones(len(idx))}
            )

    return spark.range(0, n_edges, 1, parts).mapInPandas(
        gen, schema="src long, dst long, weight double"
    )
