"""Scale-configuration ANN quality gates (VERDICT r2 items #2/#3):

- banded multi-table LSH near-dup recall vs exact brute force on the
  sf0.1 embeddings (ground truth = a 2000×64 numpy matmul);
- the bucket-size cap bounds candidate generation under a degenerate
  skew fixture (identical vectors → every bucket is one giant bucket);
- trained (√N, Lloyd) IVF recall@1 ≥ 0.9 vs brute force on sf0.1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cugraph_spark.functions.ann import (
    cosine_topk_ivf,
    embedding_near_duplicates,
    ivf_assign,
)

SF_DIR = "/root/testdata/sf0.1"
THRESH = 0.45


def _ground_truth_pairs(path: str, threshold: float):
    pdf = pd.read_parquet(path, columns=["vec_id", "embedding"])
    ids = pdf["vec_id"].to_numpy(np.int64)
    M = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    S = Mn @ Mn.T
    iu = np.triu_indices(len(ids), k=1)
    hit = S[iu] >= threshold
    a, b = ids[iu[0][hit]], ids[iu[1][hit]]
    return {(int(min(x, y)), int(max(x, y))) for x, y in zip(a, b)}, Mn, ids


def test_banded_near_dup_recall_sf01(spark):
    """The synthetic corpus plants no true near-dups (max pairwise
    cosine ≈ 0.55), so the test runs at threshold 0.45 with bands tuned
    to that regime — per-bit agreement p = 1 − arccos(0.45)/π ≈ 0.65,
    so 16 bands × 4 bits gives expected recall 1−(1−p⁴)¹⁶ ≈ 0.96. The
    round-2 single 6-bit table managed p⁶ ≈ 0.07 here."""
    truth, _Mn, _ids = _ground_truth_pairs(f"{SF_DIR}/embeddings.parquet", THRESH)
    assert truth, "fixture must contain pairs above the threshold"
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        (min(r["a"], r["b"]), max(r["a"], r["b"]))
        for r in embedding_near_duplicates(
            emb, threshold=THRESH, n_bands=16, band_bits=4
        ).collect()
    }
    assert got <= truth  # exact verify ⇒ no false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"banded LSH recall {recall:.3f} < 0.8"


def test_banded_near_dup_recall_planted_dups(spark):
    """Default (8 bands × 8 bits) parameters in their design regime:
    planted near-dup pairs at cosine ≈ 0.95-0.99 among 400 random
    64-dim vectors; expected per-pair recall 1−(1−p⁸)⁸ ≈ 0.99."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(200, 64))
    noise = rng.normal(size=(200, 64)) * 0.12
    dup = base + noise  # cosine ≈ 0.96 on average
    M = np.vstack([base, dup])
    rows = [(i, [float(x) for x in M[i]]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    truth = set()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for i in range(200):
        if float(Mn[i] @ Mn[i + 200]) >= 0.9:
            truth.add((i, i + 200))
    assert len(truth) >= 150
    got = {
        (min(r["a"], r["b"]), max(r["a"], r["b"]))
        for r in embedding_near_duplicates(df, threshold=0.9).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"default banded LSH recall {recall:.3f} < 0.9"


def test_bucket_cap_bounds_candidates(spark):
    # 300 identical vectors: every band has ONE bucket of 300 → without
    # a cap the self-join emits 300·299/2 pairs; with the cap the
    # degenerate buckets are excluded entirely.
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = embedding_near_duplicates(
        df, threshold=0.5, n_bands=4, band_bits=4, max_bucket_size=100
    )
    assert capped.count() == 0
    uncapped = embedding_near_duplicates(
        df, threshold=0.5, n_bands=4, band_bits=4, max_bucket_size=None
    )
    assert uncapped.count() == 300 * 299 // 2


def test_trained_ivf_recall_at_1_sf01(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # exact 1-NN ground truth in numpy
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = pdf["vec_id"].to_numpy(np.int64)
    M = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    S = Mn @ Mn.T
    np.fill_diagonal(S, -2.0)
    # ties broken by smallest vec_id, matching the engine's window order
    order = np.lexsort((ids[np.newaxis, :].repeat(len(ids), 0), -S), axis=1)
    truth = {int(ids[i]): int(ids[order[i, 0]]) for i in range(len(ids))}

    # the synthetic corpus is UNIFORM on the sphere — the worst case
    # for any coarse quantizer (no cluster structure to exploit), so
    # hitting 0.9 takes probing over half the √N codebook; real
    # embedding corpora cluster and need far smaller nprobe ratios.
    # Measured here: nprobe 8→0.609, 16→0.819, 24→0.917 (trained).
    got = cosine_topk_ivf(
        emb, emb, k=1, n_centroids=None, nprobe=24, train_iters=3
    ).collect()
    assert len(got) == len(ids)
    hits = sum(1 for r in got if truth[r["query_id"]] == r["vec_id"])
    recall = hits / len(ids)
    assert recall >= 0.9, f"trained IVF recall@1 {recall:.3f} < 0.9"

    # Lloyd training must beat the untrained sample codebook at a fixed
    # probe budget (measured 0.819 vs 0.750 at nprobe=16)
    tr = cosine_topk_ivf(emb, emb, k=1, n_centroids=None, nprobe=16, train_iters=3)
    un = cosine_topk_ivf(emb, emb, k=1, n_centroids=None, nprobe=16, train_iters=0)
    r_tr = sum(1 for r in tr.collect() if truth[r["query_id"]] == r["vec_id"]) / len(ids)
    r_un = sum(1 for r in un.collect() if truth[r["query_id"]] == r["vec_id"]) / len(ids)
    assert r_tr > r_un, f"training did not improve recall ({r_tr:.3f} <= {r_un:.3f})"


def test_trained_ivf_deterministic_and_sized(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a1, c1 = ivf_assign(emb, n_centroids=None, train_iters=2)
    a2, c2 = ivf_assign(emb, n_centroids=None, train_iters=2)
    # √500 ≈ 22 centroids
    assert c1.count() == max(16, min(4096, int(500 ** 0.5)))
    r1 = sorted((r["vec_id"], r["ivf_cell"]) for r in a1.select("vec_id", "ivf_cell").collect())
    r2 = sorted((r["vec_id"], r["ivf_cell"]) for r in a2.select("vec_id", "ivf_cell").collect())
    assert r1 == r2
