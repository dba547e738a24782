"""Spectral clustering — subspace power iteration + Lloyd k-means.

Reference: ``cpp/src/community/legacy/spectral_clustering.cu`` (python
``community/spectral_clustering.py``: ``spectralBalancedCutClustering``
/ ``spectralModularityMaximizationClustering``) uses a Lanczos
eigensolver on the graph Laplacian / modularity matrix. SURVEY.md
originally scoped this out for lack of an eigensolver; this module
closes the gap with the eigensolver-free formulation that fits the
engine's superstep model:

- the k-dimensional invariant subspace of the normalized adjacency
  M = (I + D^{-1/2} A D^{-1/2}) / 2 (whose TOP eigenvectors are the
  BOTTOM eigenvectors of the normalized Laplacian — the balanced-cut
  embedding) is computed by **block power iteration**: each superstep
  is one k-column SpMV (the same edges ⋈ state → groupBy(dst) join
  every other operator uses) followed by Gram-Schmidt against the k×k
  Gram matrix, which is computed with ONE aggregate and inverted
  driver-side (k ≤ ~16; the O(k²) driver math is the
  ``host_scalar_allreduce`` analog, never O(V)).
- k-means (Lloyd) on the row-normalized embedding: centroids are k
  seeded-hash-sampled rows (TakeOrderedAndProject, no global sort),
  assignment is an argmin expression over broadcast centroid literals,
  update is one groupBy — deterministic given the seed.

Scale notes: per superstep the network is O(V·k) (the embedding), the
edge side stays hash-partitioned and unmoved; no driver-side O(V)
state ever.
"""

from __future__ import annotations

from ..plans.lineage import truncate_plan

import math

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, WGT, Graph


def _gram_schmidt_cols(X: DataFrame, cols: list[str]) -> DataFrame:
    """Orthonormalize the embedding columns via one Gram-matrix agg +
    driver-side Cholesky: X ← X · L^{-T} where XᵀX = L·Lᵀ."""
    import numpy as np

    k = len(cols)
    aggs = [
        F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"g_{i}_{j}")
        for i in range(k)
        for j in range(i, k)
    ]
    row = X.agg(*aggs).first()
    G = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            G[i, j] = G[j, i] = row[f"g_{i}_{j}"] or 0.0
    # ridge for rank-deficient blocks (disconnected graphs)
    L = np.linalg.cholesky(G + 1e-12 * np.eye(k))
    Minv = np.linalg.inv(L).T  # X_new = X @ L^{-T}
    out_cols = [
        sum(
            (F.col(cols[i]) * float(Minv[i, j]) for i in range(k)),
            F.lit(0.0),
        ).alias(cols[j])
        for j in range(k)
    ]
    return X.select("vertex", *out_cols)


def spectral_embedding(
    G: Graph,
    k: int,
    num_iters: int = 30,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """[vertex, e0..e{k-1}] — the dominant k-dim subspace of
    (I + D^{-1/2} A D^{-1/2})/2, i.e. the smallest-eigenvalue subspace
    of the normalized Laplacian (balanced-cut embedding)."""
    if G.directed:
        raise ValueError("spectral_embedding requires an undirected graph")
    spark = G.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [f"e{i}" for i in range(k)]

    deg = G.edges.groupBy(F.col(SRC).alias("vertex")).agg(F.sum(WGT).alias("d"))
    verts = (
        G.vertices()
        .join(deg, "vertex", "left")
        .select("vertex", F.coalesce("d", F.lit(0.0)).alias("d"))
        .repartition(P, "vertex")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # normalized edges: w / sqrt(d_src * d_dst)
    ed = (
        G.edges.join(verts.select(F.col("vertex").alias(SRC), F.col("d").alias("ds")), SRC)
        .join(verts.select(F.col("vertex").alias(DST), F.col("d").alias("dd")), DST)
        .select(
            SRC, DST,
            (F.col(WGT) / F.sqrt(F.col("ds") * F.col("dd"))).alias("nw"),
        )
        .repartition(P, SRC)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # deterministic seeded init (full-rank w.h.p.)
    init = [
        (
            (F.pmod(F.xxhash64(F.col("vertex"), F.lit(seed + i)), F.lit(1 << 20))
             / F.lit(float(1 << 20))) - F.lit(0.5)
        ).alias(c)
        for i, c in enumerate(cols)
    ]
    X = verts.select("vertex", *init).transform(truncate_plan)
    X = _gram_schmidt_cols(X, cols)

    for _ in range(num_iters):
        msgs = ed.join(X, ed[SRC] == X["vertex"]).groupBy(DST).agg(
            *[F.sum(F.col(c) * F.col("nw")).alias(c) for c in cols]
        )
        # Y = (X + A_norm X) / 2  — the shifted operator keeps the
        # spectrum in [0,1] so power iteration targets small Laplacian
        Y = X.alias("x").join(msgs.alias("m"), X["vertex"] == msgs[DST], "left").select(
            F.col("x.vertex").alias("vertex"),
            *[
                ((F.col(f"x.{c}") + F.coalesce(F.col(f"m.{c}"), F.lit(0.0))) / 2.0).alias(c)
                for c in cols
            ],
        ).transform(truncate_plan)
        X = _gram_schmidt_cols(Y, cols)

    out = X
    ed.unpersist()
    verts.unpersist()
    return out


def kmeans(
    points: DataFrame,
    k: int,
    feature_cols: list[str],
    max_iter: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Lloyd k-means over embedding columns: seeded-hash
    centroid init (TakeOrderedAndProject), argmin-expression assignment
    against broadcast centroid literals, one groupBy mean per round.
    Returns [vertex, cluster]."""
    cents = [
        [row[c] for c in feature_cols]
        for row in points.orderBy(
            F.xxhash64(F.col("vertex"), F.lit(seed)), F.col("vertex")
        ).limit(k).collect()
    ]
    assigned = None
    for _ in range(max_iter):
        dists = [
            sum(
                ((F.col(c) - F.lit(float(cents[j][i]))) ** 2 for i, c in enumerate(feature_cols)),
                F.lit(0.0),
            )
            for j in range(k)
        ]
        best = F.lit(0)
        best_d = dists[0]
        for j in range(1, k):
            cond = dists[j] < best_d
            best = F.when(cond, F.lit(j)).otherwise(best)
            best_d = F.when(cond, dists[j]).otherwise(best_d)
        assigned = points.withColumn("cluster", best).transform(truncate_plan)
        new_rows = (
            assigned.groupBy("cluster")
            .agg(*[F.avg(c).alias(c) for c in feature_cols])
            .collect()
        )
        new_cents = list(cents)
        moved = 0.0
        for r in new_rows:
            j = r["cluster"]
            nc = [r[c] for c in feature_cols]
            moved += sum((a - b) ** 2 for a, b in zip(nc, cents[j]))
            new_cents[j] = nc
        cents = new_cents
        if moved < 1e-12:
            break
    return assigned.select("vertex", "cluster")


def spectral_clustering(
    G: Graph,
    n_clusters: int,
    num_eigen_iters: int = 30,
    kmeans_iters: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Balanced-cut spectral clustering
    (``spectralBalancedCutClustering`` semantics): k smallest
    normalized-Laplacian eigenvectors via the shifted power iteration,
    row-normalized (Ng-Jordan-Weiss), then Lloyd k-means.
    Returns [vertex, cluster]."""
    cols = [f"e{i}" for i in range(n_clusters)]
    emb = spectral_embedding(G, n_clusters, num_eigen_iters, seed)
    norm = F.sqrt(sum((F.col(c) ** 2 for c in cols), F.lit(0.0)))
    rown = emb.select(
        "vertex",
        *[
            (F.col(c) / F.when(norm > 0, norm).otherwise(F.lit(1.0))).alias(c)
            for c in cols
        ],
    ).transform(truncate_plan)
    return kmeans(rown, n_clusters, cols, kmeans_iters, seed)
