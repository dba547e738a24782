"""Centrality family — HITS, Katz, eigenvector, degree centrality.

All three iterative centralities ride the same SpMV superstep skeleton
as PageRank (SURVEY.md §2.4 ``per_v_transform_reduce_incoming_e``):
``edges ⋈ vector on src → groupBy(dst).sum`` with map-side partial
aggregation; the O(E) edge side is partitioned once and persisted, the
O(V) vector re-shuffles per superstep; one scalar action per superstep.

Reference semantics:
- HITS (``link_analysis/hits_impl.cuh``, 223 LoC): hubs/authorities
  power iteration, L1-normalized each half-step; unweighted; returns
  [vertex, hubs, authorities] (python wrapper link_analysis/hits.py).
- Katz (``centrality/katz_centrality_impl.cuh``, 224 LoC):
  c ← β + α·Aᵀc iterated from c=0; L1 diff < tol·V stops; L2-normalize
  the final vector.
- Eigenvector (``centrality/eigenvector_centrality_impl.cuh``, 199 LoC):
  power iteration on Aᵀ with L2 normalization per step.
- Degree centrality (python-only ``centrality/degree_centrality.py``):
  degree / (V−1).
"""

from __future__ import annotations

import math

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, WGT, Graph
from ..plans.strategy import vertex_join_side


def _prep_edges(G: Graph, P: int) -> DataFrame:
    return (
        G.edges.select(SRC, DST, WGT)
        .repartition(P, SRC)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def hits(
    G: Graph, max_iter: int = 100, tol: float = 1.0e-5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns [vertex, hubs, authorities]; unweighted adjacency
    (hits_impl.cuh ignores weights — the python wrapper warns)."""
    spark = G.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _prep_edges(G, P)
    verts = G.vertices().repartition(P, "vertex").persist(StorageLevel.MEMORY_AND_DISK)
    V = verts.count()
    state = verts.withColumn("hubs", F.lit(1.0 / V)).localCheckpoint(eager=False)

    for _ in range(max_iter):
        # authorities(v) = Σ_{u→v} hubs(u), L1-normalized
        sside = vertex_join_side(state, V)
        auth_raw = (
            edges.join(sside, edges[SRC] == sside["vertex"])
            .groupBy(DST)
            .agg(F.sum("hubs").alias("a"))
        )
        asum = auth_raw.agg(F.sum("a")).first()[0] or 1.0
        auth = verts.join(auth_raw, verts["vertex"] == auth_raw[DST], "left").select(
            verts["vertex"],
            (F.coalesce("a", F.lit(0.0)) / F.lit(asum)).alias("authorities"),
        ).localCheckpoint(eager=False)
        # hubs(u) = Σ_{u→v} authorities(v), L1-normalized
        aside = vertex_join_side(auth, V)
        hub_raw = (
            edges.join(aside, edges[DST] == aside["vertex"])
            .groupBy(SRC)
            .agg(F.sum("authorities").alias("h"))
        )
        hsum = hub_raw.agg(F.sum("h")).first()[0] or 1.0
        new_full = state.join(hub_raw, state["vertex"] == hub_raw[SRC], "left").select(
            state["vertex"],
            (F.coalesce("h", F.lit(0.0)) / F.lit(hsum)).alias("hubs"),
            state["hubs"].alias("old"),
        ).localCheckpoint(eager=False)

        diff = (
            new_full.agg(F.sum(F.abs(F.col("hubs") - F.col("old"))).alias("d"))
            .first()["d"]
        )
        state = new_full.select("vertex", "hubs")
        last_auth = auth
        if diff is not None and diff < tol:
            break

    out = state.join(last_auth, "vertex").select("vertex", "hubs", "authorities")
    edges.unpersist()
    verts.unpersist()
    return out


def katz_centrality(
    G: Graph, alpha: float = 0.1, beta: float = 1.0,
    max_iter: int = 100, tol: float = 1.0e-6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns [vertex, katz_centrality] (L2-normalized), semantics of
    katz_centrality_impl.cuh: c ← β + α·Aᵀc from c=0, stop on
    L1 diff < tol·V."""
    spark = G.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _prep_edges(G, P)
    verts = G.vertices().repartition(P, "vertex").persist(StorageLevel.MEMORY_AND_DISK)
    V = verts.count()
    state = verts.withColumn("c", F.lit(0.0)).localCheckpoint(eager=False)

    for _ in range(max_iter):
        sside = vertex_join_side(state, V)
        agg = (
            edges.join(sside, edges[SRC] == sside["vertex"])
            .groupBy(DST)
            .agg(F.sum(F.col("c") * F.col(WGT)).alias("s"))
        )
        new_full = state.join(agg, state["vertex"] == agg[DST], "left").select(
            state["vertex"],
            (F.lit(beta) + F.lit(alpha) * F.coalesce("s", F.lit(0.0))).alias("c"),
            state["c"].alias("old"),
        ).localCheckpoint(eager=False)
        diff = (
            new_full.agg(F.sum(F.abs(F.col("c") - F.col("old"))).alias("d"))
            .first()["d"]
        )
        state = new_full.select("vertex", "c")
        if diff is not None and diff < tol * V:
            break

    norm = state.agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("n")).first()["n"] or 1.0
    out = state.select("vertex", (F.col("c") / F.lit(norm)).alias("katz_centrality"))
    edges.unpersist()
    verts.unpersist()
    return out


def eigenvector_centrality(
    G: Graph, max_iter: int = 100, tol: float = 1.0e-6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns [vertex, eigenvector_centrality]: power iteration on Aᵀ
    with per-step L2 normalization (eigenvector_centrality_impl.cuh)."""
    spark = G.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _prep_edges(G, P)
    verts = G.vertices().repartition(P, "vertex").persist(StorageLevel.MEMORY_AND_DISK)
    V = verts.count()
    state = verts.withColumn("c", F.lit(1.0 / math.sqrt(V))).localCheckpoint(eager=False)

    for _ in range(max_iter):
        sside = vertex_join_side(state, V)
        agg = (
            edges.join(sside, edges[SRC] == sside["vertex"])
            .groupBy(DST)
            .agg(F.sum(F.col("c") * F.col(WGT)).alias("s"))
        )
        raw = state.join(agg, state["vertex"] == agg[DST], "left").select(
            state["vertex"], F.coalesce("s", F.lit(0.0)).alias("c"),
            state["c"].alias("old"),
        ).localCheckpoint(eager=False)
        norm = raw.agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("n")).first()["n"]
        if not norm:
            state = raw.select("vertex", "c")
            break
        diff = (
            raw.agg(F.sum(F.abs(F.col("c") / F.lit(norm) - F.col("old"))).alias("d"))
            .first()["d"]
        )
        state = raw.select("vertex", (F.col("c") / F.lit(norm)).alias("c"))
        if diff is not None and diff < tol * V:
            break

    out = state.select("vertex", F.col("c").alias("eigenvector_centrality"))
    edges.unpersist()
    verts.unpersist()
    return out


def degree_centrality(G: Graph) -> DataFrame:
    """degree / (V−1) (``centrality/degree_centrality.py``)."""
    V = G.number_of_vertices()
    return G.degree().select(
        "vertex", (F.col("degree") / F.lit(max(V - 1, 1))).alias("degree_centrality")
    )
