"""Approximate maximum-weight matching — locally-heaviest-edge rounds.

Reference: ``community/approx_weighted_matching_impl.cuh`` (python
``cugraph.approximate_weighted_matching`` per the C API): repeated
rounds of (1) every unmatched vertex offers to its maximum-weight
unmatched neighbor, (2) mutual offers become matches, (3) matched
vertices and their incident edges drop out — the classic ½-approximate
locally-dominant-edge scheme (Preis / Drake–Hougardy), which is exactly
the reference's per-round structure (offers :133-209, mutual-match
:209, neighborhood mask-out :258-276).

Spark shape: each round is one groupBy-max (deterministic
(weight, id)-lexicographic tie-break) + one self-join for mutuality —
the standard gather-scatter superstep; O(log V) rounds in practice.
"""

from __future__ import annotations

from ..plans.lineage import truncate_plan

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, WGT, Graph


def approximate_weighted_matching(
    G: Graph, max_rounds: int = 64
) -> tuple[DataFrame, float]:
    """Returns ([vertex, partner], total matched weight); unmatched
    vertices get partner = -1. Requires an undirected graph (the
    symmetrized edge list carries both directions)."""
    if G.directed:
        raise ValueError("approximate_weighted_matching requires an undirected graph")
    edges = (
        G.edges.select(SRC, DST, WGT)
        .filter(F.col(SRC) != F.col(DST))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    active = edges.transform(truncate_plan)
    matched = None  # [vertex, partner, w]

    for _ in range(max_rounds):
        if active.isEmpty():
            break
        # best offer per vertex: max weight, ties to the larger dst id
        # (deterministic; matches the reference's reduce on (w, partner))
        offers = (
            active.groupBy(SRC)
            .agg(F.max(F.struct(F.col(WGT), F.col(DST))).alias("m"))
            .select(
                F.col(SRC).alias("vertex"),
                F.col("m." + DST).alias("offer"),
                F.col("m." + WGT).alias("w"),
            )
        )
        o2 = offers.select(
            F.col("vertex").alias("bv"), F.col("offer").alias("boffer")
        )
        mutual = (
            offers.join(
                o2,
                (offers["offer"] == o2["bv"]) & (o2["boffer"] == offers["vertex"]),
            )
            .select("vertex", F.col("offer").alias("partner"), "w")
            .transform(truncate_plan)
        )
        if mutual.isEmpty():
            break
        matched = mutual if matched is None else matched.unionByName(mutual)
        matched = matched.transform(truncate_plan)
        mv = mutual.select("vertex")
        active = (
            active.join(mv.withColumnRenamed("vertex", SRC), SRC, "left_anti")
            .join(mv.withColumnRenamed("vertex", DST), DST, "left_anti")
            .transform(truncate_plan)
        )

    verts = G.vertices()
    if matched is None:
        out = verts.withColumn("partner", F.lit(-1).cast("long"))
        total = 0.0
    else:
        out = verts.join(matched.select("vertex", "partner"), "vertex", "left").select(
            "vertex", F.coalesce("partner", F.lit(-1)).cast("long").alias("partner")
        )
        # each matched pair appears twice (v→p and p→v): halve the sum
        total = float(matched.agg(F.sum("w")).first()[0] or 0.0) / 2.0
    edges.unpersist()
    return out, total
