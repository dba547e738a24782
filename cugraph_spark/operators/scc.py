"""Strongly connected components — parallel forward-backward coloring.

Reference: ``components/legacy/scc_matrix.cuh`` (dense reachability,
SG-only). We use the Orzan/FB-coloring algorithm (public literature:
Orzan 2004; Slota et al. "BFS and Coloring-based Parallel Algorithms
for Strongly Connected Components", IPDPS 2014), which is the standard
distributed formulation:

repeat until every vertex is assigned:
 1. **color propagation**: color(v) := max vertex id that can reach v,
    computed as a hash-max fixpoint over forward edges (all colors
    propagate simultaneously);
 2. every color root r (color(r)==r) anchors one SCC: the vertices
    with color r that can reach r **backward within their color class**
    — a multi-source semi-join fixpoint, all roots in parallel;
 3. assign those SCCs (label = root id), remove them, repeat on the
    residual subgraph.

Each outer round peels ≥1 SCC per color root (many in parallel);
labels are root vertex ids — the same any-member-id contract the
reference validates by bijection, made deterministic (max id of the
SCC wins because color = max reaching vertex).
"""

from __future__ import annotations

from ..plans.lineage import truncate_plan

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def strongly_connected_components(
    G: Graph, max_rounds: int = 50, max_prop_iters: int = 100
) -> DataFrame:
    """Returns [vertex, labels]; labels = max vertex id in the SCC."""
    all_edges = (
        G.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    unassigned = G.vertices().transform(truncate_plan)
    result = None

    rounds = 0
    while True:
        if unassigned.isEmpty():
            break
        rounds += 1
        if rounds > max_rounds:
            # FB-coloring peels ≥1 SCC per round; a graph can need one
            # round per SCC, so never return a silently-partial result.
            raise RuntimeError(
                f"strongly_connected_components did not peel all vertices "
                f"within max_rounds={max_rounds}; raise max_rounds"
            )
        edges = (
            all_edges.join(unassigned.withColumnRenamed("vertex", SRC), SRC, "left_semi")
            .join(unassigned.withColumnRenamed("vertex", DST), DST, "left_semi")
            .transform(truncate_plan)
        )
        # 1. forward hash-max color propagation to fixpoint
        color = unassigned.withColumn("color", F.col("vertex")).transform(truncate_plan)
        for _ in range(max_prop_iters):
            msgs = (
                edges.join(color, edges[SRC] == color["vertex"])
                .groupBy(DST)
                .agg(F.max("color").alias("nbr_max"))
            )
            new_color = (
                color.join(msgs, color["vertex"] == msgs[DST], "left")
                .select(
                    color["vertex"],
                    F.greatest(
                        color["color"], F.coalesce("nbr_max", color["color"])
                    ).alias("color"),
                    color["color"].alias("old"),
                )
                .transform(truncate_plan)
            )
            changed = new_color.agg(
                F.sum(F.when(F.col("color") != F.col("old"), 1).otherwise(0))
            ).first()[0]
            color = new_color.select("vertex", "color")
            if not changed:
                break
        if changed:
            raise RuntimeError(
                f"SCC color propagation did not reach a fixpoint within "
                f"max_prop_iters={max_prop_iters}; raise max_prop_iters"
            )

        # 2. backward reach of each root within its color class
        #    (reversed edges restricted to same-color endpoints)
        ce = (
            edges.join(color.withColumnRenamed("vertex", SRC)
                       .withColumnRenamed("color", "c_src"), SRC)
            .join(color.withColumnRenamed("vertex", DST)
                  .withColumnRenamed("color", "c_dst"), DST)
            .filter(F.col("c_src") == F.col("c_dst"))
            .select(F.col(DST).alias("b_src"), F.col(SRC).alias("b_dst"))
            .transform(truncate_plan)
        )
        scc = color.filter(F.col("vertex") == F.col("color")).select(
            "vertex", F.col("color").alias("labels")
        ).transform(truncate_plan)
        frontier = scc
        while True:
            step = (
                frontier.join(ce, frontier["vertex"] == ce["b_src"])
                .select(F.col("b_dst").alias("vertex"), "labels")
                .distinct()
                .join(scc, "vertex", "left_anti")
                .transform(truncate_plan)
            )
            if step.isEmpty():
                break
            scc = scc.unionByName(step).transform(truncate_plan)
            frontier = step

        result = scc if result is None else result.unionByName(scc)
        result = result.transform(truncate_plan)
        unassigned = unassigned.join(scc, "vertex", "left_anti").transform(truncate_plan)

    all_edges.unpersist()
    if result is None:
        return G.vertices().withColumn("labels", F.col("vertex"))
    return result.select("vertex", "labels")
