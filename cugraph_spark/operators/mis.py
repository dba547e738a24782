"""Maximal independent set + greedy vertex coloring — Luby rounds.

Reference: ``components/mis_impl.cuh`` / ``vertex_coloring_impl.cuh``
(random-priority Luby selection). Spark-first with deterministic
counter-based priorities (``xxhash64(vertex, round, seed)``, ties by
vertex id) so results are exactly reproducible at any parallelism:

- round: v joins the MIS iff its priority is a local minimum among
  still-active neighbors; selected vertices and their neighbors
  deactivate; repeat until no active vertices. O(log V) rounds w.h.p.
- coloring: repeated MIS over the residual graph; color = round index
  (the reference's coloring is likewise MIS-round based).
"""

from __future__ import annotations

from ..plans.lineage import truncate_plan

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph


def _sym_edges(G: Graph) -> DataFrame:
    e = G.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    return e.unionByName(
        e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    ).distinct()


def maximal_independent_set(
    G: Graph, seed: int = 42, max_rounds: int = 100
) -> DataFrame:
    """Returns [vertex, in_mis] over all vertices."""
    edges = _sym_edges(G).persist(StorageLevel.MEMORY_AND_DISK)
    active = G.vertices().transform(truncate_plan)
    chosen = None

    for rnd in range(max_rounds):
        if active.isEmpty():
            break
        pri = active.select(
            "vertex",
            F.struct(
                F.xxhash64(F.col("vertex"), F.lit(rnd), F.lit(seed)).alias("h"),
                F.col("vertex").alias("v"),
            ).alias("pri"),
        ).transform(truncate_plan)
        # min neighbor priority among active neighbors
        act_e = (
            edges.join(pri.withColumnRenamed("vertex", SRC), SRC)
            .join(active.withColumnRenamed("vertex", DST), DST, "left_semi")
        )
        nbr_min = act_e.groupBy(DST).agg(F.min("pri").alias("nm"))
        sel = (
            pri.join(nbr_min, pri["vertex"] == nbr_min[DST], "left")
            .filter(F.col("nm").isNull() | (pri["pri"] < F.col("nm")))
            .select(pri["vertex"])
            .transform(truncate_plan)
        )
        chosen = sel if chosen is None else chosen.unionByName(sel)
        chosen = chosen.transform(truncate_plan)
        # deactivate selected + their neighbors
        nbrs = edges.join(sel.withColumnRenamed("vertex", SRC), SRC, "left_semi").select(
            F.col(DST).alias("vertex")
        )
        dead = sel.unionByName(nbrs).distinct()
        active = active.join(dead, "vertex", "left_anti").transform(truncate_plan)

    out = G.vertices().join(
        (chosen or G.vertices().limit(0)).withColumn("in_mis", F.lit(True)),
        "vertex", "left",
    ).select("vertex", F.coalesce("in_mis", F.lit(False)).alias("in_mis"))
    edges.unpersist()
    return out


def vertex_coloring(
    G: Graph, seed: int = 42, max_colors: int = 200
) -> DataFrame:
    """Greedy MIS-round coloring: [vertex, color] (0-based), proper —
    no edge joins two vertices of the same color."""
    edges_all = _sym_edges(G).persist(StorageLevel.MEMORY_AND_DISK)
    remaining_v = G.vertices().transform(truncate_plan)
    remaining_e = edges_all
    out = None

    for color in range(max_colors):
        if remaining_v.isEmpty():
            break
        g = Graph.__new__(Graph)
        g.edges = remaining_e.withColumn("weight", F.lit(1.0))
        g.directed = False
        g.weighted = False
        g.mapping = None
        # restrict MIS to remaining vertices: isolated remaining
        # vertices (no remaining edges) are all selected this round
        mis = maximal_independent_set(g, seed=seed + color)
        mis_v = mis.filter(F.col("in_mis")).select("vertex")
        iso = remaining_v.join(
            g.vertices(), "vertex", "left_anti"
        )  # vertices with no remaining edges
        sel = mis_v.unionByName(iso).distinct().transform(truncate_plan)
        colored = sel.withColumn("color", F.lit(color))
        out = colored if out is None else out.unionByName(colored)
        out = out.transform(truncate_plan)
        remaining_v = remaining_v.join(sel, "vertex", "left_anti").transform(truncate_plan)
        remaining_e = (
            remaining_e.join(sel.withColumnRenamed("vertex", SRC), SRC, "left_anti")
            .join(sel.withColumnRenamed("vertex", DST), DST, "left_anti")
            .transform(truncate_plan)
        )

    edges_all.unpersist()
    return out if out is not None else G.vertices().withColumn("color", F.lit(0))
