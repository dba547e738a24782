"""Minimum spanning tree/forest — distributed Borůvka.

Reference: ``tree/legacy/mst.cu`` (single-GPU Borůvka); python wrapper
``tree/minimum_spanning_tree.py`` returns the MST edge list of an
undirected weighted graph.

Spark-first Borůvka: each round every component picks its minimum
outgoing edge (deterministic tie-break on (weight, src, dst)), the
picked edges merge components via hash-min label propagation on the
contracted component graph, and rounds repeat until no cross-component
edge remains — O(log V) rounds, each a groupBy + small fixpoint.
Result is the classic MSF (forest if disconnected).
"""

from __future__ import annotations

from ..plans.lineage import truncate_plan

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, WGT, Graph
from .pagerank import FailedToConvergeError


def minimum_spanning_tree(G: Graph, max_rounds: int = 64) -> DataFrame:
    """Returns the MSF edge list [src, dst, weight] (src < dst) of the
    undirected graph; deterministic for ties via (weight, src, dst)
    lexicographic minimum."""
    if G.directed:
        raise ValueError("minimum_spanning_tree requires an undirected graph")
    und = (
        G.edges.filter(F.col(SRC) < F.col(DST))
        .groupBy(SRC, DST)
        .agg(F.min(WGT).alias(WGT))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    comp = (
        und.select(F.col(SRC).alias("vertex"))
        .unionByName(und.select(F.col(DST).alias("vertex")))
        .distinct()
        .withColumn("c", F.col("vertex"))
        .transform(truncate_plan)
    )
    chosen = None

    for _ in range(max_rounds):
        lab = comp.select(F.col("vertex").alias("v"), F.col("c"))
        e = (
            und.join(lab.withColumnRenamed("v", SRC).withColumnRenamed("c", "c_src"), SRC)
            .join(lab.withColumnRenamed("v", DST).withColumnRenamed("c", "c_dst"), DST)
            .filter(F.col("c_src") != F.col("c_dst"))
        )
        if e.isEmpty():
            break
        # min outgoing edge per component (both directions considered)
        cand = (
            e.select(F.col("c_src").alias("comp"), SRC, DST, WGT)
            .unionByName(e.select(F.col("c_dst").alias("comp"), SRC, DST, WGT))
        )
        picked = (
            cand.groupBy("comp")
            .agg(F.min(F.struct(WGT, SRC, DST)).alias("m"))
            .select(F.col("m." + SRC).alias(SRC), F.col("m." + DST).alias(DST),
                    F.col("m." + WGT).alias(WGT))
            .distinct()
            .transform(truncate_plan)
        )
        chosen = picked if chosen is None else chosen.unionByName(picked).distinct()
        chosen = chosen.transform(truncate_plan)

        # merge components: hash-min over the picked component-pairs
        pe = (
            picked.join(lab.withColumnRenamed("v", SRC).withColumnRenamed("c", "a"), SRC)
            .join(lab.withColumnRenamed("v", DST).withColumnRenamed("c", "b"), DST)
            .select("a", "b")
        )
        pe_sym = pe.unionByName(pe.select(F.col("b").alias("a"), F.col("a").alias("b")))
        relabel = comp.select(F.col("c").alias("node")).distinct().withColumn("lbl", F.col("node"))
        for _ in range(max_rounds):
            mins = (
                pe_sym.join(relabel, pe_sym["a"] == relabel["node"])
                .groupBy("b").agg(F.min("lbl").alias("nm"))
            )
            lowered = (
                relabel.join(mins, relabel["node"] == mins["b"], "left")
                .select(
                    relabel["node"],
                    F.least(relabel["lbl"], F.coalesce("nm", relabel["lbl"])).alias("lbl"),
                    relabel["lbl"].alias("old"),
                )
                .transform(truncate_plan)
            )
            # pointer jump (lbl ← lbl(lbl), same idiom as wcc.py): the
            # picked edges form merge chains up to #components long, so
            # plain hash-min alone needs O(chain) rounds — jumping makes
            # it O(log chain), and max_rounds=64 then covers any input
            lab2 = lowered.select(
                F.col("node").alias("ln"), F.col("lbl").alias("ll")
            )
            jumped = (
                lowered.join(lab2, lowered["lbl"] == lab2["ln"], "left")
                .select(
                    lowered["node"],
                    F.coalesce("ll", lowered["lbl"]).alias("lbl"),
                    lowered["old"],
                )
                .transform(truncate_plan)
            )
            ch = jumped.agg(
                F.sum(F.when(F.col("lbl") != F.col("old"), 1).otherwise(0))
            ).first()[0]
            relabel = jumped.select("node", "lbl")
            if not ch:
                break
        else:
            # a silent fall-through would leave two halves of one merged
            # component labeled differently and let round 2 add a cycle
            # edge — fail loudly instead
            und.unpersist()
            raise FailedToConvergeError(
                f"MST component merge did not converge in {max_rounds} rounds"
            )
        comp = (
            comp.join(relabel, comp["c"] == relabel["node"])
            .select(comp["vertex"], F.col("lbl").alias("c"))
            .transform(truncate_plan)
        )
    else:
        # the emptiness probe runs at the TOP of each round, so a run
        # that merges everything in the final round lands here too —
        # re-probe before declaring failure; components at least halve
        # per Borůvka round, so with pointer-jumped merges 64 rounds
        # cover any input, but never return a non-spanning forest
        # silently if the bound is ever lowered
        lab = comp.select(F.col("vertex").alias("v"), F.col("c"))
        remaining = (
            und.join(lab.withColumnRenamed("v", SRC).withColumnRenamed("c", "c_src"), SRC)
            .join(lab.withColumnRenamed("v", DST).withColumnRenamed("c", "c_dst"), DST)
            .filter(F.col("c_src") != F.col("c_dst"))
        )
        if not remaining.isEmpty():
            und.unpersist()
            raise FailedToConvergeError(
                f"Borůvka did not converge in {max_rounds} rounds"
            )

    und.unpersist()
    if chosen is None:
        return G.edges.limit(0).select(SRC, DST, WGT)
    return chosen.select(SRC, DST, WGT)


def maximum_spanning_tree(G: Graph, max_rounds: int = 64) -> DataFrame:
    """Maximum spanning tree/forest (reference
    ``tree/legacy/mst.cu`` export ``maximum_spanning_tree``,
    python ``tree/minimum_spanning_tree.py:maximum_spanning_tree``):
    Borůvka on negated weights, weights restored on output. Ties break
    deterministically toward the lexicographically smallest (src, dst)
    among maximum-weight edges."""
    neg = G.edges.select(SRC, DST, (-F.col(WGT)).alias(WGT))
    g = Graph.__new__(Graph)
    g.edges = neg
    g.directed = G.directed
    g.weighted = G.weighted
    g.mapping = None
    out = minimum_spanning_tree(g, max_rounds=max_rounds)
    return out.select(SRC, DST, (-F.col(WGT)).alias(WGT))
