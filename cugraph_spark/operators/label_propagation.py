"""Label propagation community detection (synchronous, deterministic).

cuGraph 24.08 ships no standalone LPA (SURVEY.md §2.2.3 gap note — the
community surface is Louvain/Leiden/ECG); this implements the published
algorithm (Raghavan, Albert, Kumara 2007) in its synchronous variant
with deterministic tie-breaking so results are exactly reproducible:

- init: ``label(v) = v``;
- superstep: ``label(v) ← argmax_label Σ incident weight`` over v's
  neighbors, ties broken by the smallest label id;
- stop when no label changes or ``max_iter``.

It reuses the PageRank gather-scatter skeleton: messages =
``(dst, label(src), weight)``; reduce = ``groupBy(dst, label).sum(w)``
then a single ``max(struct(weight, -label))`` aggregate — both stages
map-side combinable, no window sort, hub-skew-safe (a hot dst key
partial-aggregates before the shuffle; AQE splits residual skew).

Scale notes: O(E) edges partitioned on ``src`` once + persisted; each
superstep shuffles O(E) messages pre-combined map-side to
O(distinct (dst,label)); one changed-count action per ``check_every``
supersteps (the supersteps in between are lazy plan executing inside
the next check's job — overshooting the fixpoint is a no-op, so any
``check_every`` returns identical labels).
"""

from __future__ import annotations

from ..plans.lineage import truncate_plan

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, WGT, Graph
from ..plans.checkpoint import CheckpointManager
from ..plans.strategy import (
    DST_PARTITION_MIN_V,
    NARROW_STATE_BROADCAST_LIMIT,
    vertex_join_side,
)


def label_propagation(
    G: Graph,
    max_iter: int = 20,
    num_partitions: int | str | None = None,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    check_every: int = 1,
    broadcast_limit: int | None = None,
) -> DataFrame:
    """Returns DataFrame ``[vertex, labels]``. Requires an undirected
    (symmetrized) graph — incident weight means both directions.

    ``check_every=k`` runs the changed-count action (the only driver
    round trip in the loop) every k supersteps instead of every one;
    the k-1 supersteps in between are pure lazy plan executing inside
    the next check's job. Results are IDENTICAL for any k: a stable
    labeling is a fixpoint of the synchronous argmax update, so
    supersteps past convergence are no-ops — the only trade is up to
    k-1 wasted (no-op) supersteps when the graph converges mid-chain.
    Use k = max_iter for fixed-budget runs (zero intermediate actions;
    k-superstep chains stay linear in Catalyst because truncate_plan
    cuts each superstep's lineage lazily)."""
    if G.directed:
        raise ValueError(
            "label_propagation requires an undirected (symmetrized) graph"
        )
    spark = G.edges.sparkSession
    from ..plans.strategy import resolve_partitions

    P = resolve_partitions(num_partitions, G.edges)

    # LPA's state is one narrow label column (8 bytes/vertex), and the
    # zero-exchange dst layout removes BOTH per-superstep aggregation
    # exchanges, so it shares the measured narrow-state cutover (RMAT-23
    # A/B on the strategy constant: 91.1s shuffle-hash vs 62.4s here).
    V = G.number_of_vertices()
    blimit = (
        NARROW_STATE_BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    )
    bcast = V <= blimit

    # Edge layout per join mode — same analysis as WCC's (operators/
    # wcc.py): shuffle-hash mode co-locates the per-superstep join on
    # SRC; broadcast mode with large V partitions by DST instead so
    # BOTH superstep aggregations (groupBy(dst,cand) and the argmax
    # groupBy(dst) — hashpartitioning(dst) satisfies either's clustered
    # distribution) and the state⋈best join run exchange-free; small V
    # scans the cache in place.
    e = G.edges.select(SRC, DST, WGT)
    if not bcast:
        if not G.partitioned_on(SRC):  # select preserves a bucketed layout
            e = e.repartition(P, SRC)
    elif V >= DST_PARTITION_MIN_V and not G.partitioned_on(DST):
        e = e.repartition(P, DST)
    edges = e.persist(StorageLevel.MEMORY_AND_DISK)

    start_iter = 0
    state = None
    if resume and checkpoint is not None and checkpoint.latest_iteration() is not None:
        it0 = checkpoint.latest_iteration()
        saved, meta = checkpoint.load(spark, it0)
        state = saved.repartition(P, "vertex").transform(truncate_plan)
        start_iter = meta["iteration"] + 1

    for it in range(start_iter, max_iter):
        checking = (it + 1) % check_every == 0 or it == max_iter - 1
        # (dst, label(src), w) → Σw per (dst,label) → argmax by (w, -label)
        if state is None:
            # superstep 0 on the identity labeling: label(src) IS src,
            # so the edges⋈state join vanishes — scores come straight
            # off the edge cache (map-side combinable), and because the
            # graph is symmetrized every vertex appears as dst, so no
            # initial vertices() distinct is needed either. Semantics
            # identical to the join path (own label only matters when a
            # vertex has no in-edges, impossible here).
            scores = edges.groupBy(
                F.col(DST), F.col(SRC).alias("cand")
            ).agg(F.sum(WGT).alias("w"))
        else:
            sside = vertex_join_side(state, V, limit=blimit)
            scores = (
                edges.join(sside, edges[SRC] == sside["vertex"])
                .groupBy(F.col(DST), F.col("labels").alias("cand"))
                .agg(F.sum(WGT).alias("w"))
            )
        best = scores.groupBy(DST).agg(
            F.max(F.struct(F.col("w"), (-F.col("cand")).alias("neg"))).alias("m")
        ).select(F.col(DST), (-F.col("m.neg")).alias("new_label"))

        # old label carried through → changed-count without a second join
        if state is None:
            new_full = best.select(
                F.col(DST).alias("vertex"),
                F.col("new_label").alias("labels"),
                F.col(DST).alias("old"),
            ).transform(truncate_plan)
        else:
            new_full = (
                state.join(
                    best.hint("shuffle_hash"), state["vertex"] == best[DST], "left"
                )
                .select(
                    state["vertex"],
                    F.coalesce("new_label", state["labels"]).alias("labels"),
                    state["labels"].alias("old"),
                )
                .transform(truncate_plan)
            )

        if not checking:
            # stay lazy: this superstep executes inside the next
            # checking superstep's action (a stable labeling is a
            # fixpoint, so overshooting convergence cannot change it)
            state = new_full.select("vertex", "labels")
            continue

        changed = (
            new_full.agg(
                F.sum(
                    F.when(F.col("labels") != F.col("old"), 1).otherwise(0)
                ).alias("c")
            )
            .first()["c"]
        )
        state = new_full.select("vertex", "labels")

        if checkpoint is not None and checkpoint_every and (it + 1) % checkpoint_every == 0:
            state = checkpoint.save(
                state.select("vertex", "labels"), it, {"changed": int(changed)}
            )

        if changed == 0:
            break

    edges.unpersist()
    if state is None:  # max_iter == 0: the identity labeling
        state = G.vertices().withColumn("labels", F.col("vertex"))
    return state.select("vertex", "labels")
