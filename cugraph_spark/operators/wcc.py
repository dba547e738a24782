"""Weakly connected components — distributed hash-min label propagation.

Recreates ``cugraph.weakly_connected_components``
(``components/connectivity.py:102-200``) over a symmetrized edge
DataFrame. The reference's CUDA implementation
(``components/weakly_connected_components_impl.cuh``, 771 LoC) is a
multi-root frontier BFS with conflict-edge contraction levels — a GPU
latency optimization. Its *contract* (validated by bijection at
``weakly_connected_components_test.cpp:179-191``) is only that every
vertex in a component gets the same label and different components get
different labels; the label is some vertex id of the component.

We standardize on the **minimum vertex id** per component (deterministic,
exactly testable, bijection-equivalent to the reference) and compute it
with hash-min propagation accelerated by pointer jumping:

- superstep: ``label(v) ← min(label(v), min_{u~v} label(u))``
  (one edges⋈state join + groupBy(dst).min — map-side combinable), then
- pointer jump: ``label(v) ← label(label(v))`` (state self-join), the
  Spark analog of the reference's contraction levels; together they give
  O(log d) supersteps instead of O(diameter).

Scale notes: the O(E) edge side is hash-partitioned on ``src`` once and
persisted; each superstep re-shuffles only the O(V) label vector. The
changed-count convergence check is the single action per superstep
(host_scalar_allreduce analog); ``check_every=k`` batches it to one
action per k supersteps (overshoot-safe: a stable labeling is a
fixpoint). Labels checkpoint every ``checkpoint_every`` supersteps for
exact resume.
"""

from __future__ import annotations

from ..plans.lineage import truncate_plan

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph
from ..plans.checkpoint import CheckpointManager
from ..plans.strategy import vertex_join_side


def weakly_connected_components(
    G: Graph,
    max_iter: int = 100,
    num_partitions: int | str | None = None,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    check_every: int = 1,
    superstep_seconds: list | None = None,
    min_iter: int = 0,
) -> DataFrame:
    """Returns DataFrame ``[vertex, labels]`` (reference column name,
    connectivity.py:102-200); ``labels`` = min vertex id in the
    component. Requires an undirected (symmetrized) graph, mirroring
    the reference's check at connectivity.py:185-187.

    ``check_every=k`` runs the changed-count action (the only driver
    round-trip) every k supersteps; intermediate supersteps stay lazy
    and execute inside the next checking superstep's action. A stable
    labeling is a fixpoint of hash-min + pointer-jump, so overshooting
    convergence by up to k−1 supersteps returns identical labels
    (same batching contract as label_propagation's ``check_every``).

    ``min_iter=k`` keeps iterating through at least k supersteps even
    after the labeling stabilizes (a stable labeling is a fixpoint, so
    the extra supersteps run the identical O(E) plan and return
    identical labels). Used by the scaling bench to collect
    steady-state per-superstep walls on low-diameter graphs that
    converge in 2-3 rounds."""
    if G.directed:
        raise ValueError(
            "weakly_connected_components requires an undirected (symmetrized) "
            "graph — construct Graph(..., directed=False)"
        )
    spark = G.edges.sparkSession
    from ..plans.strategy import resolve_partitions

    P = resolve_partitions(num_partitions, G.edges)

    e = G.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    # Compact vertex ids to int32 when they fit — the reference's own
    # narrow-id rule (vertex ids are int32 OR int64, chosen by range:
    # simpleGraph.py:253-258, renumber_edgelist_impl.cuh). The WCC
    # superstep is pure streaming (min over ids, no arithmetic), so at
    # high parallelism it is memory-bandwidth-bound; halving the bytes
    # per edge directly raises the superstep throughput ceiling. The
    # one bounds-check scan happens pre-loop on the un-persisted input;
    # output labels are cast back to long (schema unchanged).
    bounds = e.agg(
        F.min(F.least(SRC, DST)).alias("lo"),
        F.max(F.greatest(SRC, DST)).alias("hi"),
    ).first()
    compact = (
        bounds["hi"] is not None
        and bounds["lo"] > -(2**31)
        and bounds["hi"] < 2**31 - 1
    )
    if compact:
        e = e.select(
            F.col(SRC).cast("int").alias(SRC),
            F.col(DST).cast("int").alias(DST),
        )
    if not G.pre_partitioned or compact:  # select/filter preserve a bucketed layout
        e = e.repartition(P, SRC)
    edges = e.persist(StorageLevel.MEMORY_AND_DISK)
    id_t = "int" if compact else "long"

    start_iter = 0
    if resume and checkpoint is not None and checkpoint.latest_iteration() is not None:
        it0 = checkpoint.latest_iteration()
        saved, meta = checkpoint.load(spark, it0)
        state = (
            saved.select(
                F.col("vertex").cast(id_t).alias("vertex"),
                F.col("labels").cast(id_t).alias("labels"),
            )
            .repartition(P, "vertex")
            .transform(truncate_plan)
        )
        start_iter = meta["iteration"] + 1
    else:
        state = (
            G.vertices()
            .select(F.col("vertex").cast(id_t).alias("vertex"))
            .withColumn("labels", F.col("vertex"))
            .repartition(P, "vertex")
            .transform(truncate_plan)
        )

    import time as _time

    V = G.number_of_vertices()
    _t0 = _time.perf_counter()
    for it in range(start_iter, max_iter):
        checking = (it + 1) % check_every == 0 or it == max_iter - 1
        # hash-min over neighbors (isolated vertices keep their own label)
        sside = vertex_join_side(state, V)
        mins = (
            edges.join(sside, edges[SRC] == sside["vertex"])
            .groupBy(DST)
            .agg(F.min("labels").alias("nbr_min"))
        )
        # carry the old label through so the changed-count needs no extra
        # join; checkpoint `lowered` so the pointer-jump self-join reads
        # one materialized RDD instead of recomputing the mins join twice
        lowered = (
            state.join(mins.hint("shuffle_hash"), state["vertex"] == mins[DST], "left")
            .select(
                state["vertex"],
                F.least(
                    state["labels"], F.coalesce("nbr_min", state["labels"])
                ).alias("labels"),
                state["labels"].alias("old"),
            )
            .transform(truncate_plan)
        )
        # pointer jump: labels ← labels(labels) — contraction-level analog
        lab = lowered.select(
            F.col("vertex").alias("lv"), F.col("labels").alias("ll")
        )
        labside = vertex_join_side(lab, V)
        jumped = (
            lowered.join(labside, lowered["labels"] == labside["lv"], "left")
            .select(
                lowered["vertex"],
                F.coalesce(labside["ll"], lowered["labels"]).alias("labels"),
                lowered["old"],
            )
            .transform(truncate_plan)
        )

        if not checking:
            # stay lazy: this superstep executes inside the next
            # checking superstep's action
            state = jumped.select("vertex", "labels")
            continue

        changed = (
            jumped.agg(
                F.sum(
                    F.when(F.col("labels") != F.col("old"), 1).otherwise(0)
                ).alias("c")
            )
            .first()["c"]
        )
        if superstep_seconds is not None:
            # wall of the checking action (covers the k batched lazy
            # supersteps since the previous check) — same contract as
            # pagerank's chained-mode superstep_seconds
            superstep_seconds.append(_time.perf_counter() - _t0)
            _t0 = _time.perf_counter()
        state = jumped.select("vertex", "labels")

        if checkpoint is not None and checkpoint_every and (it + 1) % checkpoint_every == 0:
            state = checkpoint.save(
                state.select("vertex", "labels"), it, {"changed": int(changed)}
            )

        if changed == 0 and (it + 1) >= min_iter:
            break

    edges.unpersist()
    return state.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("labels").cast("long").alias("labels"),
    )


def connected_components(G: Graph, connection: str = "weak", **kw) -> DataFrame:
    """Reference ``connected_components`` export
    (components/connectivity.py): dispatch on ``connection`` —
    "weak" → weakly_connected_components, "strong" → SCC."""
    if connection == "weak":
        return weakly_connected_components(G, **kw)
    if connection == "strong":
        from .scc import strongly_connected_components

        return strongly_connected_components(G, **kw)
    raise ValueError(f"unknown connection type: {connection!r}")
