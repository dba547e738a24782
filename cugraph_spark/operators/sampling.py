"""Sampling — uniform random walks, node2vec-biased walks, uniform
neighbor sampling.

Reference surface:
- ``sampling/random_walks_impl.cuh`` (512 LoC) / python
  ``sampling/random_walks.py``: fixed-length uniform random walks from
  a start-vertex list; returns (vertex_paths, edge_weight_paths).
- ``sampling/node2vec_impl.cuh`` / ``sampling/node2vec.py``: p/q-biased
  second-order walks.
- ``sampling/uniform_neighbor_sample_impl.hpp``: per-seed fan-out
  sampling for GNN mini-batches.

Spark-first determinism: the reference seeds a device RNG; we need
runs to be reproducible *across partitionings and cluster sizes*, so
every random draw is a counter-based hash ``xxhash64(walk_id, step,
seed)`` (same idiom as the RMAT generator) — no RNG state anywhere —
and walk ids themselves are deterministic ``row_number`` ordinals over
the sorted start vertices (``_walk_ids``), never
``monotonically_increasing_id`` (which is partition-layout-dependent).
Each step is one join: walks-at-frontier ⋈ out-edges on the current
vertex, pick the neighbor whose rank matches the draw via
``row_number`` over (walk, neighbor order). Walk state stays O(#walks)
per step; the edge side is partitioned once.
"""

from __future__ import annotations

from ..plans.lineage import checkpoint_keep_stats, truncate_plan

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import DST, SRC, WGT, Graph


def _walk_ids(start_vertices: DataFrame) -> DataFrame:
    """[walk_id, vertex]: deterministic 0-based walk ids.

    ``monotonically_increasing_id`` depends on partition layout (and can
    change if a persisted partition is recomputed), so walk ids come
    from a DISTRIBUTED sort of the start vertices + ``zipWithIndex``
    per-partition offsets — the same dense-rank-without-a-window idiom
    ``graph.renumber`` uses. Identical output at any parallelism, and
    no single-partition Window even for all-vertex walk launches.
    Callers with a precomputed id can pass a 2-column
    (walk_id, vertex) DataFrame to skip it."""
    cols = start_vertices.columns
    if len(cols) >= 2:
        return start_vertices.select(
            F.col(cols[0]).cast("long").alias("walk_id"),
            F.col(cols[1]).alias("vertex"),
        )
    v = F.col(cols[0])
    sv = start_vertices.select(v.alias("vertex")).sort("vertex")
    vtype = dict(sv.dtypes)["vertex"]
    rdd = sv.rdd.map(lambda r: r[0]).zipWithIndex()
    return sv.sparkSession.createDataFrame(
        rdd, schema=f"vertex {vtype}, walk_id long"
    ).select("walk_id", "vertex")


def random_walks(
    G: Graph,
    start_vertices: DataFrame,
    max_depth: int,
    seed: int = 42,
) -> DataFrame:
    """Uniform random walks of length ≤ max_depth edges.

    Returns ``[walk_id, step, vertex]`` (step 0 = start vertex). Walks
    stop early at sinks (no out-edges), like the reference's padded
    walks minus the padding.
    """
    edges = G.edges.select(SRC, DST).persist(StorageLevel.MEMORY_AND_DISK)
    deg = edges.groupBy(SRC).agg(F.count("*").alias("deg"))
    w = Window.partitionBy(SRC).orderBy(DST)
    ranked = (
        edges.join(deg, SRC)
        .withColumn("rnk", F.row_number().over(w))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    walks = _walk_ids(start_vertices).persist(StorageLevel.MEMORY_AND_DISK)
    out = walks.select("walk_id", F.lit(0).alias("step"), "vertex")
    frontier = walks

    for step in range(1, max_depth + 1):
        # draw ∈ [0, deg): counter-based, partitioning-invariant
        draw = F.pmod(
            F.xxhash64(F.col("walk_id"), F.lit(step), F.lit(seed)), F.col("deg")
        )
        nxt = (
            frontier.join(ranked, frontier["vertex"] == ranked[SRC])
            .filter(F.col("rnk") - 1 == draw)
            .select("walk_id", F.col(DST).alias("vertex"))
            .transform(truncate_plan)
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(
            nxt.select("walk_id", F.lit(step).alias("step"), "vertex")
        )
        frontier = nxt

    result = out.transform(truncate_plan)
    edges.unpersist()
    ranked.unpersist()
    walks.unpersist()
    return result


def node2vec_walks(
    G: Graph,
    start_vertices: DataFrame,
    max_depth: int,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Second-order (p/q-biased) walks, node2vec semantics
    (``sampling/node2vec_impl.cuh``): unnormalized weight of stepping
    t→v→x is w(v,x)·(1/p if x==t; 1 if x~t; 1/q otherwise). Returns
    [walk_id, step, vertex]. Draws are counter-based-deterministic via
    inverse-CDF over the cumulative bias within each (walk, v) group."""
    edges = G.edges.select(SRC, DST, WGT).persist(StorageLevel.MEMORY_AND_DISK)
    adj_flag = edges.select(
        F.col(SRC).alias("t_"), F.col(DST).alias("x_"), F.lit(1).alias("is_nbr")
    ).distinct()

    walks = (
        _walk_ids(start_vertices)
        .withColumn("prev", F.lit(None).cast("long"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out = walks.select("walk_id", F.lit(0).alias("step"), "vertex")
    frontier = walks

    # decoupled column names: adj_flag descends from `edges`, so the
    # step join must not reference edges' attributes directly (ambiguous
    # self-join references otherwise)
    ecand = edges.select(
        F.col(SRC).alias("c_src"), F.col(DST).alias("c_dst"), F.col(WGT).alias("c_w")
    )
    for step in range(1, max_depth + 1):
        cand = (
            frontier.join(ecand, frontier["vertex"] == F.col("c_src"))
            .join(
                adj_flag,
                (F.col("prev") == F.col("t_")) & (F.col("c_dst") == F.col("x_")),
                "left",
            )
            .select(
                "walk_id",
                frontier["vertex"].alias("cur"),
                F.col("c_dst").alias("nxt"),
                (
                    F.col("c_w")
                    * F.when(F.col("c_dst") == F.col("prev"), F.lit(1.0 / p))
                    .when(F.col("is_nbr").isNotNull(), F.lit(1.0))
                    .otherwise(F.lit(1.0 / q))
                ).alias("bias"),
            )
        )
        w = Window.partitionBy("walk_id").orderBy("nxt")
        wall = Window.partitionBy("walk_id")
        scored = (
            cand.withColumn("cum", F.sum("bias").over(w))
            .withColumn("tot", F.sum("bias").over(wall))
            .withColumn(
                "u",
                (F.pmod(F.xxhash64("walk_id", F.lit(step), F.lit(seed)), F.lit(1 << 31))
                 / F.lit(float(1 << 31))) * F.col("tot"),
            )
        )
        nxt = (
            scored.filter(F.col("cum") - F.col("bias") <= F.col("u"))
            .filter(F.col("u") < F.col("cum"))
            .select("walk_id", F.col("nxt").alias("vertex"), F.col("cur").alias("prev"))
            .transform(truncate_plan)
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(
            nxt.select("walk_id", F.lit(step).alias("step"), "vertex")
        )
        frontier = nxt

    result = out.transform(truncate_plan)
    edges.unpersist()
    walks.unpersist()
    return result


def uniform_neighbor_sample(
    G: Graph,
    start_vertices: DataFrame,
    fanout: list[int],
    seed: int = 42,
    with_replacement: bool = False,
    cache_out: list | None = None,
) -> DataFrame:
    """GNN-style layered neighbor sampling
    (``uniform_neighbor_sample_impl.hpp``): per hop h, sample up to
    fanout[h] out-edges per frontier vertex. Returns
    [src, dst, weight, hop]. Without replacement: rank neighbors by a
    per-(vertex,hop,seed) hash and keep the top fanout. With
    replacement: fanout[h] independent slot draws per frontier vertex
    (slot s draws ``xxhash64(src, hop, s, seed) mod degree``), so the
    same neighbor can repeat. Both are vectorized, deterministic, and
    partitioning-invariant.

    Cache retention: the edge projection is lazily local-checkpointed
    and its blocks live until driver GC collects the frame. A loop
    calling the sampler many times should pass ``cache_out=[]`` and
    call ``plans.lineage.release_checkpoint`` on the appended frame
    once the returned plan's terminal action has run (BulkSampler.flush
    does this)."""
    # lazy stats-keeping checkpoint, not persist/unpersist: this loop
    # runs ZERO actions, so an unpersist-before-return would drop the
    # cache before the caller's first action and every hop would rescan
    # the source; the checkpoint RDD materializes once inside the
    # terminal job (one-shot — stats can't compound here)
    edges = G.edges.select(SRC, DST, WGT).transform(checkpoint_keep_stats)
    if cache_out is not None:
        cache_out.append(edges)
    frontier = start_vertices.select(
        F.col(start_vertices.columns[0]).alias("v")
    ).distinct()
    samples = None
    for hop, k in enumerate(fanout):
        cand = edges.join(frontier, edges[SRC] == frontier["v"]).select(SRC, DST, WGT)
        if with_replacement:
            wd = Window.partitionBy(SRC).orderBy(DST)
            ranked = (
                cand.withColumn("rn", F.row_number().over(wd))
                .withColumn("deg", F.count("*").over(Window.partitionBy(SRC)))
            )
            slots = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot")
            picked = (
                ranked.select(SRC, DST, WGT, "rn", "deg", slots)
                .filter(
                    F.col("rn") - 1
                    == F.pmod(
                        F.xxhash64(F.col(SRC), F.lit(hop), F.col("slot"), F.lit(seed)),
                        F.col("deg"),
                    )
                )
                .select(SRC, DST, WGT, F.lit(hop).alias("hop"))
                .transform(truncate_plan)
            )
        else:
            w = Window.partitionBy(SRC).orderBy(
                F.xxhash64(F.col(SRC), F.col(DST), F.lit(hop), F.lit(seed))
            )
            picked = (
                cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .select(SRC, DST, WGT, F.lit(hop).alias("hop"))
                .transform(truncate_plan)
            )
        samples = picked if samples is None else samples.unionByName(picked)
        frontier = picked.select(F.col(DST).alias("v")).distinct()
    return samples if samples is not None else G.edges.limit(0).withColumn(
        "hop", F.lit(0)
    )


def uniform_neighbor_sample_batched(
    G: Graph,
    seeds: DataFrame,
    fanout: list[int],
    seed: int = 42,
    with_replacement: bool = False,
    start_col: str = "_START_",
    batch_col: str = "_BATCH_",
    cache_out: list | None = None,
) -> DataFrame:
    """Batched GNN minibatch sampling — every batch in ONE plan.

    The reference's ``BulkSampler`` (``gnn/data_loading/bulk_sampler.py``)
    chops seeds into ``seeds_per_call`` chunks and loops sampling calls
    to bound GPU memory; Spark-first there is no loop — the batch id is
    carried through the per-hop join/window keys, so all batches sample
    together in one shuffle per hop and executor memory is bounded by
    partitioning, not by a driver-side chunk loop.

    Semantics per batch match ``uniform_neighbor_sample``: per hop h,
    up to ``fanout[h]`` out-edges per frontier vertex, frontiers evolve
    independently per batch, and every draw is keyed on
    ``(batch, vertex, hop, seed)`` so batches sample independently and
    the output is deterministic at any parallelism. Returns
    [batch_id, src, dst, weight, hop].
    """
    # lazy stats-keeping checkpoint — same zero-actions-in-loop reason
    # and cache-retention contract as uniform_neighbor_sample above
    edges = G.edges.select(SRC, DST, WGT).transform(checkpoint_keep_stats)
    if cache_out is not None:
        cache_out.append(edges)
    frontier = seeds.select(
        F.col(batch_col).cast("long").alias("b"),
        F.col(start_col).alias("v"),
    ).distinct()
    samples = None
    for hop, k in enumerate(fanout):
        cand = edges.join(frontier, edges[SRC] == frontier["v"]).select(
            "b", SRC, DST, WGT
        )
        if with_replacement:
            wd = Window.partitionBy("b", SRC).orderBy(DST)
            ranked = cand.withColumn("rn", F.row_number().over(wd)).withColumn(
                "deg", F.count("*").over(Window.partitionBy("b", SRC))
            )
            slots = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot")
            picked = (
                ranked.select("b", SRC, DST, WGT, "rn", "deg", slots)
                .filter(
                    F.col("rn") - 1
                    == F.pmod(
                        F.xxhash64(
                            F.col("b"), F.col(SRC), F.lit(hop),
                            F.col("slot"), F.lit(seed),
                        ),
                        F.col("deg"),
                    )
                )
                .select("b", SRC, DST, WGT, F.lit(hop).alias("hop"))
                .transform(truncate_plan)
            )
        else:
            w = Window.partitionBy("b", SRC).orderBy(
                F.xxhash64(
                    F.col("b"), F.col(SRC), F.col(DST), F.lit(hop), F.lit(seed)
                )
            )
            picked = (
                cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .select("b", SRC, DST, WGT, F.lit(hop).alias("hop"))
                .transform(truncate_plan)
            )
        samples = picked if samples is None else samples.unionByName(picked)
        frontier = picked.select("b", F.col(DST).alias("v")).distinct()
    out = samples if samples is not None else (
        G.edges.limit(0)
        .withColumn("b", F.lit(0).cast("long"))
        .withColumn("hop", F.lit(0))
        .select("b", SRC, DST, WGT, "hop")
    )
    return out.select(
        F.col("b").alias("batch_id"), SRC, DST, WGT, "hop"
    )


def rw_path(walks: DataFrame) -> DataFrame:
    """Reference ``rw_path`` export (sampling/random_walks.py): convert
    the flat [walk_id, step, vertex] walk rows into one row per walk
    with the ordered vertex path (the legacy offsets/lengths accessor,
    array-valued here)."""
    return (
        walks.groupBy("walk_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("step"), F.col("vertex")))
            ).alias("_s")
        )
        .select(
            "walk_id",
            F.transform(F.col("_s"), lambda s: s["vertex"]).alias("path"),
            F.size("_s").alias("path_length"),
        )
    )
