"""Force Atlas 2 layout — grid-approximated repulsion (Barnes-Hut
analog), one action per iteration.

Reference: ``cpp/src/layout/legacy/fa2.cuh`` + ``barnes_hut.cuh``
(python ``cugraph.force_atlas2``,
``python/cugraph/cugraph/layout/force_atlas2.py:19-35``): continuous
graph layout with degree+1 vertex mass, linear (or lin-log) edge
attraction, 1/d pairwise repulsion scaled by masses, gravity toward the
origin, and the adaptive global speed from swinging vs traction
(Jacomy et al. 2014). The reference accelerates repulsion with a
Barnes-Hut quadtree (theta cell opening); a distributed quadtree walk
is a poor Spark fit, so the same far-field idea is expressed
relationally: bin vertices into a G×G grid over the live bounding box,
aggregate per-cell (mass, centroid) — a ≤G² row table broadcast to a
cross join for far-cell repulsion — and resolve same-cell pairs
exactly with a cell-keyed self-join. Cell width / distance plays the
role of theta: an adjacent-cell centroid at distance ≥ cell width is
the theta ≈ 1 opening criterion of the reference's default 0.5-1.0
range (force_atlas2.py:85-87).

Scale shape: per iteration the heavy ops are one O(E) attraction join,
one O(V·G²) broadcast cross-join, and one same-cell self-join bounded
by the densest cell (grid refines with the bounding box, spreading
clusters across cells); everything reduces through a map-side
combinable groupBy(vertex). Exactly ONE driver action per iteration —
a fused aggregate returning (swing, traction, bbox) where the bbox
feeds the NEXT iteration's grid (the reference's per-iteration speed
update at fa2.cuh:~apply_forces has the same single global reduction).
"""

from __future__ import annotations

from ..plans.lineage import truncate_plan

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, WGT, Graph

_D_EPS = 1e-4  # distance floor: coincident points repel finitely


def _hash_unit(col, seed: int, salt: int):
    """Deterministic pseudo-uniform in [-1, 1) from a vertex id."""
    h = F.xxhash64(col, F.lit(seed), F.lit(salt))
    return (F.pmod(h, F.lit(2_000_001)) / F.lit(1_000_000.0)) - F.lit(1.0)


def force_atlas2(
    G: Graph,
    max_iter: int = 50,
    pos_list: DataFrame | None = None,
    outbound_attraction_distribution: bool = True,
    lin_log_mode: bool = False,
    edge_weight_influence: float = 1.0,
    jitter_tolerance: float = 1.0,
    barnes_hut_optimize: bool = True,
    barnes_hut_theta: float = 0.5,
    prevent_overlapping: bool = False,
    scaling_ratio: float = 2.0,
    strong_gravity_mode: bool = False,
    gravity: float = 1.0,
    verbose: bool = False,
    callback=None,
    grid_cells: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Returns [vertex, x, y] (reference force_atlas2.py return
    contract). Deterministic for a given seed, independent of
    partitioning: init positions are hash-of-vertex-id, every force
    is a pure column expression, and the speed recurrence consumes
    exact global aggregates.

    ``barnes_hut_optimize=False`` collapses the grid to ONE cell, so
    the near-field branch becomes exact all-pairs repulsion and the
    far-field branch is empty — the reference's own non-BH kernel is
    likewise O(V²) (force_atlas2.py:81-87), so the flag carries the
    same "exact but quadratic, small graphs only" contract here.
    ``barnes_hut_theta`` maps inversely to grid resolution (smaller
    theta = finer grid = more accuracy), mirroring the reference's
    speed/accuracy dial.
    ``prevent_overlapping`` is not supported (reference itself raises:
    force_atlas2.py "prevent_overlapping not implemented")."""
    if prevent_overlapping:
        # parity with the reference, which also rejects this flag
        raise NotImplementedError("prevent_overlapping is not implemented")
    if barnes_hut_optimize:
        grid_cells = max(4, int(round(grid_cells * 0.5 / max(barnes_hut_theta, 0.05) / 2)) * 2)
    else:
        grid_cells = 1  # exact O(V²) pairwise repulsion
    edges = (
        G.edges.select(SRC, DST, WGT)
        .filter(F.col(SRC) != F.col(DST))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # loop-invariant frames materialized ONCE: every saved stage repeats
    # max_iter times (per-iteration latency is stage-count-bound)
    und = (
        edges.unionByName(
            edges.select(
                F.col(DST).alias(SRC), F.col(SRC).alias(DST), F.col(WGT)
            )
        )
        .groupBy(SRC, DST)
        .agg(F.max(WGT).alias(WGT))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    mass = (
        und.groupBy(F.col(SRC).alias("vertex"))
        .agg((F.count("*") + F.lit(1.0)).alias("mass"))
    )
    verts = G.vertices().join(mass, "vertex", "left").select(
        "vertex", F.coalesce("mass", F.lit(1.0)).alias("mass")
    )

    if pos_list is not None:
        state = verts.join(
            pos_list.select("vertex", "x", "y"), "vertex", "left"
        ).select(
            "vertex", "mass",
            F.coalesce("x", _hash_unit(F.col("vertex"), seed, 1)).alias("x"),
            F.coalesce("y", _hash_unit(F.col("vertex"), seed, 2)).alias("y"),
        )
    else:
        state = verts.select(
            "vertex", "mass",
            _hash_unit(F.col("vertex"), seed, 1).alias("x"),
            _hash_unit(F.col("vertex"), seed, 2).alias("y"),
        )
    state = (
        state.withColumn("pfx", F.lit(0.0))
        .withColumn("pfy", F.lit(0.0))
        .transform(truncate_plan)
    )

    # iteration-0 bbox comes from the same fused aggregate every later
    # iteration uses; here it is the one extra startup action
    agg0 = state.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).first()
    if agg0[0] is None:  # vertexless graph: nothing to lay out
        edges.unpersist()
        und.unpersist()
        return state.select("vertex", "x", "y")
    bbox = (agg0[0], agg0[1], agg0[2], agg0[3])
    speed = 1.0
    speed_eff = 1.0

    w_att = (
        F.pow(F.col(WGT), F.lit(edge_weight_influence))
        if edge_weight_influence != 1.0
        else F.col(WGT)
    )

    for _ in range(max_iter):
        x0, x1, y0, y1 = bbox
        cw = max((x1 - x0) / grid_cells, _D_EPS)
        ch = max((y1 - y0) / grid_cells, _D_EPS)
        binned = state.select(
            "vertex", "mass", "x", "y", "pfx", "pfy",
            F.least(
                F.floor((F.col("x") - F.lit(x0)) / F.lit(cw)),
                F.lit(grid_cells - 1),
            ).alias("cx"),
            F.least(
                F.floor((F.col("y") - F.lit(y0)) / F.lit(ch)),
                F.lit(grid_cells - 1),
            ).alias("cy"),
        )
        cells = binned.groupBy("cx", "cy").agg(
            F.sum("mass").alias("cmass"),
            (F.sum(F.col("x") * F.col("mass")) / F.sum("mass")).alias("cmx"),
            (F.sum(F.col("y") * F.col("mass")) / F.sum("mass")).alias("cmy"),
        )

        # far-field repulsion: vertex × other-cell centroids (broadcast)
        oc = F.broadcast(
            cells.select(
                F.col("cx").alias("ox"), F.col("cy").alias("oy"),
                "cmass", "cmx", "cmy",
            )
        )
        far = (
            binned.join(
                oc,
                (F.col("cx") != F.col("ox")) | (F.col("cy") != F.col("oy")),
            )
            .select(
                "vertex",
                (F.col("x") - F.col("cmx")).alias("dx"),
                (F.col("y") - F.col("cmy")).alias("dy"),
                (F.col("mass") * F.col("cmass")).alias("mm"),
            )
        )
        # same-cell exact pair repulsion
        other = binned.select(
            F.col("cx").alias("ox"), F.col("cy").alias("oy"),
            F.col("vertex").alias("ov"), F.col("x").alias("oxp"),
            F.col("y").alias("oyp"), F.col("mass").alias("om"),
        )
        near = (
            binned.join(
                other,
                (F.col("cx") == F.col("ox"))
                & (F.col("cy") == F.col("oy"))
                & (F.col("vertex") != F.col("ov")),
            )
            .select(
                "vertex",
                (F.col("x") - F.col("oxp")).alias("dx"),
                (F.col("y") - F.col("oyp")).alias("dy"),
                (F.col("mass") * F.col("om")).alias("mm"),
            )
        )
        d2 = F.greatest(
            F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"),
            F.lit(_D_EPS * _D_EPS),
        )
        rep = (
            far.unionByName(near)
            .select(
                "vertex",
                (F.lit(scaling_ratio) * F.col("mm") * F.col("dx") / d2).alias("fx"),
                (F.lit(scaling_ratio) * F.col("mm") * F.col("dy") / d2).alias("fy"),
            )
        )

        # attraction along (symmetrized) edges
        ps = state.select(
            F.col("vertex").alias(SRC), F.col("x").alias("sx"),
            F.col("y").alias("sy"), F.col("mass").alias("sm"),
        )
        pd_ = state.select(
            F.col("vertex").alias(DST), F.col("x").alias("tx"),
            F.col("y").alias("ty"),
        )
        att_pairs = und.join(ps, SRC).join(pd_, DST)
        adx = F.col("tx") - F.col("sx")
        ady = F.col("ty") - F.col("sy")
        ad = F.sqrt(
            F.greatest(adx * adx + ady * ady, F.lit(_D_EPS * _D_EPS))
        )
        a_mag = F.log1p(ad) / ad if lin_log_mode else F.lit(1.0)
        if outbound_attraction_distribution:
            a_mag = a_mag / F.col("sm")
        att = att_pairs.select(
            F.col(SRC).alias("vertex"),
            (w_att * a_mag * adx).alias("fx"),
            (w_att * a_mag * ady).alias("fy"),
        )

        forces = (
            rep.unionByName(att)
            .groupBy("vertex")
            .agg(F.sum("fx").alias("fx"), F.sum("fy").alias("fy"))
        )

        # gravity toward the origin needs no join — fold it into the
        # state-side update expression (saves a union branch per iter)
        gd = F.sqrt(
            F.greatest(
                F.col("x") * F.col("x") + F.col("y") * F.col("y"),
                F.lit(_D_EPS * _D_EPS),
            )
        )
        g_mag = (
            F.lit(gravity) * F.col("mass")
            if strong_gravity_mode
            else F.lit(gravity) * F.col("mass") / gd
        )
        nxt = (
            state.join(forces, "vertex", "left")
            .select(
                "vertex", "mass", "x", "y", "pfx", "pfy",
                (F.coalesce("fx", F.lit(0.0)) - g_mag * F.col("x")).alias("fx"),
                (F.coalesce("fy", F.lit(0.0)) - g_mag * F.col("y")).alias("fy"),
            )
        )
        dfx = F.col("fx") - F.col("pfx")
        dfy = F.col("fy") - F.col("pfy")
        sfx = F.col("fx") + F.col("pfx")
        sfy = F.col("fy") + F.col("pfy")
        swing_v = F.sqrt(dfx * dfx + dfy * dfy)
        factor = F.lit(speed_eff) / (
            F.lit(1.0) + F.lit(speed_eff) * F.sqrt(swing_v)
        )
        moved = nxt.select(
            "vertex", "mass",
            (F.col("x") + F.col("fx") * factor).alias("x"),
            (F.col("y") + F.col("fy") * factor).alias("y"),
            F.col("fx").alias("pfx"), F.col("fy").alias("pfy"),
            (F.col("mass") * swing_v).alias("sw"),
            (F.col("mass") * F.lit(0.5) * F.sqrt(sfx * sfx + sfy * sfy)).alias("tr"),
        ).transform(truncate_plan)

        # the ONE action: speed aggregates + next iteration's bbox
        row = moved.agg(
            F.sum("sw"), F.sum("tr"),
            F.min("x"), F.max("x"), F.min("y"), F.max("y"),
        ).first()
        g_swing = float(row[0] or 0.0)
        g_traction = float(row[1] or 0.0)
        bbox = (row[2], row[3], row[4], row[5])
        # FA2 adaptive global speed (Jacomy et al. §"speed"): grow
        # toward jitter_tolerance·traction/swing, capped at 1.5×/step
        if g_swing > 0:
            target = jitter_tolerance * g_traction / g_swing
            speed = min(target, 1.5 * speed, 10.0)
        else:
            speed = min(1.5 * speed, 10.0)
        speed_eff = speed
        state = moved.select("vertex", "mass", "x", "y", "pfx", "pfy")
        if callback is not None:
            callback(state.select("vertex", "x", "y"))

    edges.unpersist()
    und.unpersist()
    return state.select("vertex", "x", "y")
