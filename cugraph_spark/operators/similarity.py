"""Link prediction similarity — Jaccard / Overlap / Sørensen.

Reference: ``link_prediction/similarity_impl.cuh`` (631 LoC); python
wrappers ``link_prediction/{jaccard,overlap,sorensen}.py``. Semantics
(unweighted variant; similarity_impl.cuh computes |N(a)∩N(b)| per pair
then the coefficient):

- jaccard(a,b)  = |∩| / |N(a) ∪ N(b)| = |∩| / (d(a)+d(b)−|∩|)
- overlap(a,b)  = |∩| / min(d(a), d(b))
- sorensen(a,b) = 2·|∩| / (d(a)+d(b))

Pairs default to all 2-hop-connected vertex pairs (the reference's
default vertex_pair = two-hop pairs, jaccard.py docs); callers can pass
an explicit pair DataFrame.

Spark shape: |∩| for every 2-hop pair falls out of ONE self-join on the
shared neighbor + groupBy(a,b).count — no per-pair set materialization.
Degrees join in afterwards. The common-neighbor join's fan-out is
Σ_w d(w)², the same hub-square term the reference bounds by chunking
(similarity_impl.cuh processes vertex pairs in batches); shared
neighbors above ``hub_threshold`` degree are split/salted explicitly
via ``plans.skew.salted_common_neighbor_join`` so no single task sees a
full d(w)² block (the pair set itself is unchanged — the output IS the
fan-out; salting bounds per-task memory, not total work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, Graph
from ..plans.skew import DEFAULT_HUB_DEGREE, salted_common_neighbor_join


def _pair_intersections(
    G: Graph,
    pairs: DataFrame | None,
    hub_threshold: int = DEFAULT_HUB_DEGREE,
    salt: int = 16,
) -> DataFrame:
    """[a, b, isect, d_a, d_b] for requested (or all 2-hop) pairs a<b."""
    und = (
        G.edges.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    deg = und.groupBy(F.col(SRC).alias("v")).agg(F.count("*").alias("d"))
    # common-neighbor join: (a,w) ⋈ (b,w) with a<b → per-pair count;
    # hot shared-neighbor keys w are salted (see module docstring)
    e1 = und.select(F.col(SRC).alias("a"), F.col(DST).alias("w"))
    e2 = und.select(F.col(SRC).alias("b"), F.col(DST).alias("w"))
    joined = salted_common_neighbor_join(
        e1, e2, "w", hub_threshold=hub_threshold, salt=salt
    )
    isect = (
        joined.filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("isect"))
    )
    if pairs is not None:
        # canonicalize only for the lookup; the output keeps the
        # caller's orientation and multiplicity (reference contract:
        # one result row per input pair row, keyed as given). Left
        # joins + coalesce-0 keep pairs whose endpoint has no edges
        # (degree 0) instead of silently dropping them — the symmetric
        # coefficient formulas don't care which endpoint d_a labels.
        keyed = pairs.select(
            F.col(pairs.columns[0]).alias("pa"),
            F.col(pairs.columns[1]).alias("pb"),
            F.least(pairs.columns[0], pairs.columns[1]).alias("a"),
            F.greatest(pairs.columns[0], pairs.columns[1]).alias("b"),
        )
        return (
            keyed.join(isect, ["a", "b"], "left")
            .join(deg.select(F.col("v").alias("a"), F.col("d").alias("d_a")),
                  "a", "left")
            .join(deg.select(F.col("v").alias("b"), F.col("d").alias("d_b")),
                  "b", "left")
            .select(
                F.col("pa").alias("a"), F.col("pb").alias("b"),
                F.coalesce("isect", F.lit(0)).alias("isect"),
                F.coalesce("d_a", F.lit(0)).alias("d_a"),
                F.coalesce("d_b", F.lit(0)).alias("d_b"),
            )
        )
    return (
        isect.join(deg.select(F.col("v").alias("a"), F.col("d").alias("d_a")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("d_b")), "b")
    )


def _pair_intersections_weighted(
    G: Graph,
    pairs: DataFrame | None,
    hub_threshold: int = DEFAULT_HUB_DEGREE,
    salt: int = 16,
) -> DataFrame:
    """[a, b, w_min, w_union, wd_a, wd_b] for requested (or all 2-hop)
    pairs a<b — the ``use_weight=True`` semantics of
    ``similarity_impl.cuh:130-168``: over common neighbors c,
    intersection weight = Σ min(w_ac, w_bc); union weight =
    Σ max(w_ac, w_bc) + (wdeg_a − Σ w_ac) + (wdeg_b − Σ w_bc); the
    denominators use weighted out-degrees (``weighted_out_degrees``,
    similarity_impl.cuh:84)."""
    from ..graph import WGT

    und = (
        G.edges.select(SRC, DST, WGT)
        .filter(F.col(SRC) != F.col(DST))
        .groupBy(SRC, DST)
        .agg(F.min(WGT).alias("ew"))
    )
    wdeg = und.groupBy(F.col(SRC).alias("v")).agg(F.sum("ew").alias("wd"))
    e1 = und.select(F.col(SRC).alias("a"), F.col(DST).alias("n"), F.col("ew").alias("wa"))
    e2 = und.select(F.col(SRC).alias("b"), F.col(DST).alias("n"), F.col("ew").alias("wb"))
    joined = salted_common_neighbor_join(
        e1, e2, "n", hub_threshold=hub_threshold, salt=salt
    )
    isect = (
        joined.filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.sum(F.least("wa", "wb")).alias("w_min"),
            F.sum(F.greatest("wa", "wb")).alias("w_max"),
            F.sum("wa").alias("w_ia"),
            F.sum("wb").alias("w_ib"),
        )
    )
    if pairs is not None:
        # same contract as the unweighted path: caller orientation and
        # multiplicity preserved, endpoints without edges kept with
        # weighted degree 0 (w_union stays internally consistent — the
        # wd/w_i pairing is canonical on both terms, and every public
        # formula is symmetric in the endpoints)
        keyed = pairs.select(
            F.col(pairs.columns[0]).alias("pa"),
            F.col(pairs.columns[1]).alias("pb"),
            F.least(pairs.columns[0], pairs.columns[1]).alias("a"),
            F.greatest(pairs.columns[0], pairs.columns[1]).alias("b"),
        )
        return (
            keyed.join(isect, ["a", "b"], "left")
            .join(wdeg.select(F.col("v").alias("a"), F.col("wd").alias("wd_a")),
                  "a", "left")
            .join(wdeg.select(F.col("v").alias("b"), F.col("wd").alias("wd_b")),
                  "b", "left")
            .select(
                F.col("pa").alias("a"), F.col("pb").alias("b"),
                *[F.coalesce(c, F.lit(0.0)).alias(c)
                  for c in ("w_min", "w_max", "w_ia", "w_ib",
                            "wd_a", "wd_b")],
            )
            .withColumn(
                "w_union",
                F.col("w_max") + (F.col("wd_a") - F.col("w_ia"))
                + (F.col("wd_b") - F.col("w_ib")),
            )
        )
    return (
        isect.join(wdeg.select(F.col("v").alias("a"), F.col("wd").alias("wd_a")), "a")
        .join(wdeg.select(F.col("v").alias("b"), F.col("wd").alias("wd_b")), "b")
        .withColumn(
            "w_union",
            F.col("w_max") + (F.col("wd_a") - F.col("w_ia"))
            + (F.col("wd_b") - F.col("w_ib")),
        )
    )


def _coeff(num, den):
    """Reference guard: score is 0 when the denominator vanishes
    (jaccard_impl.cuh:34, overlap_impl.cuh:34, sorensen_impl.cuh:34)."""
    return F.when(den <= F.lit(0.0), F.lit(0.0)).otherwise(num / den)


def jaccard(G: Graph, pairs: DataFrame | None = None, use_weight: bool = False,
            hub_threshold: int = DEFAULT_HUB_DEGREE, salt: int = 16) -> DataFrame:
    """[first, second, jaccard_coeff] (reference column names,
    link_prediction/jaccard.py; ``use_weight`` per jaccard.py:62-99)."""
    if G.directed:
        raise ValueError("jaccard requires an undirected graph")
    if use_weight:
        if not G.weighted:
            raise ValueError("use_weight=True requires a weighted graph")
        pi = _pair_intersections_weighted(G, pairs, hub_threshold, salt)
        coeff = _coeff(F.col("w_min"), F.col("w_union"))
    else:
        pi = _pair_intersections(G, pairs, hub_threshold, salt)
        coeff = _coeff(
            F.col("isect"), F.col("d_a") + F.col("d_b") - F.col("isect")
        )
    return pi.select(
        F.col("a").alias("first"), F.col("b").alias("second"),
        coeff.alias("jaccard_coeff"),
    )


def overlap(G: Graph, pairs: DataFrame | None = None, use_weight: bool = False,
            hub_threshold: int = DEFAULT_HUB_DEGREE, salt: int = 16) -> DataFrame:
    """[first, second, overlap_coeff]."""
    if G.directed:
        raise ValueError("overlap requires an undirected graph")
    if use_weight:
        if not G.weighted:
            raise ValueError("use_weight=True requires a weighted graph")
        pi = _pair_intersections_weighted(G, pairs, hub_threshold, salt)
        coeff = _coeff(F.col("w_min"), F.least("wd_a", "wd_b"))
    else:
        pi = _pair_intersections(G, pairs, hub_threshold, salt)
        coeff = _coeff(F.col("isect"), F.least("d_a", "d_b"))
    return pi.select(
        F.col("a").alias("first"), F.col("b").alias("second"),
        coeff.alias("overlap_coeff"),
    )


def sorensen(G: Graph, pairs: DataFrame | None = None, use_weight: bool = False,
            hub_threshold: int = DEFAULT_HUB_DEGREE, salt: int = 16) -> DataFrame:
    """[first, second, sorensen_coeff]."""
    if G.directed:
        raise ValueError("sorensen requires an undirected graph")
    if use_weight:
        if not G.weighted:
            raise ValueError("use_weight=True requires a weighted graph")
        pi = _pair_intersections_weighted(G, pairs, hub_threshold, salt)
        coeff = _coeff(F.lit(2.0) * F.col("w_min"), F.col("wd_a") + F.col("wd_b"))
    else:
        pi = _pair_intersections(G, pairs, hub_threshold, salt)
        coeff = _coeff(F.lit(2.0) * F.col("isect"), F.col("d_a") + F.col("d_b"))
    return pi.select(
        F.col("a").alias("first"), F.col("b").alias("second"),
        coeff.alias("sorensen_coeff"),
    )


def jaccard_coefficient(G: Graph, ebunch: DataFrame | None = None, **kw) -> DataFrame:
    """NetworkX-compat export (link_prediction/jaccard.py:
    ``jaccard_coefficient``) — jaccard over an optional pair list."""
    return jaccard(G, pairs=ebunch, **kw)


def overlap_coefficient(G: Graph, ebunch: DataFrame | None = None, **kw) -> DataFrame:
    """NetworkX-compat export — overlap over an optional pair list."""
    return overlap(G, pairs=ebunch, **kw)


def sorensen_coefficient(G: Graph, ebunch: DataFrame | None = None, **kw) -> DataFrame:
    """NetworkX-compat export — sorensen over an optional pair list."""
    return sorensen(G, pairs=ebunch, **kw)
