"""Local-tail equivalence + Spark-exact xxhash64 + louvain/leiden
checkpoint-resume.

The driver-local tails (``plans/local_tail.py``) must be BIT-IDENTICAL
to the distributed loops — same hash stream, same tie-breaks, same
expression trees. Each operator is run twice on the same graph:
``local_tail_edges=0`` (forced distributed) vs a huge threshold (forced
local), and the sorted row sets compared exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cugraph_spark.graph import Graph
from cugraph_spark.operators.community import ecg, leiden, louvain
from cugraph_spark.operators.cores import core_number
from cugraph_spark.operators.mis import maximal_independent_set, vertex_coloring
from cugraph_spark.plans.checkpoint import CheckpointManager
from cugraph_spark.plans.xxh64 import pmod2, xxhash64

from .conftest import make_edges

BIG = 10**9


def _graph(spark, kind="weighted"):
    e = spark.createDataFrame(make_edges(kind), "src long, dst long, weight double")
    return Graph(e, directed=False, weighted=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_xxhash64_matches_spark(spark):
    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [rng.integers(-(2**62), 2**62, 300),
         np.array([0, 1, -1, 2**31, -(2**31), 42])]
    ).astype(np.int64)
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    got = np.array([r[0] for r in df.select(F.xxhash64("v")).collect()])
    assert np.array_equal(got, xxhash64(vals))
    # the (vertex, round-int-lit, seed-int-lit) chain every Luby/move
    # loop draws from
    got2 = np.array(
        [r[0] for r in df.select(
            F.xxhash64(F.col("v"), F.lit(3), F.lit(42))).collect()]
    )
    assert np.array_equal(got2, xxhash64(vals, ("int", 3), ("int", 42)))
    got3 = np.array(
        [r[0] for r in df.select(
            F.pmod(F.xxhash64(F.col("v"), F.lit(5), F.lit(7)), F.lit(2))
        ).collect()]
    )
    assert np.array_equal(got3, pmod2(xxhash64(vals, ("int", 5), ("int", 7))))


@pytest.mark.parametrize("kind", ["weighted", "disjoint", "self_loops"])
def test_coloring_local_equals_distributed(spark, kind):
    G = _graph(spark, kind)
    assert _rows(vertex_coloring(G, local_tail_edges=BIG)) == _rows(
        vertex_coloring(G, local_tail_edges=0)
    )


@pytest.mark.parametrize("kind", ["weighted", "disjoint"])
def test_mis_local_equals_distributed(spark, kind):
    G = _graph(spark, kind)
    assert _rows(maximal_independent_set(G, local_tail_edges=BIG)) == _rows(
        maximal_independent_set(G, local_tail_edges=0)
    )


def test_mis_local_equals_distributed_wide_seed(spark):
    """Seeds >= 2**31 type as LongType through F.lit, so the local
    twin must hash them on the 8-byte path too — forcing the int path
    silently int32-wraps and diverges from the JVM stream."""
    G = _graph(spark, "weighted")
    wide = 2**31 + 12345
    assert _rows(maximal_independent_set(G, seed=wide, local_tail_edges=BIG)) == _rows(
        maximal_independent_set(G, seed=wide, local_tail_edges=0)
    )


@pytest.mark.parametrize("kind", ["weighted", "self_loops"])
def test_core_number_local_equals_distributed(spark, kind):
    G = _graph(spark, kind)
    assert _rows(core_number(G, local_tail_edges=BIG)) == _rows(
        core_number(G, local_tail_edges=0)
    )


def test_louvain_local_equals_distributed(spark):
    G = _graph(spark)
    la, qa = louvain(G, local_tail_edges=BIG)
    lb, qb = louvain(G, local_tail_edges=0)
    assert _rows(la) == _rows(lb)
    assert qa == qb


def test_leiden_local_equals_distributed(spark):
    G = _graph(spark, "disjoint")
    la, qa = leiden(G, local_tail_edges=BIG)
    lb, qb = leiden(G, local_tail_edges=0)
    assert _rows(la) == _rows(lb)
    assert qa == qb


def test_ecg_local_equals_distributed(spark):
    G = _graph(spark)
    la, qa = ecg(G, ensemble_size=3, local_tail_edges=BIG)
    lb, qb = ecg(G, ensemble_size=3, local_tail_edges=0)
    assert _rows(la) == _rows(lb)
    assert qa == qb


def test_move_phase_partial_init_labels_local_equals_distributed(spark):
    """init_labels missing some vertices: the distributed move phase
    drops those vertices via its INNER init join (k still grouped over
    the FULL edge frame first); the local twin's filtering branch
    (``move_phase_local`` init_labels path) must be bit-identical —
    same surviving vertex set, same k, same final labels."""
    from cugraph_spark.operators.community import _move_phase

    G = _graph(spark, "weighted")
    e = G.edges
    two_m = 2.0 * e.agg(F.sum("weight")).first()[0]
    n_edges = e.count()
    # seed labels for a strict subset of the vertices (drop ids > 25),
    # grouped into two coarse communities
    init = (
        G.vertices()
        .filter(F.col("vertex") <= 25)
        .select("vertex", (F.col("vertex") % 2).alias("labels"))
    )
    kw = dict(two_m=two_m, max_iter=5, resolution=1.0, min_gain=1e-9,
              init_labels=init, n_edges=n_edges)
    local = _move_phase(e, local_tail_edges=BIG, **kw)
    dist = _move_phase(e, local_tail_edges=0, **kw)
    assert _rows(local) == _rows(dist)
    # the branch under test actually filtered something
    assert local.count() < G.vertices().count()


def test_louvain_checkpoint_resume_exact(spark, tmp_path):
    """Kill-after-level-0 + resume == uninterrupted run (per-level
    durable state; coarse edges recomputed from the saved assignment)."""
    G = _graph(spark, "disjoint")
    full, q_full = louvain(G)

    cp = CheckpointManager(str(tmp_path), "louv")
    # "killed" run: only level 0 executes, but its acceptance was saved
    louvain(G, max_levels=1, checkpoint=cp)
    assert cp.latest_iteration() == 0
    resumed, q_res = louvain(G, checkpoint=cp, resume=True)
    assert _rows(resumed) == _rows(full)
    assert q_res == q_full


def test_leiden_checkpoint_resume_exact(spark, tmp_path):
    G = _graph(spark, "disjoint")
    full, q_full = leiden(G)

    cp = CheckpointManager(str(tmp_path), "leid")
    leiden(G, max_levels=1, checkpoint=cp)
    if cp.latest_iteration() is None:
        pytest.skip("level 0 not accepted on this fixture")
    resumed, q_res = leiden(G, checkpoint=cp, resume=True)
    assert _rows(resumed) == _rows(full)
    assert q_res == q_full


def test_leiden_torn_checkpoint_resumes_from_last_complete_level(spark, tmp_path):
    """A crash between the main save and the seed-sidecar save leaves
    the main manager one level ahead. resume=True must fall back to the
    last level BOTH managers committed (here: none — fresh start), not
    raise on the missing seed dir forever."""
    import shutil

    G = _graph(spark, "disjoint")
    full, q_full = leiden(G)

    cp = CheckpointManager(str(tmp_path), "leid_torn")
    leiden(G, max_levels=1, checkpoint=cp)
    if cp.latest_iteration() is None:
        pytest.skip("level 0 not accepted on this fixture")
    # simulate the torn save: the seed sidecar of the latest level is gone
    shutil.rmtree(str(tmp_path / "leid_torn_seed"), ignore_errors=True)
    resumed, q_res = leiden(G, checkpoint=cp, resume=True)
    assert _rows(resumed) == _rows(full)
    assert q_res == q_full
