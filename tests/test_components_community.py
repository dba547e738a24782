"""WCC / label propagation / triangle count vs the numpy golden oracles
(reference validation contracts: SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest

from cugraph_spark import (
    Graph,
    label_propagation,
    triangle_count,
    edge_triangle_count,
    weakly_connected_components,
)
from .conftest import edges_df, make_edges, sym_tuples
from .oracles import lpa_ref, triangle_ref, wcc_ref


def _as_map(rows, k="vertex", v="labels"):
    return {r[k]: r[v] for r in rows}


@pytest.mark.parametrize("kind", ["tiny_social", "disjoint", "line", "hub"])
def test_wcc_matches_oracle(spark, kind):
    edges = make_edges(kind)
    G = Graph(edges_df(spark, edges), directed=False)
    got = _as_map(weakly_connected_components(G).collect())
    ref = wcc_ref(edges)
    present = sorted(got)
    assert got == {v: int(ref[v]) for v in present}


def test_wcc_requires_undirected(spark):
    G = Graph(edges_df(spark, make_edges("tiny_social")), directed=True)
    with pytest.raises(ValueError):
        weakly_connected_components(G)


def test_wcc_self_loops_ok(spark):
    edges = make_edges("self_loops")
    G = Graph(edges_df(spark, edges), directed=False)
    got = _as_map(weakly_connected_components(G).collect())
    ref = wcc_ref(edges)
    assert got == {v: int(ref[v]) for v in sorted(got)}


def test_wcc_min_iter_identical(spark):
    """min_iter forces extra supersteps past the fixpoint (the scaling
    bench's steady-state sampling mode); labels must be unchanged and
    the superstep walls must show the forced rounds actually ran."""
    for kind in ("tiny_social", "disjoint", "hub"):
        edges = make_edges(kind)
        G = Graph(edges_df(spark, edges), directed=False)
        a = _as_map(weakly_connected_components(G).collect())
        walls: list[float] = []
        b = _as_map(
            weakly_connected_components(
                G, min_iter=6, superstep_seconds=walls
            ).collect()
        )
        assert a == b, kind
        assert len(walls) == 6, kind


@pytest.mark.parametrize("kind", ["tiny_social", "weighted", "disjoint"])
def test_lpa_matches_oracle(spark, kind):
    edges = make_edges(kind)
    G = Graph(edges_df(spark, edges), directed=False)
    got = _as_map(label_propagation(G, max_iter=20).collect())
    ref, _ = lpa_ref(sym_tuples(edges))
    assert got == {v: int(ref[v]) for v in sorted(got)}


def test_wcc_check_every_identical(spark):
    """Batched WCC convergence checks must not change labels: a stable
    labeling is a fixpoint of hash-min + pointer-jump, so overshooting
    convergence inside a lazy chain is a no-op."""
    for kind in ("tiny_social", "disjoint", "line", "hub"):
        edges = make_edges(kind)
        G = Graph(edges_df(spark, edges), directed=False)
        a = _as_map(weakly_connected_components(G).collect())
        b = _as_map(weakly_connected_components(G, check_every=3).collect())
        assert a == b, kind


def test_lpa_check_every_identical(spark):
    """Batched convergence checks must not change labels: a stable
    labeling is a fixpoint of the synchronous update, so overshooting
    convergence inside a chain is a no-op."""
    for kind in ("tiny_social", "weighted", "disjoint"):
        edges = make_edges(kind)
        G = Graph(edges_df(spark, edges), directed=False)
        a = _as_map(label_propagation(G, max_iter=20).collect())
        b = _as_map(label_propagation(G, max_iter=20, check_every=4).collect())
        assert a == b, kind


@pytest.mark.parametrize("kind", ["triangle_mesh", "tiny_social", "hub", "disjoint"])
def test_triangle_count_matches_oracle(spark, kind):
    edges = make_edges(kind)
    G = Graph(edges_df(spark, edges), directed=False)
    got = {r["vertex"]: r["counts"] for r in triangle_count(G).collect()}
    ref = triangle_ref(edges)
    assert got == {v: int(ref[v]) for v in sorted(got)}


def test_triangle_count_start_list(spark):
    edges = make_edges("triangle_mesh")
    G = Graph(edges_df(spark, edges), directed=False)
    sl = spark.createDataFrame([(0,), (4,)], "vertex long")
    got = {r["vertex"]: r["counts"] for r in triangle_count(G, start_list=sl).collect()}
    ref = triangle_ref(edges)
    assert got == {0: int(ref[0]), 4: int(ref[4])}


def test_edge_triangle_count_k4(spark):
    # K4: every edge has exactly 2 common neighbors
    edges = [(a, b, 1.0) for a in range(4) for b in range(a + 1, 4)]
    G = Graph(edges_df(spark, edges), directed=False)
    got = {(r["src"], r["dst"]): r["counts"] for r in edge_triangle_count(G).collect()}
    assert got == {(a, b): 2 for a in range(4) for b in range(a + 1, 4)}


def test_total_triangles_is_sum_over_three(spark):
    edges = make_edges("tiny_social")
    G = Graph(edges_df(spark, edges), directed=False)
    counts = np.array([r["counts"] for r in triangle_count(G).collect()])
    assert counts.sum() % 3 == 0


def test_wcc_large_ids_use_long_path(spark):
    """Vertex ids beyond int32 range must skip the narrow-id compaction
    and still produce correct min-id labels (the compact branch is
    bounds-checked, simpleGraph.py:253-258 analog)."""
    big = 5_000_000_000  # > 2^31 - 1
    rows = [(big, big + 1, 1.0), (big + 1, big + 2, 1.0), (7, 8, 1.0)]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    G = Graph(df, directed=False)
    got = _as_map(weakly_connected_components(G).collect())
    assert got[big] == big and got[big + 1] == big and got[big + 2] == big
    assert got[7] == 7 and got[8] == 7
    # output schema stays long either way
    out = weakly_connected_components(G)
    assert dict(out.dtypes) == {"vertex": "bigint", "labels": "bigint"}
