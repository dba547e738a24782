"""MIS / vertex coloring / SCC tests."""

from __future__ import annotations

import pytest

from cugraph_spark import Graph
from cugraph_spark.operators.mis import maximal_independent_set, vertex_coloring
from cugraph_spark.operators.scc import strongly_connected_components
from .conftest import edges_df, make_edges, sym_tuples
from .oracles import scc_ref


@pytest.mark.parametrize("kind", ["tiny_social", "triangle_mesh"])
def test_mis_independent_and_maximal(spark, kind):
    edges = make_edges(kind)
    G = Graph(edges_df(spark, edges), directed=False)
    res = {r["vertex"]: r["in_mis"] for r in maximal_independent_set(G).collect()}
    adj = {}
    for a, b, _ in sym_tuples(edges):
        adj.setdefault(a, set()).add(b)
    mis = {v for v, m in res.items() if m}
    # independent: no edge inside the set
    for v in mis:
        assert not (adj.get(v, set()) & mis), f"edge inside MIS at {v}"
    # maximal: every excluded vertex has a MIS neighbor
    for v, m in res.items():
        if not m:
            assert adj.get(v, set()) & mis, f"{v} could join the MIS"


def test_mis_deterministic(spark):
    edges = make_edges("tiny_social")
    G = Graph(edges_df(spark, edges), directed=False)
    a = sorted(map(tuple, maximal_independent_set(G, seed=1).collect()))
    b = sorted(map(tuple, maximal_independent_set(G, seed=1).collect()))
    assert a == b


def test_vertex_coloring_proper(spark):
    edges = make_edges("triangle_mesh")
    G = Graph(edges_df(spark, edges), directed=False)
    res = {r["vertex"]: r["color"] for r in vertex_coloring(G).collect()}
    for a, b, _ in sym_tuples(edges):
        if a != b:
            assert res[a] != res[b], f"edge {a}-{b} same color"
    assert max(res.values()) + 1 >= 4  # K4 needs ≥4 colors
    assert set(res) == {r["vertex"] for r in G.vertices().collect()}


def test_scc_cycle_and_dag(spark):
    # 0→1→2→0 cycle + 2→3→4 tail
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0), (3, 4, 1.0)]
    G = Graph(edges_df(spark, edges), directed=True)
    got = {r["vertex"]: r["labels"] for r in strongly_connected_components(G).collect()}
    ref = scc_ref(edges)
    assert got == {v: ref[v] for v in got}


@pytest.mark.parametrize("kind", ["directed_asym", "line"])
def test_scc_matches_tarjan(spark, kind):
    edges = make_edges(kind)
    G = Graph(edges_df(spark, edges), directed=True)
    got = {r["vertex"]: r["labels"] for r in strongly_connected_components(G).collect()}
    ref = scc_ref(edges)
    assert got == {v: ref[v] for v in got}


def test_scc_two_cycles(spark):
    edges = [(0, 1, 1.0), (1, 0, 1.0), (2, 3, 1.0), (3, 2, 1.0), (1, 2, 1.0)]
    G = Graph(edges_df(spark, edges), directed=True)
    got = {r["vertex"]: r["labels"] for r in strongly_connected_components(G).collect()}
    assert got[0] == got[1] and got[2] == got[3] and got[0] != got[2]
