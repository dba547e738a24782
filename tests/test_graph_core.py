"""Graph structure operators vs hand semantics + oracles
(mirrors the reference unit surface: symmetrize, renumber, degrees,
out-weight sums, self-loop / multi-edge handling)."""

import numpy as np
import pytest

from cugraph_spark import Graph, renumber, symmetrize, unrenumber
from cugraph_spark.graph import remove_self_loops

from .conftest import edges_df, make_edges, sym_tuples


def test_symmetrize_min_weight_dedup(spark):
    # conflicting duplicate (a,b) directions keep the MIN weight
    # (reference symmetrize.py:85-100)
    df = edges_df(spark, [(0, 1, 5.0), (1, 0, 2.0), (2, 3, 1.0)])
    got = {(r.src, r.dst): r.weight for r in symmetrize(df).collect()}
    assert got == {(0, 1): 2.0, (1, 0): 2.0, (2, 3): 1.0, (3, 2): 1.0}


def test_undirected_graph_is_symmetrized(spark):
    edges = make_edges("weighted")
    G = Graph(edges_df(spark, edges), directed=False)
    got = {(r.src, r.dst) for r in G.edges.collect()}
    expect = {(a, b) for a, b, _ in sym_tuples(edges)}
    assert got == expect


def test_self_loop_removal(spark):
    df = edges_df(spark, make_edges("self_loops"))
    out = remove_self_loops(df)
    assert out.filter("src = dst").count() == 0
    assert out.count() == df.count() - 2


def test_multi_edge_dedup_min(spark):
    edges = make_edges("multi_edge")
    G = Graph(edges_df(spark, edges), directed=True, multi_edge=False)
    # (src,dst) pairs unique; conflicting weights resolved to min
    base = make_edges("weighted")
    a, b, w0 = base[3]
    got = G.edges.filter(f"src = {a} and dst = {b}").first()
    assert got.weight == min(w0, 0.5)
    assert G.edges.groupBy("src", "dst").count().filter("count > 1").count() == 0


def test_renumber_roundtrip_string_ids(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 3.0), ("z", "a", 1.0)],
        "src string, dst string, weight double",
    )
    e, mapping = renumber(df)
    assert dict(e.dtypes)["src"] == "bigint"
    ids = [r.id for r in mapping.collect()]
    assert sorted(ids) == list(range(4))  # dense [0, V)
    # deterministic: ordered by external id
    m = {r.external: r.id for r in mapping.collect()}
    assert m == {"a": 0, "b": 1, "c": 2, "z": 3}
    # unrenumber restores external ids
    res = e.groupBy("src").count().withColumnRenamed("src", "vertex")
    back = unrenumber(res, mapping, "vertex")
    assert {r.vertex for r in back.collect()} <= {"a", "b", "c", "z"}


def test_degrees_and_out_weight_sums(spark):
    edges = make_edges("weighted")
    G = Graph(edges_df(spark, edges), directed=True)
    src, dst = [e[0] for e in edges], [e[1] for e in edges]
    n = max(max(src), max(dst)) + 1
    outd = np.zeros(n, dtype=int)
    ind = np.zeros(n, dtype=int)
    ows = np.zeros(n)
    for a, b, w in edges:
        outd[a] += 1
        ind[b] += 1
        ows[a] += w
    got_out = {r.vertex: r.out_degree for r in G.out_degree().collect()}
    got_in = {r.vertex: r.in_degree for r in G.in_degree().collect()}
    got_ows = {r.vertex: r.ows for r in G.out_weight_sums().collect()}
    for v in got_out:
        assert got_out[v] == outd[v]
        assert got_in[v] == ind[v]
        assert got_ows[v] == pytest.approx(ows[v])


def test_two_hop_neighbors(spark):
    df = edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)])
    G = Graph(df, directed=True)
    got = {(r.first, r.second) for r in G.two_hop_neighbors().collect()}
    assert got == {(0, 2), (1, 3)}


def test_induced_subgraph(spark):
    edges = make_edges("tiny_social")
    G = Graph(edges_df(spark, edges), directed=True)
    keep = spark.createDataFrame([(v,) for v in range(10)], "vertex long")
    sub = G.induced_subgraph(keep)
    for r in sub.edges.collect():
        assert r.src < 10 and r.dst < 10
    expect = sum(1 for a, b, _ in set((a, b, 1.0) for a, b, _ in edges) if a < 10 and b < 10)
    assert sub.edges.count() == expect


def test_introspection(spark):
    df = edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    G = Graph(df, directed=True)
    assert G.number_of_vertices() == 3
    assert G.number_of_edges() == 2
    assert G.has_node(1) and not G.has_node(7)
    assert G.has_edge(0, 1) and not G.has_edge(1, 0)
    Gu = Graph(df, directed=False)
    assert Gu.number_of_edges() == 2
    assert Gu.has_edge(1, 0)


def test_vertex_count_memoized_and_invalidated(spark):
    df = edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    G = Graph(df, directed=True)
    assert G.number_of_vertices() == 3
    # memoized: second call returns the cached count for the same edges
    assert G._nv_cache is not None and G._nv_cache[1] == 3
    assert G.number_of_vertices() == 3
    # rebinding edges (community._as_graph / mst negation style) invalidates
    G.edges = edges_df(spark, [(0, 1, 1.0)])
    assert G.number_of_vertices() == 2
    # __new__-built views (induced_subgraph/reverse) start with the
    # class-level defaults, not a stale instance cache
    H = Graph.__new__(Graph)
    H.edges = edges_df(spark, [(5, 6, 1.0), (6, 7, 1.0), (7, 8, 1.0)])
    H.directed = True
    assert H.pre_partitioned is False
    assert H.number_of_vertices() == 4


def test_undirected_multigraph_keeps_parallel_edges(spark):
    from cugraph_spark import MultiGraph

    e = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 3.0), (1, 2, 1.0)],
        "src long, dst long, weight double",
    )
    M = MultiGraph(e)  # directed defaults to False
    # parallel edges survive the multigraph symmetrize (the simple
    # path's min-weight groupBy used to collapse them)
    assert M.edges.count() == 6  # 3 undirected edges x 2 orientations
    assert M.number_of_edges() == 3
    ws = sorted(r.weight for r in M.edges.filter("src = 0 AND dst = 1").collect())
    assert ws == [1.0, 3.0]


def test_number_of_edges_undirected_self_loop(spark):
    df = edges_df(spark, [(0, 1, 1.0), (2, 2, 1.0)])
    G = Graph(df, directed=False)
    # self-loops are stored once in the symmetrized layout; a plain
    # count//2 used to halve them away
    assert G.number_of_edges() == 2
    assert G.edges.count() == 3


def test_non_numeric_ids_raise_without_renumber(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, weight double"
    )
    with pytest.raises(ValueError, match="non-numeric"):
        Graph(df)
    # the renumbering path handles any id type
    G = Graph.from_edgelist(df, weight_col="weight", do_renumber=True)
    assert G.number_of_vertices() == 2
