"""PropertyGraph + hypergraph builder tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from cugraph_spark import Graph, pagerank
from cugraph_spark.property_graph import PropertyGraph, hypergraph


def _pg(spark):
    pg = PropertyGraph()
    users = spark.createDataFrame(
        [(1, "ann", 34), (2, "bo", 28), (3, "cy", 41)],
        "uid long, name string, age int",
    )
    repos = spark.createDataFrame(
        [(100, "libfoo"), (101, "barapp")], "rid long, repo_name string"
    )
    pg.add_vertex_data(users, "uid", "user")
    pg.add_vertex_data(repos, "rid", "repo")
    follows = spark.createDataFrame(
        [(1, 2, 5.0), (2, 3, 1.0), (3, 1, 2.0)], "u long, v long, strength double"
    )
    stars = spark.createDataFrame(
        [(1, 100, 1.0), (2, 100, 1.0), (3, 101, 1.0)], "u long, r long, w double"
    )
    pg.add_edge_data(follows, ("u", "v"), "follows")
    pg.add_edge_data(stars, ("u", "r"), "stars")
    return pg


def test_property_graph_counts_and_types(spark):
    pg = _pg(spark)
    assert pg.vertex_types() == ["repo", "user"]
    assert pg.edge_types() == ["follows", "stars"]
    assert pg.get_num_edges() == 6
    assert pg.get_num_vertices() == 5


def test_property_graph_retrieval(spark):
    pg = _pg(spark)
    vd = pg.get_vertex_data(types=["user"], columns=["name"])
    assert sorted(r["name"] for r in vd.collect()) == ["ann", "bo", "cy"]
    ed = pg.get_edge_data(types=["follows"])
    assert ed.count() == 3
    assert all(r["strength"] is not None for r in ed.collect())


def test_extract_subgraph_runs_algorithms(spark):
    pg = _pg(spark)
    G = pg.extract_subgraph(edge_types=["follows"], weight_col="strength")
    pr = pagerank(G, tol=1e-6, max_iter=100)
    total = pr.agg(F.sum("pagerank")).first()[0]
    assert abs(total - 1.0) < 1e-9
    assert pr.count() == 3


def test_extract_subgraph_filter(spark):
    pg = _pg(spark)
    G = pg.extract_subgraph(
        edge_types=["follows"], edge_filter="strength > 1.5"
    )
    assert G.edges.count() == 2


def test_annotate_dataframe(spark):
    pg = _pg(spark)
    q = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    out = pg.annotate_dataframe(q, "a", "b", edge_types=["follows"])
    got = {(r["a"], r["b"]): r["strength"] for r in out.collect()}
    assert got == {(1, 2): 5.0, (2, 3): 1.0}


def test_hypergraph_bipartite(spark):
    df = spark.createDataFrame(
        [(0, "x", "p"), (1, "x", "q"), (2, "y", None)],
        "row_id long, c1 string, c2 string",
    )
    e = hypergraph(df)
    got = {(r["src"], r["dst"]) for r in e.collect()}
    assert ("row::0", "c1::x") in got and ("row::0", "c2::p") in got
    assert ("row::2", "c1::y") in got
    assert not any(d.endswith("::None") for _, d in got)
    # bipartite graph is WCC-connectable through shared values
    G = Graph.from_edgelist(e, weight_col="weight", directed=False, do_renumber=True)
    assert G.number_of_vertices() == 3 + 4  # 3 rows + {c1::x, c1::y, c2::p, c2::q}


def test_hypergraph_rowid_fallback_parallelism_invariant(spark):
    """Without a row_id column, row-node ids come from a content hash —
    the SAME edges at any partition count (the round-2
    monotonically_increasing_id fallback renamed row-nodes per
    layout)."""
    rows = [("a%d" % i, "b%d" % (i % 3)) for i in range(30)]
    d1 = spark.createDataFrame(rows, "c1 string, c2 string").repartition(2)
    d8 = spark.createDataFrame(rows, "c1 string, c2 string").repartition(8)
    e1 = sorted(map(tuple, hypergraph(d1).collect()))
    e8 = sorted(map(tuple, hypergraph(d8).collect()))
    assert e1 == e8
    # 30 distinct rows → 30 distinct row-nodes (hash identity)
    assert len({s for s, _d, _w in e1 if s.startswith("row::")}) == 30


def test_hypergraph_rowid_fallback_duplicates_collapse(spark):
    """SET semantics under the content-hash fallback: exact duplicate
    rows collapse to ONE row-node with weight-1 edges — not one
    row-node with accumulated weight-2 edges."""
    df = spark.createDataFrame(
        [("x", "p"), ("x", "p"), ("y", "q")], "c1 string, c2 string"
    )
    e = hypergraph(df)
    got = {(r["src"], r["dst"]): r["weight"] for r in e.collect()}
    assert len({s for s, _d in got}) == 2  # two distinct rows
    assert all(w == 1.0 for w in got.values())


def test_hypergraph_direct(spark):
    df = spark.createDataFrame(
        [(0, "x", "p"), (1, "x", "q")], "row_id long, c1 string, c2 string"
    )
    e = hypergraph(df, direct=True)
    got = {(r["src"], r["dst"]): r["weight"] for r in e.collect()}
    assert got[("c1::x", "c2::p")] == 1.0
    assert got[("c1::x", "c2::q")] == 1.0
    assert len(got) == 2


def test_property_graph_selection_surface(spark):
    pg = PropertyGraph()
    v = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None), (3, "b", 30)], "vid long, kind string, score long"
    )
    pg.add_vertex_data(v, vertex_col_name="vid", type_name="user")
    e = spark.createDataFrame([(1, 2, 5.0), (2, 3, 7.0)], "s long, d long, amt double")
    pg.add_edge_data(e, vertex_col_names=("s", "d"), type_name="paid")

    assert pg.vertex_property_names() == ["kind", "score"]
    assert pg.edge_property_names() == ["amt"]
    assert pg.get_vertices().count() == 3
    sel = pg.select_vertices("kind = 'a'")
    assert sorted(r["vertex"] for r in sel.collect()) == [1, 2]
    assert pg.select_edges("amt > 6").count() == 1
    pg.fillna_vertices(0)
    assert pg.get_vertex_data().filter("score IS NULL").count() == 0


def test_hypergraph_categories(spark):
    # reference categories knob: columns mapped to the same category
    # share one value-node namespace (cat::value)
    df = spark.createDataFrame(
        [(1, "x", "y")], "row_id long, c1 string, c2 string"
    )
    e = hypergraph(df, categories={"c1": "cat", "c2": "cat"})
    assert {r["dst"] for r in e.collect()} == {"cat::x", "cat::y"}
    e2 = hypergraph(df)
    assert {r["dst"] for r in e2.collect()} == {"c1::x", "c2::y"}
