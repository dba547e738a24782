"""API-parity surface: the reference's remaining python exports
(cugraph/__init__.py:14-110) re-created on Spark — converters,
predicates, traversal aliases, multi-source BFS, max spanning tree,
clustering analysis scorers, modularity-maximization spectral."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cugraph_spark import (
    Graph,
    analyze_clustering_edge_cut,
    analyze_clustering_modularity,
    analyze_clustering_ratio_cut,
    connected_components,
    filter_unreachable,
    maximum_spanning_tree,
    minimum_spanning_tree,
    multi_source_bfs,
    rw_path,
    shortest_path_length,
    spectral_modularity_maximization_clustering,
)


def _g(spark, rows, directed=False):
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph(e, directed=directed, weighted=True)


def test_converters_roundtrip(spark):
    rows = [(0, 1, 2.0), (1, 2, 3.0)]
    G = _g(spark, rows, directed=True)
    pdf = G.to_pandas_edgelist()
    assert len(pdf) == 2
    adj = G.to_pandas_adjacency()
    assert adj.loc[0, 1] == 2.0 and adj.loc[1, 2] == 3.0 and adj.loc[2, 0] == 0.0
    arr = G.to_numpy_array()
    G2 = Graph.from_numpy_array(spark, arr, directed=True)
    back = sorted((r["src"], r["dst"], r["weight"]) for r in G2.edges.collect())
    assert back == sorted((s, d, w) for s, d, w in rows)


def test_predicates(spark):
    G = _g(spark, [(0, 1, 1.0)], directed=False)
    assert G.is_weighted() and not G.is_directed()
    assert not G.is_multigraph() and not G.is_bipartite()
    assert not G.is_renumbered()


def test_multi_source_bfs_matches_single(spark):
    from cugraph_spark import bfs

    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (4, 5, 1.0)]
    G = _g(spark, rows, directed=True)
    srcs = spark.createDataFrame([(0,), (4,)], "source long")
    got = {
        (r["source"], r["vertex"]): (r["distance"], r["predecessor"])
        for r in multi_source_bfs(G, srcs).collect()
    }
    single = {
        r["vertex"]: (r["distance"], r["predecessor"])
        for r in bfs(G, 0).collect()
        if r["distance"] >= 0
    }
    for v, dp in single.items():
        assert got[(0, v)] == dp, v
    assert got[(4, 5)] == (1, 4)
    assert (0, 5) not in got  # unreached pairs absent by contract


def test_shortest_path_aliases_and_filter(spark):
    rows = [(0, 1, 2.0), (1, 2, 3.0), (5, 6, 1.0)]
    G = _g(spark, rows, directed=True)
    spl = shortest_path_length(G, 0)
    assert set(spl.columns) == {"vertex", "distance"}
    reach = {r["vertex"]: r["distance"] for r in filter_unreachable(spl).collect()}
    assert reach == {0: 0.0, 1: 2.0, 2: 5.0}


def test_maximum_spanning_tree(spark):
    # square with one heavy diagonal: MaxST keeps the heaviest 3 edges
    rows = [(0, 1, 1.0), (1, 2, 5.0), (2, 3, 4.0), (3, 0, 3.0)]
    G = _g(spark, rows, directed=False)
    mx = sorted(
        (r["src"], r["dst"], r["weight"]) for r in maximum_spanning_tree(G).collect()
    )
    assert mx == [(1, 2, 5.0), (2, 3, 4.0), (3, 0, 3.0)] or mx == [
        (0, 3, 3.0), (1, 2, 5.0), (2, 3, 4.0)]
    mn = {r["weight"] for r in minimum_spanning_tree(G).collect()}
    assert 1.0 in mn and 5.0 not in mn


def test_connected_components_dispatch(spark):
    rows = [(0, 1, 1.0), (2, 3, 1.0)]
    G = _g(spark, rows, directed=False)
    w = connected_components(G, connection="weak")
    assert w.select(F.countDistinct("labels")).first()[0] == 2
    Gd = _g(spark, [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0)], directed=True)
    s = connected_components(Gd, connection="strong")
    labs = {r["vertex"]: r["labels"] for r in s.collect()}
    assert labs[0] == labs[1] and labs[2] != labs[0]


def test_rw_path_shapes(spark):
    from cugraph_spark import random_walks

    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)]
    G = _g(spark, rows, directed=True)
    starts = spark.createDataFrame([(0,), (1,)], "v long")
    walks = random_walks(G, starts, max_depth=3, seed=7)
    paths = rw_path(walks).collect()
    assert len(paths) == 2
    for p in paths:
        assert p["path_length"] == len(p["path"]) == 4  # cycle: never stops


def test_clustering_analysis_scorers(spark):
    # two triangles joined by one bridge edge
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
            (3, 4, 1.0), (4, 5, 1.0), (5, 3, 1.0), (2, 3, 1.0)]
    G = _g(spark, rows, directed=False)
    labels = spark.createDataFrame(
        [(v, 0 if v < 3 else 1) for v in range(6)], "vertex long, cluster long"
    )
    assert abs(analyze_clustering_edge_cut(G, labels) - 1.0) < 1e-12
    # ratio cut: cut(c)=1 each, sizes 3,3 -> 1/3 + 1/3
    assert abs(analyze_clustering_ratio_cut(G, labels) - 2.0 / 3.0) < 1e-12
    q = analyze_clustering_modularity(G, labels)
    # the natural 2-clustering of two bridged triangles is strongly modular
    assert q > 0.3


def test_spectral_modularity_maximization(spark):
    # two 4-cliques plus a weak bridge: modularity-max spectral must
    # recover the cliques as the 2 clusters
    rows = [(a, b, 1.0) for c in (0, 4) for a in range(c, c + 4)
            for b in range(a + 1, c + 4)] + [(3, 4, 0.1)]
    G = _g(spark, rows, directed=False)
    out = {r["vertex"]: r["cluster"]
           for r in spectral_modularity_maximization_clustering(G, 2, seed=3).collect()}
    left = {out[v] for v in range(4)}
    right = {out[v] for v in range(4, 8)}
    assert len(left) == 1 and len(right) == 1 and left != right


# ---- scalar/utility surface (SURVEY §2.5) ----


def test_ensure_graph_obj_coercions(spark):
    import pandas as pd

    from cugraph_spark import ensure_graph_obj

    rows = [(0, 1, 2.0), (1, 2, 3.0)]
    G = _g(spark, rows, directed=True)
    same, t = ensure_graph_obj(G)
    assert same is G and t is type(G)

    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    g2, t2 = ensure_graph_obj(df, directed=True)
    assert g2.edges.count() == 2 and g2.weighted

    pdf = pd.DataFrame(rows, columns=["src", "dst", "weight"])
    g3, _ = ensure_graph_obj(pdf, directed=True, spark=spark)
    assert g3.edges.count() == 2

    try:
        ensure_graph_obj(42)
        assert False, "expected TypeError"
    except TypeError:
        pass


def test_df_score_to_dictionary(spark):
    from cugraph_spark import df_score_to_dictionary

    df = spark.createDataFrame(
        [(0, 0.5), (1, 0.25), (2, 0.25)], "vertex long, pagerank double"
    )
    d = df_score_to_dictionary(df, "pagerank")
    assert d == {0: 0.5, 1: 0.25, 2: 0.25}
    try:
        df_score_to_dictionary(df, "pagerank", max_rows=2)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_harmonize_scores(spark):
    from cugraph_spark import harmonize_scores

    df = spark.createDataFrame([(0, 1), (1, 2)], "vertex int, values int")
    out = harmonize_scores(df)
    assert out.schema.simpleString() == "struct<vertex:bigint,values:double>"


def test_bfs_edges_alias(spark):
    """bfs_edges forwards to bfs (reference traversal/bfs.py:256-330)
    and rejects the parameters the reference itself rejects."""
    import pytest

    from cugraph_spark import bfs, bfs_edges
    from cugraph_spark.graph import Graph
    from .conftest import edges_df, make_edges

    G = Graph(edges_df(spark, make_edges("tiny_social")), directed=False)
    a = sorted(map(tuple, bfs_edges(G, 0, depth_limit=3).collect()))
    b = sorted(map(tuple, bfs(G, 0, max_depth=3).collect()))
    assert a == b
    with pytest.raises(NotImplementedError):
        bfs_edges(G, 0, reverse=True)
    with pytest.raises(NotImplementedError):
        bfs_edges(G, 0, sort_neighbors=lambda x: x)


def test_module_level_compat_surface(spark):
    """Reference-spelled module-level exports (cugraph/__init__.py):
    a reference user's `import cugraph` call sites keep working with
    `import cugraph_spark as cugraph`."""
    import pandas as pd

    import cugraph_spark as cg

    pdf = pd.DataFrame({"u": [0, 1, 2], "v": [1, 2, 0], "w": [1.0, 2.0, 3.0]})
    G = cg.from_pandas_edgelist(pdf, source="u", destination="v", edge_attr="w")
    assert cg.is_directed(G) and cg.is_weighted(G)
    assert not cg.is_multigraph(G) and not cg.is_bipartite(G)
    out = cg.to_pandas_edgelist(G, source="u", destination="v")
    assert set(out.columns) >= {"u", "v"} and len(out) == 3

    # free-function subgraph over a sequence of ids
    H = cg.induced_subgraph(G, [0, 1])
    assert H.number_of_edges() == 1
    assert cg.subgraph is cg.induced_subgraph

    # from_edgelist accepts a Spark DataFrame too
    sdf = spark.createDataFrame(pdf)
    G2 = cg.from_edgelist(sdf, source="u", destination="v", edge_attr="w")
    assert G2.number_of_edges() == 3
    assert cg.from_cudf_edgelist is cg.from_edgelist

    # adjacency converters
    A = cg.to_numpy_array(G)
    G3 = cg.from_numpy_array(A)
    assert G3.number_of_edges() == 3
    assert cg.to_numpy_matrix is cg.to_numpy_array

    # exceptions module path
    from cugraph_spark.exceptions import FailedToConvergeError

    assert issubclass(FailedToConvergeError, RuntimeError)

    # camelCase spectral spellings are the snake_case callables
    assert cg.spectralBalancedCutClustering is cg.spectral_clustering
    assert cg.analyzeClustering_modularity is cg.analyze_clustering_modularity
    assert cg.symmetrize_ddf is cg.symmetrize_df


def test_graph_class_variants(spark):
    import cugraph_spark as cg

    e = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 2.0), (1, 2, 1.0)],
        "src long, dst long, weight double",
    )
    M = cg.MultiGraph(e, directed=True)
    assert M.is_multigraph()
    assert M.number_of_edges() == 3  # parallel edge retained
    try:
        M.density()
        assert False, "density must raise on MultiGraph"
    except TypeError:
        pass

    T = cg.Tree(e.dropDuplicates(["src", "dst"]), directed=True)
    assert T.tree and not T.is_multigraph()

    B = cg.BiPartiteGraph(e, directed=False)
    assert B.is_bipartite() and B.is_multipartite()
    B.add_nodes_from([0, 1], bipartite="top")
    B.add_nodes_from([2], bipartite="bottom")
    sets = B.sets()
    assert {r["vertex"] for r in sets["top"].collect()} == {0, 1}
    assert cg.is_multipartite(B) and cg.is_bipartite(B)

    N = cg.NPartiteGraph(e, directed=False)
    assert N.is_multipartite() and not N.is_bipartite()


def test_node2vec_module_spelling(spark):
    import cugraph_spark as cg

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)],
        "src long, dst long, weight double",
    )
    G = Graph(e, directed=False, weighted=True)
    walks = cg.node2vec(G, [0, 1], max_depth=3, p=0.5, q=2.0)
    rows = walks.collect()
    assert {r["step"] for r in rows} <= {0, 1, 2, 3}
    assert len({r["walk_id"] for r in rows}) == 2


def test_create_using_directedness(spark):
    """create_using's class decides directedness: MultiGraph (reference
    default undirected) must not silently come back directed."""
    import pandas as pd

    import cugraph_spark as cg

    pdf = pd.DataFrame({"src": [0, 1], "dst": [1, 2], "w": [1.0, 1.0]})
    Gd = cg.from_pandas_edgelist(pdf, edge_attr="w")
    assert Gd.directed
    Gm = cg.from_pandas_edgelist(pdf, edge_attr="w", create_using=cg.MultiGraph)
    assert not Gm.directed
    assert Gm.edges.count() == 4  # symmetrized
    assert isinstance(Gm, cg.MultiGraph)
