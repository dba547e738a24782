"""Leiden / ECG / approximate weighted matching + parity constructors
(from_adjlist, MTX reader, relabel). Contracts mirror the reference
test suites: leiden modularity >= louvain modularity on the same graph
and every leiden community internally connected
(tests/community/test_leiden.py); matching validity + maximality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cugraph_spark.graph import Graph, relabel
from cugraph_spark.operators.community import (
    _refine_partition,
    ecg,
    leiden,
    louvain,
    modularity,
)
from cugraph_spark.operators.matching import approximate_weighted_matching

from .conftest import edges_df, make_edges


def two_cliques():
    """Two K5s bridged by one edge — canonical community structure."""
    e = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                e.append((base + i, base + j, 1.0))
    e.append((4, 10, 1.0))
    return e


def _communities_connected(G, labels_df) -> bool:
    """Every community induces a connected subgraph (checked via the
    same CC refinement leiden uses — one refined label per community)."""
    refined = _refine_partition(G.edges, labels_df)
    counts = (
        labels_df.join(refined, "vertex")
        .groupBy("labels")
        .agg(F.countDistinct("refined").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    return counts == 1


def test_leiden_beats_or_matches_louvain(spark):
    G = Graph(edges_df(spark, two_cliques()), directed=False)
    _, q_lou = louvain(G)
    labels, q_lei = leiden(G)
    assert q_lei >= q_lou - 1e-9
    # partition validity: every vertex exactly once
    n_v = G.number_of_vertices()
    assert labels.count() == n_v
    assert labels.select("vertex").distinct().count() == n_v


def test_leiden_communities_connected(spark):
    # "disjoint" has separate components — a classic badly-connected
    # trap for plain Louvain labels
    for edges in (two_cliques(), make_edges("disjoint")):
        G = Graph(edges_df(spark, edges), directed=False)
        labels, _q = leiden(G, max_iter_per_level=5)
        assert _communities_connected(G, labels)


def test_leiden_modularity_matches_reported(spark):
    G = Graph(edges_df(spark, two_cliques()), directed=False)
    labels, q = leiden(G)
    assert abs(modularity(G, labels) - q) < 1e-9


def test_ecg_valid_partition_and_determinism(spark):
    G = Graph(edges_df(spark, two_cliques()), directed=False)
    labels, q = ecg(G, ensemble_size=3)
    n_v = G.number_of_vertices()
    assert labels.count() == n_v
    assert labels.select("vertex").distinct().count() == n_v
    assert q > 0.0  # community-structured fixture
    labels2, q2 = ecg(G, ensemble_size=3)
    assert q2 == q
    assert sorted(map(tuple, labels.collect())) == sorted(map(tuple, labels2.collect()))


def test_matching_valid_and_maximal(spark):
    edges = make_edges("weighted")
    G = Graph(edges_df(spark, edges), directed=False)
    m, total = approximate_weighted_matching(G)
    rows = {r["vertex"]: r["partner"] for r in m.collect()}
    eset = {}
    for r in G.edges.collect():
        eset[(r["src"], r["dst"])] = r["weight"]
    w_sum = 0.0
    for v, p in rows.items():
        if p == -1:
            continue
        assert rows[p] == v, "partner symmetry"
        assert (v, p) in eset, "matched pairs are real edges"
        w_sum += eset[(v, p)]
    assert abs(w_sum / 2.0 - total) < 1e-9
    # maximality: no edge joins two unmatched vertices
    for (a, b) in eset:
        if a != b:
            assert not (rows[a] == -1 and rows[b] == -1), (a, b)


def test_from_adjlist_roundtrip(spark):
    # CSR of {0→1, 0→2, 1→2, 2→0}
    offsets = [0, 2, 3, 4]
    indices = [1, 2, 2, 0]
    weights = [1.0, 2.0, 3.0, 4.0]
    G = Graph.from_adjlist(spark, offsets, indices, weights, directed=True)
    got = sorted(map(tuple, G.edges.collect()))
    assert got == [(0, 1, 1.0), (0, 2, 2.0), (1, 2, 3.0), (2, 0, 4.0)]


def test_read_mtx(spark, tmp_path):
    from cugraph_spark.sources.mtx import read_mtx

    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% a comment\n"
        "3 3 3\n"
        "1 2 1.5\n"
        "2 3 2.5\n"
        "3 1 3.5\n"
    )
    G = read_mtx(spark, str(p))
    assert G.directed
    got = sorted(map(tuple, G.edges.collect()))
    assert got == [(0, 1, 1.5), (1, 2, 2.5), (2, 0, 3.5)]

    ps = tmp_path / "s.mtx"
    ps.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "3 3 2\n"
        "2 1\n"
        "3 2\n"
    )
    Gs = read_mtx(spark, str(ps))
    assert not Gs.directed
    got = sorted((r["src"], r["dst"]) for r in Gs.edges.collect())
    assert got == [(0, 1), (1, 0), (1, 2), (2, 1)]

    # skew-symmetric would substring-match "symmetric" but needs
    # negated mirror weights — must refuse, not silently mirror
    pk = tmp_path / "k.mtx"
    pk.write_text(
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "2 2 1\n"
        "2 1 3.5\n"
    )
    import pytest

    with pytest.raises(ValueError, match="skew-symmetric"):
        read_mtx(spark, str(pk))


def test_relabel_standalone(spark):
    df = spark.createDataFrame([(0, 10), (1, 11), (2, 12)], "v long, x long")
    mapping = spark.createDataFrame([(0, 100), (2, 200)], "old long, new long")
    out = {r["v"]: r["x"] for r in relabel(df, mapping, ["v"]).collect()}
    assert set(out) == {100, 1, 200}


def test_spectral_clustering_two_cliques(spark):
    from cugraph_spark.operators.spectral import spectral_clustering

    G = Graph(edges_df(spark, two_cliques()), directed=False)
    got = {r["vertex"]: r["cluster"]
           for r in spectral_clustering(G, 2, num_eigen_iters=20).collect()}
    c1 = {got[v] for v in range(5)}
    c2 = {got[v] for v in range(10, 15)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2


def test_spectral_embedding_orthonormal(spark):
    import numpy as np
    from cugraph_spark.operators.spectral import spectral_embedding

    G = Graph(edges_df(spark, two_cliques()), directed=False)
    emb = spectral_embedding(G, 3, num_iters=10)
    M = np.array([[r["e0"], r["e1"], r["e2"]] for r in emb.collect()])
    gram = M.T @ M
    assert np.allclose(gram, np.eye(3), atol=1e-6)
