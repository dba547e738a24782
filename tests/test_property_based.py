"""Property-based randomized testing (hypothesis) — arbitrary small
graphs vs the pure-python golden oracles.

The reference validates against networkx on a fixed dataset zoo
(SURVEY.md §5.1); hypothesis extends that contract to adversarially
generated inputs: multi-edges, self-loops, sparse id spaces,
disconnected blobs — shapes a fixed zoo misses. Example counts are kept
small because each example is a real Spark job (~seconds);
``derandomize=True`` keeps the corpus CI-stable while still diverse
across examples.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cugraph_spark import (
    Graph,
    bfs,
    pagerank,
    sssp,
    triangle_count,
    weakly_connected_components,
)
from cugraph_spark.operators.centrality import hits, katz_centrality
from cugraph_spark.operators.cores import core_number
from cugraph_spark.operators.label_propagation import label_propagation
from cugraph_spark.operators.scc import strongly_connected_components
from cugraph_spark.operators.similarity import jaccard
from cugraph_spark.operators.tree import minimum_spanning_tree
from .conftest import edges_df, sym_tuples
from .oracles import (
    bfs_ref,
    core_number_ref,
    hits_ref,
    jaccard_ref,
    katz_ref,
    lpa_ref,
    mst_ref,
    pagerank_ref,
    scc_ref,
    sssp_ref,
    triangle_ref,
    wcc_ref,
)

# Edge tuples over <=12 vertex ids (possibly sparse), weights in
# [0.5, 4]; lists may contain duplicates (multi-edges) and self-loops —
# both must be handled.
_edge = st.tuples(
    st.integers(min_value=0, max_value=11),
    st.integers(min_value=0, max_value=11),
    st.floats(min_value=0.5, max_value=4.0, allow_nan=False, width=32),
)
_edge_lists = st.lists(_edge, min_size=1, max_size=40)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,  # Spark actions are seconds, not ms
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.differing_executors],
    derandomize=True,
)


def _min_dedup(edges):
    kept = {}
    for a, b, w in edges:
        kept[(a, b)] = min(kept.get((a, b), float("inf")), w)
    return [(a, b, w) for (a, b), w in sorted(kept.items())]


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_pagerank_random_graphs(spark, edges):
    G = Graph(edges_df(spark, edges), directed=True)
    got = {r["vertex"]: r["pagerank"] for r in pagerank(G, tol=1e-8).collect()}
    # PageRank's vertex universe is the ids PRESENT in the edge list —
    # compact to dense ids for the array-indexed oracle so absent ids
    # don't count as extra dangling vertices.
    dedup = _min_dedup(edges)
    vs = sorted({v for a, b, _ in dedup for v in (a, b)})
    idx = {v: i for i, v in enumerate(vs)}
    ref, _, _ = pagerank_ref(
        [(idx[a], idx[b], w) for a, b, w in dedup], n=len(vs), tol=1e-10
    )
    assert sorted(got) == vs
    assert np.allclose([got[v] for v in vs], [ref[idx[v]] for v in vs], atol=1e-6)


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_wcc_random_graphs(spark, edges):
    G = Graph(edges_df(spark, edges), directed=False)
    got = {r["vertex"]: r["labels"] for r in weakly_connected_components(G).collect()}
    ref = wcc_ref(edges)
    assert got == {v: int(ref[v]) for v in sorted(got)}


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_triangle_count_random_graphs(spark, edges):
    no_loops = [(a, b, w) for a, b, w in edges if a != b] or [(0, 1, 1.0)]
    G = Graph(edges_df(spark, no_loops), directed=False)
    got = {r["vertex"]: r["counts"] for r in triangle_count(G).collect()}
    ref = triangle_ref(sym_tuples(no_loops))
    assert got == {v: int(ref[v]) for v in sorted(got)}


def _compact(edges):
    """Map sparse ids to dense 0..n-1 (for oracles whose normalization
    sums run over the whole 0..max_id array, where absent ids would
    otherwise count as extra zero/β-valued vertices)."""
    dedup = _min_dedup(edges)
    vs = sorted({v for a, b, _ in dedup for v in (a, b)})
    idx = {v: i for i, v in enumerate(vs)}
    return [(idx[a], idx[b], w) for a, b, w in dedup], vs, idx


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_katz_random_graphs(spark, edges):
    # α below 1/λmax for any generated graph (≤40 edges × w ≤ 4 bounds
    # the max weighted in-degree, hence the spectral radius, by 160)
    dense, vs, idx = _compact(edges)
    G = Graph(edges_df(spark, edges), directed=True)
    got = {r["vertex"]: r["katz_centrality"]
           for r in katz_centrality(G, alpha=0.002, max_iter=40).collect()}
    ref = katz_ref(dense, n=len(vs), alpha=0.002, max_iter=40)
    assert sorted(got) == vs
    assert np.allclose([got[v] for v in vs], [ref[idx[v]] for v in vs], atol=1e-6)


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_hits_random_graphs(spark, edges):
    G = Graph(edges_df(spark, edges), directed=True)
    got = {r["vertex"]: (r["hubs"], r["authorities"])
           for r in hits(G, max_iter=30, tol=1e-7).collect()}
    h_ref, a_ref = hits_ref(_min_dedup(edges), max_iter=30, tol=1e-7)
    for v, (h, a) in got.items():
        assert abs(h - h_ref[v]) < 1e-4
        assert abs(a - a_ref[v]) < 1e-4


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_core_number_random_graphs(spark, edges):
    no_loops = [(a, b, w) for a, b, w in edges if a != b] or [(0, 1, 1.0)]
    G = Graph(edges_df(spark, no_loops), directed=False)
    got = {r["vertex"]: r["core_number"] for r in core_number(G).collect()}
    ref = core_number_ref(no_loops)
    assert got == {v: int(ref[v]) for v in sorted(got)}


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_scc_random_graphs(spark, edges):
    G = Graph(edges_df(spark, edges), directed=True)
    got = {r["vertex"]: r["labels"]
           for r in strongly_connected_components(G).collect()}
    ref = scc_ref(_min_dedup(edges))
    assert got == {v: ref[v] for v in got}


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_lpa_random_graphs(spark, edges):
    G = Graph(edges_df(spark, edges), directed=False)
    got = {r["vertex"]: r["labels"]
           for r in label_propagation(G, max_iter=20).collect()}
    ref, _ = lpa_ref(sym_tuples(edges), max_iter=20)
    assert got == {v: int(ref[v]) for v in sorted(got)}


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_jaccard_random_graphs(spark, edges):
    no_loops = [(a, b, w) for a, b, w in edges if a != b] or [(0, 1, 1.0)]
    G = Graph(edges_df(spark, no_loops), directed=False)
    jac = {(r["first"], r["second"]): r["jaccard_coeff"]
           for r in jaccard(G).collect()}
    ref = jaccard_ref(sym_tuples(no_loops))
    assert set(jac) == set(ref)
    for (a, b), (isect, da, db) in ref.items():
        assert abs(jac[(a, b)] - isect / (da + db - isect)) < 1e-12


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_mst_random_graphs(spark, edges):
    no_loops = [(a, b, w) for a, b, w in edges if a != b] or [(0, 1, 1.0)]
    G = Graph(edges_df(spark, no_loops), directed=False)
    got = [(min(r["src"], r["dst"]), max(r["src"], r["dst"]), r["weight"])
           for r in minimum_spanning_tree(G).collect()]
    ref = mst_ref(no_loops)
    # forest weight is unique (ties may swap same-weight edges);
    # edge COUNT is graph-determined: n_vertices - n_components
    assert len(got) == len(ref)
    assert abs(sum(w for _, _, w in got) - sum(w for _, _, w in ref)) < 1e-9


@settings(**_SETTINGS)
@given(edges=_edge_lists, source=st.integers(min_value=0, max_value=11))
def test_bfs_sssp_random_graphs(spark, edges, source):
    # ensure the source exists in the vertex set
    edges = edges + [(source, source, 1.0)]
    G = Graph(edges_df(spark, edges), directed=True)

    got_b = {r["vertex"]: r["distance"] for r in bfs(G, source).collect()}
    dist, _pred = bfs_ref(edges, source, directed=True)
    assert got_b == {v: int(dist[v]) for v in sorted(got_b)}

    got_s = {r["vertex"]: r["distance"] for r in sssp(G, source).collect()}
    ref_s = sssp_ref(edges, source)
    for v in sorted(got_s):
        if ref_s[v] is None:
            assert got_s[v] is None
        else:
            assert got_s[v] is not None and abs(got_s[v] - ref_s[v]) < 1e-9


@settings(**_SETTINGS)
@given(edges=_edge_lists)
def test_vertex_coloring_random_graphs(spark, edges):
    # Jones-Plassmann greedy rewrite: proper (no monochromatic edge),
    # complete (every vertex colored exactly once), and <= delta+1
    # colors — checked on adversarial multi-edge/self-loop inputs.
    from cugraph_spark.operators.mis import vertex_coloring

    G = Graph(edges_df(spark, edges), directed=False)
    rows = vertex_coloring(G).collect()
    color = {}
    for r in rows:
        assert r["vertex"] not in color, "vertex colored twice"
        color[r["vertex"]] = r["color"]
    verts = {v for a, b, _ in edges for v in (a, b)}
    assert set(color) == verts
    deg: dict = {}
    for a, b, _ in _min_dedup(edges):
        if a != b:
            assert color[a] != color[b]
            for u, v in ((a, b), (b, a)):
                deg.setdefault(u, set()).add(v)
    delta = max((len(s) for s in deg.values()), default=0)
    assert max(color.values(), default=0) <= delta
