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
from .conftest import edges_df, sym_tuples
from .oracles import bfs_ref, pagerank_ref, sssp_ref, triangle_ref, wcc_ref

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
