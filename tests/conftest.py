"""Shared fixtures: one SparkSession per test session + deterministic
edge-list micro-fixtures mirroring the reference's modified-karate
family (FIXTURES.md §2: self-loops, multi-edges, isolated vertices,
string ids, disjoint components, power-law hubs)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cugraph_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="cugraph_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


def make_edges(kind: str, seed: int = 42):
    """Deterministic synthetic edge lists as (src, dst, weight) tuples.

    Structural analogs of the reference's test datasets
    (datasets/README.md modified-karate table), regenerated not copied.
    """
    rng = np.random.RandomState(seed)
    if kind == "tiny_social":
        # connected, undirected-intent social graph, 34 vertices
        n = 34
        edges = set()
        for v in range(1, n):
            u = rng.randint(0, v)  # random spanning tree → connected
            edges.add((u, v))
        while len(edges) < 78:
            a, b = rng.randint(0, n), rng.randint(0, n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        return [(a, b, 1.0) for a, b in sorted(edges)]
    if kind == "weighted":
        return [(a, b, float(1 + ((a * 7 + b * 13) % 5)))
                for a, b, _ in make_edges("tiny_social", seed)]
    if kind == "disjoint":
        # two copies of tiny_social offset by 100 → ≥2 components
        base = make_edges("tiny_social", seed)
        return base + [(a + 100, b + 100, w) for a, b, w in base]
    if kind == "self_loops":
        return make_edges("tiny_social", seed) + [(0, 0, 1.0), (5, 5, 2.0)]
    if kind == "multi_edge":
        base = make_edges("weighted", seed)
        return base + [(base[0][0], base[0][1], 9.0), (base[3][0], base[3][1], 0.5)]
    if kind == "isolated":
        # vertex ids 40..42 never appear in edges but exist in [0, n)
        return make_edges("tiny_social", seed)  # callers pass n=43
    if kind == "directed_asym":
        # directed, with dangling vertices (no out-edges)
        base = make_edges("tiny_social", seed)
        return [(a, b, w) for a, b, w in base]  # one direction only
    if kind == "hub":
        # power-law-ish: vertex 0 is a hub imported by everyone
        n = 200
        edges = [(v, 0, 1.0) for v in range(1, n)]
        for v in range(1, n):
            edges.append((v, 1 + (v * 17) % (n - 1), 1.0))
        return [(a, b, w) for a, b, w in edges if a != b]
    if kind == "line":
        return [(i, i + 1, 1.0) for i in range(9)]
    if kind == "triangle_mesh":
        # known triangle structure: K4 plus a pendant path
        k4 = [(a, b, 1.0) for a in range(4) for b in range(a + 1, 4)]
        return k4 + [(3, 4, 1.0), (4, 5, 1.0)]
    raise ValueError(kind)


def edges_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in edges], "src long, dst long, weight double"
    )


def sym_tuples(edges):
    """Symmetrize tuple edge list with min-weight dedup (reference
    symmetrize semantics) for feeding oracles."""
    agg = {}
    for a, b, w in edges:
        for k in ((a, b), (b, a)):
            agg[k] = min(agg.get(k, float("inf")), w)
    return [(a, b, w) for (a, b), w in sorted(agg.items())]
