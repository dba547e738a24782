"""Hungarian/auction assignment + Force Atlas 2 layout.

Assignment contract mirrors the reference
``python/cugraph/cugraph/linear_assignment/lap.py`` (min-cost perfect
matching on the worker side, (cost, [vertex, assignment]) return);
optimality is checked against brute-force permutation enumeration —
the same ground truth the reference's test_hungarian.py draws from
scipy.optimize.linear_sum_assignment.

Layout contract mirrors ``cugraph.force_atlas2`` (return [vertex, x,
y]; finite, deterministic): quality is checked structurally — two
bridged cliques must end up with intra-clique distances smaller than
cross-clique distances (the reference's trustworthiness score test in
tests/layout/test_force_atlas2.py plays the same role).
"""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from cugraph_spark.graph import Graph
from cugraph_spark.operators.assignment import dense_hungarian, hungarian
from cugraph_spark.operators.layout import force_atlas2

from .conftest import edges_df


def brute_min_cost(cost):
    n = len(cost)
    best = math.inf
    for perm in itertools.permutations(range(n)):
        c = sum(cost[i][perm[i]] for i in range(n))
        best = min(best, c)
    return best


@pytest.fixture(scope="module")
def cost6():
    # deterministic integer costs, same formula as the driver fixture
    return [[(i * 7 + j * 11) % 23 for j in range(6)] for i in range(6)]


def test_hungarian_optimal_cost(spark, cost6):
    rows = [
        (i, 100 + j, float(cost6[i][j]))
        for i in range(6)
        for j in range(6)
    ]
    G = Graph(edges_df(spark, rows), directed=True, weighted=True)
    workers = spark.createDataFrame([(i,) for i in range(6)], "vertex long")
    cost, df = hungarian(G, workers)
    got = {r["vertex"]: r["assignment"] for r in df.collect()}
    # perfect matching on the worker side, jobs distinct
    assert sorted(got) == list(range(6))
    assert len(set(got.values())) == 6
    # auction with integer costs and eps < 1/n is exactly optimal
    assert cost == pytest.approx(brute_min_cost(cost6))
    # returned cost is consistent with the returned assignment
    assert cost == pytest.approx(
        sum(cost6[i][got[i] - 100] for i in range(6))
    )


def test_hungarian_unique_optimum_assignment(spark):
    # diagonal-dominant: unique optimum is the identity assignment
    cost = [[0 if i == j else 10 + i + j for j in range(4)] for i in range(4)]
    rows = [(i, 50 + j, float(cost[i][j])) for i in range(4) for j in range(4)]
    G = Graph(edges_df(spark, rows), directed=True, weighted=True)
    workers = spark.createDataFrame([(i,) for i in range(4)], "vertex long")
    total, df = hungarian(G, workers)
    assert total == pytest.approx(0.0, abs=1e-9)
    assert {r["vertex"]: r["assignment"] for r in df.collect()} == {
        i: 50 + i for i in range(4)
    }


def test_hungarian_rectangular_workers_lt_jobs(spark):
    # 2 workers, 3 jobs: worker side saturated, cheapest pair chosen
    cost = {(0, 10): 5.0, (0, 11): 1.0, (0, 12): 9.0,
            (1, 10): 1.0, (1, 11): 1.0, (1, 12): 9.0}
    rows = [(i, j, w) for (i, j), w in cost.items()]
    G = Graph(edges_df(spark, rows), directed=True, weighted=True)
    workers = spark.createDataFrame([(0,), (1,)], "vertex long")
    total, df = hungarian(G, workers)
    got = {r["vertex"]: r["assignment"] for r in df.collect()}
    assert sorted(got) == [0, 1]
    assert len(set(got.values())) == 2
    assert total == pytest.approx(2.0)


def test_dense_hungarian_matches_sparse(spark, cost6):
    flat = [float(c) for row in cost6 for c in row]
    cost, df = dense_hungarian(spark, flat, 6, 6)
    assert cost == pytest.approx(brute_min_cost(cost6))
    got = {r["vertex"]: r["assignment"] for r in df.collect()}
    assert sorted(got) == list(range(6))
    assert sorted(got.values()) == list(range(6))


def two_cliques_bridged():
    e = []
    for base in (0, 10):
        for i in range(6):
            for j in range(i + 1, 6):
                e.append((base + i, base + j, 1.0))
    e.append((0, 10, 1.0))
    return e


def test_fa2_structure_and_finiteness(spark):
    G = Graph(edges_df(spark, two_cliques_bridged()), directed=False, weighted=True)
    pos = force_atlas2(G, max_iter=12, seed=7)
    rows = pos.collect()
    assert len(rows) == 12
    p = {r["vertex"]: (r["x"], r["y"]) for r in rows}
    assert all(math.isfinite(x) and math.isfinite(y) for x, y in p.values())

    def mean_dist(pairs):
        ds = [
            math.dist(p[a], p[b]) for a, b in pairs
        ]
        return sum(ds) / len(ds)

    intra = [(i, j) for base in (0, 10) for i in range(base, base + 6)
             for j in range(i + 1, base + 6)]
    cross = [(i, 10 + j) for i in range(6) for j in range(6)]
    assert mean_dist(intra) < mean_dist(cross)


def test_fa2_deterministic_across_partitionings(spark):
    e = two_cliques_bridged()
    a = force_atlas2(
        Graph(edges_df(spark, e).repartition(1), directed=False, weighted=True),
        max_iter=3, seed=3,
    ).collect()
    b = force_atlas2(
        Graph(edges_df(spark, e).repartition(7), directed=False, weighted=True),
        max_iter=3, seed=3,
    ).collect()
    pa = {r["vertex"]: (r["x"], r["y"]) for r in a}
    pb = {r["vertex"]: (r["x"], r["y"]) for r in b}
    assert set(pa) == set(pb)
    # float-sum order varies across partitionings; positions agree to
    # far tighter than layout meaning (same contract as pagerank's
    # parallelism-invariance tolerance)
    for v in pa:
        assert pa[v][0] == pytest.approx(pb[v][0], abs=1e-6)
        assert pa[v][1] == pytest.approx(pb[v][1], abs=1e-6)


def test_fa2_pos_list_and_strong_gravity(spark):
    G = Graph(edges_df(spark, two_cliques_bridged()), directed=False, weighted=True)
    init = spark.createDataFrame(
        [(v, 0.1 * v, -0.1 * v) for v in range(12)], "vertex long, x double, y double"
    )
    pos = force_atlas2(
        G, max_iter=2, pos_list=init, strong_gravity_mode=True, lin_log_mode=True
    )
    rows = pos.collect()
    assert len(rows) == 12
    assert all(math.isfinite(r["x"]) and math.isfinite(r["y"]) for r in rows)


def test_fa2_prevent_overlapping_rejected(spark):
    G = Graph(edges_df(spark, two_cliques_bridged()), directed=False, weighted=True)
    with pytest.raises(NotImplementedError):
        force_atlas2(G, prevent_overlapping=True)
