"""Linear assignment (Hungarian-equivalent) via the Bertsekas auction
algorithm — distributed min-cost bipartite matching.

Reference: ``cpp/src/linear_assignment/legacy/hungarian.cu`` (python
``cugraph.hungarian`` / ``cugraph.dense_hungarian``,
``python/cugraph/cugraph/linear_assignment/lap.py:18-88``): lowest-cost
matching of a weighted bipartite graph where ``workers`` is one vertex
side and every worker is assigned exactly one job. The reference runs a
sequential shortest-augmenting-path Hungarian kernel on one GPU; a
row-at-a-time augmenting path is inherently serial, so the Spark-native
equivalent is the *auction algorithm* (Bertsekas 1988) — the standard
parallel/distributed LAP formulation, and the same primal-dual
(ε-complementary-slackness) theory: with integer costs and
ε < 1/n the final assignment is exactly optimal.

Spark shape per round (all-Jacobi bidding — every unassigned worker
bids simultaneously):

1. unassigned workers ⋈ edges ⋈ prices → net value (−cost − price);
2. two groupBy-max passes per worker → best / second-best net
   (no collect_list — hub-degree safe);
3. bid = price(best) + (best − second) + ε; per-job groupBy-max takes
   the winning bid (deterministic (bid, −worker) tie-break);
4. winners overwrite price + assignment; displaced workers re-enter.

Rounds are the usual gather-scatter supersteps (one lazy checkpoint per
round); price monotonicity bounds rounds by O(n·C/ε) and in practice
O(n) for random costs. All state is O(V) — edge data never accumulates.
"""

from __future__ import annotations

from ..plans.lineage import truncate_plan

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DST, SRC, WGT, Graph
from .pagerank import FailedToConvergeError

_BIG = 1e15  # "only candidate" second-best sentinel: price jumps high


def hungarian(
    G: Graph,
    workers: DataFrame,
    epsilon: float | None = None,
    max_rounds: int = 10_000,
) -> tuple[float, DataFrame]:
    """Min-cost assignment of every worker to a distinct job.

    ``workers``: DataFrame whose first column holds the worker-side
    vertex ids (reference lap.py takes a series/column the same way);
    every edge (src ∈ workers) → dst is a candidate assignment with
    cost = edge weight. Requires |workers| ≤ |jobs reachable| and a
    feasible perfect matching on the worker side.

    Returns ``(total_cost, DataFrame[vertex, assignment])`` exactly like
    the reference (lap.py:55-64). With integer costs and the default
    ε = 1/(n+1) the cost is the true optimum; float costs are optimal
    to within n·ε.
    """
    wcol = workers.columns[0]
    wset = workers.select(F.col(wcol).cast("long").alias("vertex")).distinct()
    # candidate edges: worker side only, value = -cost (auction maximizes)
    edges = (
        G.edges.join(wset.withColumnRenamed("vertex", SRC), SRC)
        .select(
            F.col(SRC).alias("i"),
            F.col(DST).alias("j"),
            (-F.col(WGT)).alias("v"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = wset.count()
    if n == 0:
        return 0.0, workers.sparkSession.createDataFrame(
            [], "vertex long, assignment long"
        )
    eps = epsilon if epsilon is not None else 1.0 / (n + 1)

    spark = edges.sparkSession
    prices = edges.select("j").distinct().withColumn("p", F.lit(0.0))
    assigned = spark.createDataFrame([], "i long, j long").transform(truncate_plan)

    for _ in range(max_rounds):
        unassigned = wset.join(
            assigned.select(F.col("i").alias("vertex")), "vertex", "left_anti"
        )
        if unassigned.isEmpty():
            break
        cand = (
            unassigned.join(edges, unassigned["vertex"] == edges["i"])
            .join(prices, "j")
            .select("i", "j", (F.col("v") - F.col("p")).alias("net"))
        )
        # best (net, smallest j) per worker — two max-passes, hub-safe
        best = (
            cand.groupBy("i")
            .agg(F.max(F.struct(F.col("net"), (-F.col("j")).alias("nj"))).alias("m"))
            .select("i", F.col("m.net").alias("bnet"), (-F.col("m.nj")).alias("bj"))
        )
        second = (
            cand.join(best, "i")
            .filter(F.col("j") != F.col("bj"))
            .groupBy("i")
            .agg(F.max("net").alias("snet"))
        )
        bids = (
            best.join(second, "i", "left")
            .join(prices, best["bj"] == prices["j"])
            .select(
                F.col("i"),
                F.col("bj").alias("j2"),
                (
                    F.col("p")
                    + F.col("bnet")
                    - F.coalesce(F.col("snet"), F.col("bnet") - F.lit(_BIG))
                    + F.lit(eps)
                ).alias("bid"),
            )
        )
        # each job takes the single highest bid (ties → smaller worker id)
        wins = (
            bids.groupBy("j2")
            .agg(F.max(F.struct(F.col("bid"), (-F.col("i")).alias("ni"))).alias("m"))
            .select(
                F.col("j2").alias("j"),
                (-F.col("m.ni")).alias("i"),
                F.col("m.bid").alias("bid"),
            )
            .transform(truncate_plan)
        )
        prices = (
            prices.join(wins.select("j", "bid"), "j", "left")
            .select("j", F.coalesce("bid", F.col("p")).alias("p"))
            .transform(truncate_plan)
        )
        assigned = (
            assigned.join(wins.select("j"), "j", "left_anti")
            .unionByName(wins.select("i", "j"))
            .transform(truncate_plan)
        )
    else:
        # the loop checks completion at the TOP of each round, so an
        # assignment finished by the final allowed round needs one more
        # look before declaring failure
        final_unassigned = wset.join(
            assigned.select(F.col("i").alias("vertex")), "vertex", "left_anti"
        )
        if not final_unassigned.isEmpty():
            edges.unpersist()
            raise FailedToConvergeError(
                f"auction did not complete within {max_rounds} rounds"
            )

    out = assigned.select(
        F.col("i").alias("vertex"), F.col("j").alias("assignment")
    )
    total = float(
        out.join(
            edges, (out["vertex"] == edges["i"]) & (out["assignment"] == edges["j"])
        )
        .agg(F.sum(-F.col("v")))
        .first()[0]
        or 0.0
    )
    edges.unpersist()
    return total, out


def dense_hungarian(
    spark: SparkSession,
    costs: list[float],
    num_rows: int,
    num_columns: int,
    epsilon: float | None = None,
) -> tuple[float, DataFrame]:
    """Dense row-major cost matrix entry point (reference
    lap.py:90-120): worker i = row i (vertex id i), job j = column j
    (vertex id num_rows + j)."""
    if len(costs) != num_rows * num_columns:
        raise ValueError("costs must have num_rows*num_columns entries")
    rows = [
        (i, num_rows + j, float(costs[i * num_columns + j]))
        for i in range(num_rows)
        for j in range(num_columns)
    ]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    G = Graph(e, directed=True, weighted=True)
    workers = spark.createDataFrame([(i,) for i in range(num_rows)], "vertex long")
    cost, df = hungarian(G, workers, epsilon=epsilon)
    return cost, df.withColumn("assignment", F.col("assignment") - num_rows)
