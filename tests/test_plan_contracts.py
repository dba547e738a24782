"""Plan-shape regression tests: the physical-plan properties the
engine's scale story depends on, asserted so a refactor can't silently
lose them."""

from __future__ import annotations

from pyspark.sql import functions as F

from cugraph_spark.graph import Graph
from cugraph_spark.plans.strategy import vertex_join_side
from .conftest import edges_df, make_edges

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_reach_parquet_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("lang") == "en")
        .select("doc_id", "n_chars")
    )
    plan = _plan(df)
    # predicate pushdown: the filter appears in the scan's PushedFilters
    assert "PushedFilters" in plan and "EqualTo(lang,en)" in plan
    # column pruning: the scan schema must NOT include the heavy text col
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_vertex_join_side_picks_broadcast_then_shuffle_hash(spark):
    e = edges_df(spark, make_edges("tiny_social"))
    state = e.select(F.col("src").alias("vertex")).distinct()
    b = e.join(vertex_join_side(state, 100), e.src == F.col("vertex"))
    assert "BroadcastHashJoin" in _plan(b)
    s = e.join(
        vertex_join_side(state, 100_000_000), e.src == F.col("vertex")
    )
    plan = _plan(s)
    assert "ShuffledHashJoin" in plan and "SortMergeJoin" not in plan


def test_superstep_message_agg_is_partial(spark):
    # groupBy(dst).sum must plan a map-side partial aggregate before
    # the exchange (the reduce_op::plus shuffle-combine analog)
    e = edges_df(spark, make_edges("tiny_social"))
    agg = e.groupBy("dst").agg(F.sum("weight"))
    plan = _plan(agg)
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_triangle_count_plan_has_no_nested_loop(spark):
    from cugraph_spark.operators.triangle_count import triangle_count

    G = Graph(edges_df(spark, make_edges("tiny_social")), directed=False)
    plan = _plan(triangle_count(G))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bulk_sampler_plan_is_joins_not_loops(spark):
    # the batched GNN sampler must fan batches out through joins —
    # no cartesian/nested-loop node, no Python UDF in the hot path
    from cugraph_spark.operators.sampling import uniform_neighbor_sample_batched

    G = Graph(edges_df(spark, make_edges("tiny_social")), directed=True)
    seeds = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], ["_START_", "_BATCH_"]
    )
    plan = _plan(uniform_neighbor_sample_batched(G, seeds, fanout=[2, 2]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_whole_stage_codegen_covers_text_scoring(spark):
    # the text pipeline must stay JVM-side: no Python UDF nodes
    from cugraph_spark.functions.text import quality_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(quality_score(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "*(1)" in plan  # the whole-stage-codegen stage marker


def test_dst_partitioned_superstep_agg_needs_no_exchange(spark):
    """The zero-exchange superstep layout (docs/PLANS.md round 3): with
    the edge cache hash-partitioned by dst and the state broadcast, the
    groupBy(dst) message aggregation's clustered distribution is
    satisfied by the cache's hashpartitioning(dst) — EnsureRequirements
    must NOT insert an Exchange. This is the property that removed the
    P-proportional min(E, P·V) partial-combine shuffle from WCC/LPA
    supersteps; if it regresses, every superstep re-exchanges O(E)."""
    e = edges_df(spark, make_edges("tiny_social"))
    edges = e.repartition(8, "dst").persist()
    edges.count()
    try:
        state = spark.createDataFrame(
            [(i, i) for i in range(10)], ["vertex", "labels"]
        )
        mins = (
            edges.join(F.broadcast(state), edges.src == state.vertex)
            .groupBy("dst")
            .agg(F.min("labels").alias("m"))
        )
        plan = _plan(mins)
        # the hot path — everything above the cached scan (the
        # InMemoryRelation body renders the one-time cache-fill
        # exchange, which already ran) — must contain no shuffle: the
        # agg's clustered distribution is satisfied by the cache's
        # hashpartitioning(dst), and the state side only broadcasts
        hot = plan.split("InMemoryRelation", 1)[0]
        assert "InMemoryTableScan" in hot
        assert "Exchange hashpartitioning" not in hot
        assert "BroadcastHashJoin" in hot
    finally:
        edges.unpersist()


def test_triangle_closing_leg_packed_broadcast_midsize(spark):
    """Between the 4M both-legs and 32M closing-leg cutovers the wedge
    stream must never shuffle: exactly one BroadcastHashJoin (the
    closing leg) on a single packed-long key (shiftleft in the plan →
    LongHashedRelation, not the row-keyed map)."""
    from cugraph_spark.operators.triangle_count import _tri_join

    e = edges_df(spark, make_edges("triangle_mesh"))
    o = e.select(F.col("src").cast("int").alias("src"),
                 F.col("dst").cast("int").alias("dst"))
    mid = _plan(_tri_join(o, 10_000_000))
    # exactly one broadcast join — the closing leg (the wedge e1⋈e2
    # join may legitimately shuffle at this size); its key is the
    # shiftleft-packed long on BOTH sides, so the wedge output feeds
    # the broadcast probe directly and is never exchanged
    assert mid.count("BroadcastHashJoin") == 1
    assert mid.count("shiftleft") >= 2
    closing = mid.split("BroadcastHashJoin", 1)[0]
    assert "Exchange hashpartitioning(uw" not in closing


def test_triangle_legs_broadcast_when_small(spark):
    """The 3-way triangle self-join must broadcast its probe legs for a
    small oriented list — the persisted leaf carries no usable size
    estimate, so without the explicit hint Catalyst plans sort-merge
    joins (measured ~2x slower on the dense sf0.1 graph)."""
    from cugraph_spark.operators.triangle_count import _tri_join

    e = edges_df(spark, make_edges("triangle_mesh"))
    o = e.select("src", "dst")
    small = _plan(_tri_join(o, 1000))
    assert small.count("BroadcastHashJoin") >= 2
    large = _plan(_tri_join(o, 50_000_000))
    assert "BroadcastHashJoin" not in large
