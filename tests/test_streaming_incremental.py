"""EdgeLog + warm-start incremental PageRank."""

from __future__ import annotations

from pyspark.sql import functions as F

from cugraph_spark import Graph, pagerank
from cugraph_spark.streaming.incremental import EdgeLog, incremental_pagerank
from .conftest import edges_df, make_edges


def test_edge_log_idempotent_append(spark, tmp_path):
    log = EdgeLog(str(tmp_path / "log"))
    e = edges_df(spark, make_edges("tiny_social"))
    assert log.append(e, 0) is True
    assert log.append(e, 0) is False  # retry skipped
    assert log.append(e.limit(10), 1) is True
    assert log.committed_batches() == [0, 1]
    assert log.read(spark).count() == e.count() + 10


def test_warm_start_converges_faster_and_matches(spark, tmp_path):
    base = make_edges("tiny_social")
    delta = [(0, 33, 1.0), (12, 7, 1.0), (33, 5, 1.0)]
    log = EdgeLog(str(tmp_path / "log2"))
    log.append(edges_df(spark, base), 0)

    ranks0 = incremental_pagerank(spark, log, None, tol=1e-8)

    log.append(edges_df(spark, delta), 1)
    ts_warm: list[float] = []
    warm = incremental_pagerank(
        spark, log, ranks0, tol=1e-8, superstep_seconds=ts_warm
    )
    ts_cold: list[float] = []
    cold = incremental_pagerank(
        spark, log, None, tol=1e-8, superstep_seconds=ts_cold
    )
    w = {r["vertex"]: r["pagerank"] for r in warm.collect()}
    c = {r["vertex"]: r["pagerank"] for r in cold.collect()}
    assert set(w) == set(c)
    for v in w:
        assert abs(w[v] - c[v]) < 1e-6  # same fixed point
    # warm start never needs MORE supersteps than cold (the saving is
    # log(d_cold/d_warm)/log(1/λ2), which rounds to ~0 on a 34-vertex
    # graph with a 3-edge delta but grows with graph/delta ratio)
    assert len(ts_warm) <= len(ts_cold)


def test_streaming_ingest_foreachbatch(spark, tmp_path):
    """Drive the sink through an actual Structured Streaming query
    (rate source → mapped edges → foreachBatch append)."""
    log = EdgeLog(str(tmp_path / "slog"))
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(
            (F.col("value") % 20).alias("src"),
            ((F.col("value") * 7 + 1) % 20).alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    q = stream.writeStream.foreachBatch(log.foreach_batch_sink()).trigger(
        processingTime="1 seconds"
    ).start()
    try:
        q.awaitTermination(12)
    finally:
        q.stop()
    batches = log.committed_batches()
    assert len(batches) >= 1
    df = log.read(spark)
    assert df.count() > 0
    assert set(df.columns) == {"src", "dst", "weight"}


def test_incremental_wcc_matches_batch(spark, tmp_path):
    from cugraph_spark.streaming.incremental import incremental_wcc
    from cugraph_spark import weakly_connected_components

    # two components in batch 0; batch 1 merges them AND introduces
    # brand-new vertices (one forming its own new component)
    base = [(0, 1, 1.0), (1, 2, 1.0), (10, 11, 1.0)]
    delta = [(2, 10, 1.0), (20, 21, 1.0), (11, 22, 1.0)]
    log = EdgeLog(str(tmp_path / "wlog"))
    log.append(edges_df(spark, base), 0)

    labels0 = incremental_wcc(spark, log, None)  # cold start
    assert {r["vertex"]: r["labels"] for r in labels0.collect()} == {
        0: 0, 1: 0, 2: 0, 10: 10, 11: 10,
    }

    log.append(edges_df(spark, delta), 1)
    inc = {
        r["vertex"]: r["labels"]
        for r in incremental_wcc(spark, log, labels0, after_batch=0).collect()
    }
    full = {
        r["vertex"]: r["labels"]
        for r in weakly_connected_components(
            Graph(log.read(spark), directed=False, weighted=False)
        ).collect()
    }
    assert inc == full
    assert inc[22] == 0 and inc[20] == 20  # merged vs new component


def test_incremental_wcc_delta_only_workload(spark, tmp_path):
    """The merge graph must be built from the delta alone — verified by
    feeding a delta that touches none of the old components and checking
    old labels pass through untouched."""
    from cugraph_spark.streaming.incremental import incremental_wcc

    log = EdgeLog(str(tmp_path / "wlog2"))
    log.append(edges_df(spark, [(0, 1, 1.0), (2, 3, 1.0)]), 0)
    labels0 = incremental_wcc(spark, log, None)
    log.append(edges_df(spark, [(100, 101, 1.0)]), 1)
    inc = {
        r["vertex"]: r["labels"]
        for r in incremental_wcc(spark, log, labels0, after_batch=0).collect()
    }
    assert inc == {0: 0, 1: 0, 2: 2, 3: 2, 100: 100, 101: 100}
