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
