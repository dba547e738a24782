"""Event-time Structured Streaming: watermarked windows, session
windows, and applyInPandasWithState stateful operators.

Strategy: every transform in ``streaming/events.py`` is stream-batch
symmetric, so each test drives the SAME function through an actual
``readStream`` file source (dropping parquet files one at a time and
``processAllAvailable()`` between drops gives deterministic
micro-batch boundaries) and asserts the streamed output against the
batch run / hand-computed expectations.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cugraph_spark.streaming.events import (
    running_user_totals,
    sessionized_user_stats,
    streaming_hub_detector,
    windowed_event_stats,
)

_TS = "2024-03-01 {}"


def _events_df(spark, rows):
    """rows: (event_id, 'HH:MM:SS', user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(i, _TS.format(t), u, et, float(v)) for i, t, u, et, v in rows],
        "event_id bigint, ts_s string, user_id bigint, event_type string, value double",
    )
    return df.select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        F.col("value"),
        F.to_json(F.struct(F.lit(1).alias("k"))).alias("props"),
    )


BATCH1 = [
    # hour-10 window, two types, two users
    (1, "10:00:00", 1, "view", 1.0),
    (2, "10:10:00", 1, "view", 2.0),
    (3, "10:20:00", 2, "click", 4.0),
    # event far ahead: advances event-time max to 12:05
    (4, "12:05:00", 3, "view", 8.0),
]
BATCH2 = [
    (5, "12:40:00", 1, "click", 16.0),
    (6, "12:45:00", 2, "view", 32.0),
]


def _drop(df, path):
    df.coalesce(1).write.mode("append").parquet(path)


def _start_file_stream(spark, path, schema):
    return spark.readStream.schema(schema).parquet(path)


def test_windowed_stats_streaming_matches_batch(spark, tmp_path):
    """Complete-mode streamed windowed aggregation == batch twin."""
    src = str(tmp_path / "ev1")
    b1 = _events_df(spark, BATCH1)
    b2 = _events_df(spark, BATCH2)
    _drop(b1, src)
    _drop(b2, src)

    stream = _start_file_stream(spark, src, b1.schema)
    q = (
        windowed_event_stats(stream, window="1 hour")
        .writeStream.format("memory")
        .queryName("win_complete")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.w_start_us, r.event_type): (r.n_events, r.sum_value, r.avg_k)
            for r in spark.sql("SELECT * FROM win_complete").collect()
        }
    finally:
        q.stop()

    want = {
        (r.w_start_us, r.event_type): (r.n_events, r.sum_value, r.avg_k)
        for r in windowed_event_stats(b1.unionAll(b2), window="1 hour").collect()
    }
    assert got == want
    assert len(want) == 4  # (10h view),(10h click),(12h view),(12h click)


def test_windowed_append_watermark_closes_windows(spark, tmp_path):
    """Append mode + watermark: only windows the watermark has passed
    are emitted; open windows stay in state."""
    src = str(tmp_path / "ev2")
    b1 = _events_df(spark, BATCH1)
    _drop(b1, src)

    stream = _start_file_stream(spark, src, b1.schema)
    q = (
        windowed_event_stats(stream, window="1 hour", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("win_append")
        .outputMode("append")
        .start()
    )
    h10 = int(pd.Timestamp("2024-03-01 10:00:00").value // 1000)
    h12 = int(pd.Timestamp("2024-03-01 12:00:00").value // 1000)
    try:
        q.processAllAvailable()
        # batch 0 advanced the watermark to 12:05 (event 4); the
        # follow-up no-data batch finalizes the hour-10 windows.
        # The hour-12 window (ends 13:00 > 12:05) stays open in state.
        first = {
            (r.w_start_us, r.event_type): r.n_events
            for r in spark.sql("SELECT * FROM win_append").collect()
        }
        assert first == {(h10, "view"): 2, (h10, "click"): 1}

        # batch 2 events land at 12:40/12:45 → watermark 12:45 < 13:00,
        # so the hour-12 window is STILL open: nothing new emitted.
        _drop(_events_df(spark, BATCH2), src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM win_append").collect()
    finally:
        q.stop()

    emitted = {(r.w_start_us, r.event_type): r.n_events for r in rows}
    assert emitted == first
    assert all(k[0] != h12 for k in emitted)  # 12h windows not finalized


def test_sessionized_streaming_closes_sessions(spark, tmp_path):
    """Session windows in append mode: the watermark passing
    last_ts+gap closes a session; the emitted row matches the batch
    twin bit-for-bit."""
    src = str(tmp_path / "ev3")
    b1 = _events_df(spark, BATCH1)
    _drop(b1, src)

    stream = _start_file_stream(spark, src, b1.schema)
    q = (
        sessionized_user_stats(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_append")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _drop(_events_df(spark, BATCH2), src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_append").collect()
    finally:
        q.stop()

    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events, r.sum_value)
        for r in rows
    }
    # after batch 2 the watermark reaches 12:45, which closes every
    # batch-1 session (latest end: user 3, 12:05+30m = 12:35) — so the
    # emitted set is exactly the batch twin over batch-1 data, while
    # the sessions opened by batch-2 events (ending 13:10 / 13:15)
    # remain in state, unemitted.
    want = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events, r.sum_value)
        for r in sessionized_user_stats(b1, gap="30 minutes").collect()
    }
    assert got == want


def test_running_user_totals_stateful(spark, tmp_path):
    """applyInPandasWithState carries per-user totals across
    micro-batches; the last emission per user equals the batch
    groupBy aggregate over everything fed."""
    src = str(tmp_path / "ev4")
    b1 = _events_df(spark, BATCH1)
    _drop(b1, src)

    batches: list[pd.DataFrame] = []
    stream = _start_file_stream(spark, src, b1.schema)
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: batches.append(df.toPandas()))
        .start()
    )
    try:
        q.processAllAvailable()
        _drop(_events_df(spark, BATCH2), src)
        q.processAllAvailable()
    finally:
        q.stop()

    nonempty = [b for b in batches if len(b)]
    assert len(nonempty) == 2
    # batch 0 touched users 1,2,3; batch 1 users 1,2 with carried state
    last = {}
    for b in nonempty:
        for r in b.itertuples():
            last[r.user_id] = (r.n_events, r.sum_value)
    want = {
        r.user_id: (r.n, r.s)
        for r in _events_df(spark, BATCH1 + BATCH2)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert last == want
    b0 = {r.user_id: r.n_events for r in nonempty[0].itertuples()}
    assert b0 == {1: 2, 2: 1, 3: 1}  # pre-carry counts from batch 1 only


def test_streaming_hub_detector_exactly_once(spark, tmp_path):
    """Hubs are emitted exactly once, at the batch where cumulative
    degree first EXCEEDS the threshold (strict >, matching
    plans/skew.py:hub_vertices)."""
    src = str(tmp_path / "ev5")
    mk = lambda rows: spark.createDataFrame(rows, "src bigint, dst bigint")
    # threshold=2, strict >: batch 1: v7 degree 3 (exceeds), v9 degree 2
    # (== threshold → not a hub yet)
    b1 = mk([(7, 1), (7, 2), (7, 3), (9, 1), (9, 2)])
    # batch 2: v9 +1 (exceeds now), v7 +2 (must NOT re-emit)
    b2 = mk([(9, 3), (7, 4), (7, 5), (11, 1)])
    _drop(b1, src)

    stream = _start_file_stream(spark, src, b1.schema)
    q = (
        streaming_hub_detector(stream, threshold=2)
        .writeStream.format("memory")
        .queryName("hubs")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {(r.vertex, r.degree) for r in spark.sql("SELECT * FROM hubs").collect()}
        _drop(b2, src)
        q.processAllAvailable()
        final = [(r.vertex, r.degree) for r in spark.sql("SELECT * FROM hubs").collect()]
    finally:
        q.stop()

    assert first == {(7, 3)}
    assert sorted(final) == [(7, 3), (9, 3)]  # v7 once, v9 on crossing, v11 never
    assert len(final) == len(set(final)) == 2


@pytest.mark.parametrize("gap_min", [30])
def test_session_gap_boundary_batch(spark, gap_min):
    """Spark merges ADJACENT session windows: an event at exactly
    last_ts + gap joins the session; only a strictly larger gap
    splits. (The DuckDB oracle twin therefore uses ``> gap``, not
    ``>=``.)"""
    rows = [
        (1, "10:00:00", 1, "view", 1.0),
        (2, "10:29:59", 1, "view", 1.0),  # < gap → same session
        (3, "10:59:59", 1, "view", 1.0),  # == last+30m exactly → still merged
        (4, "11:30:00", 1, "view", 1.0),  # 30m00s001..? no: +30m01s → split
    ]
    df = _events_df(spark, rows)
    out = sessionized_user_stats(df, gap=f"{gap_min} minutes").collect()
    # events 1-3 one session; event 4 (10:59:59 + 30m = 11:29:59 <
    # 11:30:00, strictly beyond) starts a new one
    assert sorted(r.n_events for r in out) == [1, 3]
