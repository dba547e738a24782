"""Measured shuffle-byte counters for superstep plans.

Round 3 argued the broadcast+dst layout's "zero per-superstep
exchange" from plan shape (.explain showing no Exchange inside the
loop). This module turns that into a *measured* number: Spark's
AppStatusStore (the store behind the UI/REST API, populated by
AppStatusListener whether or not the UI is enabled) exposes per-stage
``shuffleReadBytes`` / ``shuffleWriteBytes``; snapshotting the running
totals around each superstep's action gives the actual bytes the
superstep exchanged. Iterative operators accept
``superstep_metrics=[]`` and append one
``{"shuffle_read", "shuffle_write"}`` delta dict per checking action.

Caveats (documented, acceptable for the bench harnesses this feeds):
- totals are cumulative across the SparkContext, so deltas attribute
  concurrent foreign jobs to the superstep — benches run one job at a
  time;
- the store retains ``spark.ui.retainedStages`` (default 1000) stages;
  eviction under-counts very long runs. Superstep loops run a handful
  of stages per round, far under the limit.
- a broken probe must NOT masquerade as a measured zero: the zero-
  exchange claim is exactly what these numbers exist to prove, so JVM
  API drift returns ``None`` (→ ``shuffle_unmeasured: true`` in the
  delta dict) instead of a fake ``(0, 0)``.
"""

from __future__ import annotations


def shuffle_totals(spark) -> tuple[int, int] | None:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all
    stages the status store currently retains, or ``None`` when the
    probe itself fails (JVM API drift) — never a fabricated zero.
    Pure driver-side JVM call — no Spark job."""
    try:
        store = spark._jsparkSession.sparkContext().statusStore()
        empty = spark._jvm.java.util.ArrayList()  # empty filter = all
        # Scala default args surface as stageList$default$N accessors
        # (signature: statuses, details, withSummaries, quantiles,
        # taskStatus — Spark 4.x)
        seq = store.stageList(
            empty,
            *[getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)],
        )
        it = seq.iterator()
        r = w = 0
        while it.hasNext():
            s = it.next()
            r += int(s.shuffleReadBytes())
            w += int(s.shuffleWriteBytes())
        return r, w
    except Exception:  # pragma: no cover - JVM API drift safety net
        return None


class ShuffleProbe:
    """Delta-snapshot helper: ``probe.delta()`` returns the bytes
    shuffled since the previous call (or construction). When either
    snapshot failed, the delta carries ``shuffle_read/write = None``
    plus ``shuffle_unmeasured: True`` so downstream benches cannot
    mistake broken instrumentation for a measured zero-shuffle
    superstep."""

    def __init__(self, spark):
        self._spark = spark
        self._last = shuffle_totals(spark)

    def delta(self) -> dict:
        cur = shuffle_totals(self._spark)
        if cur is None or self._last is None:
            self._last = cur
            return {
                "shuffle_read": None,
                "shuffle_write": None,
                "shuffle_unmeasured": True,
            }
        out = {
            "shuffle_read": cur[0] - self._last[0],
            "shuffle_write": cur[1] - self._last[1],
        }
        self._last = cur
        return out
