"""Bucketed edge tables — shuffle-free superstep ingest.

At 100 TB the dominant fixed cost of every analytics run is the initial
``repartition(P, src)`` of the edge list: an O(E) full-network shuffle
before the first superstep starts. Spark's answer is BUCKETING: write
the edge table once with ``bucketBy(buckets, "src")`` and every
subsequent scan reports ``HashPartitioning(src)`` to Catalyst, so
joins/aggregations keyed on ``src`` reuse the on-disk layout — the
exchange disappears from the plan (asserted in
``tests/test_bucketed.py``). This is the Spark analog of the
reference's partitioned-graph ingest (cuGraph renumbers + partitions
once at ``from_edgelist`` and every algorithm reuses that layout,
``structure/graph_classes.py``): pay the partitioning once at write
time, amortize it over every job that reads the graph.

The read path returns a ``Graph`` with ``pre_partitioned=True``:
superstep operators (PageRank/WCC/LPA) then skip their
``repartition(P, src)`` and persist the scan output directly — the
per-run O(E) shuffle is gone; only the O(V) state side moves per
superstep, now including superstep 0.

Write-side contract: the writer materializes the graph's FINAL edge
form (multi-edges already collapsed, symmetrization already applied if
undirected intent) because those transforms re-shuffle and would void
the bucket layout; the reader therefore constructs the Graph with
``multi_edge=True, directed=True`` (no re-transform). ``sortBy(src,
dst)`` gives clustered, run-length-friendly parquet and deterministic
file contents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..graph import DST, SRC, Graph


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int,
    path: str | None = None,
    mode: str = "errorifexists",
    key: str = SRC,
) -> None:
    """Persist ``edges`` as a bucketed table (``bucketBy(buckets,
    key)``, sorted within buckets by (key, other)). ``path`` makes it
    an external table. The input must already be the final edge form —
    see module docstring.

    ``key``: ``src`` (default) co-locates the shuffle-hash-mode
    superstep join; ``dst`` co-locates the broadcast-mode zero-exchange
    aggregation (docs/PLANS.md round 3) — pick by where V sits against
    ``plans/strategy.NARROW_STATE_BROADCAST_LIMIT``. Store vertex ids
    as int32 when they fit: WCC's compaction is then a no-op cast and
    the bucket layout survives into the superstep plan."""
    if key not in (SRC, DST):
        raise ValueError(f"key must be {SRC!r} or {DST!r}")
    other = DST if key == SRC else SRC
    w = (
        edges.write.format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key, other)
        .mode(mode)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed_edges(
    spark: SparkSession, table: str, weighted: bool = True,
    directed: bool = True, key: str = SRC,
) -> Graph:
    """Open a bucketed edge table as a ``pre_partitioned`` Graph:
    superstep operators trust the bucket layout and skip their initial
    edge shuffle. Pass ``directed=False`` when the table was written
    from an undirected graph's (already-symmetrized) edges — the read
    trusts that physical form instead of re-symmetrizing. ``key`` must
    name the column the table was bucketed by (the writer's ``key``)."""
    return Graph(
        spark.read.table(table),
        directed=directed,
        weighted=weighted,
        multi_edge=True,
        pre_partitioned=True,
        assume_symmetric=not directed,
        pre_partition_key=key,
    )
