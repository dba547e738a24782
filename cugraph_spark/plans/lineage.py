"""Superstep lineage truncation that does not poison Catalyst stats.

Every iterative operator truncates its per-round plan with
``localCheckpoint`` (the Spark analog of the reference finishing each
superstep inside one C++ kernel call — lineage must not accumulate
across supersteps). Spark's ``Dataset.localCheckpoint`` truncates the
*plan* but copies the origin plan's **estimated statistics** onto the
new ``LogicalRDD`` leaf (``LogicalRDD.fromDataset`` passes
``originStats``). For superstep loops this is catastrophic: the
size-only stats visitor estimates a join as the PRODUCT of its
children's ``sizeInBytes``, so when round N's plan joins two or three
frames derived from round N-1's checkpoint, the checkpointed BigInt
size MULTIPLIES into round N's stats — digit count grows ~k× per round
(k = number of state-derived join inputs). By round ~15 the driver is
doing Toom-Cook multiplication on million-digit BigIntegers inside
``SizeInBytesOnlyStatsPlanVisitor`` and a 25-vertex Leiden run takes
hours of driver CPU. (Empirically: digits double per round with two
state references; see docs/PLANS.md "lineage truncation".)

``truncate_plan`` checkpoints and then rebuilds the ``LogicalRDD``
leaf WITHOUT the origin stats/constraints, so every round restarts
from the (constant-size) default leaf statistics. Join strategy for
superstep joins is chosen explicitly by ``plans.strategy`` /
``F.broadcast`` hints and at runtime by AQE from true shuffle sizes —
neither consults the poisoned estimate — so dropping it changes no
plan we rely on. Output partitioning is copied verbatim (Spark 4.1's
own checkpoint already reports ``UnknownPartitioning`` there, so this
is lossless).

Chain-friendly: ``df.transform(truncate_plan)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LOGICAL_RDD = "org.apache.spark.sql.execution.LogicalRDD"


def checkpoint_keep_stats(df: DataFrame, eager: bool = False) -> DataFrame:
    """Plain ``localCheckpoint`` — lineage truncated, origin statistics
    KEPT. For ONE-SHOT checkpoints (a frame referenced several times in
    one plan, e.g. the oriented edge list feeding a 3-way self-join):
    dropping the stats would replace Catalyst's small size estimate
    with the huge LogicalRDD default, silently turning every downstream
    broadcast join into a sort-merge join (measured 4x on the sf0.1
    triangle count). Loops MUST keep using :func:`truncate_plan` — with
    per-round checkpoints the copied stats multiply geometrically."""
    spark = df.sparkSession
    return DataFrame(df._jdf.localCheckpoint(eager), spark)


def release_checkpoint(df: DataFrame) -> None:
    """Free the executor blocks held by a local checkpoint produced by
    :func:`checkpoint_keep_stats` / :func:`truncate_plan`. Local
    checkpoints otherwise live until driver-side GC collects the
    DataFrame — long-running loops that create one per call (e.g. a
    DistSampler loop invoking the neighbor samplers) should release
    the terminal one explicitly. Safe no-op on any other plan."""
    try:
        node = df._jdf.queryExecution().analyzed()
        if node.getClass().getName() == _LOGICAL_RDD:
            node.rdd().unpersist(False)
    except Exception:  # pragma: no cover - JVM API drift safety net
        pass


def truncate_plan(df: DataFrame, eager: bool = False) -> DataFrame:
    """``localCheckpoint(eager)`` + drop the origin stats/constraints
    from the resulting ``LogicalRDD`` leaf. Falls back to the plain
    checkpointed frame if the JVM internals ever move."""
    spark = df.sparkSession
    jdf = df._jdf.localCheckpoint(eager)
    try:
        node = jdf.queryExecution().analyzed()
        if node.getClass().getName() != _LOGICAL_RDD:
            return DataFrame(jdf, spark)
        jvm = spark._jvm
        empty = jvm.scala.Option.empty()
        clean = jvm.org.apache.spark.sql.execution.LogicalRDD(
            node.output(),
            node.rdd(),
            node.outputPartitioning(),
            node.outputOrdering(),
            node.isStreaming(),
            node.stream(),
            spark._jsparkSession,
            empty,   # originStats — the whole point
            empty,   # originConstraints — derived from the same origin
        )
        jdf2 = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, clean
        )
        return DataFrame(jdf2, spark)
    except Exception:  # pragma: no cover - JVM API drift safety net
        return DataFrame(jdf, spark)
