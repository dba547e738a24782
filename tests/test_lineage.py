"""truncate_plan: superstep lineage truncation must not compound
Catalyst size estimates.

Spark's ``localCheckpoint`` copies the origin plan's estimated stats
onto the new ``LogicalRDD`` leaf; a superstep whose plan joins k≥2
frames derived from the previous round's checkpoint then MULTIPLIES
that estimate into the next round — sizeInBytes digit count grows
~k× per round and by round ~15 the driver grinds million-digit
BigInteger products inside the stats visitor (hours of driver CPU for
a 25-vertex Leiden run). ``plans.lineage.truncate_plan`` rebuilds the
leaf without origin stats; these tests pin (a) constant-size stats
across rounds and (b) value fidelity vs the raw checkpoint path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cugraph_spark.plans.lineage import truncate_plan


def _stats_digits(df) -> int:
    return len(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def _one_round(state):
    """A round shaped like the Louvain move phase: THREE joins whose
    inputs all derive from `state` (the worst multiplicative case)."""
    lab = state.select(F.col("vertex").alias("nv"), F.col("labels").alias("nl"))
    sigma = (
        state.groupBy("labels").agg(F.count("*").alias("c"))
        .withColumnRenamed("labels", "sl")
    )
    return (
        state.join(lab, state["vertex"] == lab["nv"])
        .join(sigma, F.col("labels") == F.col("sl"))
        .select("vertex", "labels")
    )


def test_truncate_plan_keeps_stats_constant_across_rounds(spark):
    df = spark.range(64).select(
        F.col("id").alias("vertex"), (F.col("id") % 8).alias("labels")
    )
    state = truncate_plan(df)
    base = _stats_digits(state)
    for _ in range(6):
        state = truncate_plan(_one_round(state))
        state.count()  # materialize, like every superstep's action
        assert _stats_digits(state) == base
    # the raw-checkpoint path doubles digits per round — prove the
    # mechanism this guards against is real (and version-current)
    raw = df.localCheckpoint(eager=False)
    d0 = _stats_digits(raw)
    raw = _one_round(raw).localCheckpoint(eager=False)
    raw.count()
    assert _stats_digits(raw) > d0  # compounding happens without the fix


def test_truncate_plan_preserves_rows_and_schema(spark):
    df = spark.range(100).select(
        F.col("id").alias("vertex"), (F.col("id") * 3 % 7).alias("labels")
    )
    t = truncate_plan(df)
    assert t.schema == df.schema
    assert sorted(r["labels"] for r in t.collect()) == sorted(
        r["labels"] for r in df.collect()
    )
    # chain-friendly form used across operators/
    t2 = df.filter(F.col("vertex") < 10).transform(truncate_plan)
    assert t2.count() == 10
