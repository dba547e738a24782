"""Superstep checkpoint/resume with per-partition lineage + metrics.

The reference runs its iteration loop inside one C++ call and has no
mid-run durability; our Spark engine checkpoints the convergence-state
DataFrame (ranks / component labels / propagated labels) every k
supersteps so a killed job resumes *exactly* where it stopped
(north-star requirement). Each checkpoint is:

    {root}/{name}/iter=NNNNN/        parquet state (the post-iteration
                                     state, written AFTER the
                                     convergence check of iteration N)
    {root}/{name}/iter=NNNNN/_meta.json
        {"iteration": N, "metrics": {...}, "partitions":
         [{"partition_id": i, "rows": n}, ...], "schema": [...]}

Checkpointing doubles as lineage truncation: the resumed/NEXT-iteration
plan reads from parquet, so the logical plan never grows beyond k
supersteps (SURVEY.md §7.3.1). In production the write format would be
Iceberg (`.format("iceberg")`); this sandbox has no Iceberg runtime jar,
so the manager takes a ``format`` argument defaulting to parquet — the
commit protocol (write, then _meta.json as the atomicity marker) is
format-agnostic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, root: str, name: str, format: str = "parquet"):
        self.root = root
        self.name = name
        self.format = format
        self.base = os.path.join(root, name)

    def _iter_dir(self, iteration: int) -> str:
        return os.path.join(self.base, f"iter={iteration:05d}")

    def _meta_path(self, iteration: int) -> str:
        return os.path.join(self._iter_dir(iteration), "_meta.json")

    def save(self, df: DataFrame, iteration: int, metrics: dict) -> DataFrame:
        """Write state + lineage meta; returns the re-read DataFrame
        (lineage-truncated) to continue iterating from."""
        path = self._iter_dir(iteration)
        df.write.mode("overwrite").format(self.format).save(path)
        reloaded = df.sparkSession.read.format(self.format).load(path)
        partitions = [
            {"partition_id": int(r["pid"]), "rows": int(r["rows"])}
            for r in reloaded.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("rows"))
            .collect()
        ]
        meta = {
            "iteration": iteration,
            "metrics": metrics,
            "partitions": sorted(partitions, key=lambda p: p["partition_id"]),
            "schema": df.schema.jsonValue(),
        }
        with open(self._meta_path(iteration), "w") as f:
            json.dump(meta, f)
        return reloaded

    def latest_iteration(self) -> int | None:
        if not os.path.isdir(self.base):
            return None
        iters = []
        for d in os.listdir(self.base):
            if d.startswith("iter=") and os.path.exists(
                os.path.join(self.base, d, "_meta.json")
            ):
                iters.append(int(d.split("=")[1]))
        return max(iters) if iters else None

    def load(self, spark: SparkSession, iteration: int) -> tuple[DataFrame, dict]:
        with open(self._meta_path(iteration)) as f:
            meta = json.load(f)
        df = spark.read.format(self.format).load(self._iter_dir(iteration))
        return df, meta
