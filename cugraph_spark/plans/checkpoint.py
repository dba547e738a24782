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
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs_and_path(spark: SparkSession, path_str: str):
    """(HadoopFileSystem, Path) for ANY Spark-supported URI — s3a://,
    hdfs://, file://, or a bare path on the cluster's default FS. The
    state parquet already goes wherever ``df.write`` resolves the path;
    the _meta.json commit marker must land on the SAME filesystem, not
    the driver's local disk (python ``open`` would silently split the
    checkpoint across two filesystems on a real cluster)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath


def _write_text(spark: SparkSession, path_str: str, text: str) -> None:
    fs, p = _fs_and_path(spark, path_str)
    out = fs.create(p, True)
    try:
        out.write(text.encode("utf-8"))
    finally:
        out.close()


def _read_text(spark: SparkSession, path_str: str) -> str:
    fs, p = _fs_and_path(spark, path_str)
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


class CheckpointManager:
    def __init__(self, root: str, name: str, format: str = "parquet"):
        self.root = root
        self.name = name
        self.format = format
        # posixpath, not os.path: these are URI-style paths on whatever
        # filesystem Spark resolves (s3a/hdfs/file), never OS-native
        self.base = posixpath.join(root, name)

    def _iter_dir(self, iteration: int) -> str:
        return posixpath.join(self.base, f"iter={iteration:05d}")

    def _meta_path(self, iteration: int) -> str:
        return posixpath.join(self._iter_dir(iteration), "_meta.json")

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
        _write_text(df.sparkSession, self._meta_path(iteration), json.dumps(meta))
        return reloaded

    def latest_iteration(self) -> int | None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "latest_iteration needs an active SparkSession (the "
                "checkpoint root may live on a non-local filesystem)"
            )
        fs, base = _fs_and_path(spark, self.base)
        if not fs.exists(base):
            return None
        jvm = spark._jvm
        iters = []
        for st in fs.listStatus(base):
            name = st.getPath().getName()
            if name.startswith("iter=") and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_meta.json")
            ):
                iters.append(int(name.split("=")[1]))
        return max(iters) if iters else None

    def load(self, spark: SparkSession, iteration: int) -> tuple[DataFrame, dict]:
        meta = json.loads(_read_text(spark, self._meta_path(iteration)))
        df = spark.read.format(self.format).load(self._iter_dir(iteration))
        return df, meta
