"""GNN data loading — the reference's ``cugraph.gnn`` surface, Spark-first.

Recreates ``gnn/data_loading/bulk_sampler.py`` (class ``BulkSampler``,
column conventions ``_START_``/``_BATCH_``, parquet minibatch output
partitioned by batch range), the io contract of
``gnn/data_loading/bulk_sampler_io.py:write_samples``, and the
``gnn/feature_storage/feat_storage.py`` ``FeatureStore`` minibatch
feature-fetch surface.

Design notes vs the reference:

- The reference loops ``sample_from_nodes`` over ``seeds_per_call``
  chunks to bound GPU memory, then renumbers batch ids per output
  partition (its issue #3794 workaround). Spark-first there is no
  chunk loop: every accumulated batch samples in ONE declarative plan
  (the batch id rides the per-hop join/window keys — see
  ``operators/sampling.py:uniform_neighbor_sample_batched``), executor
  memory is bounded by partitioning, and batch ids are preserved
  verbatim (the reference renumbers batch ids per output partition —
  its issue-#3794 workaround — which loses the caller's ids; nothing
  forces that here). ``renumber=True`` is the reference's VERTEX
  renumbering: batch-local contiguous ids, seeds first, with a
  [batch_id, local_id, vertex] map sidecar. ``seeds_per_call`` is
  accepted for API compatibility and ignored.
- Output: parquet at ``output_path`` partitioned by
  ``batch_partition = batch_id // batches_per_partition`` with columns
  [batch_id, src, dst, weight, hop] — the reference's
  (sources, destinations, hop_id, batch_id) shape plus weight. Batches
  that sample zero edges are naturally absent (the reference likewise
  discards empty batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window

from .graph import Graph
from .operators.sampling import uniform_neighbor_sample_batched
from .plans.lineage import truncate_plan


def _with_batch_partition(df: DataFrame, batches_per_partition: int) -> DataFrame:
    """``batch_partition = batch_id // batches_per_partition`` — the ONE
    place the partitioning rule lives. floor, not cast: cast truncates
    toward zero, which would collide caller batch ids -1 and +1 into
    partition 0."""
    return df.withColumn(
        "batch_partition",
        F.floor(F.col("batch_id") / F.lit(batches_per_partition)),
    )


def renumber_batch_samples(
    samples: DataFrame, seeds: DataFrame,
    start_col: str = "_START_", batch_col: str = "_BATCH_",
) -> tuple[DataFrame, DataFrame]:
    """Per-batch contiguous local vertex ids — the Spark analog of the
    reference's renumbered sampler output (``bulk_sampler_io.py``:
    minors + renumber map per batch; the CSR byte-packing is a GPU
    framework contract with no Spark meaning).

    Local id order is the GNN convention: the batch's seeds first
    (ascending vertex id), then newly-reached vertices by (first hop
    reached, vertex id) — so layer-0 seeds occupy ids 0..n_seeds-1 in
    every batch, exactly what a training loop indexing the first rows
    of the feature matrix expects. Deterministic at any parallelism.

    Returns (renumbered_samples [batch_id, src, dst, weight, hop] with
    LOCAL ids, renumber_map [batch_id, local_id, vertex]).
    """
    seed_v = seeds.select(
        F.col(batch_col).cast("long").alias("batch_id"),
        F.col(start_col).alias("vertex"),
        F.lit(-1).alias("ord"),
    )
    reached = samples.select(
        "batch_id", F.col("dst").alias("vertex"), F.col("hop").alias("ord")
    )
    first = (
        seed_v.unionByName(reached)
        .groupBy("batch_id", "vertex")
        .agg(F.min("ord").alias("first_ord"))
    )
    # one window per batch — partitions are minibatch-sized by design,
    # so the per-batch sort never sees more than one batch's vertices
    w = Window.partitionBy("batch_id").orderBy("first_ord", "vertex")
    # materialize once: flush(renumber=True) runs TWO actions over this
    # frame (the rmap sidecar write, then the samples write that joins
    # it) — without the checkpoint the union+groupBy+window re-executes
    rmap = first.select(
        "batch_id", (F.row_number().over(w) - 1).alias("local_id"), "vertex"
    ).transform(truncate_plan)
    s_map = rmap.select(
        "batch_id", F.col("vertex").alias("src"), F.col("local_id").alias("src_l")
    )
    d_map = rmap.select(
        "batch_id", F.col("vertex").alias("dst"), F.col("local_id").alias("dst_l")
    )
    renumbered = (
        samples.join(s_map, ["batch_id", "src"])
        .join(d_map, ["batch_id", "dst"])
        .select(
            "batch_id",
            F.col("src_l").alias("src"),
            F.col("dst_l").alias("dst"),
            "weight",
            "hop",
        )
    )
    return renumbered, rmap


class BulkSampler:
    """Accumulate seed batches lazily, sample every batch in one plan
    on ``flush()``, write minibatches to parquet.

    Parameters mirror the reference (``bulk_sampler.py:52-61``):
    ``batch_size`` (seeds per batch — informational; batches are defined
    by the caller's ``_BATCH_`` column), ``output_path``, ``graph``,
    ``batches_per_partition`` (output layout), plus the sampling knobs
    ``fanout`` / ``seed`` / ``with_replacement``.
    """

    start_col_name = "_START_"
    batch_col_name = "_BATCH_"

    def __init__(
        self,
        batch_size: int,
        output_path: str,
        graph: Graph,
        fanout: list[int] | None = None,
        seed: int = 42,
        with_replacement: bool = False,
        seeds_per_call: int = 200_000,  # accepted for API compat; unused
        batches_per_partition: int = 100,
        renumber: bool = False,
    ):
        self.renumber = renumber
        self.batch_size = batch_size
        self.output_path = output_path
        self.graph = graph
        self.fanout = fanout if fanout is not None else [10, 25]
        self.seed = seed
        self.with_replacement = with_replacement
        self.batches_per_partition = batches_per_partition
        self._pending: DataFrame | None = None
        self._edge_caches: list = []
        self.flush_count = 0

    def add_batches(
        self,
        df: DataFrame,
        start_col_name: str | None = None,
        batch_col_name: str | None = None,
    ) -> None:
        """Enqueue a seed DataFrame (lazy — no job runs until flush).
        Columns: one vertex column (``_START_``) + one integral batch
        id column (``_BATCH_``)."""
        s = start_col_name or self.start_col_name
        b = batch_col_name or self.batch_col_name
        norm = df.select(
            F.col(s).alias(self.start_col_name),
            F.col(b).cast("long").alias(self.batch_col_name),
        )
        self._pending = (
            norm if self._pending is None else self._pending.unionByName(norm)
        )

    def sample(self) -> DataFrame:
        """The flush plan WITHOUT the write — [batch_id, src, dst,
        weight, hop, batch_partition] for every pending batch."""
        if self._pending is None:
            raise ValueError("no batches added")
        # APPENDS to self._edge_caches (never rebinds it): a caller may
        # sample() then flush() — which samples again — and a rebind
        # would orphan the first call's checkpointed edge frames,
        # re-creating the driver-GC-timed leak flush() exists to close
        out = uniform_neighbor_sample_batched(
            self.graph,
            self._pending,
            fanout=self.fanout,
            seed=self.seed,
            with_replacement=self.with_replacement,
            start_col=self.start_col_name,
            batch_col=self.batch_col_name,
            cache_out=self._edge_caches,
        )
        return _with_batch_partition(out, self.batches_per_partition)

    def flush(self) -> None:
        """Sample every pending batch in one plan and append the
        minibatches to ``output_path`` partitioned by batch range.
        With ``renumber=True`` vertex ids are batch-local contiguous
        (seeds first) and the [batch_id, local_id, vertex] map lands
        in ``<output_path>_renumber_map`` — the reference's
        ``write_samples`` renumber-map sidecar, as a parquet dataset."""
        if self._pending is None:
            return
        out = self.sample()
        if self.renumber:
            renum, rmap = renumber_batch_samples(
                out.drop("batch_partition"), self._pending,
                self.start_col_name, self.batch_col_name,
            )
            out = _with_batch_partition(renum, self.batches_per_partition)
            rmap.write.mode("append").parquet(
                self.output_path.rstrip("/") + "_renumber_map"
            )
        write_samples(out, self.output_path)
        # the terminal write ran — free the sampler's checkpointed edge
        # blocks now instead of waiting on driver GC (a training loop
        # flushing many samplers otherwise accumulates them)
        from .plans.lineage import release_checkpoint

        for cached in getattr(self, "_edge_caches", []):
            release_checkpoint(cached)
        self._edge_caches = []
        self._pending = None
        self.flush_count += 1


class DistSampleWriter:
    """``dist_sampler.py:DistSampleWriter`` analog: owns the output
    location + batch-range partitioning for sampler minibatches.
    Format is parquet (the reference's default)."""

    def __init__(self, directory: str, batches_per_partition: int = 256,
                 format: str = "parquet"):
        if format != "parquet":
            raise ValueError("only parquet output is supported")
        self._directory = directory
        self._batches_per_partition = batches_per_partition

    def write_minibatches(self, samples: DataFrame) -> None:
        write_samples(
            _with_batch_partition(samples, self._batches_per_partition),
            self._directory,
        )

    def get_reader(self, spark) -> "DistSampleReader":
        return DistSampleReader(self._directory, spark)


class DistSampleReader:
    """Iterate the written minibatch dataset one batch-partition at a
    time (the reference reads one parquet file per step). Yields
    ``(pandas_minibatch, start_batch, end_batch)`` — pandas because the
    consumer is a training loop, and one partition is minibatch-sized
    by construction."""

    def __init__(self, directory: str, spark):
        from pyspark.errors import AnalysisException

        try:
            self._df = spark.read.parquet(directory)
        except AnalysisException as e:
            # a sampler that produced zero edges leaves only _SUCCESS
            # (partitionBy of an empty frame writes no data files), so
            # schema inference fails — iterate as empty. ONLY that
            # case: a wrong path, permission error, or corrupt dataset
            # must raise, or a training loop silently runs on no data.
            if "UNABLE_TO_INFER_SCHEMA" not in str(e):
                raise
            self._df = None
            self._parts = []
            self._i = 0
            return
        self._parts = sorted(
            r["batch_partition"]
            for r in self._df.select("batch_partition").distinct().collect()
        )
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= len(self._parts):
            raise StopIteration
        p = self._parts[self._i]
        self._i += 1
        pdf = (
            self._df.filter(F.col("batch_partition") == p)
            .drop("batch_partition")
            .toPandas()
        )
        return pdf, int(pdf["batch_id"].min()), int(pdf["batch_id"].max())


class DistSampler:
    """``dist_sampler.py:DistSampler`` analog: chunk a node list into
    ``batch_size`` batches and bulk-sample them — all batches in one
    plan (the reference loops per rank/call; see BulkSampler notes)."""

    def __init__(self, graph: Graph, writer: DistSampleWriter,
                 fanout: list[int] | None = None, seed: int = 42,
                 with_replacement: bool = False):
        self._graph = graph
        self._writer = writer
        self.fanout = fanout if fanout is not None else [10, 25]
        self.seed = seed
        self.with_replacement = with_replacement

    def sample_from_nodes(self, nodes: DataFrame, batch_size: int,
                          start_batch_id: int = 0) -> None:
        """``nodes``: one-column DataFrame of start vertices. Batch ids
        assigned deterministically by ascending vertex id in chunks of
        ``batch_size`` (the reference chunks the caller's tensor in
        order; a DataFrame has no order, so ascending id is the
        deterministic equivalent).

        The dense rank comes from ``zipWithIndex`` over the sorted node
        RDD — distributed sort + per-partition offsets, the same
        no-single-partition-window idiom as ``graph.renumber`` — because
        the node list here can be the entire vertex set and a global
        ``Window.orderBy`` would funnel it through one task."""
        v = nodes.columns[0]
        vt = dict(nodes.dtypes)[v]
        ranked = nodes.sparkSession.createDataFrame(
            nodes.select(F.col(v)).sort(v).rdd.map(lambda r: r[0]).zipWithIndex(),
            schema=f"_START_ {vt}, _rank long",
        )
        seeds = ranked.select(
            "_START_",
            ((F.col("_rank") / F.lit(batch_size)).cast("long")
             + F.lit(start_batch_id)).alias("_BATCH_"),
        )
        samples = uniform_neighbor_sample_batched(
            self._graph, seeds, fanout=self.fanout, seed=self.seed,
            with_replacement=self.with_replacement,
        )
        self._writer.write_minibatches(samples)

    def get_reader(self, spark) -> DistSampleReader:
        return self._writer.get_reader(spark)


class UniformNeighborSampler(DistSampler):
    """Reference export alias: a DistSampler whose sampling primitive
    is uniform per-hop neighbor top-k (the only primitive here)."""


class FeatureStore:
    """The reference's ``gnn/feature_storage/feat_storage.py`` surface
    over Spark storage: per-(type, feature) vertex feature tables.

    Backend is numpy (the reference's default; torch/wholegraph are GPU
    runtime contracts with no Spark meaning). Features register as
    DataFrames ``[vertex, value]`` (value may be an array column) or as
    numpy arrays (row i = vertex id i, the reference's indexing
    semantic). ``get_data`` fetches a MINIBATCH of vertex ids to the
    driver — that is the GNN training contract (indices come from a
    sampler minibatch, bounded by batch size), not a scan collect; the
    distributed filter runs as a broadcast semi-join on the id list.
    """

    def __init__(self, spark=None, backend: str = "numpy"):
        from pyspark.sql import SparkSession

        if spark is not None and not isinstance(spark, SparkSession):
            # the reference spells FeatureStore(backend=...); ported
            # code calling FeatureStore('torch') would otherwise bind
            # the backend string to `spark`, pass the backend check,
            # and fail much later with a confusing createDataFrame
            # error
            raise TypeError(
                f"first argument must be a SparkSession (got "
                f"{type(spark).__name__!r}); pass backend= by keyword"
            )
        if backend != "numpy":
            raise ValueError(
                f"backend {backend} not supported. Supported backends "
                "on Spark storage: numpy"
            )
        self.backend = backend
        self._spark = spark
        self.fd: dict = {}

    def add_data(self, feat_obj, type_name: str, feat_name: str,
                 vertex_col: str | None = None) -> None:
        """Register features. ``feat_obj``: a DataFrame whose first (or
        ``vertex_col``) column is the vertex id and the rest the
        feature value(s), or a numpy/array-like where row i belongs to
        vertex i (reference ``add_data`` semantics)."""
        import numpy as np

        if isinstance(feat_obj, DataFrame):
            vc = vertex_col or feat_obj.columns[0]
            cols = [c for c in feat_obj.columns if c != vc]
            if not cols:
                raise ValueError(
                    f"feature DataFrame has no columns besides the vertex "
                    f"column {vc!r}"
                )
            array_cols = [c for c in cols if _is_array_col(feat_obj, c)]
            if array_cols and len(cols) > 1:
                # casting an array column to double would silently null
                # every element and only blow up later in get_data
                raise ValueError(
                    f"cannot mix array feature column(s) {array_cols} with "
                    "other columns; register the array column alone"
                )
            df = feat_obj.select(
                F.col(vc).cast("long").alias("vertex"),
                F.col(cols[0]).cast("array<double>").alias("feat")
                if array_cols
                else F.array(
                    *[F.col(c).cast("double") for c in cols]
                ).alias("feat"),
            )
        else:
            arr = np.asarray(feat_obj, dtype="float64")
            if arr.ndim == 1:
                arr = arr[:, None]
            if self._spark is None:
                raise ValueError("pass spark= to register numpy features")
            df = self._spark.createDataFrame(
                [(i, row.tolist()) for i, row in enumerate(arr)],
                "vertex long, feat array<double>",
            )
        self.fd.setdefault(type_name, {})[feat_name] = df

    # reference API alias: no backend cast exists on the numpy path
    add_data_no_cast = add_data

    def get_data_df(self, indices, type_name: str, feat_name: str) -> DataFrame:
        """Distributed variant of :meth:`get_data`: the broadcast
        semi-join WITHOUT the driver collect — [vertex, feat], for
        consumers that keep the minibatch on the cluster (or fetch
        sets beyond ``max_vertices``)."""
        if type_name not in self.fd or feat_name not in self.fd[type_name]:
            raise ValueError(f"feature {type_name}/{feat_name} not found")
        df = self.fd[type_name][feat_name]
        spark = df.sparkSession
        want = spark.createDataFrame(
            [(int(i),) for i in set(int(i) for i in indices)], "vertex long"
        )
        return df.join(F.broadcast(want), "vertex")

    def get_data(self, indices, type_name: str, feat_name: str,
                 max_vertices: int = 1_048_576):
        """Fetch ``feat[indices]`` for a minibatch of vertex ids —
        returns a 2-D numpy array aligned (and duplicated) exactly like
        the reference's array indexing.

        ``max_vertices`` guards the driver collect (the minibatch
        contract keeps this small; the guard catches a full-graph id
        list passed by mistake — use :meth:`get_data_df` for those)."""
        import numpy as np

        if type_name not in self.fd or feat_name not in self.fd[type_name]:
            raise ValueError(f"feature {type_name}/{feat_name} not found")
        df = self.fd[type_name][feat_name]
        idx = [int(i) for i in indices]
        if len(idx) > max_vertices:
            raise ValueError(
                f"get_data collects features to the driver; got "
                f"{len(idx)} indices > max_vertices={max_vertices} — "
                "use get_data_df for cluster-side fetches"
            )
        spark = df.sparkSession
        want = spark.createDataFrame([(i,) for i in set(idx)], "vertex long")
        rows = df.join(F.broadcast(want), "vertex").collect()
        lut = {r["vertex"]: r["feat"] for r in rows}
        missing = [i for i in idx if i not in lut]
        if missing:
            raise ValueError(f"vertex ids without features: {missing[:5]}")
        return np.asarray([lut[i] for i in idx], dtype="float64")

    def get_feature_list(self) -> list[str]:
        return [f for feats in self.fd.values() for f in feats]

    def get_storage(self, type_name: str, feat_name: str) -> str:
        if type_name not in self.fd or feat_name not in self.fd[type_name]:
            raise ValueError(f"feature {type_name}/{feat_name} not found")
        return "spark"


def _is_array_col(df: DataFrame, col: str) -> bool:
    from pyspark.sql.types import ArrayType

    return isinstance(df.schema[col].dataType, ArrayType)


def write_samples(samples: DataFrame, output_path: str) -> None:
    """``bulk_sampler_io.write_samples`` analog: one parquet dataset,
    hive-partitioned by ``batch_partition`` so a training loader reads
    each batch range as one file group."""
    (
        samples.write.mode("append")
        .partitionBy("batch_partition")
        .parquet(output_path)
    )
