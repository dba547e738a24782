"""Scalar/utility surface parity (SURVEY.md §2.5).

Spark analogs of the reference's input-coercion and score-conversion
helpers:

- ``ensure_graph_obj``  ↔ ``cugraph.utilities.utils.ensure_cugraph_obj``
  (utils.py:258-322): coerce whatever the caller holds — a ``Graph``,
  an edge DataFrame, a pandas edgelist — into a ``Graph`` plus the
  original input type, so every algorithm accepts the same loose inputs
  the reference does.
- ``df_score_to_dictionary`` ↔ ``cugraph.utilities.nx_factory
  .df_score_to_dictionary`` (nx_factory.py:165-196): collect a
  per-vertex score frame into a plain ``{vertex: score}`` dict. This is
  EXPLICITLY a driver-side convenience for small results (the reference
  converts to host memory the same way); it guards against silently
  collecting a 100 TB-scale result by refusing above ``max_rows``.
- ``harmonize_scores`` ↔ the dtype harmonization in
  ``link_analysis/pagerank.py:45-80`` (cast personalization / nstart
  frames to the graph's vertex & weight dtypes at the API boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import Graph

DEFAULT_COLLECT_LIMIT = 10_000_000


def ensure_graph_obj(obj, directed: bool = True, spark=None):
    """Return ``(Graph, original_type)`` from a Graph, an edge
    DataFrame with (src, dst[, weight]) columns, or a pandas edgelist
    (requires ``spark`` for the pandas path)."""
    input_type = type(obj)
    if isinstance(obj, Graph):
        return obj, input_type
    if isinstance(obj, DataFrame):
        weight = "weight" if "weight" in obj.columns else None
        return (
            Graph.from_edgelist(obj, weight_col=weight, directed=directed),
            input_type,
        )
    try:
        import pandas as pd

        if isinstance(obj, pd.DataFrame):
            if spark is None:
                raise ValueError("pandas edgelist coercion needs spark=")
            weight = "weight" if "weight" in obj.columns else None
            return (
                Graph.from_edgelist(
                    spark.createDataFrame(obj), weight_col=weight, directed=directed
                ),
                input_type,
            )
    except ImportError:  # pragma: no cover
        pass
    raise TypeError(f"cannot coerce {input_type} to Graph")


def df_score_to_dictionary(
    df: DataFrame, k: str, v: str = "vertex", max_rows: int = DEFAULT_COLLECT_LIMIT
) -> dict:
    """Collect ``df[[v, k]]`` into ``{vertex: score}``.

    Driver-side by design (small-result convenience, same contract as
    the reference's host conversion); raises rather than collect more
    than ``max_rows`` rows so it can never become an accidental
    full-corpus collect in a pipeline.
    """
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"df_score_to_dictionary is a small-result helper; got >{max_rows} "
            "rows — keep large results as DataFrames"
        )
    return {row[v]: row[k] for row in df.select(v, k).collect()}


def harmonize_scores(
    df: DataFrame, vertex_col: str = "vertex", value_col: str = "values"
) -> DataFrame:
    """Cast a user-supplied (vertex, value) frame to the engine's
    canonical dtypes (vertex → long, value → double), mirroring the
    reference's boundary casts (pagerank.py:45-80)."""
    return df.select(
        F.col(vertex_col).cast("long").alias(vertex_col),
        F.col(value_col).cast("double").alias(value_col),
    )
