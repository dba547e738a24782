"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: derive the customer→supplier purchase
graph from the sf0.001 tables and run converged PageRank (α=0.85,
tol=1e-6) — the engine's north-star algorithm end-to-end.

``queries()`` / ``oracle_sql()`` — the full operator catalog from
SURVEY.md §2 plus the training-data pipeline functions, instantiated
over the driver's testdata tables; implementations live in
``cugraph_spark/queries.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cugraph_spark import queries as q  # noqa: E402
from cugraph_spark.graph import Graph  # noqa: E402
from cugraph_spark.operators.pagerank import pagerank  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001 — the north-star pipeline:
    a source-code repository table of the input_hint schema
    (repo, path, commit, lang, content) → import-link edge extraction
    → PageRank (α=0.85) to tol 1e-6 convergence over the string-id
    file graph (renumber → rank → unrenumber), hub files first."""
    edges = q.code_graph_edges(spark, "/root/testdata/sf0.001")
    G = Graph.from_edgelist(
        edges, weight_col="weight", directed=True, do_renumber=True
    )
    pr = pagerank(G, alpha=0.85, tol=1e-6, max_iter=200)
    out = q.unrenumber(pr, G.mapping)
    return out.orderBy(F.desc("pagerank"), F.asc("vertex"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
