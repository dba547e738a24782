"""MatrixMarket (.mtx) edge-list reader.

Reference analog: the dataset loaders under ``datasets/`` and
``python/cugraph/cugraph/datasets/dataset.py:64-200`` read the small
benchmark graphs (karate, dolphins, netscience) whose canonical
upstream distribution format is MatrixMarket coordinate; SURVEY.md §2.1
lists the MTX reader as an API-parity item.

Format: a ``%%MatrixMarket matrix coordinate <field> <symmetry>``
banner, ``%`` comment lines, one ``rows cols nnz`` size line, then
``src dst [weight]`` triples, 1-based. ``symmetric`` files store one
triangle; we return it as an undirected Graph (which symmetrizes).

Spark shape: the banner/size header is read driver-side (bounded,
2 lines); the triples parse distributedly from ``spark.read.text``
with the size line dropped by index (zipWithIndex preserves text-file
line order). Ids are converted to 0-based longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import Graph


def read_mtx_edges(spark: SparkSession, path: str) -> tuple[DataFrame, bool]:
    """Returns (edges DataFrame [src, dst, weight], symmetric flag)."""
    with open(path) as fh:
        banner = fh.readline().strip().lower()
    if not banner.startswith("%%matrixmarket"):
        raise ValueError(f"not a MatrixMarket file: {path!r} (banner {banner!r})")
    if "coordinate" not in banner:
        raise ValueError("only coordinate (sparse) MatrixMarket supported")
    # exact token match: "skew-symmetric" would substring-match
    # "symmetric" but needs A[j,i] = -A[i,j] (and "hermitian" needs
    # conjugation) — refuse rather than silently mirror with the same
    # weight
    qualifier = banner.split()[-1]
    if qualifier in ("skew-symmetric", "hermitian"):
        raise ValueError(
            f"MatrixMarket symmetry {qualifier!r} not supported "
            "(only general and symmetric)"
        )
    symmetric = qualifier == "symmetric"

    lines = (
        spark.read.text(path)
        .filter(~F.col("value").startswith("%"))
        .filter(F.length(F.trim("value")) > 0)
    )
    # drop the single size line (first non-comment line; text-file line
    # order is preserved by zipWithIndex)
    data = (
        lines.rdd.zipWithIndex()
        .filter(lambda t: t[1] > 0)
        .map(lambda t: t[0]["value"])
    )
    parts = spark.createDataFrame(data.map(lambda s: (s,)), "line string").select(
        F.split(F.trim("line"), r"\s+").alias("f")
    )
    return (
        parts.select(
            (F.element_at("f", 1).cast("long") - 1).alias("src"),
            (F.element_at("f", 2).cast("long") - 1).alias("dst"),
            F.coalesce(F.try_element_at("f", F.lit(3)).cast("double"), F.lit(1.0)).alias("weight"),
        ),
        symmetric,
    )


def read_mtx(spark: SparkSession, path: str, directed: bool | None = None) -> Graph:
    """Load an .mtx file as a Graph; ``symmetric`` files default to an
    undirected Graph (both directions materialized), ``general`` files
    to directed. Pass ``directed`` to override."""
    edges, symmetric = read_mtx_edges(spark, path)
    if directed is None:
        directed = not symmetric
    return Graph(edges, directed=directed, weighted=True)
