"""Reference-spelled module-level API (cugraph top-level exports).

cuGraph exposes its conversion helpers and several algorithms as BOTH
free functions and ``Graph`` methods (exports at
``python/cugraph/cugraph/__init__.py:14-110``; converters in
``structure/convert_matrix.py``). The engine's native surface is the
snake_case method/function set; this module adds the module-level
spellings so a reference user's imports keep working:

    import cugraph_spark as cugraph
    G = cugraph.from_pandas_edgelist(pdf, source="u", destination="v")
    cugraph.to_pandas_edgelist(G)
    cugraph.spectralBalancedCutClustering(G, 2)

Everything here is a thin delegate — no logic lives in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph import DST, SRC, Graph
from .operators.sampling import node2vec_walks
from .operators.spectral import (
    analyze_clustering_edge_cut,
    analyze_clustering_modularity,
    analyze_clustering_ratio_cut,
    spectral_clustering,
    spectral_modularity_maximization_clustering,
)


def _spark() -> SparkSession:
    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("no active SparkSession — create one first")
    return s


def _resolve_create_using(create_using):
    """(class, directed) from a ``create_using`` that is either a Graph
    subclass (directedness from its class-level ``DIRECTED`` default)
    or, like the reference accepts, an instance (directedness from the
    instance — ``cugraph.Graph(directed=True)`` idiom)."""
    if isinstance(create_using, Graph):
        return type(create_using), create_using.directed
    return create_using, getattr(create_using, "DIRECTED", True)


# ---- constructors (convert_matrix.py:30-356, graph_classes.py) ----

def from_edgelist(
    df,
    source: str = "src",
    destination: str = "dst",
    edge_attr: str | None = None,
    create_using=Graph,
    renumber: bool = False,
):
    """``cugraph.from_edgelist`` (convert_matrix.py:30): accepts a Spark
    DataFrame or a pandas DataFrame (the reference dispatches on input
    type the same way)."""
    if not isinstance(df, DataFrame):
        df = _spark().createDataFrame(df)
    cls, directed = _resolve_create_using(create_using)
    return cls.from_edgelist(
        df, src_col=source, dst_col=destination, weight_col=edge_attr,
        directed=directed,
        do_renumber=renumber,
    )


# the engine's edge list IS the columnar (cuDF-analog) path
from_cudf_edgelist = from_edgelist


def from_pandas_edgelist(
    pdf,
    source: str = "src",
    destination: str = "dst",
    edge_attr: str | None = None,
    create_using=Graph,
    renumber: bool = False,
):
    return from_edgelist(
        pdf, source=source, destination=destination, edge_attr=edge_attr,
        create_using=create_using, renumber=renumber,
    )


def from_adjlist(offsets, indices, values=None, create_using=Graph):
    cls, directed = _resolve_create_using(create_using)
    return cls.from_adjlist(
        _spark(), offsets, indices, weights=values, directed=directed,
    )


def from_pandas_adjacency(df, create_using=Graph):
    cls, directed = _resolve_create_using(create_using)
    return cls.from_pandas_adjacency(_spark(), df, directed=directed)


def from_numpy_array(A, create_using=Graph):
    cls, directed = _resolve_create_using(create_using)
    return cls.from_numpy_array(_spark(), A, directed=directed)


from_numpy_matrix = from_numpy_array


# ---- sinks ----

def to_pandas_edgelist(G: Graph, source: str = "src", destination: str = "dst"):
    pdf = G.to_pandas_edgelist()
    return pdf.rename(columns={SRC: source, DST: destination})


def to_pandas_adjacency(G: Graph):
    return G.to_pandas_adjacency()


def to_numpy_array(G: Graph):
    return G.to_numpy_array()


to_numpy_matrix = to_numpy_array


# ---- structure free functions ----

def induced_subgraph(G: Graph, vertices) -> Graph:
    """``cugraph.induced_subgraph`` / ``cugraph.subgraph``
    (community/subgraph_extraction.py): ``vertices`` may be a DataFrame
    with a ``vertex`` column or a python sequence of ids."""
    if not isinstance(vertices, DataFrame):
        vertices = _spark().createDataFrame(
            [(int(v),) for v in vertices], schema="vertex long"
        )
    return G.induced_subgraph(vertices)


subgraph = induced_subgraph


# ---- predicates (reference exports these as free functions too) ----

def is_directed(G: Graph) -> bool:
    return G.is_directed()


def is_weighted(G: Graph) -> bool:
    return G.is_weighted()


def is_multigraph(G: Graph) -> bool:
    return G.is_multigraph()


def is_bipartite(G: Graph) -> bool:
    return G.is_bipartite()


def is_multipartite(G: Graph) -> bool:
    return G.is_multipartite()


# ---- algorithm spellings ----

def node2vec(
    G: Graph,
    start_vertices,
    max_depth: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """``cugraph.node2vec`` (sampling/node2vec.py): start_vertices may
    be a DataFrame with a ``vertex`` column or a python sequence."""
    if not isinstance(start_vertices, DataFrame):
        start_vertices = _spark().createDataFrame(
            [(int(v),) for v in start_vertices], schema="vertex long"
        )
    return node2vec_walks(
        G, start_vertices, max_depth=max_depth, p=p, q=q, seed=seed
    )


# reference camelCase spectral exports (community/spectral_clustering.py)
spectralBalancedCutClustering = spectral_clustering
spectralModularityMaximizationClustering = (
    spectral_modularity_maximization_clustering
)
analyzeClustering_modularity = analyze_clustering_modularity
analyzeClustering_edge_cut = analyze_clustering_edge_cut
analyzeClustering_ratio_cut = analyze_clustering_ratio_cut
