"""PropertyGraph — typed vertex/edge property tables over DataFrames.

Re-creates the reference's ``structure/property_graph.py`` (2548 LoC)
surface Spark-first: property data lives in two long-format DataFrames
(vertex table keyed by ``_VERTEX_``, edge table keyed by
``(_SRC_, _DST_, _EDGE_ID_)``, both carrying ``_TYPE_``), and
algorithms never see properties — ``extract_subgraph`` projects a
plain ``Graph`` exactly like the reference extracts into a
``cugraph.Graph``. The hypergraph builder mirrors
``structure/hypergraph.py`` (599 LoC): tabular rows → bipartite
row-node ↔ (column:value)-node edge list.

Spark notes: each ``add_*_data`` call is a lazy union (columns
auto-aligned, missing → NULL); nothing materializes until an extract
or count; type filters push down into the parquet/Iceberg scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import Graph

_V = "_VERTEX_"
_S = "_SRC_"
_D = "_DST_"
_T = "_TYPE_"
_EID = "_EDGE_ID_"


def _align_union(a: DataFrame | None, b: DataFrame) -> DataFrame:
    if a is None:
        return b
    return a.unionByName(b, allowMissingColumns=True)


class PropertyGraph:
    def __init__(self):
        self._vdata: DataFrame | None = None
        self._edata: DataFrame | None = None

    # ---- ingestion (reference add_vertex_data / add_edge_data) ----

    def add_vertex_data(
        self, df: DataFrame, vertex_col_name: str, type_name: str = ""
    ) -> None:
        self._vdata = _align_union(
            self._vdata,
            df.withColumnRenamed(vertex_col_name, _V).withColumn(
                _T, F.lit(type_name)
            ),
        )

    def add_edge_data(
        self,
        df: DataFrame,
        vertex_col_names: tuple[str, str],
        type_name: str = "",
    ) -> None:
        s, d = vertex_col_names
        e = (
            df.withColumnRenamed(s, _S)
            .withColumnRenamed(d, _D)
            .withColumn(_T, F.lit(type_name))
        )
        self._edata = _align_union(self._edata, e)

    # ---- introspection ----

    def get_num_vertices(self, include_edge_endpoints: bool = True) -> int:
        parts = []
        if self._vdata is not None:
            parts.append(self._vdata.select(F.col(_V).alias("v")))
        if include_edge_endpoints and self._edata is not None:
            parts.append(self._edata.select(F.col(_S).alias("v")))
            parts.append(self._edata.select(F.col(_D).alias("v")))
        if not parts:
            return 0
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct().count()

    def get_num_edges(self) -> int:
        return self._edata.count() if self._edata is not None else 0

    def vertex_types(self) -> list[str]:
        if self._vdata is None:
            return []
        return sorted(r[0] for r in self._vdata.select(_T).distinct().collect())

    def edge_types(self) -> list[str]:
        if self._edata is None:
            return []
        return sorted(r[0] for r in self._edata.select(_T).distinct().collect())

    # ---- retrieval ----

    def get_vertex_data(
        self, vertex_ids=None, types: list[str] | None = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        if self._vdata is None:
            raise ValueError("no vertex data")
        out = self._vdata
        if types:
            out = out.filter(F.col(_T).isin(types))
        if vertex_ids is not None:
            out = out.filter(F.col(_V).isin(list(vertex_ids)))
        if columns:
            out = out.select(_V, _T, *columns)
        return out

    def get_edge_data(
        self, types: list[str] | None = None, columns: list[str] | None = None
    ) -> DataFrame:
        if self._edata is None:
            raise ValueError("no edge data")
        out = self._edata
        if types:
            out = out.filter(F.col(_T).isin(types))
        if columns:
            out = out.select(_S, _D, _T, *columns)
        return out

    def vertex_property_names(self) -> list[str]:
        """Reference ``vertex_property_names`` (property_graph.py:284):
        user property columns, excluding the reserved key/type cols."""
        if self._vdata is None:
            return []
        return sorted(c for c in self._vdata.columns if c not in (_V, _T))

    def edge_property_names(self) -> list[str]:
        if self._edata is None:
            return []
        return sorted(c for c in self._edata.columns if c not in (_S, _D, _T, _EID))

    def get_vertices(self) -> DataFrame:
        """Reference ``get_vertices`` (property_graph.py:499): distinct
        vertex ids across vertex data and edge endpoints."""
        parts = []
        if self._vdata is not None:
            parts.append(self._vdata.select(F.col(_V).alias("vertex")))
        if self._edata is not None:
            parts.append(self._edata.select(F.col(_S).alias("vertex")))
            parts.append(self._edata.select(F.col(_D).alias("vertex")))
        if not parts:
            raise ValueError("empty PropertyGraph")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()

    def select_vertices(self, expr: str) -> DataFrame:
        """Reference ``select_vertices`` (property_graph.py:1428): SQL
        expression over the vertex table → selected vertex ids (the
        Spark-native stand-in for PropertySelection; feed the result to
        callers that take a vertex list)."""
        if self._vdata is None:
            raise ValueError("no vertex data")
        return self._vdata.filter(expr).select(F.col(_V).alias("vertex")).distinct()

    def select_edges(self, expr: str) -> DataFrame:
        """Reference ``select_edges`` (property_graph.py:1510): SQL
        expression over the edge table → selected edge rows."""
        if self._edata is None:
            raise ValueError("no edge data")
        return self._edata.filter(expr)

    def fillna_vertices(self, val=0) -> None:
        """Reference ``fillna_vertices`` (property_graph.py:1382)."""
        if self._vdata is not None:
            self._vdata = self._vdata.fillna(val)

    def fillna_edges(self, val=0) -> None:
        """Reference ``fillna_edges`` (property_graph.py:1405)."""
        if self._edata is not None:
            self._edata = self._edata.fillna(val)

    # ---- extraction (the algorithm boundary) ----

    def extract_subgraph(
        self,
        edge_types: list[str] | None = None,
        edge_filter: str | None = None,
        weight_col: str | None = None,
        directed: bool = True,
        do_renumber: bool = False,
    ) -> Graph:
        """Project a plain ``Graph`` from the selected edge rows —
        the analog of PropertyGraph.extract_subgraph returning a
        ``cugraph.Graph`` with no properties attached."""
        if self._edata is None:
            raise ValueError("no edge data")
        e = self._edata
        if edge_types:
            e = e.filter(F.col(_T).isin(edge_types))
        if edge_filter:
            e = e.filter(edge_filter)
        sel = [F.col(_S).alias("src"), F.col(_D).alias("dst")]
        if weight_col is not None:
            sel.append(F.col(weight_col).cast("double").alias("weight"))
        proj = e.select(*sel)
        return Graph.from_edgelist(
            proj,
            weight_col="weight" if weight_col is not None else None,
            directed=directed,
            do_renumber=do_renumber,
        )

    def annotate_dataframe(
        self, df: DataFrame, src_col: str, dst_col: str,
        edge_types: list[str] | None = None,
    ) -> DataFrame:
        """Join edge properties back onto an external (src,dst) frame
        (reference ``annotate_dataframe``)."""
        e = self.get_edge_data(types=edge_types)
        return df.join(
            e,
            (df[src_col] == e[_S]) & (df[dst_col] == e[_D]),
            "left",
        ).drop(_S, _D)


def hypergraph(
    df: DataFrame,
    columns: list[str] | None = None,
    categories: dict | None = None,
    direct: bool = False,
    row_id_col: str = "row_id",
) -> DataFrame:
    """Tabular → graph (reference ``structure/hypergraph.py``).

    Default (``direct=False``): bipartite edges row-node → value-node,
    one edge per non-null cell; node ids are strings
    ``"row::<id>"`` / ``"<col>::<value>"`` (the reference's
    ``col::value`` naming). ``direct=True``: value-nodes connected
    pairwise per row (the reference's direct mode), skipping
    row-nodes. ``categories`` maps column → category name so columns
    with the same kinds of values share one node namespace
    (``cat::value``), exactly the reference's ``categories`` knob
    (hypergraph.py:105-108, ``cat = categories.get(key, key)``).
    Returns an edge DataFrame (src, dst, weight).

    Row identity: ``row_id_col`` when present; otherwise a
    deterministic CONTENT-HASH id. Under that fallback, exact
    duplicate rows collapse into ONE row-node (set semantics) — pass
    ``row_id_col`` when the input is a multiset and per-physical-row
    nodes matter (e.g. de-normalized event logs with repeated rows).
    """
    cols = columns or [c for c in df.columns if c != row_id_col]
    categories = categories or {}
    # Row identity: row_id_col when present; otherwise the row's
    # CONTENT HASH (sha2-256 over a length-prefixed encoding of every
    # column) — deterministic at any parallelism, unlike the round-2
    # monotonically_increasing_id fallback whose ids depended on
    # partition layout (two runs at different core counts renamed every
    # row-node). Exact duplicate rows collapse to one row-node under
    # the fallback; pass row_id_col for multiset semantics.
    if row_id_col in df.columns:
        rid = F.concat(F.lit("row::"), F.col(row_id_col).cast("string"))
    else:
        # true SET semantics: physically collapse exact duplicates
        # BEFORE building edges — identical rows sharing one __rid must
        # contribute ONE row-node with weight-1 edges, not accumulated
        # weights. sha2-256 (not a 64-bit hash): at 10⁹+ rows a 64-bit
        # id has birthday-real collision odds, silently merging two
        # DISTINCT rows. Each value is LENGTH-PREFIXED ("<len>:<val>";
        # null → "n:") before joining, so column boundaries stay
        # unambiguous even when values themselves contain the join
        # separator — ("a\x01b","c") and ("a","b\x01c") encode
        # differently ("4:a\x01b␟1:c" vs "1:a␟4:b\x01c"), where a bare
        # concat_ws would have merged them into one row-node.
        df = df.dropDuplicates()

        def _enc(c: str):
            s = F.col(c).cast("string")
            return F.when(s.isNull(), F.lit("n:")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )

        rid = F.concat(
            F.lit("row::"),
            F.sha2(
                F.concat_ws("\x01", *[_enc(c) for c in df.columns]),
                256,
            ),
        )
    base = df.withColumn("__rid", rid)
    val_nodes = [
        F.when(
            F.col(c).isNotNull(),
            F.concat(
                F.lit(categories.get(c, c) + "::"), F.col(c).cast("string")
            ),
        ).alias(c)
        for c in cols
    ]
    melted = base.select("__rid", F.array(*val_nodes).alias("vals"))
    if not direct:
        return (
            melted.select("__rid", F.explode("vals").alias("val"))
            .filter(F.col("val").isNotNull())
            .groupBy(F.col("__rid").alias("src"), F.col("val").alias("dst"))
            .agg(F.count("*").cast("double").alias("weight"))
        )
    ex = melted.select("__rid", F.explode("vals").alias("val")).filter(
        F.col("val").isNotNull()
    )
    # per-row pair fan-out is ≤ len(cols)² — bounded by the SCHEMA, not
    # the data — so unlike the similarity/edges_ss common-neighbor
    # joins this self-join needs no hub salting
    a = ex.select(F.col("__rid").alias("r"), F.col("val").alias("src"))
    b = ex.select(F.col("__rid").alias("r"), F.col("val").alias("dst"))
    return (
        a.join(b, "r")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
