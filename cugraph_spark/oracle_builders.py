"""DuckDB oracle-SQL generators for the driver correctness gate.

Each function returns ANSI-SQL (DuckDB dialect) that recomputes one
operator's result independently of Spark, for the driver's
rows/schema/value-hash comparison. Three families:

1. **Unrolled fixed-iteration twins** (sssp, hits, eigenvector,
   core_number, k_truss, louvain level-1, betweenness, mst): the
   superstep recurrence is unrolled into chained CTEs with the exact
   same arithmetic and tie-breaking as the Spark operator, following
   the proven ``_pagerank_sql`` / ``_katz_sql`` pattern in queries.py.
   The Spark side runs to convergence; the SQL side unrolls enough
   iterations to be past the fixpoint on the test graph — both then
   express the same mathematical object.
2. **Closure twins** (scc, mst component merge): DuckDB
   ``WITH RECURSIVE`` transitive closures. NOTE the DuckDB quirk: any
   CTE with a bare ``UNION`` body inside a WITH RECURSIVE block is
   treated as recursive — non-recursive dedup must use
   ``SELECT DISTINCT`` over ``UNION ALL``.
3. **Portable-hash twins** (minhash, simhash, embedding LSH): the
   Spark queries switch their hash to the 60-bit md5 portable hash
   (``functions.dedup._hash64`` with fn='md5_60') / literal
   hyperplanes, which DuckDB reproduces bit-for-bit — so the FULL
   pipelines (shingle → minhash → band → candidate → verify;
   token → simhash → pigeonhole block → hamming) are value-checked,
   not rows-only.

Reference parity notes live on each builder; all ``path:line`` cites
are into /root/reference (cuGraph 24.08).
"""

from __future__ import annotations

# DuckDB snippet reproducing cugraph_spark.functions.dedup._hash64
# (fn='md5_60'): first 15 hex chars of md5 as a non-negative 60-bit int.
def _h60(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# words/shingles preprocessing identical to functions.text.shingles
_WORDS = (
    r"regexp_split_to_array(trim(lower(regexp_replace(text, '[^\w\s]', '', 'g'))), '\s+')"
)


# --------------------------------------------------------------- traversal

def sssp_sql(edges_sql: str, source: int, iters: int = 10) -> str:
    """Unrolled Bellman-Ford (mirrors operators/traversal.py:sssp —
    reference traversal/sssp_impl.cuh relax loop). NULL = unreachable.
    ``iters`` must exceed the hop-length of the longest shortest path
    on the test graph; distances are path sums accumulated left-to-
    right in both engines, so values match exactly."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT DISTINCT vertex FROM ("
        "SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e))",
        f"d0 AS MATERIALIZED (SELECT vertex, CASE WHEN vertex = {source} THEN 0.0 END AS dist FROM verts)",
    ]
    for i in range(iters):
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT e.dst AS vertex, MIN(d.dist + e.weight) AS nd "
            f"FROM e JOIN d{i} d ON e.src = d.vertex WHERE d.dist IS NOT NULL "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"d{i + 1} AS MATERIALIZED (SELECT v.vertex, CASE "
            f"WHEN v.dist IS NULL THEN m.nd WHEN m.nd IS NULL THEN v.dist "
            f"WHEN m.nd < v.dist THEN m.nd ELSE v.dist END AS dist "
            f"FROM d{i} v LEFT JOIN m{i} m ON v.vertex = m.vertex)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT vertex, ROUND(dist, 6) + 0.0 AS distance FROM d{iters}"
    )


# --------------------------------------------------------------- centrality

def hits_sql(edges_sql: str, iters: int = 3) -> str:
    """Fixed-iteration HITS twin of operators/centrality.py:hits
    (reference link_analysis/hits_impl.cuh): unnormalized hub power
    iteration h ← A·Aᵀ(h/S) with the L1 scale S divided in lazily,
    exactly like the Spark operator; final hubs = h/S, authorities =
    L1-normalized Aᵀ(h/S). Unweighted adjacency, like the reference."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT DISTINCT vertex FROM ("
        "SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e))",
        "h0 AS MATERIALIZED (SELECT vertex, 1.0 AS h FROM verts)",
        "s0 AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS s FROM verts)",
    ]
    for i in range(iters):
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT e.dst AS vertex, SUM(h.h) / (SELECT s FROM s{i}) AS a "
            f"FROM e JOIN h{i} h ON e.src = h.vertex GROUP BY e.dst)"
        )
        parts.append(
            f"h{i + 1} AS MATERIALIZED (SELECT v.vertex, COALESCE(x.hn, 0.0) AS h FROM verts v "
            f"LEFT JOIN (SELECT e.src AS vertex, SUM(a.a) AS hn "
            f"FROM e JOIN a{i} a ON e.dst = a.vertex GROUP BY e.src) x "
            f"ON v.vertex = x.vertex)"
        )
        parts.append(f"s{i + 1} AS MATERIALIZED (SELECT SUM(h) AS s FROM h{i + 1})")
    n = iters
    parts.append(
        f"af AS MATERIALIZED (SELECT e.dst AS vertex, SUM(h.h) / (SELECT s FROM s{n}) AS a "
        f"FROM e JOIN h{n} h ON e.src = h.vertex GROUP BY e.dst)"
    )
    parts.append("asum AS MATERIALIZED (SELECT SUM(a) AS s FROM af)")
    return (
        ",\n".join(parts)
        + f"""
SELECT v.vertex,
       ROUND(h.h / (SELECT s FROM s{n}), 8) + 0.0 AS hubs,
       ROUND(COALESCE(a.a, 0.0) / (SELECT s FROM asum), 8) + 0.0 AS authorities
FROM verts v
JOIN h{n} h ON v.vertex = h.vertex
LEFT JOIN af a ON v.vertex = a.vertex
"""
    )


def eigenvector_sql(edges_sql: str, iters: int = 3) -> str:
    """Fixed-iteration eigenvector-centrality twin of
    operators/centrality.py:eigenvector_centrality (reference
    centrality/eigenvector_centrality_impl.cuh): c ← Aᵀ(c/N) with the
    L2 scale N divided in lazily; output c/N_final."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT DISTINCT vertex FROM ("
        "SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e))",
        "u0 AS MATERIALIZED (SELECT vertex, 1.0 / sqrt((SELECT COUNT(*) FROM verts)) AS c FROM verts)",
        "n0 AS MATERIALIZED (SELECT 1.0 AS n)",
    ]
    for i in range(iters):
        parts.append(
            f"u{i + 1} AS MATERIALIZED (SELECT v.vertex, COALESCE(x.s, 0.0) AS c FROM verts v "
            f"LEFT JOIN (SELECT e.dst AS vertex, "
            f"SUM(u.c * e.weight) / (SELECT n FROM n{i}) AS s "
            f"FROM e JOIN u{i} u ON e.src = u.vertex GROUP BY e.dst) x "
            f"ON v.vertex = x.vertex)"
        )
        parts.append(f"n{i + 1} AS MATERIALIZED (SELECT sqrt(SUM(c * c)) AS n FROM u{i + 1})")
    return (
        ",\n".join(parts)
        + f"\nSELECT vertex, ROUND(c / (SELECT n FROM n{iters}), 8) + 0.0 "
        f"AS eigenvector_centrality FROM u{iters}"
    )


def _brandes_parts(edges_sql: str, depth: int) -> list[str]:
    """Shared Brandes CTE chain (forward sweep + backward deltas) used
    by both the vertex and edge betweenness twins."""
    parts = [
        f"WITH e0 AS MATERIALIZED ({edges_sql})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0)",
        "verts AS MATERIALIZED (SELECT DISTINCT vertex FROM ("
        "SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e))",
        "l0 AS MATERIALIZED (SELECT vertex AS source, vertex AS vertex, 1.0 AS sigma FROM verts)",
        "r0 AS MATERIALIZED (SELECT source, vertex FROM l0)",
    ]
    for d in range(depth):
        parts.append(
            f"c{d} AS MATERIALIZED (SELECT f.source, e.dst AS vertex, SUM(f.sigma) AS sigma "
            f"FROM l{d} f JOIN e ON e.src = f.vertex GROUP BY f.source, e.dst)"
        )
        parts.append(
            f"l{d + 1} AS MATERIALIZED (SELECT c.source, c.vertex, c.sigma FROM c{d} c "
            f"LEFT JOIN r{d} r ON c.source = r.source AND c.vertex = r.vertex "
            f"WHERE r.vertex IS NULL)"
        )
        parts.append(
            f"r{d + 1} AS MATERIALIZED (SELECT source, vertex FROM r{d} "
            f"UNION ALL SELECT source, vertex FROM l{d + 1})"
        )
    # backward sweep: delta at the deepest unrolled level is 0
    parts.append(
        f"delta{depth} AS MATERIALIZED (SELECT source, vertex, sigma, 0.0 AS delta FROM l{depth})"
    )
    for d in range(depth - 1, -1, -1):
        parts.append(
            f"dep{d} AS MATERIALIZED (SELECT cur.source, cur.vertex, "
            f"SUM(cur.sigma / w.sigma * (1.0 + w.delta)) AS dep "
            f"FROM l{d} cur JOIN e ON cur.vertex = e.src "
            f"JOIN delta{d + 1} w ON w.source = cur.source AND w.vertex = e.dst "
            f"GROUP BY cur.source, cur.vertex)"
        )
        parts.append(
            f"delta{d} AS MATERIALIZED (SELECT cur.source, cur.vertex, cur.sigma, "
            f"COALESCE(p.dep, 0.0) AS delta FROM l{d} cur "
            f"LEFT JOIN dep{d} p ON cur.source = p.source AND cur.vertex = p.vertex)"
        )
    parts.append("vc AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM verts)")
    return parts


def betweenness_sql(edges_sql: str, depth: int = 6) -> str:
    """All-sources Brandes twin of operators/betweenness.py (reference
    centrality/betweenness_centrality_impl.cuh): level-synchronous
    forward sweep batched over every source (sigma = path counts),
    then the backward dependency sweep per level, normalized by
    1/((V-1)(V-2)). ``depth`` must exceed the graph's BFS eccentricity
    from any source; deeper levels are empty CTEs and contribute 0."""
    parts = _brandes_parts(edges_sql, depth)
    acc_union = " UNION ALL ".join(
        f"SELECT vertex, delta FROM delta{d}" for d in range(1, depth)
    )
    parts.append(f"acc AS MATERIALIZED (SELECT vertex, SUM(delta) AS bc FROM ({acc_union}) GROUP BY vertex)")
    return (
        ",\n".join(parts)
        + """
SELECT vt.vertex,
       ROUND(COALESCE(a.bc, 0.0) * (1.0 / (((SELECT v FROM vc) - 1) * ((SELECT v FROM vc) - 2))), 8) + 0.0
         AS betweenness_centrality
FROM verts vt LEFT JOIN acc a ON vt.vertex = a.vertex
"""
    )


def edge_betweenness_sql(edges_sql: str, depth: int = 6) -> str:
    """All-sources EDGE betweenness twin of
    operators/betweenness.py:edge_betweenness_centrality (reference
    betweenness_centrality_impl.cuh:560-670): the per-(v,w) dependency
    term sigma(v)/sigma(w)·(1+delta(w)) accumulates onto edge (v,w) at
    every level (including level 0), normalized by 1/(V(V-1))."""
    parts = _brandes_parts(edges_sql, depth)
    edep_union = " UNION ALL ".join(
        f"SELECT cur.vertex AS src, e.dst AS dst, "
        f"cur.sigma / w.sigma * (1.0 + w.delta) AS term "
        f"FROM l{d} cur JOIN e ON cur.vertex = e.src "
        f"JOIN delta{d + 1} w ON w.source = cur.source AND w.vertex = e.dst"
        for d in range(depth)
    )
    parts.append(
        f"eacc AS MATERIALIZED (SELECT src, dst, SUM(term) AS bc "
        f"FROM ({edep_union}) GROUP BY src, dst)"
    )
    return (
        ",\n".join(parts)
        + """
SELECT e.src, e.dst,
       ROUND(COALESCE(a.bc, 0.0) * (1.0 / ((SELECT v FROM vc) * ((SELECT v FROM vc) - 1))), 8) + 0.0
         AS betweenness_centrality
FROM e LEFT JOIN eacc a ON e.src = a.src AND e.dst = a.dst
"""
    )


# --------------------------------------------------------------- components

def scc_sql(edges_sql: str) -> str:
    """SCC labels via two-way recursive reachability closure: label(v) =
    max id u with v⇝u and u⇝v (the FB-coloring label contract of
    operators/scc.py — max vertex id in the SCC)."""
    return f"""
WITH RECURSIVE e0 AS MATERIALIZED ({edges_sql}),
ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
verts AS MATERIALIZED (SELECT DISTINCT vertex FROM (
    SELECT src AS vertex FROM e0 UNION ALL SELECT dst FROM e0)),
reach(a, b) AS (
    SELECT src, dst FROM ed
    UNION
    SELECT r.a, e.dst FROM reach r JOIN ed e ON e.src = r.b
),
m AS (
    SELECT r1.a AS v, MAX(r1.b) AS mx
    FROM reach r1 JOIN reach r2 ON r1.b = r2.a AND r2.b = r1.a
    GROUP BY r1.a
)
SELECT vt.vertex, CAST(GREATEST(vt.vertex, COALESCE(m.mx, vt.vertex)) AS BIGINT) AS labels
FROM verts vt LEFT JOIN m ON vt.vertex = m.v
"""


# --------------------------------------------------------------- cores

def _core_parts(edges_sql: str, iters: int) -> list[str]:
    parts = [
        f"WITH e0 AS MATERIALIZED ({edges_sql})",
        "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0) WHERE src <> dst)",
        "verts AS MATERIALIZED (SELECT DISTINCT vertex FROM ("
        "SELECT src AS vertex FROM e0 UNION ALL SELECT dst FROM e0))",
        "c0 AS MATERIALIZED (SELECT v.vertex, CAST(COALESCE(d.cnt, 0) AS BIGINT) AS core FROM verts v "
        "LEFT JOIN (SELECT src, COUNT(*) AS cnt FROM und GROUP BY src) d ON v.vertex = d.src)",
    ]
    for i in range(iters):
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT dst, MAX(LEAST(nbr_core, rnk)) AS h FROM ("
            f"SELECT u.dst, c.core AS nbr_core, "
            f"ROW_NUMBER() OVER (PARTITION BY u.dst ORDER BY c.core DESC) AS rnk "
            f"FROM und u JOIN c{i} c ON u.src = c.vertex) GROUP BY dst)"
        )
        parts.append(
            f"c{i + 1} AS MATERIALIZED (SELECT v.vertex, LEAST(v.core, COALESCE(h.h, 0)) AS core "
            f"FROM c{i} v LEFT JOIN h{i} h ON v.vertex = h.dst)"
        )
    return parts


def core_number_sql(edges_sql: str, iters: int = 6) -> str:
    """Unrolled h-index fixpoint twin of operators/cores.py:core_number
    (Montresor et al. distributed k-core; reference
    cores/core_number_impl.cuh semantics): core ← H(neighbor cores)
    from core = degree, monotonically non-increasing, exact at the
    fixpoint. ``iters`` must be past convergence on the test graph."""
    parts = _core_parts(edges_sql, iters)
    return (
        ",\n".join(parts)
        + f"\nSELECT vertex, CAST(core AS BIGINT) AS core_number FROM c{iters}"
    )


def k_core_sql(edges_sql: str, k: int, iters: int = 6) -> str:
    """k-core subgraph twin of operators/cores.py:k_core (reference
    cores/k_core_impl.cuh): the induced min-weight-symmetrized edge set
    on {v : core(v) ≥ k}, emitted canonically as src < dst rows."""
    parts = _core_parts(edges_sql, iters)
    parts.append(
        f"keep AS MATERIALIZED (SELECT vertex FROM c{iters} WHERE core >= {k})"
    )
    parts.append(
        "se AS MATERIALIZED (SELECT src, dst, MIN(weight) AS w FROM ("
        "SELECT src, dst, weight FROM e0 UNION ALL SELECT dst, src, weight FROM e0"
        ") GROUP BY src, dst)"
    )
    return (
        ",\n".join(parts)
        + """
SELECT se.src, se.dst, ROUND(se.w, 6) + 0.0 AS weight
FROM se
JOIN keep ka ON se.src = ka.vertex
JOIN keep kb ON se.dst = kb.vertex
WHERE se.src < se.dst
"""
    )


# --------------------------------------------------------------- tree

def mst_sql(edges_sql: str, rounds: int = 5) -> str:
    """Unrolled Borůvka twin of operators/tree.py:minimum_spanning_tree
    (reference tree/legacy/mst.cu): per round, each component picks its
    (weight, src, dst)-lexicographic minimum outgoing edge; components
    re-derive from the chosen forest via a recursive min-label closure.
    ``rounds ≥ ceil(log2 V)`` guarantees the fixpoint."""
    parts = [
        f"WITH RECURSIVE e0 AS MATERIALIZED ({edges_sql})",
        "und AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, MIN(weight) AS w "
        "FROM e0 WHERE src <> dst GROUP BY 1, 2)",
        "verts AS MATERIALIZED (SELECT DISTINCT v FROM ("
        "SELECT a AS v FROM und UNION ALL SELECT b FROM und))",
        "chosen0 AS MATERIALIZED (SELECT a, b, w FROM und WHERE FALSE)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"sym{r} AS MATERIALIZED (SELECT a, b FROM chosen{r - 1} "
            f"UNION ALL SELECT b, a FROM chosen{r - 1})"
        )
        parts.append(
            f"reach{r}(v, l) AS (SELECT v, v FROM verts "
            f"UNION SELECT s.b, r.l FROM reach{r} r JOIN sym{r} s ON s.a = r.v)"
        )
        parts.append(
            f"comp{r} AS MATERIALIZED (SELECT v, MIN(l) AS c FROM reach{r} GROUP BY v)"
        )
        parts.append(
            f"cand{r} AS MATERIALIZED (SELECT ca.c AS comp, u.a, u.b, u.w FROM und u "
            f"JOIN comp{r} ca ON u.a = ca.v JOIN comp{r} cb ON u.b = cb.v "
            f"WHERE ca.c <> cb.c "
            f"UNION ALL "
            f"SELECT cb.c AS comp, u.a, u.b, u.w FROM und u "
            f"JOIN comp{r} ca ON u.a = ca.v JOIN comp{r} cb ON u.b = cb.v "
            f"WHERE ca.c <> cb.c)"
        )
        parts.append(
            f"pick{r} AS MATERIALIZED (SELECT DISTINCT a, b, w FROM ("
            f"SELECT a, b, w, ROW_NUMBER() OVER (PARTITION BY comp ORDER BY w, a, b) AS rn "
            f"FROM cand{r}) WHERE rn = 1)"
        )
        parts.append(
            f"chosen{r} AS MATERIALIZED (SELECT DISTINCT a, b, w FROM ("
            f"SELECT a, b, w FROM chosen{r - 1} UNION ALL SELECT a, b, w FROM pick{r}))"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT a AS src, b AS dst, ROUND(w, 6) + 0.0 AS weight FROM chosen{rounds}"
    )


# --------------------------------------------------------------- community

def k_truss_sql(edges_sql: str, k: int, iters: int = 4) -> str:
    """Iterated triangle-support filter twin of
    operators/community.py:k_truss (reference community/k_truss_impl.cuh):
    per round drop undirected edges with < k−2 common neighbors, until
    stable. ``iters`` must be past the fixpoint on the test graph."""
    parts = [
        f"WITH e0 AS MATERIALIZED ({edges_sql})",
        "t0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
        "FROM e0 WHERE src <> dst)",
    ]
    for i in range(iters):
        parts.append(
            f"sym{i} AS MATERIALIZED (SELECT a AS u, b AS v FROM t{i} "
            f"UNION ALL SELECT b, a FROM t{i})"
        )
        parts.append(
            f"t{i + 1} AS MATERIALIZED (SELECT a, b FROM ("
            f"SELECT t.a, t.b, COUNT(*) AS c FROM t{i} t "
            f"JOIN sym{i} n1 ON n1.u = t.a JOIN sym{i} n2 ON n2.u = t.b AND n2.v = n1.v "
            f"GROUP BY t.a, t.b) WHERE c >= {k - 2})"
        )
    return ",\n".join(parts) + f"\nSELECT a AS src, b AS dst FROM t{iters}"


def louvain_level_sql(edges_sql: str, inner_iters: int = 2,
                      min_gain: float = 1.0e-7, resolution: float = 1.0) -> str:
    """Level-1 Louvain twin of operators/community.py:louvain at
    max_levels=1 (reference community/louvain_impl.cuh move phase):
    ``inner_iters`` synchronous best-modularity-gain move rounds with
    min-label tie-break over the symmetrized graph, then the level-1
    modularity gate — labels are kept only if Q improves over the
    singleton partition (the operator's own acceptance rule). All gain
    inputs (k, σ, k_in, 2m) are integer-valued sums on the test graph,
    so gain comparisons are float-exact across engines."""
    parts = [
        f"WITH e0 AS MATERIALIZED ({edges_sql})",
        "eu AS MATERIALIZED (SELECT src, dst, weight FROM e0 UNION ALL SELECT dst, src, weight FROM e0)",
        "e AS MATERIALIZED (SELECT src, dst, MIN(weight) AS w FROM eu GROUP BY src, dst)",
        "twom AS MATERIALIZED (SELECT SUM(w) AS m2 FROM e)",
        "verts AS MATERIALIZED (SELECT DISTINCT vertex FROM ("
        "SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e))",
        "kk AS MATERIALIZED (SELECT v.vertex, COALESCE(s.k, 0.0) AS k FROM verts v "
        "LEFT JOIN (SELECT src, SUM(w) AS k FROM e GROUP BY src) s ON v.vertex = s.src)",
        "l0 AS MATERIALIZED (SELECT vertex, vertex AS lab FROM verts)",
    ]
    for i in range(inner_iters):
        parts.append(
            f"sig{i} AS MATERIALIZED (SELECT l.lab AS slab, SUM(k.k) AS sigma "
            f"FROM l{i} l JOIN kk k ON l.vertex = k.vertex GROUP BY l.lab)"
        )
        parts.append(
            f"knc{i} AS MATERIALIZED (SELECT e.src AS vertex, l.lab AS cand, SUM(e.w) AS k_in "
            f"FROM e JOIN l{i} l ON e.dst = l.vertex WHERE e.src <> e.dst "
            f"GROUP BY e.src, l.lab)"
        )
        parts.append(
            f"sc{i} AS MATERIALIZED (SELECT n.vertex, n.cand, "
            f"n.k_in - ({resolution} * k.k) * (s.sigma - CASE WHEN n.cand = cur.lab THEN k.k ELSE 0.0 END) "
            f"/ (SELECT m2 FROM twom) AS gain "
            f"FROM knc{i} n JOIN l{i} cur ON n.vertex = cur.vertex "
            f"JOIN kk k ON n.vertex = k.vertex JOIN sig{i} s ON n.cand = s.slab)"
        )
        parts.append(
            f"best{i} AS MATERIALIZED (SELECT vertex, cand, gain FROM ("
            f"SELECT vertex, cand, gain, "
            f"ROW_NUMBER() OVER (PARTITION BY vertex ORDER BY gain DESC, cand ASC) AS rn "
            f"FROM sc{i}) WHERE rn = 1)"
        )
        parts.append(
            f"l{i + 1} AS MATERIALIZED (SELECT l.vertex, CASE WHEN b.gain > {min_gain} THEN b.cand "
            f"ELSE l.lab END AS lab FROM l{i} l LEFT JOIN best{i} b ON l.vertex = b.vertex)"
        )
    n = inner_iters
    # modularity gate: Q(labels) vs Q(singletons); mirror community.modularity
    def _mod(lab_cte: str, alias: str) -> str:
        return (
            f"{alias} AS MATERIALIZED (SELECT SUM(in_c / (SELECT m2 FROM twom)) "
            f"- {resolution} * SUM(POW(deg_c / (SELECT m2 FROM twom), 2.0)) AS q FROM ("
            f"SELECT SUM(CASE WHEN la.lab = lb.lab THEN e.w ELSE 0.0 END) AS in_c, "
            f"SUM(e.w) AS deg_c FROM e "
            f"JOIN {lab_cte} la ON e.src = la.vertex JOIN {lab_cte} lb ON e.dst = lb.vertex "
            f"GROUP BY la.lab))"
        )
    parts.append(_mod("l0", "q0"))
    parts.append(_mod(f"l{n}", "q1"))
    return (
        ",\n".join(parts)
        + f"""
SELECT l.vertex,
       CAST(CASE WHEN (SELECT q FROM q1) > (SELECT q FROM q0) THEN l.lab
            ELSE l.vertex END AS BIGINT) AS labels
FROM l{n} l
"""
    )


# ----------------------------------------------------- invariant oracles

def walk_invariants_sql(edges_sql: str, n_starts: int, expected_rows: int) -> str:
    """Expected per-walk invariant summary for q_random_walks: walks
    start from the ``n_starts`` smallest vertices (walk ids = sorted
    ordinals), every start on this graph has out-edges and every
    out-neighbor is a sink, so each walk has exactly ``expected_rows``
    rows and zero invalid steps (the Spark side derives the same
    summary from the ACTUAL walks, including an anti-join of every
    consecutive step pair against the edge list)."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
verts AS MATERIALIZED (SELECT DISTINCT vertex FROM (
    SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)),
starts AS MATERIALIZED (SELECT vertex, ROW_NUMBER() OVER (ORDER BY vertex) - 1 AS walk_id
           FROM verts ORDER BY vertex LIMIT {n_starts})
SELECT CAST(walk_id AS BIGINT) AS walk_id,
       vertex AS start_vertex,
       CAST({expected_rows} AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS bad_steps
FROM starts
"""


def neighbor_sample_invariants_sql(edges_sql: str, n_starts: int, fanout0: int) -> str:
    """Expected per-source invariant summary for q_neighbor_sample on a
    bipartite src→sink graph: hop 0 samples exactly min(fanout,
    out_degree) DISTINCT real out-edges per start; hop 1 is empty
    (all sampled dsts are sinks)."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
verts AS MATERIALIZED (SELECT DISTINCT vertex FROM (
    SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)),
starts AS MATERIALIZED (SELECT vertex FROM verts ORDER BY vertex LIMIT {n_starts}),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e GROUP BY src)
SELECT s.vertex AS src,
       0 AS hop,
       CAST(LEAST({fanout0}, d.d) AS BIGINT) AS n_rows,
       CAST(LEAST({fanout0}, d.d) AS BIGINT) AS n_distinct,
       CAST(0 AS BIGINT) AS bad_edges
FROM starts s JOIN deg d ON s.vertex = d.src
"""


def bulk_sample_invariants_sql(
    edges_sql: str, n_starts: int, per_batch: int, fanout0: int
) -> str:
    """Expected per-(batch, source) invariant summary for q_bulk_sample
    on a bipartite src→sink graph: the first ``n_starts`` vertices
    split into batches of ``per_batch``; per batch, hop 0 samples
    exactly min(fanout, out_degree) DISTINCT real out-edges per seed;
    hop 1 is empty (all sampled dsts are sinks)."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
verts AS MATERIALIZED (SELECT DISTINCT vertex FROM (
    SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)),
starts AS MATERIALIZED (
    SELECT vertex,
           CAST((ROW_NUMBER() OVER (ORDER BY vertex) - 1) // {per_batch}
                AS BIGINT) AS batch_id
    FROM verts ORDER BY vertex LIMIT {n_starts}),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e GROUP BY src)
SELECT s.batch_id,
       s.vertex AS src,
       0 AS hop,
       CAST(LEAST({fanout0}, d.d) AS BIGINT) AS n_rows,
       CAST(LEAST({fanout0}, d.d) AS BIGINT) AS n_distinct,
       CAST(0 AS BIGINT) AS bad_edges
FROM starts s JOIN deg d ON s.vertex = d.src
"""


def neighbor_sample_wr_invariants_sql(edges_sql: str, n_starts: int,
                                      fanout0: int) -> str:
    """Expected per-source invariant summary for q_neighbor_sample_wr
    on a bipartite src→sink graph: hop 0 draws exactly fanout0 slots
    per start with out-degree ≥ 1 (repeats allowed, so no distinct
    count); hop 1 is empty (sampled dsts are sinks)."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
verts AS MATERIALIZED (SELECT DISTINCT vertex FROM (
    SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)),
starts AS MATERIALIZED (SELECT vertex FROM verts ORDER BY vertex LIMIT {n_starts}),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e GROUP BY src)
SELECT s.vertex AS src,
       0 AS hop,
       CAST({fanout0} AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS bad_edges
FROM starts s JOIN deg d ON s.vertex = d.src
"""


def all_vertices_ok_sql(edges_sql: str) -> str:
    """Expected [vertex, ok=TRUE] for per-vertex invariant queries —
    the Spark side computes the operator's local invariant per vertex
    (MIS independence+maximality, Leiden community connectivity, ECG
    partition validity, matching symmetry+maximality) and must come
    back all-true."""
    return f"""
WITH e AS ({edges_sql}),
verts AS (SELECT DISTINCT vertex FROM (
    SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e))
SELECT vertex, TRUE AS ok FROM verts
"""


def mis_invariants_sql(edges_sql: str) -> str:
    """Expected per-vertex invariant for q_mis: every vertex satisfies
    the MIS local condition (in-set → no neighbor in set; out-of-set →
    ≥1 neighbor in set, which also forces isolated vertices in). The
    generated SQL is the shared all-true vertex frame — the MIS logic
    lives on the Spark side; MATERIALIZED hints were a no-op on this
    2-CTE shape."""
    return all_vertices_ok_sql(edges_sql)


# ---------------------------------------------------- portable-hash twins

def minhash_sql(threshold: float, n: int = 3, num_hashes: int = 64,
                bands: int = 16) -> str:
    """Full MinHash-LSH pipeline twin of
    functions/dedup.py:minhash_dedup_pairs with hash_fn='md5_60':
    shingles → per-seed min-hash signature → banded bucket hash →
    candidate pairs → exact set-Jaccard verify ≥ threshold. Every hash
    is the portable 60-bit md5, bit-identical across engines."""
    rpb = num_hashes // bands
    return f"""
WITH words AS MATERIALIZED (SELECT doc_id, {_WORDS} AS w FROM documents),
grams AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
    FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
    WHERE len(w) >= {n}
),
hs AS (
    SELECT doc_id, seeds.i AS i, MIN({_h60("seeds.i || ':' || g")}) AS mh
    FROM grams, (SELECT UNNEST(range(0, {num_hashes})) AS i) seeds
    GROUP BY doc_id, seeds.i
),
sig AS MATERIALIZED (SELECT doc_id, list(mh ORDER BY i) AS s FROM hs GROUP BY doc_id),
banded AS (
    SELECT doc_id, bb.b AS band,
           {_h60(f"bb.b || ':' || array_to_string(s[bb.b*{rpb}+1 : bb.b*{rpb}+{rpb}], ',')")} AS bucket
    FROM sig, (SELECT UNNEST(range(0, {bands})) AS b) bb
),
cand AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM banded x JOIN banded y ON x.band = y.band AND x.bucket = y.bucket
    WHERE x.doc_id < y.doc_id
),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
    SELECT c.a, c.b, COUNT(*) AS isect
    FROM cand c JOIN grams ga ON ga.doc_id = c.a
    JOIN grams gb ON gb.doc_id = c.b AND gb.g = ga.g
    GROUP BY c.a, c.b
)
SELECT i.a AS a, i.b AS b,
       ROUND(CAST(i.isect AS DOUBLE) / (sa.sz + sb.sz - i.isect), 6) + 0.0 AS jaccard
FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
WHERE CAST(i.isect AS DOUBLE) / (sa.sz + sb.sz - i.isect) >= {threshold}
"""


def simhash_sql(max_hamming: int = 8, bits: int = 60) -> str:
    """Full SimHash near-dup twin of
    functions/dedup.py:simhash_near_duplicates with hash_fn='md5_60',
    bits=60: token ±1 bit sums → simhash → (max_hamming+1)-chunk
    pigeonhole blocking → exact Hamming ≤ max_hamming."""
    chunks = max_hamming + 1
    width = bits // chunks
    mask = (1 << width) - 1
    return f"""
WITH toks AS (
    SELECT doc_id, UNNEST({_WORDS}) AS t FROM documents
),
tok2 AS MATERIALIZED (SELECT doc_id, {_h60("t")} AS h FROM toks WHERE length(t) > 0),
bitsums AS (
    SELECT doc_id, bb.b AS b,
           SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
    FROM tok2, (SELECT UNNEST(range(0, {bits})) AS b) bb
    GROUP BY doc_id, bb.b
),
sims AS (
    SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sim
    FROM bitsums GROUP BY doc_id
),
blk AS (
    SELECT doc_id, sim, cc.c AS c, (sim >> (cc.c * {width})) & {mask} AS val
    FROM sims, (SELECT UNNEST(range(0, {chunks})) AS c) cc
),
pairs AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
           bit_count(xor(x.sim, y.sim)) AS hamming
    FROM blk x JOIN blk y ON x.c = y.c AND x.val = y.val
    WHERE x.doc_id < y.doc_id
)
SELECT a, b, hamming FROM pairs WHERE hamming <= {max_hamming}
"""


def lsh_buckets_sql(dim: int = 64, n_planes: int = 8, seed: int = 42) -> str:
    """Sign-LSH bucket twin of functions/ann.py:lsh_bucket: the SAME
    deterministic hyperplane constants (functions/ann.py:_hyperplanes,
    seeded splitmix64) are embedded as SQL literals, and the dot
    product is written as an explicit left-to-right sum — identical
    float operation order to Spark's sequential ``aggregate`` fold, so
    the sign tests match bit-for-bit."""
    from .functions.ann import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    for i in range(n_planes):
        dot = " + ".join(
            f"CAST(embedding[{j + 1}] AS DOUBLE) * {planes[i, j]!r}"
            for j in range(dim)
        )
        bits.append(f"CASE WHEN (0.0 + {dot}) > 0 THEN (1::BIGINT << {i}) ELSE 0 END")
    expr = " + ".join(bits)
    return f"SELECT vec_id, CAST({expr} AS BIGINT) AS lsh_bucket FROM embeddings"


def lsh_band_keys_sql(
    dim: int = 64, n_bands: int = 4, band_bits: int = 6, seed: int = 42
) -> str:
    """Banded sign-LSH key twin of functions/ann.py:lsh_band_keys: one
    UNION ALL arm per band, the SAME splitmix64 hyperplane literals
    (plane index = band*band_bits + bit) and the same left-to-right
    dot-product fold, key = band * 2^band_bits + bucket."""
    from .functions.ann import _hyperplanes

    planes = _hyperplanes(dim, n_bands * band_bits, seed)
    arms = []
    for band in range(n_bands):
        bits = []
        for j in range(band_bits):
            p = planes[band * band_bits + j]
            dot = " + ".join(
                f"CAST(embedding[{c + 1}] AS DOUBLE) * {p[c]!r}" for c in range(dim)
            )
            bits.append(
                f"CASE WHEN (0.0 + {dot}) > 0 THEN (1::BIGINT << {j}) ELSE 0 END"
            )
        expr = " + ".join(bits)
        arms.append(
            f"SELECT vec_id, CAST({band}::BIGINT * {1 << band_bits} "
            f"+ ({expr}) AS BIGINT) AS bk FROM embeddings"
        )
    return " UNION ALL ".join(arms)


def embedding_near_dup_sql(
    dim: int = 64, n_bands: int = 4, band_bits: int = 6, seed: int = 42,
    threshold: float = 0.4,
) -> str:
    """Twin of functions/ann.py:embedding_near_duplicates — the same
    banded hyperplane tables (via lsh_band_keys_sql), the same DISTINCT
    any-band candidate generation (a < b), and the candidate-scoped
    exact cosine verify + threshold. Cosine rounds to 4 digits on both
    sides. (The bucket-size cap and hub salting change WHICH plan runs,
    not the result, for caps above the gate corpus size.)"""
    keys = lsh_band_keys_sql(dim=dim, n_bands=n_bands, band_bits=band_bits, seed=seed)
    return f"""
WITH bk AS MATERIALIZED ({keys}),
v AS MATERIALIZED (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
cand AS (
    SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
    FROM bk x JOIN bk y ON x.bk = y.bk AND x.vec_id < y.vec_id
),
p AS (
    SELECT a, b,
           list_sum(list_zip(va.e, vb.e).apply(pp -> pp[1] * pp[2]))
           / (sqrt(list_sum(va.e.apply(z -> z * z)))
              * sqrt(list_sum(vb.e.apply(z -> z * z)))) AS cos
    FROM cand
    JOIN v va ON va.vec_id = a
    JOIN v vb ON vb.vec_id = b
)
SELECT a, b, ROUND(cos, 4) + 0.0 AS cosine FROM p WHERE cos >= {threshold}
"""


def ivf_top1_sql(
    n_centroids: int = 16, nprobe: int = 4, stride_seed: int = 1
) -> str:
    """Twin of functions/ann.py:cosine_topk_ivf at k=1 on the portable
    md5-60 hash: the same centroid pick (smallest seeded hash, then id),
    the same id-ordered cell numbering, the same max-cosine/-cell-tie
    assignment, the same nprobe best-cell probing, and the exact cosine
    within probed cells only. Self-search: queries = corpus."""
    h = f"('0x' || substr(md5(concat_ws(':', {stride_seed}, vec_id)), 1, 15))::BIGINT"
    return f"""
WITH v AS MATERIALIZED (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
picked AS (
    SELECT vec_id, e
    FROM v
    ORDER BY {h}, vec_id
    LIMIT {n_centroids}
),
cents AS MATERIALIZED (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS ivf_cell, e AS cent
    FROM picked
),
cos_vc AS MATERIALIZED (
    SELECT v.vec_id, c.ivf_cell,
           list_sum(list_zip(v.e, c.cent).apply(pp -> pp[1] * pp[2]))
           / (sqrt(list_sum(v.e.apply(z -> z * z)))
              * sqrt(list_sum(c.cent.apply(z -> z * z)))) AS cs
    FROM v CROSS JOIN cents c
),
assigned AS (
    SELECT vec_id, ivf_cell
    FROM (SELECT vec_id, ivf_cell,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY cs DESC, ivf_cell ASC) AS rn
          FROM cos_vc)
    WHERE rn = 1
),
probes AS (
    SELECT vec_id AS query_id, ivf_cell
    FROM (SELECT vec_id, ivf_cell,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY cs DESC, ivf_cell ASC) AS pr
          FROM cos_vc)
    WHERE pr <= {nprobe}
),
scored AS (
    SELECT p.query_id, a.vec_id,
           list_sum(list_zip(q.e, c.e).apply(pp -> pp[1] * pp[2]))
           / (sqrt(list_sum(q.e.apply(z -> z * z)))
              * sqrt(list_sum(c.e.apply(z -> z * z)))) AS cos
    FROM probes p
    JOIN assigned a ON a.ivf_cell = p.ivf_cell AND a.vec_id <> p.query_id
    JOIN v q ON q.vec_id = p.query_id
    JOIN v c ON c.vec_id = a.vec_id
)
SELECT query_id, vec_id AS nn_id, ROUND(cos, 4) + 0.0 AS cosine
FROM (SELECT query_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id ASC) AS rk
      FROM scored)
WHERE rk = 1
"""


# ------------------------------------------------------- simple extras

def degree_centrality_sql(edges_sql: str) -> str:
    """degree/(V−1) twin of operators/centrality.py:degree_centrality
    (reference centrality/degree_centrality.py); directed degree =
    in+out."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
verts AS MATERIALIZED (SELECT DISTINCT vertex FROM (
    SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e)),
vc AS MATERIALIZED (SELECT COUNT(*) AS v FROM verts),
od AS MATERIALIZED (SELECT src AS vertex, COUNT(*) AS d FROM e GROUP BY src),
idg AS MATERIALIZED (SELECT dst AS vertex, COUNT(*) AS d FROM e GROUP BY dst)
SELECT v.vertex,
       ROUND(CAST(COALESCE(o.d, 0) + COALESCE(i.d, 0) AS DOUBLE)
             / ((SELECT v FROM vc) - 1), 8) + 0.0 AS degree_centrality
FROM verts v LEFT JOIN od o ON v.vertex = o.vertex LEFT JOIN idg i ON v.vertex = i.vertex
"""


def k_hop_sql(edges_sql: str, n_seeds: int, k: int = 2) -> str:
    """k_hop_neighbors twin (reference cpp/src/traversal/k_hop_nbrs*):
    distinct vertices within ≤k hops of each seed, seeds included."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT DISTINCT vertex FROM ("
        "SELECT src AS vertex FROM e UNION ALL SELECT dst FROM e))",
        f"seeds AS MATERIALIZED (SELECT vertex AS start_vertex FROM verts ORDER BY vertex LIMIT {n_seeds})",
        "h0 AS MATERIALIZED (SELECT start_vertex, start_vertex AS nbr FROM seeds)",
    ]
    for i in range(k):
        parts.append(
            f"h{i + 1} AS MATERIALIZED (SELECT DISTINCT start_vertex, nbr FROM ("
            f"SELECT start_vertex, nbr FROM h{i} "
            f"UNION ALL "
            f"SELECT h.start_vertex, e.dst AS nbr FROM h{i} h JOIN e ON e.src = h.nbr))"
        )
    return ",\n".join(parts) + f"\nSELECT start_vertex, nbr FROM h{k}"


def ego_graph_sql(edges_sql: str, n_seeds: int, radius: int = 1) -> str:
    """Batched ego-graph twin of operators/community.py:ego_graph
    (reference community/egonet_impl.cuh): per seed, the induced edge
    set of its ≤radius-hop out-ball."""
    khop = "ball"
    parts = [
        f"WITH e0 AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT DISTINCT vertex FROM ("
        "SELECT src AS vertex FROM e0 UNION ALL SELECT dst FROM e0))",
        f"seeds AS MATERIALIZED (SELECT vertex AS seed FROM verts ORDER BY vertex LIMIT {n_seeds})",
        "b0 AS MATERIALIZED (SELECT seed, seed AS nbr FROM seeds)",
    ]
    for i in range(radius):
        parts.append(
            f"b{i + 1} AS MATERIALIZED (SELECT DISTINCT seed, nbr FROM ("
            f"SELECT seed, nbr FROM b{i} "
            f"UNION ALL SELECT b.seed, e.dst AS nbr FROM b{i} b JOIN e0 e ON e.src = b.nbr))"
        )
    parts.append(f"{khop} AS MATERIALIZED (SELECT seed, nbr FROM b{radius})")
    return (
        ",\n".join(parts)
        + f"""
SELECT DISTINCT a.seed, e.src, e.dst, ROUND(e.weight, 6) + 0.0 AS weight
FROM {khop} a JOIN e0 e ON a.nbr = e.src
JOIN {khop} b ON b.seed = a.seed AND b.nbr = e.dst
"""
    )


def similarity_sql(edges_sql: str, kind: str) -> str:
    """Overlap / Sørensen twins of operators/similarity.py (reference
    link_prediction/similarity_impl.cuh) over all 2-hop pairs a<b."""
    if kind == "overlap":
        coeff = "CAST(i.i AS DOUBLE) / LEAST(da.d, db.d)"
        col = "overlap_coeff"
    elif kind == "sorensen":
        coeff = "2.0 * i.i / (da.d + db.d)"
        col = "sorensen_coeff"
    else:
        raise ValueError(kind)
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e) WHERE src <> dst),
deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS d FROM und GROUP BY src),
isect AS (
    SELECT a.src AS a, b.src AS b, COUNT(*) AS i
    FROM und a JOIN und b ON a.dst = b.dst AND a.src < b.src
    GROUP BY 1, 2
)
SELECT i.a AS first, i.b AS second,
       ROUND({coeff}, 6) + 0.0 AS {col}
FROM isect i JOIN deg da ON i.a = da.v JOIN deg db ON i.b = db.v
"""
