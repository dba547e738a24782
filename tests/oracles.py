"""In-repo numpy golden oracles.

Pure sequential reference implementations transliterated (by semantics,
not code) from the reference's host-side test oracles:

- pagerank_ref: cpp/tests/link_analysis/pagerank_test.cpp:44-132
- wcc_ref: min-vertex-id canonical labels (bijection-equivalent to
  cpp/tests/components/weakly_connected_components_test.cpp:41-74)
- lpa_ref: synchronous Raghavan-Albert-Kumara with max-incident-weight
  label, min-id tie-break (SURVEY.md §2.2.3 spec)
- triangle_ref: brute-force per-vertex triangle counts
  (nx.triangles semantics, tests/community/test_triangle_count.py:86-101)
- hits/katz/eigenvector: straight power iterations matching the
  corresponding *_impl.cuh semantics
"""

from __future__ import annotations

import numpy as np


def _to_arrays(edges):
    """edges: list of (src, dst, weight) → (src, dst, w, n_vertices)."""
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    w = np.array([e[2] if len(e) > 2 else 1.0 for e in edges], dtype=np.float64)
    n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1 if len(src) else 0
    return src, dst, w, n


def pagerank_ref(edges, n=None, alpha=0.85, tol=1e-6, max_iter=500,
                 personalization=None, nstart=None):
    """Exact reference iteration (pagerank_test.cpp:44-132 /
    pagerank_impl.cuh). Returns (ranks[n], converged, n_iter)."""
    src, dst, w, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    ows = np.zeros(n)
    np.add.at(ows, src, w)
    if nstart is not None:
        r = np.asarray(nstart, dtype=np.float64)
        r = r / r.sum()
    else:
        r = np.full(n, 1.0 / n)
    pnorm = None
    if personalization is not None:
        pnorm = np.asarray(personalization, dtype=np.float64)
        pnorm = pnorm / pnorm.sum()
    converged = False
    it = 0
    for it in range(max_iter):
        dangling = r[ows == 0.0].sum()
        rdiv = r / np.where(ows == 0.0, 1.0, ows)
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rdiv[src] * w)
        if pnorm is None:
            unvarying = (dangling * alpha + (1 - alpha)) / n
            new_r = alpha * contrib + unvarying
        else:
            new_r = alpha * contrib + (dangling * alpha + (1 - alpha)) * pnorm
        l1 = np.abs(new_r - r).sum()
        r = new_r
        if l1 < tol:
            converged = True
            break
    return r, converged, it + 1


def wcc_ref(edges, n=None):
    """Min-vertex-id component labels over the undirected closure."""
    src, dst, w, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(src, dst):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return np.array([find(v) for v in range(n)])


def lpa_ref(edges_sym, n=None, max_iter=20):
    """Synchronous LPA: label(v) ← argmax_label Σ incident weight,
    ties → smallest label. edges_sym must already be symmetric.
    Returns (labels, n_iter_run)."""
    src, dst, w, n_auto = _to_arrays(edges_sym)
    n = n if n is not None else n_auto
    labels = np.arange(n, dtype=np.int64)
    for it in range(max_iter):
        new_labels = labels.copy()
        # incident weight per (dst, label(src))
        agg: dict[tuple[int, int], float] = {}
        for s, d, wt in zip(src, dst, w):
            key = (int(d), int(labels[s]))
            agg[key] = agg.get(key, 0.0) + wt
        best: dict[int, tuple[float, int]] = {}
        for (v, lab), wt in agg.items():
            cur = best.get(v)
            if cur is None or wt > cur[0] or (wt == cur[0] and lab < cur[1]):
                best[v] = (wt, lab)
        for v, (_, lab) in best.items():
            new_labels[v] = lab
        if np.array_equal(new_labels, labels):
            return labels, it + 1
        labels = new_labels
    return labels, max_iter


def triangle_ref(edges, n=None):
    """Per-vertex triangle counts, nx.triangles semantics. edges may be
    directed or symmetric; self-loops and parallel edges ignored."""
    src, dst, w, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    adj = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    counts = np.zeros(n, dtype=np.int64)
    for u in range(n):
        for v in adj[u]:
            if v > u:
                common = adj[u] & adj[v]
                for wv in common:
                    if wv > v:
                        counts[u] += 1
                        counts[v] += 1
                        counts[wv] += 1
    return counts


def hits_ref(edges, n=None, max_iter=100, tol=1e-5):
    """HITS (hits_impl.cuh semantics): hubs/authorities power iteration,
    L1-normalized each step; unweighted."""
    src, dst, _, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    hubs = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(max_iter):
        auth = np.zeros(n)
        np.add.at(auth, dst, hubs[src])
        if auth.sum() > 0:
            auth /= auth.sum()
        new_hubs = np.zeros(n)
        np.add.at(new_hubs, src, auth[dst])
        if new_hubs.sum() > 0:
            new_hubs /= new_hubs.sum()
        diff = np.abs(new_hubs - hubs).sum()
        hubs = new_hubs
        if diff < tol:
            break
    return hubs, auth


def katz_ref(edges, n=None, alpha=0.1, beta=1.0, max_iter=100, tol=1e-6):
    """Katz centrality: c = α·Aᵀc + β iterated; L2-normalized at the end
    (katz_centrality_impl.cuh semantics)."""
    src, dst, w, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    c = np.zeros(n)
    for _ in range(max_iter):
        tmp = np.zeros(n)
        np.add.at(tmp, dst, c[src] * w)
        new_c = beta + alpha * tmp
        diff = np.abs(new_c - c).sum()
        c = new_c
        if diff < tol * n:
            break
    norm = np.linalg.norm(c)
    return c / norm if norm > 0 else c


def eigenvector_ref(edges, n=None, max_iter=100, tol=1e-6):
    """Eigenvector centrality: power iteration on Aᵀ, L2 normalize per
    iter (eigenvector_centrality_impl.cuh semantics)."""
    src, dst, w, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    c = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(max_iter):
        new_c = np.zeros(n)
        np.add.at(new_c, dst, c[src] * w)
        norm = np.linalg.norm(new_c)
        if norm == 0:
            return new_c
        new_c /= norm
        diff = np.abs(new_c - c).sum()
        c = new_c
        if diff < tol * n:
            break
    return c


def bfs_ref(edges, source, n=None, directed=True):
    """BFS distances (and min-id predecessors) from source; unreachable
    → distance -1, predecessor -1."""
    src, dst, _, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    dist = np.full(n, -1, dtype=np.int64)
    pred = np.full(n, -1, dtype=np.int64)
    dist[source] = 0
    frontier = [source]
    level = 0
    while frontier:
        level += 1
        nxt = {}
        for u in frontier:
            for v in adj[u]:
                if dist[v] == -1:
                    if v not in nxt or u < nxt[v]:
                        nxt[v] = u
        for v, p in nxt.items():
            dist[v] = level
            pred[v] = p
        frontier = sorted(nxt.keys())
    return dist, pred


def core_number_ref(edges, n=None):
    """k-core numbers on the undirected simple graph (peeling)."""
    src, dst, _, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    adj = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = np.array([len(a) for a in adj])
    core = deg.copy()
    alive = np.ones(n, dtype=bool)
    for k in range(0, int(deg.max(initial=0)) + 1):
        changed = True
        while changed:
            changed = False
            for v in range(n):
                if alive[v] and deg[v] <= k:
                    core[v] = k
                    alive[v] = False
                    changed = True
                    for u in adj[v]:
                        if alive[u]:
                            deg[u] -= 1
    return core


def sssp_ref(edges, source, n=None):
    """Dijkstra distances from source over the directed weighted edge
    list (sssp_impl.cuh semantics, non-negative weights); unreachable →
    None."""
    import heapq

    src, dst, w, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    adj = [[] for _ in range(n)]
    for s, d, wt in zip(src, dst, w):
        adj[s].append((d, wt))
    dist = [None] * n
    dist[source] = 0.0
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if dist[u] is not None and du > dist[u]:
            continue
        for v, wt in adj[u]:
            nd = du + wt
            if dist[v] is None or nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def jaccard_ref(edges_sym, n=None):
    """{(a,b): (isect, d_a, d_b)} over all 2-hop pairs a<b of the
    undirected simple graph."""
    src, dst, _, n_auto = _to_arrays(edges_sym)
    n = n if n is not None else n_auto
    adj = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    out = {}
    for w_ in range(n):
        nb = sorted(adj[w_])
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                a, b = nb[i], nb[j]
                if (a, b) not in out:
                    isect = len(adj[a] & adj[b])
                    out[(a, b)] = (isect, len(adj[a]), len(adj[b]))
    return out


def mst_ref(edges, n=None):
    """Kruskal MSF weight + edge set over the undirected simple graph
    with (weight, src, dst) deterministic tie-break."""
    und = {}
    for s, d, w in edges:
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        und[(a, b)] = min(und.get((a, b), float("inf")), w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = []
    for w, a, b in sorted((w, a, b) for (a, b), w in und.items()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            chosen.append((a, b, w))
    return chosen


def modularity_ref(edges_sym, labels, resolution=1.0):
    """Q over a symmetric weighted edge list; labels: dict v->c."""
    two_m = sum(w for _, _, w in edges_sym)
    if two_m == 0:
        return 0.0
    in_c = {}
    deg_c = {}
    for s, d, w in edges_sym:
        cs, cd = labels[s], labels[d]
        deg_c[cs] = deg_c.get(cs, 0.0) + w
        if cs == cd:
            in_c[cs] = in_c.get(cs, 0.0) + w
    q = 0.0
    for c, dc in deg_c.items():
        q += in_c.get(c, 0.0) / two_m - resolution * (dc / two_m) ** 2
    return q


def betweenness_ref(edges, n=None, directed=True, normalized=True, sources=None):
    """Brandes exact betweenness (unweighted), NetworkX rescale
    contract: normalized → 1/((n-1)(n-2)); unnormalized undirected →
    0.5; sampled → × n/#sources."""
    from collections import deque

    src, dst, _, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    bc = np.zeros(n)
    srcs = range(n) if sources is None else sources
    n_sources = len(list(srcs)) if sources is not None else n
    srcs = range(n) if sources is None else sources
    for s in srcs:
        sigma = np.zeros(n)
        dist = np.full(n, -1)
        preds = [[] for _ in range(n)]
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj[u]:
                if dist[v] == -1:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = np.zeros(n)
        for v in reversed(order):
            for u in preds[v]:
                delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
            if v != s:
                bc[v] += delta[v]
    if normalized and n > 2:
        scale = 1.0 / ((n - 1) * (n - 2))
    elif not directed:
        scale = 0.5
    else:
        scale = 1.0
    if n_sources < n:
        scale *= n / n_sources
    return bc * scale


def edge_betweenness_ref(edges, n=None, directed=True, normalized=True):
    """Brandes exact EDGE betweenness (unweighted) as {(u,v): bc} over
    directed adjacency rows (both orientations for undirected graphs);
    reference rescale: normalized → 1/(n(n-1)); unnormalized
    undirected → 0.5 (betweenness_centrality_impl.cuh:655-670)."""
    from collections import deque

    src, dst, _, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    ebc: dict = {}
    for s in range(n):
        sigma = np.zeros(n)
        dist = np.full(n, -1)
        preds = [[] for _ in range(n)]
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj[u]:
                if dist[v] == -1:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = np.zeros(n)
        for v in reversed(order):
            for u in preds[v]:
                term = sigma[u] / sigma[v] * (1 + delta[v])
                delta[u] += term
                ebc[(u, v)] = ebc.get((u, v), 0.0) + term
    if normalized and n > 1:
        scale = 1.0 / (n * (n - 1))
    elif not directed:
        scale = 0.5
    else:
        scale = 1.0
    return {k: v * scale for k, v in ebc.items()}


def scc_ref(edges, n=None):
    """Tarjan SCC; labels = max vertex id per component."""
    src, dst, _, n_auto = _to_arrays(edges)
    n = n if n is not None else n_auto
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        if s != d:
            adj[s].append(d)
    index = [None] * n
    low = [0] * n
    on_stack = [False] * n
    stack = []
    labels = [0] * n
    counter = [0]

    import sys
    sys.setrecursionlimit(100000)

    def strongconnect(v):
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        on_stack[v] = True
        for w in adj[v]:
            if index[w] is None:
                strongconnect(w)
                low[v] = min(low[v], low[w])
            elif on_stack[w]:
                low[v] = min(low[v], index[w])
        if low[v] == index[v]:
            comp = []
            while True:
                w = stack.pop()
                on_stack[w] = False
                comp.append(w)
                if w == v:
                    break
            m = max(comp)
            for w in comp:
                labels[w] = m

    for v in range(n):
        if index[v] is None:
            strongconnect(v)
    return labels
