"""A/B: PageRank mode='csr' (packed mmap CSR blocks, O(V)-only Python
boundary) vs mode='dataframe' (pure Catalyst plan) — same JVM, same
input, same convergence contract (tol > 0 → one action per superstep
in BOTH modes, so the comparison isolates the SpMV strategy).

Round-3 verdict flagged the old csr mode (per-superstep O(E) cogroup
exchange) as strictly slower; the rebuilt mode packs blocks once and
ships only ranks through Arrow. Done-bar: csr within noise of
dataframe.

Usage: PYTHONPATH=<repo> python tools/ab_pagerank_csr.py [cpus] [reps] [scale] [iters]
"""
import sys, time, json, os
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from cugraph_spark.session import get_spark
from cugraph_spark.sources.rmat import rmat_edges
from cugraph_spark.graph import Graph
from cugraph_spark.operators.pagerank import pagerank

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
scale = int(sys.argv[3]) if len(sys.argv) > 3 else 21
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10

os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
spark = get_spark(app_name="ab_pagerank_csr",
                  extra_conf={"spark.cleaner.periodicGC.interval": "45s"})

e = rmat_edges(spark, scale=scale, edgefactor=16, seed=42).persist()
n = e.count()
G = Graph(e, directed=True, weighted=True, multi_edge=True)
V = G.number_of_vertices()
print(f"edges={n} V={V}", flush=True)

out = {}
for mode in ("dataframe", "csr"):
    walls, steps = [], []
    for _ in range(reps):
        ss = []
        t0 = time.perf_counter()
        # tol=0 + chained=False puts BOTH modes on the identical
        # one-action-per-superstep loop for exactly `iters` supersteps
        pagerank(G, tol=0.0, max_iter=iters, mode=mode, chained=False,
                 fail_on_nonconvergence=False,
                 superstep_seconds=ss)[0].count()
        walls.append(round(time.perf_counter() - t0, 2))
        steps.append([round(s, 2) for s in ss])
        spark.sparkContext._jvm.System.gc()
        time.sleep(2.0)
    out[mode] = {"walls": walls, "min": min(walls), "steps": steps}
    print("AB " + json.dumps({mode: out[mode]}), flush=True)

import statistics
for mode in out:
    tail = [s for rep in out[mode]["steps"] for s in rep[1:]]  # drop warm-up step
    out[mode]["steady_median_step"] = round(statistics.median(tail), 2) if tail else None
print("ABJSON " + json.dumps(
    {"cpus": cpus, "V": V, "edges": n, "scale": scale, "iters": iters, **out}),
    flush=True)
