"""One-off A/B: the 8M broadcast-state cutover for WCC and LPA.

The zero-exchange superstep layout (docs/PLANS.md round 3) only
engages in broadcast-state mode. The generic cutover is 4M vertices
(plans/strategy.BROADCAST_VERTEX_LIMIT, A/B-measured for PageRank's
16-byte (id, rank) state); WCC/LPA state is 8 bytes/vertex, so their
cutover arguably sits higher — but that claim needs its own
measurement, at a V actually BETWEEN the two constants.

RMAT-23 ef16 symmetrized has V = 4,611,356 occupied vertices (max id
8,387,850 — note `Graph.vertex_stats()[0]` counts occupied vertices,
not the id-space width; RMAT-22's V is 2.40M, under the generic
cutover, which is why an RMAT-22 run cannot A/B this constant).

Runs each algorithm twice in one JVM on the same persisted edges:
broadcast_limit=4_000_000 (V>limit → shuffle-hash + src-partition) vs
broadcast_limit=8_000_000 (broadcast + dst-partitioned zero-exchange).
WCC runs to convergence; LPA runs a fixed 4-superstep budget.

Usage: python tools/ab_lpa_cutover.py [cpus] [scale] [reps] [algos]
       (defaults: 32, 23, 3, "wcc,lpa")
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

WORKER = r"""
import sys, time, json
sys.path.insert(0, {root!r})
from cugraph_spark.session import get_spark
from cugraph_spark.sources.rmat import rmat_edges
from cugraph_spark.graph import Graph, symmetrize
from cugraph_spark.operators.label_propagation import label_propagation
from cugraph_spark.operators.wcc import weakly_connected_components

spark = get_spark(app_name="ab_cutover",
                  extra_conf={{"spark.cleaner.periodicGC.interval": "45s"}})

e = rmat_edges(spark, scale={scale}, edgefactor=16, seed=42)
se = symmetrize(e).persist()
n = se.count()
G = Graph(se, directed=False, weighted=True, multi_edge=True,
          assume_symmetric=True)
V = G.number_of_vertices()

def _gc():
    spark.sparkContext._jvm.System.gc()
    time.sleep(2.0)

out = {{"n_edges": n, "V": V}}
algos = {algos!r}.split(",")
for mode, blimit in (("shuffle_hash_4M", 4_000_000),
                     ("broadcast_dst_8M", 8_000_000)):
    res = {{}}
    for algo in algos:
        walls = []
        for _ in range({reps}):
            t0 = time.perf_counter()
            if algo == "wcc":
                weakly_connected_components(
                    G, check_every=2, broadcast_limit=blimit).count()
            else:
                label_propagation(G, max_iter=4, check_every=4,
                                  broadcast_limit=blimit).count()
            walls.append(round(time.perf_counter() - t0, 2))
            _gc()
        res[algo] = {{"walls": walls, "min_wall": min(walls)}}
    out[mode] = res

print("BENCHJSON " + json.dumps(out))
"""


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 23
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    algos = sys.argv[4] if len(sys.argv) > 4 else "wcc,lpa"

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench_scaling import _sweep_orphan_scratch

    _sweep_orphan_scratch()
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_DRIVER_MEMORY", "48g")
    shm = "/dev/shm/spark-graft-local"
    os.makedirs(shm, exist_ok=True)
    env.setdefault("SPARK_LOCAL_DIRS", shm)
    code = WORKER.format(root=str(ROOT), scale=scale, reps=reps, algos=algos)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=5400,
    )
    for line in out.stdout.splitlines():
        if "BENCHJSON" in line:
            print(json.dumps(json.loads(line.split("BENCHJSON ", 1)[1]), indent=2))
            return
    raise RuntimeError(f"no result; stderr tail: {out.stderr[-2000:]}")


if __name__ == "__main__":
    main()
