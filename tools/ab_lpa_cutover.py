"""One-off A/B: LPA broadcast-state cutover at RMAT-22 (V=4.19M).

WCC moved its cutover to 8M vertices after the round-3 A/B showed
broadcast + dst-partitioned zero-exchange supersteps beating
shuffle-hash at V just above the generic 4M constant. LPA's state is
the same 8 bytes/vertex (vertex int32, labels int32) and its superstep
has the same shape (edges⋈state join + dst-keyed aggregation), so the
same cutover should hold — this measures it rather than inferring it.

Runs label_propagation(max_iter=4, check_every=4) twice in one JVM on
the same persisted RMAT-22 symmetrized edges: once with the default
broadcast_limit (4M → shuffle-hash mode at V=4.19M) and once with
broadcast_limit=8M (broadcast + dst-partition mode). Reports walls.

Usage: python tools/ab_lpa_cutover.py [cpus] [scale] [reps]
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

spark = get_spark(app_name="ab_lpa_cutover",
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
for mode, blimit in (("shuffle_hash", 4_000_000), ("broadcast_dst", 8_000_000)):
    walls = []
    for _ in range({reps}):
        t0 = time.perf_counter()
        label_propagation(G, max_iter=4, check_every=4,
                          broadcast_limit=blimit).count()
        walls.append(round(time.perf_counter() - t0, 2))
        _gc()
    out[mode] = {{"walls": walls, "min_wall": min(walls)}}

print("BENCHJSON " + json.dumps(out))
"""


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench_scaling import _sweep_orphan_scratch

    _sweep_orphan_scratch()
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_DRIVER_MEMORY", "48g")
    shm = "/dev/shm/spark-graft-local"
    os.makedirs(shm, exist_ok=True)
    env.setdefault("SPARK_LOCAL_DIRS", shm)
    code = WORKER.format(root=str(ROOT), scale=scale, reps=reps)
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
