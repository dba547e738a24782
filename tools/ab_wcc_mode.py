"""A/B: WCC superstep-join mode at a chosen RMAT scale — shuffle-hash
(broadcast_limit=0) vs broadcast+dst zero-exchange (limit=32M), same
JVM, same cached input, same prep protocol as bench_scaling_e2e.

This is the harness that justified raising
``plans/strategy.NARROW_STATE_BROADCAST_LIMIT`` 8M → 24M: at RMAT-24
(occupied V=8,872,774, 520.8M symmetrized edges, 32 cores, min-of-2)
it measured WCC 160.8s shuffle-hash vs 101.0s broadcast+dst (1.59×) —
see BENCH/BASELINE.md "RMAT-24: the 8M cutover cliff".

Usage: PYTHONPATH=<repo> python tools/ab_wcc_mode.py [cpus] [reps] [scale]
"""
import sys, time, json, os
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from cugraph_spark.session import get_spark
from cugraph_spark.sources.rmat import rmat_edges
from cugraph_spark.graph import Graph, symmetrize
from cugraph_spark.operators.wcc import weakly_connected_components

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
scale = int(sys.argv[3]) if len(sys.argv) > 3 else 24

os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
spark = get_spark(app_name="ab_wcc24",
                  extra_conf={"spark.cleaner.periodicGC.interval": "45s"})

e = rmat_edges(spark, scale=scale, edgefactor=16, seed=42)
se = (
    symmetrize(e)
    .repartition(spark.sparkContext.defaultParallelism, "src")
    .persist()
)
n = se.count()
G = Graph(se, directed=False, weighted=True, multi_edge=True,
          assume_symmetric=True, pre_partitioned=True)
V = G.number_of_vertices()
print(f"edges={n} V={V}", flush=True)

out = {}
for mode, blimit in (("shuffle_hash", 0), ("broadcast_dst", 32_000_000)):
    walls, steps = [], []
    for _ in range(reps):
        ss = []
        t0 = time.perf_counter()
        weakly_connected_components(G, check_every=2, superstep_seconds=ss,
                                    broadcast_limit=blimit).count()
        walls.append(round(time.perf_counter() - t0, 2))
        steps.append([round(s, 2) for s in ss])
        spark.sparkContext._jvm.System.gc()
        time.sleep(2.0)
    out[mode] = {"walls": walls, "min": min(walls), "steps": steps}
    print("AB " + json.dumps({mode: out[mode]}), flush=True)
print("ABJSON " + json.dumps({"cpus": cpus, "V": V, "edges": n, **out}), flush=True)
