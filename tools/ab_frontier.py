"""A/B: frontier/delta supersteps vs dense (round-3 plan) for WCC and
LPA at a chosen RMAT scale — same JVM, same cached input, same prep
protocol as tools/ab_wcc_mode.py.

Per variant it reports the end-to-end wall, per-superstep walls, and
the MEASURED per-superstep shuffle bytes + changed-counts
(``superstep_metrics`` / plans/metrics.py) — the instrumented form of
both the zero-exchange claim and the "superstep wall tracks frontier
size" claim.

Usage: PYTHONPATH=<repo> python tools/ab_frontier.py [cpus] [reps] [scale] [op]
       op in {wcc, lpa, both} (default both)
"""
import sys, time, json, os
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from cugraph_spark.session import get_spark
from cugraph_spark.sources.rmat import rmat_edges
from cugraph_spark.graph import Graph, symmetrize
from cugraph_spark.operators.wcc import weakly_connected_components
from cugraph_spark.operators.label_propagation import label_propagation

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
scale = int(sys.argv[3]) if len(sys.argv) > 3 else 23
which = sys.argv[4] if len(sys.argv) > 4 else "both"

os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
spark = get_spark(app_name="ab_frontier",
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

OPS = {
    "wcc": lambda fthr, ss, sm: weakly_connected_components(
        G, superstep_seconds=ss, superstep_metrics=sm,
        frontier_threshold=fthr),
    "lpa": lambda fthr, ss, sm: label_propagation(
        G, max_iter=12, superstep_metrics=sm, frontier_threshold=fthr),
}
ops = ["wcc", "lpa"] if which == "both" else [which]

out = {}
for op in ops:
    for variant, fthr in (("dense", 0), ("frontier", None)):
        walls, metrics = [], []
        for _ in range(reps):
            ss, sm = [], []
            t0 = time.perf_counter()
            OPS[op](fthr, ss, sm).count()
            walls.append(round(time.perf_counter() - t0, 2))
            metrics.append([
                {k: (round(v, 2) if isinstance(v, float) else v)
                 for k, v in m.items()} for m in sm
            ])
            spark.sparkContext._jvm.System.gc()
            time.sleep(2.0)
        key = f"{op}_{variant}"
        out[key] = {"walls": walls, "min": min(walls), "metrics": metrics}
        print("AB " + json.dumps({key: {"walls": walls, "min": min(walls)}}),
              flush=True)
        print("STEPS " + json.dumps({key: metrics[-1]}), flush=True)
print("ABJSON " + json.dumps(
    {"cpus": cpus, "V": V, "edges": n, "scale": scale, **out}), flush=True)
