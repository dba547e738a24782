"""A/B: packed-CSR supersteps (wcc mode='csr') vs the dataframe plan
(round-4 frontier mode) at a chosen RMAT scale — same JVM, same cached
input, same prep protocol as tools/ab_frontier.py.

Per variant: end-to-end wall plus the measured per-superstep walls,
changed-counts, and shuffle bytes (superstep_metrics). The csr claim
under test: the dense hash-min superstep drops from the ~21.6M edges/s
JVM stream ceiling to a per-block np.minimum.at (measured 200M
edges/s/core standalone), with only the O(V) label vector crossing
Arrow per superstep.

Usage: PYTHONPATH=<repo> python tools/ab_wcc_csr.py [cpus] [reps] [scale]
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
scale = int(sys.argv[3]) if len(sys.argv) > 3 else 23

os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
spark = get_spark(app_name="ab_wcc_csr",
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
for variant, kw in (
    ("dataframe", {}),
    ("csr", {"mode": "csr"}),
):
    walls, metrics = [], []
    for rep in range(reps):
        sm = []
        if kw.get("mode") == "csr":
            # tmpfs block_dir: the single-box analog of the design's
            # page-cache-resident shared-storage blocks (a /tmp dir on
            # the sandbox's one virtual disk adds 0-30s of write/read
            # variance that a real deployment's page cache never pays)
            import shutil, tempfile

            bd = tempfile.mkdtemp(prefix="abwcc_csr_", dir="/dev/shm")
            kw = {**kw, "block_dir": bd}
        t0 = time.perf_counter()
        weakly_connected_components(G, superstep_metrics=sm, **kw).count()
        walls.append(round(time.perf_counter() - t0, 2))
        if kw.get("block_dir"):
            shutil.rmtree(kw["block_dir"], ignore_errors=True)
        metrics.append([
            {k: (round(v, 2) if isinstance(v, float) else v)
             for k, v in m.items()} for m in sm
        ])
        spark.sparkContext._jvm.System.gc()
        time.sleep(2.0)
    out[f"wcc_{variant}"] = {"walls": walls, "min": min(walls),
                             "metrics": metrics}
    print("AB " + json.dumps({variant: {"walls": walls, "min": min(walls)}}),
          flush=True)
    print("STEPS " + json.dumps(metrics[-1]), flush=True)
print("ABJSON " + json.dumps(
    {"cpus": cpus, "V": V, "edges": n, "scale": scale, **out}), flush=True)
