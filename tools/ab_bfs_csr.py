"""A/B: BFS levels via packed-block frontier gather (bfs mode='csr')
vs the dataframe frontier join, on a directed RMAT graph.

Three legs: dataframe; csr with the pack job in-wall; csr REUSING the
pre-packed blocks (pack once per stored graph — the deployment story,
and what the reference's own graph-construction/algorithm split
amortizes). Reached-set equality is asserted across all legs.

Usage: PYTHONPATH=<repo> python tools/ab_bfs_csr.py [cpus] [scale]
"""
import sys, time, json, os, tempfile, shutil
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from cugraph_spark.session import get_spark
from cugraph_spark.sources.rmat import rmat_edges
from cugraph_spark.graph import Graph
from cugraph_spark.operators.traversal import bfs
from pyspark.sql import functions as F

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
scale = int(sys.argv[2]) if len(sys.argv) > 2 else 23

os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
spark = get_spark(app_name="ab_bfs_csr")

e = rmat_edges(spark, scale=scale, edgefactor=16, seed=42).persist()
n = e.count()
G = Graph(e, directed=True, weighted=True)
src = 0  # RMAT hub — large reachable set
print(f"edges={n}", flush=True)

bd = tempfile.mkdtemp(prefix="ab_bfs_csr_", dir="/dev/shm")
out = {}
sigs = {}
for name, kw in (
    ("dataframe", {}),
    ("csr_pack_in_wall", {"mode": "csr", "block_dir": bd + "/fresh"}),
    ("csr_blocks_reused", {"mode": "csr", "block_dir": bd + "/fresh"}),
):
    t0 = time.perf_counter()
    res = bfs(G, src, **kw)
    sig = res.agg(
        F.sum(F.when(F.col("distance") >= 0, 1).otherwise(0)).alias("reached"),
        F.sum(F.col("distance")).alias("dsum"),
        F.max("distance").alias("dmax"),
    ).first()
    wall = round(time.perf_counter() - t0, 2)
    sigs[name] = (int(sig["reached"]), int(sig["dsum"]), int(sig["dmax"]))
    out[name] = {"wall": wall, "reached": sigs[name][0], "dmax": sigs[name][2]}
    print("AB " + json.dumps({name: out[name]}), flush=True)
    spark.sparkContext._jvm.System.gc()
    time.sleep(2.0)
assert len(set(sigs.values())) == 1, f"BFS results diverged: {sigs}"
shutil.rmtree(bd, ignore_errors=True)
print("ABJSON " + json.dumps({"cpus": cpus, "scale": scale, "edges": n,
                              "source": src, **out}), flush=True)
