"""Bench: triangle_count(start_list) cost scales with the start set's
2-hop ball, not |E| (verdict item: start_list input masking).

Runs full-graph TC once, then start-masked TC for geometrically growing
start sets on the same cached input, reporting per-run wall + the
masked subgraph's edge count (the |2-hop(start)| proxy the cost should
track).

Usage: PYTHONPATH=<repo> python tools/bench_tc_start.py [cpus] [scale]
"""
import sys, time, json, os
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from pyspark.sql import functions as F

from cugraph_spark.session import get_spark
from cugraph_spark.sources.rmat import rmat_edges
from cugraph_spark.graph import Graph, symmetrize
from cugraph_spark.operators.triangle_count import triangle_count

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
scale = int(sys.argv[2]) if len(sys.argv) > 2 else 18

os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
spark = get_spark(app_name="bench_tc_start")
e = rmat_edges(spark, scale=scale, edgefactor=16, seed=42)
se = (
    symmetrize(e).select("src", "dst", "weight")
    .groupBy("src", "dst").agg(F.min("weight").alias("weight"))  # simple graph
    .persist()
)
n = se.count()
G = Graph(se, directed=False, weighted=True, assume_symmetric=True)
V = G.number_of_vertices()
print(f"edges={n} V={V}", flush=True)

out = {"cpus": cpus, "scale": scale, "edges": n, "V": V, "runs": []}

t0 = time.perf_counter()
full = triangle_count(G)
full_tri = full.agg(F.sum("counts")).first()[0]
full_wall = round(time.perf_counter() - t0, 2)
out["runs"].append({"start": "full", "wall": full_wall, "sum_counts": int(full_tri)})
print(f"full wall={full_wall}s sum={full_tri}", flush=True)

# RMAT low ids are the hubs: a start set containing vertex 0 pulls in
# >half of E through its 1-hop ball (measured: 3 starts incl. hub 0 →
# 4.1M of 7.6M edges). Report hub-free strata (vertex > 2^{scale}/4,
# the power-law tail) as the scaling curve, plus one hub-inclusive row
# for honesty about the worst case.
tail_floor = 2 ** scale // 4
for tag, pred in (
    ("hub3", (F.col("vertex") % 100_000 == 0)),
    ("tail_few", (F.col("vertex") > tail_floor) & (F.col("vertex") % 20_000 == 7)),
    ("tail_some", (F.col("vertex") > tail_floor) & (F.col("vertex") % 2_000 == 7)),
    ("tail_many", (F.col("vertex") > tail_floor) & (F.col("vertex") % 200 == 7)),
):
    sl = G.vertices().filter(pred)
    ns = sl.count()
    # masked-subgraph edge count = the |2-hop(start)| cost proxy
    nb = (
        G.edges.join(F.broadcast(sl), G.edges["src"] == sl["vertex"], "left_semi")
        .select(F.col("dst").alias("v"))
        .unionByName(sl.select(F.col("vertex").alias("v")))
        .distinct()
    )
    masked = (
        G.edges.join(nb.withColumnRenamed("v", "src"), "src", "left_semi")
        .join(nb.withColumnRenamed("v", "dst"), "dst", "left_semi")
        .count()
    )
    t0 = time.perf_counter()
    r = triangle_count(G, start_list=sl)
    s = r.agg(F.sum("counts")).first()[0]
    wall = round(time.perf_counter() - t0, 2)
    out["runs"].append({
        "tag": tag, "start": ns, "masked_edges": masked, "wall": wall,
        "sum_counts": int(s or 0),
    })
    print(f"{tag}: start={ns} masked_edges={masked} wall={wall}s sum={s}", flush=True)

print("TCSTART " + json.dumps(out), flush=True)
