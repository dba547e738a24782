"""Two-parallelism WCC superstep-throughput harness.

Same methodology as tools/bench_scaling.py's PageRank measurement
(steady-state per-superstep wall from inside the loop, warm-up
discarded, median vs host noise), applied to the WCC superstep plan
(edges ⋈ labels hash-min + pointer jump). RMAT graphs are
low-diameter — WCC converges in 2-3 supersteps, far too few samples
for a median and short enough that fixed per-job costs dominate any
end-to-end wall comparison (see BENCH/e2e_scaling.jsonl). So this
harness passes ``min_iter`` to keep the loop running past the
fixpoint: a stable labeling is a fixpoint of hash-min + pointer-jump,
so every extra superstep executes the identical O(E) plan — a
legitimate steady-state throughput sample.

Input prep (symmetrize, hash-partition, vertex count) happens before
the timed region, matching the e2e harness: on a real deployment these
are the stored physical layout and table metadata. Shuffle files go to
tmpfs so the sandbox's single shared virtual disk doesn't skew the
8-vs-32-core comparison (a real 4N cluster has 4N shuffle disks).

Usage: python tools/bench_scaling_wcc.py [N] [rmat_scale] [edgefactor] [iters] [mode]
       (defaults: N=8, scale=22, edgefactor=16, mode=dataframe →
       ~128M symmetrized edges; mode=csr runs the packed-block
       supersteps — the pack job is setup/layout prep, same role as
       the pre-stored partitioning, and superstep_seconds excludes it)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

WORKER = r"""
import sys, json
sys.path.insert(0, {root!r})
from cugraph_spark.session import get_spark
from cugraph_spark.sources.rmat import rmat_edges
from cugraph_spark.graph import Graph, symmetrize
from cugraph_spark.operators.wcc import weakly_connected_components

spark = get_spark(app_name="bench_scaling_wcc")
e = rmat_edges(spark, scale={scale}, edgefactor=16, seed=42)
se = (
    symmetrize(e)
    .repartition(spark.sparkContext.defaultParallelism, "src")
    .persist()
)
n = se.count()  # materialize the canonical symmetric form pre-clock
G = Graph(se, directed=False, weighted=True, multi_edge=True,
          assume_symmetric=True, pre_partitioned=True)
G.number_of_vertices()  # warm the memoized V (metadata on a real table)
ts = []
weakly_connected_components(
    G, max_iter={iters}, min_iter={iters}, check_every=1,
    superstep_seconds=ts, mode={mode!r},
).count()
steady = sorted(ts[2:])
median = steady[len(steady) // 2]
print("BENCHJSON " + json.dumps({{
    "n_edges": n, "supersteps": ts,
    "steady_median_sec": median,
    "edges_per_sec_per_superstep": n / median,
}}))
"""


def run_worker(cpus: int, scale: int, ef: int, iters: int,
               mode: str = "dataframe") -> dict:
    # sweep orphaned tmpfs shuffle scratch like bench_scaling.py does
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench_scaling import _sweep_orphan_scratch

    _sweep_orphan_scratch()
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_DRIVER_MEMORY", "48g")
    shm = "/dev/shm/spark-graft-local"
    os.makedirs(shm, exist_ok=True)
    env.setdefault("SPARK_LOCAL_DIRS", shm)
    code = WORKER.format(root=str(ROOT), scale=scale, ef=ef, iters=iters,
                         mode=mode)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if "BENCHJSON" in line:
            return json.loads(line.split("BENCHJSON ", 1)[1])
    raise RuntimeError(f"no result; stderr tail: {out.stderr[-2000:]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    ef = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    mode = sys.argv[5] if len(sys.argv) > 5 else "dataframe"

    a = run_worker(n, scale, ef, iters, mode)
    b = run_worker(4 * n, scale, ef, iters, mode)

    thr_a = a["edges_per_sec_per_superstep"]
    thr_b = b["edges_per_sec_per_superstep"]
    eff = (thr_b / thr_a) / 4.0
    report = {
        "algo": "wcc",
        "mode": mode,
        "input": f"rmat scale={scale} edgefactor={ef} symmetrized ({a['n_edges']} edges)",
        "cores_A": n, "cores_B": 4 * n,
        "steady_sec_per_superstep_A": round(a["steady_median_sec"], 2),
        "steady_sec_per_superstep_B": round(b["steady_median_sec"], 2),
        "edges_per_sec_per_superstep_A": round(thr_a, 0),
        "edges_per_sec_per_superstep_B": round(thr_b, 0),
        "scaling_efficiency": round(eff, 3),
        "supersteps_A": [round(t, 2) for t in a["supersteps"]],
        "supersteps_B": [round(t, 2) for t in b["supersteps"]],
    }
    print(json.dumps(report, indent=2))
    with open(ROOT / "BENCH" / "wcc_scaling.jsonl", "a") as f:
        f.write(json.dumps(report) + "\n")


if __name__ == "__main__":
    main()
