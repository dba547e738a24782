"""Two-parallelism scaling harness (the sandbox instantiation of the
north rule's N vs 4N executor criterion; see BASELINE.md §3).

Runs the identical PageRank-superstep benchmark on the identical input
at local[N] and local[4N] (fresh subprocess each — Spark master is
fixed per JVM), reports throughput at both plus the scaling
efficiency, and appends a row to BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [N] [sf_dir]
       (default N=8 → compares local[8] vs local[32])
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def run_bench(cpus: int, sf_dir: str, only: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_ONLY"] = only
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = "pagerank_cs10,wcc_cs,tc_rmat14"

    a = run_bench(n, sf_dir, only)
    b = run_bench(4 * n, sf_dir, only)

    thr_a = a["pagerank_edges_per_sec_per_superstep"]
    thr_b = b["pagerank_edges_per_sec_per_superstep"]
    eff = (thr_b / thr_a) / 4.0
    report = {
        "sf_dir": sf_dir,
        "cores_A": n, "cores_B": 4 * n,
        "pagerank_edges_per_sec_per_superstep_A": thr_a,
        "pagerank_edges_per_sec_per_superstep_B": thr_b,
        "wcc_wall_A": a["queries"].get("wcc_cs"),
        "wcc_wall_B": b["queries"].get("wcc_cs"),
        "tc_wall_A": a["queries"].get("tc_rmat14"),
        "tc_wall_B": b["queries"].get("tc_rmat14"),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report, indent=2))

    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = bench_dir / "BASELINE.md"
    header = (
        "# BENCH/BASELINE.md — two-parallelism scaling evidence\n\n"
        "Same job, same input, two local parallelism levels (the sandbox\n"
        "instantiation of the N vs 4N executor criterion; no real cluster\n"
        "exists here). scaling_efficiency = (thr_B / thr_A) / (cores_B/cores_A).\n\n"
        "| sf | cores A | cores B | PR edges/s/superstep A | B | WCC wall A | B | TC wall A | B | efficiency |\n"
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |\n"
    )
    if not md.exists():
        md.write_text(header)
    with open(md, "a") as f:
        f.write(
            f"| {sf_dir.rstrip('/').split('sf')[-1]} | {n} | {4*n} "
            f"| {thr_a} | {thr_b} "
            f"| {report['wcc_wall_A']} | {report['wcc_wall_B']} "
            f"| {report['tc_wall_A']} | {report['tc_wall_B']} "
            f"| {report['scaling_efficiency']} |\n"
        )


if __name__ == "__main__":
    main()
