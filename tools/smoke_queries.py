"""Spark-side smoke/robustness runner: execute EVERY driver-contract
query at a given scale factor, record wall time + row count, flag
failures and planning blowups.

The DuckDB oracle gate (tools/verify_oracles.py) is the correctness
check at sf0.01; at sf0.1+ several DuckDB twins (recursive-CTE
closures, unrolled 64-hash MinHash) are orders of magnitude slower
than the Spark plans they verify, so this runner checks what actually
matters at larger scale — that OUR plans execute, stay sane, and don't
regress into driver-side planning blowups (the round-2 Catalyst-stats
incident: Leiden spent 40+ min in BigInteger stats arithmetic at
sf0.01 until plans/lineage.py:truncate_plan).

Usage: python tools/smoke_queries.py [sf_dir] [budget_sec_per_query]
Prints one line per query and a final JSON summary; exit code 1 if any
query fails or exceeds the per-query budget.
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0

    from cugraph_spark.queries import queries
    from cugraph_spark.session import get_spark

    spark = get_spark(app_name="smoke_queries")
    spark.sparkContext.setLogLevel("ERROR")

    results, failed, slow = {}, [], []
    for name, fn in queries().items():
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            results[name] = {"rows": n, "sec": round(dt, 2)}
            tag = "SLOW" if dt > budget else "ok"
            if dt > budget:
                slow.append(name)
            print(f"[{tag}] {name}: {n} rows in {dt:.1f}s", flush=True)
        except Exception as e:
            dt = time.perf_counter() - t0
            results[name] = {"error": repr(e), "sec": round(dt, 2)}
            failed.append(name)
            print(f"[FAIL] {name} after {dt:.1f}s: {e!r}", flush=True)
            traceback.print_exc()
    print(json.dumps({"sf_dir": sf_dir, "failed": failed, "slow": slow,
                      "total_sec": round(sum(r["sec"] for r in results.values()), 1),
                      "queries": results}))
    sys.exit(1 if failed or slow else 0)


if __name__ == "__main__":
    main()
