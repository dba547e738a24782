"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same sf dir; compare row count, sorted-column schema, and an
order-insensitive value hash (doubles pre-rounded by the queries
themselves).

Usage: python tools/verify_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = sorted(
        tuple(repr(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for t in canon:
        h.update("|".join(t).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from cugraph_spark.session import get_spark

    spark = get_spark(app_name="verify_oracles", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        spark_rows = df.collect()
        spark_cols = df.columns
        t1 = time.time()
        timings[name] = t1 - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_rows)} rows  ({t1-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_rows = rel.fetchall()
            duck_cols = [c.lower() for c in rel.columns]
        except Exception as e:
            failures.append(name)
            print(f"[ORACLE ERR] {name}: {e}")
            continue
        t2 = time.time()
        ok_rows = len(spark_rows) == len(duck_rows)
        ok_schema = sorted(c.lower() for c in spark_cols) == sorted(duck_cols)
        sh = value_hash([tuple(r) for r in spark_rows], [c.lower() for c in spark_cols])
        dh = value_hash(duck_rows, duck_cols)
        ok_hash = sh == dh
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        if status != "OK":
            failures.append(name)
        print(
            f"[{status}] {name}: rows {len(spark_rows)}/{len(duck_rows)} "
            f"schema={ok_schema} hash={ok_hash}  (spark {t1-t0:.1f}s, duck {t2-t1:.1f}s)"
        )
        if status != "OK" and len(spark_rows) < 40:
            # key=repr: NULLs mixed with values would TypeError a plain
            # tuple sort and abort the gate before the FAILURES summary
            print("  spark:", sorted((tuple(r) for r in spark_rows), key=repr)[:10])
            print("  duck :", sorted(duck_rows, key=repr)[:10])
    if len(timings) > 3:
        total = sum(timings.values())
        top = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
        print(f"SPARK TOTAL: {total:.1f}s over {len(timings)} queries; slowest:")
        for n, s in top:
            print(f"  {s:6.1f}s  {n}")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
