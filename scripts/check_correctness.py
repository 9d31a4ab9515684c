"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle side-by-side,
compare row count, column names, and order-insensitive value multiset.

Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from lopez_spark.session import get_spark  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize(v):
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize(x)) for k, x in v.items()))
    if isinstance(v, float):
        return round(v, 9)
    return v


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(normalize(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("correctness", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = [c.lower() for c in orel.columns]
            orows = orel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_cols = sorted(c.lower() for c in scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = row_multiset([c.lower() for c in scols], [tuple(r) for r in srows]) == row_multiset(
                ocols, orows
            )
        status = "ok   " if (ok_cols and ok_count and ok_vals) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(
            f"{status}{name}: rows {len(srows)}/{len(orows)} cols={ok_cols} "
            f"vals={ok_vals} ({time.time() - t0:.1f}s)"
        )
        if not ok_cols:
            print(f"      spark={sorted(scols)} duck={sorted(ocols)}")
        if ok_cols and ok_count and not ok_vals:
            sm = row_multiset([c.lower() for c in scols], [tuple(r) for r in srows])
            om = row_multiset(ocols, orows)
            diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
            print(f"      first diffs: {diff}")

    # smoke entry()
    n = entrymod.entry(spark).count()
    print(f"entry() rows: {n}")
    print("FAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
