"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle side-by-side,
compare row count, column names, and order-insensitive value multiset.

Usage: python scripts/check_correctness.py [sf_dir] [query_name ...]

Besides the order-insensitive multiset compare, this also replicates the
driver's pandas canonicalize-and-hash (sort columns by name, lexsort
rows, hash values *with dtypes*), which is what caught the
HUGEINT-vs-BIGINT SUM typing in round 1.
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


def pandas_canon_hash(pdf):
    """Mimic the driver's canonicalizer: lowercase + sort columns, lexsort
    rows, then hash values dtype-sensitively.  Raises (like the driver)
    on unhashable cells such as lists."""
    import pandas as pd

    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    # round floats so representation noise doesn't flip the hash
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(9)
    vals = pd.util.hash_pandas_object(pdf, index=False).sum()
    dtypes = tuple(str(t) for t in pdf.dtypes)
    return int(vals), dtypes


def main():
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}
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
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False)]
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            results[name] = {"err": f"spark: {e}"}
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            results[name] = {"spark_rows": len(srows), "err": None, "rows_only": True}
            print(f"weak  {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = [c.lower() for c in orel.columns]
            opdf = orel.df()
            orows = [tuple(r) for r in opdf.itertuples(index=False)]
        except Exception as e:
            failures.append(name)
            results[name] = {"err": f"duckdb: {e}"}
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_cols = sorted(c.lower() for c in scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = row_multiset([c.lower() for c in scols], [tuple(r) for r in srows]) == row_multiset(
                ocols, orows
            )
        ok_hash = False
        hash_err = None
        if ok_cols and ok_count:
            try:
                sh, sdt = pandas_canon_hash(spdf)
                oh, odt = pandas_canon_hash(opdf)
                ok_hash = sh == oh
                if sdt != odt:
                    hash_err = f"note: dtypes spark={sdt} duck={odt}"
            except Exception as e:
                hash_err = f"canon error: {e}"
        status = "ok   " if (ok_cols and ok_count and ok_vals and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        results[name] = {
            "rows_match": ok_count,
            "schema_match": ok_cols,
            "hash_match": ok_hash,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": hash_err,
            "secs": round(time.time() - t0, 2),
        }
        print(
            f"{status}{name}: rows {len(srows)}/{len(orows)} cols={ok_cols} "
            f"vals={ok_vals} hash={ok_hash} ({time.time() - t0:.1f}s)"
        )
        if hash_err:
            print(f"      {hash_err}")
        if not ok_cols:
            print(f"      spark={sorted(scols)} duck={sorted(ocols)}")
        if ok_cols and ok_count and not ok_vals:
            sm = row_multiset([c.lower() for c in scols], [tuple(r) for r in srows])
            om = row_multiset(ocols, orows)
            diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
            print(f"      first diffs: {diff}")

    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"wrote {json_path} ({len(results)} queries)")
    # smoke entry()
    n = entrymod.entry(spark).count()
    print(f"entry() rows: {n}")
    print("FAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
