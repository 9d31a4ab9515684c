"""Round-6 optimization measurement harness (guide §1).

NOT the driver's frozen bench: this isolates individual declared
queries with the noop sink, repeats them for noise rejection, labels
jobs, and optionally captures .explain("formatted") to plans/r06/.

Usage:
  python bench_extra.py [--reps N] [--explain SUFFIX] [--out FILE] [query ...]

With no query names, runs the full HEADLINE_QUERIES list from bench.py.
Writes a JSON map {name: {"times": [...], "min": .., "median": ..}}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE_QUERIES  # noqa: E402
from lopez_spark.plans.driver_queries import QUERIES  # noqa: E402
from lopez_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="write plans/r06/<query>_<SUFFIX>.txt explain output")
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    names = args.queries or HEADLINE_QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = os.path.join(os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001")
    if not args.no_warm and os.path.isdir(warm_dir):
        for name in names:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            QUERIES[name](spark, warm_dir).write.mode("overwrite").format("noop").save()

    results: dict[str, dict] = {}
    for name in names:
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.time()
            QUERIES[name](spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        results[name] = {
            "times": times,
            "min": min(times),
            "median": round(statistics.median(times), 3),
        }
        print(f"{name}: min={min(times):.3f} median={results[name]['median']:.3f} {times}",
              flush=True)
        if args.explain:
            import contextlib
            import io

            os.makedirs("plans/r06", exist_ok=True)
            df = QUERIES[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/r06/{name}_{args.explain}.txt", "w") as fh:
                fh.write(buf.getvalue())

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    total_min = sum(r["min"] for r in results.values())
    total_med = sum(r["median"] for r in results.values())
    print(f"TOTAL min={total_min:.2f} median={total_med:.2f} over {len(results)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
