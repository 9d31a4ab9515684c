"""Same-session A/B for the round-4 'regression cluster' (VERDICT r4
task #3): dedup_winnowing, events_asof_join, ann_cosine_topk,
similarity_lsh_buckets ran 1.3-1.6x slower in round 4's bench than in
round 3's — with UNCHANGED plans.  Two hypotheses: (a) host noise
(this sandbox varies +-20-30% run-to-run), (b) session pressure (the
round-4 bench session ran 78 queries in one JVM vs 31 in round 3's —
GC/code-cache/broadcast accumulation).

Design — one JVM, interleaved, best-of-3 (the repo's own bench
discipline): measure the 4 queries best-of-3 at increasing session
pressure P = number of OTHER registry queries executed so far in this
session (P=0, then after each pressure block of ~25 queries).  If the
times climb with P, the regression is session pressure and reproduces;
if flat, round 4's numbers were host noise.

Usage: python scripts/ab_session_pressure.py [sf_dir]
Prints one JSON line; also appends nothing (BENCH.md is updated by
hand from the output).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lopez_spark.plans.driver_queries import QUERIES  # noqa: E402
from lopez_spark.session import get_spark  # noqa: E402

CLUSTER = [
    "dedup_winnowing",
    "events_asof_join",
    "ann_cosine_topk",
    "similarity_lsh_buckets",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ab-pressure", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    # untimed warm-up of the cluster queries (whole-stage codegen + JIT)
    for name in CLUSTER:
        run(name)

    others = [n for n in QUERIES if n not in CLUSTER]
    blocks = [others[i : i + 25] for i in range(0, len(others), 25)]

    results: list[dict] = []

    def measure(pressure: int) -> None:
        point = {"pressure": pressure}
        for name in CLUSTER:
            point[name] = min(run(name) for _ in range(3))
        results.append(point)
        print(json.dumps(point), flush=True)

    measure(0)
    done = 0
    for block in blocks:
        for name in block:
            try:
                run(name)
            except Exception as e:  # a pressure query failing is not the point
                print(f"# pressure query {name} failed: {e}", file=sys.stderr)
        done += len(block)
        measure(done)

    base = results[0]
    final = results[-1]
    ratios = {
        n: round(final[n] / base[n], 3) if base[n] else None for n in CLUSTER
    }
    print(
        json.dumps(
            {
                "metric": "session_pressure_ab",
                "sf_dir": sf_dir,
                "points": results,
                "final_over_base_ratio": ratios,
                "verdict": (
                    "pressure"
                    if any(r and r > 1.25 for r in ratios.values())
                    else "host-noise"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
