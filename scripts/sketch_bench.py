"""Scale probe for the mergeable-sketch builders (operators/sketches.py)
at volumes where the work, not the stage overhead, dominates: HLL
register build and CMS cell build over synthetic key streams, timed at
two parallelism levels for the N-vs-4N scaling criterion.

Usage: python scripts/sketch_bench.py [rows] [trials]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lopez_spark.operators.sketches import (  # noqa: E402
    cms_cells,
    hll_registers,
)
from lopez_spark.session import get_spark  # noqa: E402


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results = {}
    for cores in (8, 2):
        spark = get_spark(
            f"sketch-bench-{cores}", master=f"local[{cores}]", shuffle_partitions=cores * 4
        )
        spark.sparkContext.setLogLevel("ERROR")
        keys = spark.range(rows).select(
            F.concat(F.lit("url:"), F.col("id").cast("string")).alias("url")
        )
        counts = spark.range(rows).select(
            F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
            (F.col("id") % 997 + 1).alias("n"),
        )
        # warm-up
        hll_registers(keys.limit(100_000), "url")
        best = {}
        for name, fn in (
            ("hll_registers", lambda: hll_registers(keys, "url")),
            ("cms_cells_d4w4096", lambda: cms_cells(counts, "host", "n", 4, 4096).count()),
        ):
            ts = []
            for _ in range(trials):
                t0 = time.monotonic()
                fn()
                ts.append(time.monotonic() - t0)
            best[name] = min(ts)
            print(f"local[{cores}] {name}: best {min(ts):.2f}s (runs {[round(t,2) for t in ts]})")
        results[cores] = best
        spark.stop()
    for name in results[8]:
        thr8 = rows / results[8][name]
        thr2 = rows / results[2][name]
        print(
            f"{name}: {thr2:,.0f} keys/s @local[2]  {thr8:,.0f} @local[8]  "
            f"efficiency {(thr8 / thr2) / 4:.3f}"
        )


if __name__ == "__main__":
    main()
