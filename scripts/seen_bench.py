"""Seen-set scale measurement (BENCH §8): the banded-Bloom DataFrame
tier at 10^8 REAL keys — two decades above the oracle tests, the
largest size this sandbox's wall-clock affords; the north-rule 10^10
differs only in band count (the per-band work is capped by
``max_band_bytes`` by construction, so scale adds bands, not
per-task cost).

Measures: distributed banded build over 10^8 distinct int64 keys,
incremental OR-merge of a 10^7-key delta, and the banded anti-join of
a 10^7-row candidate stream (half seen, half new) — checking the
result is exact (bloom positives verified).  Everything generated
executor-side via spark.range; nothing key-sized touches the driver.

Usage: python scripts/seen_bench.py [n_seen] [n_cand]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lopez_spark.operators.seen import (  # noqa: E402
    BandedBloomSpec,
    build_banded_bloom,
    merge_banded_blooms,
    seen_anti_join_banded,
)
from lopez_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n_cand = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000

    spark = get_spark("seen-bench", master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    spec = BandedBloomSpec(n_seen, 0.01)

    # seen keys: xxhash64 of the id range — distinct with overwhelming
    # probability, uniformly spread over bands
    seen = (
        spark.range(0, n_seen, 1, 32)
        .select(F.xxhash64("id").alias("url_hash"))
        .persist()
    )
    seen.count()  # materialize outside the timed build

    t0 = time.time()
    bloom = build_banded_bloom(seen, "url_hash", spec).localCheckpoint(eager=True)
    build_s = time.time() - t0
    n_bands = bloom.count()

    # incremental delta merge (one wave's discoveries at 10% scale)
    delta_keys = (
        spark.range(n_seen, n_seen + n_cand, 1, 32)
        .select(F.xxhash64("id").alias("url_hash"))
    )
    t1 = time.time()
    bloom = merge_banded_blooms(
        bloom, build_banded_bloom(delta_keys, "url_hash", spec)
    ).localCheckpoint(eager=True)
    merge_s = time.time() - t1

    # candidates: half already seen, half genuinely new
    cand = (
        spark.range(0, n_cand, 1, 32)
        .select(
            F.when(F.col("id") % 2 == 0, F.xxhash64("id"))  # seen half
            .otherwise(F.xxhash64((F.col("id") + 3 * n_seen).cast("long")))
            .alias("url_hash")
        )
        .persist()
    )
    cand.count()

    t2 = time.time()
    new = seen_anti_join_banded(cand, seen, "url_hash", bloom, spec)
    n_new = new.count()
    probe_s = time.time() - t2

    print(
        json.dumps(
            {
                "n_seen": n_seen,
                "n_candidates": n_cand,
                "bands": n_bands,
                "band_bytes": spec.band_bytes(),
                "build_s": round(build_s, 1),
                "build_keys_per_s": round(n_seen / build_s),
                "merge_delta_s": round(merge_s, 1),
                "probe_s": round(probe_s, 1),
                "probe_keys_per_s": round(n_cand / probe_s),
                "n_new": n_new,
                "expected_new": n_cand // 2,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
