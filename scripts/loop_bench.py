"""Full `CrawlEngine.crawl` loop throughput (BENCH/BASELINE.md §6).

Protocol (identical to rounds 1-2 so the numbers compare): 10^6-id
synthetic corpus, BFS warm-up from 2,000 seeds, quota 200,000 pages,
local[8], 32 partitions, batch 65,536, seen-bloom ON.  Round 3 the
seen tier is size-adaptive (broadcast at this capacity; --banded /
--cuckoo force the other tiers for the BENCH §6 A/B) and the
round-1/2 driver-held filter + per-wave toPandas maintenance is gone.

Usage: python scripts/loop_bench.py [--no-bloom] [--banded] [--cuckoo]
       [--quota N] [--corpus N]
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lopez_spark import fixtures as fx  # noqa: E402
from lopez_spark.catalog import WaveStore  # noqa: E402
from lopez_spark.crawler.config import Boundaries, CrawlConfig  # noqa: E402
from lopez_spark.crawler.wave import CrawlEngine  # noqa: E402
from lopez_spark.crawler.web import SyntheticWeb  # noqa: E402
from lopez_spark.session import get_spark  # noqa: E402


def main() -> None:
    corpus = 1_000_000
    quota = 200_000
    bloom = "--no-bloom" not in sys.argv
    force_banded = "--banded" in sys.argv
    force_cuckoo = "--cuckoo" in sys.argv
    delta = "--delta" in sys.argv
    pipeline = "--pipeline" in sys.argv
    latency = 0.0
    for i, a in enumerate(sys.argv):
        if a == "--quota":
            quota = int(sys.argv[i + 1])
        if a == "--corpus":
            corpus = int(sys.argv[i + 1])
        if a == "--latency":
            latency = float(sys.argv[i + 1])

    spark = get_spark("loop-bench", master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    cfg = CrawlConfig(
        seeds=tuple(fx.url_of(fx.image_id_of(i)) for i in range(2_000)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=quota,
        max_depth=12,
        batch_size=65_536,
        partitions=32,
        hot_origin_threshold=2_048,
        max_salts=16,
        seen_bloom_capacity=2_000_000 if bloom else None,
        seen_broadcast_max_bytes=0 if force_banded else 256 << 20,
        seen_tier="cuckoo" if force_cuckoo else "auto",
        pipeline_commit=pipeline,
    )
    web = SyntheticWeb(corpus)

    class LatencyWaveStore(WaveStore):
        """Object-store latency simulator: pads every write_data with a
        fixed sleep (the commit round-trip a high-latency store adds on
        top of the compute) — the A/B instrument for the pipelined
        commit, whose whole point is overlapping that latency with the
        next wave's foreground work."""

        def write_data(self, k, frontier, linkage, analyses=None, delta=None):
            super().write_data(k, frontier, linkage, analyses, delta=delta)
            if latency:
                time.sleep(latency)

    mk_store = LatencyWaveStore if latency else WaveStore

    # one small untimed warm-up crawl: fresh-JVM whole-stage-codegen /
    # JIT is a one-off no long-lived cluster pays
    wcfg = CrawlConfig(
        seeds=cfg.seeds[:200],
        boundaries=cfg.boundaries,
        quota=5_000,
        max_depth=12,
        batch_size=8_192,
        partitions=32,
        hot_origin_threshold=2_048,
        max_salts=16,
        seen_bloom_capacity=200_000 if bloom else None,
        seen_broadcast_max_bytes=0 if force_banded else 256 << 20,
        seen_tier="cuckoo" if force_cuckoo else "auto",
    )
    mode = "delta" if delta else "snapshot"
    CrawlEngine(spark, wcfg, web, mk_store(tempfile.mkdtemp(), "warm", mode=mode)).crawl()

    store = mk_store(tempfile.mkdtemp(), "loop", mode=mode)
    t0 = time.time()
    summary = CrawlEngine(spark, cfg, web, store).crawl()
    wall = time.time() - t0
    n_new = sum(m["metrics"]["n_new"] for m in summary.per_wave)
    print(
        json.dumps(
            {
                "waves": summary.waves,
                "processed": summary.processed,
                "new_urls_deduped": n_new,
                "wall_s": round(wall, 1),
                "fetched_plus_new_per_sec": round((summary.processed + n_new) / wall),
                "seen_tier": summary.seen_tier,
                "store_mode": mode,
                "pipeline_commit": pipeline,
                "injected_write_latency_s": latency,
                "per_wave": [
                    {
                        "n": m["metrics"]["n_batch"],
                        "new": m["metrics"]["n_new"],
                        "wall_s": m["metrics"].get("wall_s"),
                        **({"phases": m["metrics"]["phases"]} if "phases" in m["metrics"] else {}),
                    }
                    for m in summary.per_wave
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
