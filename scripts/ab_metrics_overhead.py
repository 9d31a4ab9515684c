"""Same-session A/B: engine-loop cost of the round-5 wave metrics —
AIMD adaptive politeness (one filtered keyed aggregate per wave) and
the HLL distinct-URLs manifest metric (startup frontier register build
+ one 64-row aggregate per wave).

Two interleaved crawls over the same SyntheticWeb corpus in one Spark
session: both features off (control) vs both on.  Crawl BEHAVIOR is
unchanged on this corpus in virtual-clock mode (politeness is
simulated, so a multiplier changes recorded waits, not wall time;
the HLL is pure accounting), so the delta is the metrics' price.

Usage: python scripts/ab_metrics_overhead.py [corpus] [quota] [trials]
"""

from __future__ import annotations

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
    corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    quota = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark("ab-metrics", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    def run(on: bool, tag: str):
        if on:
            os.environ["LOPEZ_WAVE_HLL"] = "1"
        else:
            os.environ.pop("LOPEZ_WAVE_HLL", None)
        cfg = CrawlConfig(
            seeds=tuple(fx.seeds(corpus)),
            boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
            quota=quota,
            max_depth=6,
            batch_size=256,
            partitions=8,
            hot_origin_threshold=32,
            max_salts=4,
            adaptive_politeness=on,
        )
        store = WaveStore(tempfile.mkdtemp(), tag)
        t0 = time.monotonic()
        summary = CrawlEngine(spark, cfg, SyntheticWeb(corpus), store).crawl()
        return time.monotonic() - t0, summary

    run(False, "warmup")
    rows = []
    for i in range(trials):
        off_t, off_s = run(False, f"off{i}")
        on_t, on_s = run(True, f"on{i}")
        assert off_s.waves == on_s.waves and off_s.processed == on_s.processed
        rows.append((off_t, on_t, off_s.waves))
        print(f"trial {i}: off {off_t:.2f}s  on {on_t:.2f}s  waves {off_s.waves}")

    best_off = min(r[0] for r in rows)
    best_on = min(r[1] for r in rows)
    waves = rows[0][2]
    print(
        f"best-of-{trials}: off {best_off:.2f}s  on {best_on:.2f}s  "
        f"delta {best_on - best_off:+.2f}s total, "
        f"{(best_on - best_off) / waves:+.3f}s/wave over {waves} waves"
    )


if __name__ == "__main__":
    main()
