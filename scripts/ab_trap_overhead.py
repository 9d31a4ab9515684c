"""Same-session A/B: engine-loop cost of spider-trap accounting.

Two interleaved crawls over the same SyntheticWeb corpus in one Spark
session: trap_budget=None (control) vs a budget high enough to block
nothing (10^6) — isolating the pure accounting overhead (startup
frontier recount, per-wave template merge + localCheckpoint, broadcast
anti-join on the discovery path) from any behavioral change.  Results
are identical by construction; the delta is the feature's price.

Usage: python scripts/ab_trap_overhead.py [corpus] [quota] [trials]
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

    spark = get_spark("ab-trap", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    def run(budget, tag):
        cfg = CrawlConfig(
            seeds=tuple(fx.seeds(corpus)),
            boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
            quota=quota,
            max_depth=6,
            batch_size=256,
            partitions=8,
            hot_origin_threshold=32,
            max_salts=4,
            trap_budget=budget,
        )
        store = WaveStore(tempfile.mkdtemp(), tag)
        t0 = time.monotonic()
        summary = CrawlEngine(spark, cfg, SyntheticWeb(corpus), store).crawl()
        dt = time.monotonic() - t0
        return dt, summary

    # one untimed warm-up (JIT/codegen) then interleaved trials
    run(None, "warmup")
    rows = []
    for i in range(trials):
        off_t, off_s = run(None, f"off{i}")
        on_t, on_s = run(1_000_000, f"on{i}")
        assert off_s.processed == on_s.processed, "A/B results diverged"
        assert off_s.waves == on_s.waves
        rows.append((off_t, on_t, off_s.waves))
        print(
            f"trial {i}: off={off_t:.2f}s on={on_t:.2f}s "
            f"waves={off_s.waves} overhead={(on_t - off_t) / off_s.waves:+.3f}s/wave"
        )
    best_off = min(r[0] for r in rows)
    best_on = min(r[1] for r in rows)
    waves = rows[0][2]
    print(
        f"best-of-{trials}: off={best_off:.2f}s on={best_on:.2f}s "
        f"({waves} waves) overhead={(best_on - best_off) / waves:+.3f}s/wave "
        f"({(best_on / best_off - 1) * 100:+.1f}%)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
