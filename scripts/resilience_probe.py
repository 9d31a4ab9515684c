"""Executor-failure resilience probe (BENCH §10).

Runs a full crawl on a 2-executor `local-cluster`, SIGKILLs one
executor JVM mid-crawl, and checks the final frontier against the
pure-Python crawl oracle.  Two recovery paths are both correct:

  * task-level: Spark reschedules the dead executor's tasks (and
    recomputes lost shuffle blocks) and the wave job completes;
  * wave-level: if the in-flight wave aborts (e.g. a lost
    `localCheckpoint` block — localCheckpoint is deliberately not
    fault-tolerant), the crawl is resumed from the last committed
    snapshot, which is exactly the engine's documented crash model
    (manifest-last atomic commits; a wave IS one job).

Either way the probe asserts the end state is oracle-identical —
executor loss may cost time, never correctness.

Usage: python scripts/resilience_probe.py [kill_after_s]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lopez_spark import fixtures as fx  # noqa: E402
from lopez_spark.catalog import WaveStore  # noqa: E402
from lopez_spark.crawler.config import Boundaries, CrawlConfig  # noqa: E402
from lopez_spark.crawler.wave import CrawlEngine  # noqa: E402
from lopez_spark.crawler.web import SyntheticWeb  # noqa: E402
from lopez_spark.oracle import oracle_crawl  # noqa: E402
from lopez_spark.session import get_spark  # noqa: E402


def executor_pids() -> list[int]:
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    return [
        int(line.split(None, 1)[0])
        for line in out.splitlines()
        if "CoarseGrainedExecutorBackend" in line
    ]


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--pipeline"]
    pipeline = "--pipeline" in sys.argv
    kill_after = float(args[0]) if args else 12.0

    spark = get_spark(
        "resilience", master="local-cluster[2,1,2048]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = 500
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(n)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=300,
        max_depth=5,
        batch_size=64,
        partitions=8,
        hot_origin_threshold=16,
        max_salts=4,
        seen_bloom_capacity=100_000,
        pipeline_commit=pipeline,
    )
    root = tempfile.mkdtemp()
    web = SyntheticWeb(n)

    crawl_err: list[BaseException] = []

    def run_crawl():
        try:
            CrawlEngine(spark, cfg, web, WaveStore(root, "res")).crawl()
        except BaseException as e:  # noqa: BLE001 - recorded, then resumed
            crawl_err.append(e)

    t = threading.Thread(target=run_crawl)
    t.start()
    time.sleep(kill_after)
    victims = executor_pids()
    killed = None
    if victims:
        killed = victims[0]
        os.kill(killed, signal.SIGKILL)
    t.join()

    resumed = False
    if crawl_err:
        # wave-level recovery: resume from the last committed snapshot
        resumed = True
        CrawlEngine(spark, cfg, web, WaveStore(root, "res")).crawl()

    store = WaveStore(root, "res")
    latest = store.latest_wave()
    got = {
        r["url"]: (r["status"], r["http_status"], r["depth"])
        for r in store.load_frontier(spark, latest).collect()
    }
    want = oracle_crawl(cfg, web)
    print(
        json.dumps(
            {
                "pipeline_commit": pipeline,
                "killed_executor_pid": killed,
                "crawl_raised": repr(crawl_err[0]) if crawl_err else None,
                "resumed": resumed,
                "waves_committed": latest + 1,
                "oracle_waves": len(want.snapshots),
                "end_state_matches_oracle": got == want.snapshots[-1],
            }
        )
    )
    spark.stop()
    sys.exit(0 if got == want.snapshots[-1] else 1)


if __name__ == "__main__":
    main()
