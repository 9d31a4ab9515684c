"""Same-session A/B of the trained-ANN localCheckpoint optimization.

One Spark session; for each trained query, interleaved runs with
LOPEZ_NO_TRAIN_CKPT=1 (old construction) and unset (new), best-of-3
each, bench.py's exact measurement (construct + noop write).  The env
var is read at query-construction time, so toggling it between runs
inside one session is a valid A/B.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lopez_spark.plans.driver_queries import QUERIES  # noqa: E402
from lopez_spark.session import get_spark  # noqa: E402

NAMES = ["ann_ivfpq_trained_topk", "ann_ivfpq_recall", "ann_ivfpq_nprobe_sweep"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


def run(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 3)


def main() -> None:
    spark = get_spark("ab", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    warm = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    for name in NAMES:  # warm both variants' plans
        os.environ["LOPEZ_NO_TRAIN_CKPT"] = "1"
        run(spark, name, warm)
        os.environ.pop("LOPEZ_NO_TRAIN_CKPT")
        run(spark, name, warm)

    out: dict[str, dict] = {}
    for name in NAMES:
        old, new = [], []
        for _ in range(REPS):
            os.environ["LOPEZ_NO_TRAIN_CKPT"] = "1"
            old.append(run(spark, name, SF_DIR))
            os.environ.pop("LOPEZ_NO_TRAIN_CKPT")
            new.append(run(spark, name, SF_DIR))
        out[name] = {
            "old_best": min(old), "new_best": min(new),
            "old_runs": old, "new_runs": new,
            "speedup": round(min(old) / min(new), 2),
        }
        print(name, out[name], flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
