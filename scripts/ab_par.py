"""Interleaved same-session A/B of the `_par` read-parallelism wrapper
(round-6 optimization): for each query, alternate variant on/off within
ONE SparkSession so host-window drift cancels.  Usage:
  python scripts/ab_par.py [reps] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lopez_spark.plans.driver_queries import QUERIES  # noqa: E402
from lopez_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "graph_opic", "graph_label_propagation", "graph_degrees",
    "dedup_paragraph", "lm_bigram_novelty", "bpe_encode_tokens",
    "sample_dsir_weights", "dedup_components", "bpe_train_merges",
    "graph_triangles", "quality_ngram_char_fractions", "dedup_cdc_chunks",
    "crawl_dust_rules", "pagerank_orders", "graph_trustrank",
    "dedup_minhash_lsh", "quality_perceptron", "dedup_ngram_jaccard",
    "dedup_winnowing", "crawl_anchor_text",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("ab_par", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    warm = "/root/testdata/sf0.001"
    for name in names:  # warm both variants
        for flag in ("", "1"):
            os.environ["LOPEZ_NO_PAR"] = flag
            QUERIES[name](spark, warm).write.mode("overwrite").format("noop").save()
    os.environ["LOPEZ_NO_PAR"] = ""

    out = {}
    for name in names:
        on, off = [], []
        for _ in range(reps):
            for flag, acc in (("", on), ("1", off)):
                os.environ["LOPEZ_NO_PAR"] = flag
                t0 = time.time()
                QUERIES[name](spark, sf).write.mode("overwrite").format("noop").save()
                acc.append(round(time.time() - t0, 3))
        os.environ["LOPEZ_NO_PAR"] = ""
        out[name] = {"par_on": on, "par_off": off}
        print(f"{name}: on_min={min(on):.2f} off_min={min(off):.2f} "
              f"on={on} off={off}", flush=True)
    with open("/tmp/ab_par_interleaved.json", "w") as fh:
        json.dump(out, fh, indent=1)
    won = sum(1 for v in out.values() if min(v["par_on"]) < min(v["par_off"]))
    print(f"par_on wins {won}/{len(out)}")
    spark.stop()


if __name__ == "__main__":
    main()
