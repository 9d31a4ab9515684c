"""Capture .explain("formatted") for a list of declared queries into
plans/r06/<query>_<suffix>.txt (round-6 deliverable).

Usage: python scripts/capture_plans.py <suffix> <out_dir> [query ...]

Run from ANY checkout: imports lopez_spark from its own repo root, so
pointing PYTHONPATH/cwd at a worktree of the round-start commit yields
the "before" plans.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lopez_spark.plans.driver_queries import QUERIES  # noqa: E402
from lopez_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "ann_ivfpq_trained_topk",
    "ann_ivfpq_recall",
    "ann_ivfpq_nprobe_sweep",
    "ann_pq_recall_trained",
    "ann_ivf_trained_topk",
    "kmeans_centroids",
    "dedup_semdedup_trained",
    "kmeans_parallel_init",
    "graph_trustrank",
    "quality_ngram_char_fractions",
    "dedup_cdc_chunks",
    "crawl_dust_rules",
    "image_letterbox_prep",
    "video_frame_dedup",
]


def main() -> None:
    suffix = sys.argv[1]
    out_dir = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    for name in names:
        df = QUERIES[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
