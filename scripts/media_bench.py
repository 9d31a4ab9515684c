"""Media-ingest scaling bench: the round-4 media paths measured at the
same N vs 4N protocol as the headline (BENCH §2b: both levels inside
the host's linear region — local[1] vs local[4]; mapInPandas keeps 2
hot processes per core, so local[4] ≈ 8 runnable procs ≈ the 0.94
region).  Best of 3 runs per level (±20-30% host noise).

  A. MJPEG frame sampling: AVI fixtures through ``frame_sample``
     (container walk + real JPEG entropy decode of sampled frames).
  B. WebDataset streamed ingest: tar shards through
     ``wds_samples_from_paths`` (sequential member walk from disk).

Usage: python scripts/media_bench.py [--rows 512] [--reps 3]
Prints one JSON line per job with throughput at both levels and the
scaling efficiency (x4/x1)/4.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _build_fixtures(tmp: str, rows: int, shards: int):
    """Driver-side one-time fixture build, shared by both levels."""
    from lopez_spark import fixtures as fx
    from lopez_spark.ops.avi import build_avi
    from lopez_spark.ops.jpeg import encode_jpeg
    from lopez_spark.sources.webdataset import build_shard

    rng = np.random.default_rng(7)
    avis = []
    for u in range(8):  # 8 unique videos, replicated to `rows`
        base = np.clip(
            rng.integers(0, 224, (128, 128, 3)) + np.arange(128)[None, :, None],
            0, 255,
        ).astype(np.uint8)
        frames = [
            encode_jpeg(np.roll(base, 9 * k, axis=1), 90, "420")
            for k in range(8)
        ]
        avis.append(build_avi(frames, 128, 128, fps=24))
    videos = [(f"v{i:05d}", avis[i % 8]) for i in range(rows)]

    os.makedirs(f"{tmp}/wds", exist_ok=True)
    uniq = []
    for u in range(4):  # 4 unique shards, copied to `shards` paths
        samples = [
            {
                "key": f"s{u}-{j:06d}",
                "files": {
                    "raw": rng.integers(0, 256, 256, dtype=np.uint8).tobytes(),
                    "txt": f"caption {u}/{j}".encode(),
                },
            }
            for j in range(2048)
        ]
        uniq.append(build_shard(samples))
    paths = []
    for i in range(shards):
        p = f"{tmp}/wds/shard-{i:04d}.tar"
        with open(p, "wb") as fh:
            fh.write(uniq[i % 4])
        paths.append(p)
    return videos, paths


def _run_level(master: str, videos, wds_paths, reps: int):
    from lopez_spark.ops.multimodal import frame_sample
    from lopez_spark.session import get_spark
    from lopez_spark.sources.webdataset import wds_samples_from_paths

    n_cores = int(master[master.index("[") + 1 : -1])
    spark = get_spark(f"media-bench-{n_cores}", master=master,
                      shuffle_partitions=max(4 * n_cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        vdf = spark.createDataFrame(
            [(vid, bytearray(b), 0, 0, 0, "avi") for vid, b in videos],
            "video_id string, bytes binary, w int, h int, n_frames int, fmt string",
        ).repartition(4 * n_cores).persist()
        n_rows = vdf.count()  # materialize input before timing
        best_a = None
        frames = 0
        for _ in range(reps):
            t0 = time.perf_counter()
            frames = frame_sample(vdf, every_n=2).count()
            dt = time.perf_counter() - t0
            best_a = dt if best_a is None else min(best_a, dt)
        vdf.unpersist()

        pdf = spark.createDataFrame(
            [(p,) for p in wds_paths], "path string"
        ).repartition(4 * n_cores).persist()
        pdf.count()
        best_b = None
        samples = 0
        for _ in range(reps):
            t0 = time.perf_counter()
            samples = wds_samples_from_paths(pdf).count()
            dt = time.perf_counter() - t0
            best_b = dt if best_b is None else min(best_b, dt)
        pdf.unpersist()
        return {
            "videos": n_rows, "frames": frames, "frame_s": best_a,
            "samples": samples, "wds_s": best_b,
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="media_bench_")
    try:
        videos, wds_paths = _build_fixtures(tmp, args.rows, args.shards)
        lo = _run_level("local[1]", videos, wds_paths, args.reps)
        hi = _run_level("local[4]", videos, wds_paths, args.reps)
        for job, key, unit_lo, unit_hi, n in (
            ("mjpeg_frame_sample", "frame_s", lo["frames"] / lo["frame_s"],
             hi["frames"] / hi["frame_s"], lo["frames"]),
            ("wds_streamed_ingest", "wds_s", lo["samples"] / lo["wds_s"],
             hi["samples"] / hi["wds_s"], lo["samples"]),
        ):
            print(json.dumps({
                "job": job, "n": n,
                "per_s_1core": round(unit_lo, 1),
                "per_s_4core": round(unit_hi, 1),
                "t_1core_s": round(lo[key], 2),
                "t_4core_s": round(hi[key], 2),
                "scaling_efficiency": round(unit_hi / unit_lo / 4.0, 3),
            }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
