"""Frontier-processing throughput benchmark (the BASELINE.json metric).

One full crawl wave — F2 priority selection → origin routing →
mapInPandas fetch (robots + politeness virtual clocks) → link cleaning
→ seen-set dedup — over a synthetic frontier generated *per-partition*
on executors (the pattern that scales the nominal frontier to 10^10
ids without ever materializing rows on the driver).

Throughput = (URLs fetched + new URLs deduped) / wall seconds.
Run at two parallelism levels (N and 4N cores) for the scaling
efficiency criterion; see BENCH/BASELINE.md.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .. import fixtures as fx
from ..crawler.config import Boundaries, CrawlConfig
from ..crawler.fetch import FETCH_SCHEMA, make_fetch_fn
from ..crawler.frontier import (
    expand_links,
    new_open_rows,
    priority_batch_and_origin_counts,
    with_salt,
)
from ..crawler.web import SyntheticWeb
from ..operators.seen import build_bloom

BENCH_BOUNDARIES = Boundaries(allowed=(r"^https://h\d+\.example\.test/",))


def synthetic_frontier(spark: SparkSession, rows: int, corpus_n: int, partitions: int):
    """Distributed frontier generation: id range → canonical URL / origin /
    hash via an Arrow-batched stage; no driver materialization."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"]
            urls = [fx.url_of(fx.image_id_of(int(i) % corpus_n)) for i in ids]
            yield pd.DataFrame(
                {
                    "url": urls,
                    "origin": [u.rsplit("/", 1)[0] for u in urls],
                    "depth": (ids % 5).astype("int32"),
                }
            )

    ids = spark.range(0, rows, 1, partitions)
    df = ids.mapInPandas(gen, "url string, origin string, depth int")
    return (
        df.dropDuplicates(["url"])
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("status", F.lit("open"))
        .withColumn("http_status", F.lit(None).cast("int"))
    )


def run_wave_bench(
    spark: SparkSession,
    parallelism: int,
    frontier_rows: int = 600_000,
    corpus_n: int = 10_000_000,
    batch_size: int = 450_000,
    use_bloom: bool = True,
    partitions: int = 32,
) -> dict:
    """``partitions`` is fixed independently of ``parallelism``: the
    cluster model is a fixed data partitioning drained by a varying
    number of executors (N vs 4N), so per-task Python/Arrow costs are
    identical at both levels and only the drain rate changes."""
    cfg = CrawlConfig(
        seeds=(),
        boundaries=BENCH_BOUNDARIES,
        quota=batch_size,
        max_depth=10,
        batch_size=batch_size,
        partitions=partitions,
        hot_origin_threshold=max(1024, batch_size // 32),
        max_salts=16,
    )
    web = SyntheticWeb(corpus_n)

    frontier = synthetic_frontier(spark, frontier_rows, corpus_n, partitions).persist()
    n_frontier = frontier.count()  # materialize outside the timed section

    # pre-warm one Python worker per core (fork + numpy/pandas import is
    # a per-executor one-off a long-lived cluster amortizes; the metric
    # is steady-state throughput)
    def _warm(batches):
        for pdf in batches:
            yield pdf

    spark.range(0, parallelism * 4, 1, parallelism * 4).mapInPandas(
        _warm, "id long"
    ).count()

    bloom = build_bloom(frontier, "url_hash", capacity=frontier_rows, fpp=0.01) if use_bloom else None

    t0 = time.time()
    batch, origin_counts, _n_sel = priority_batch_and_origin_counts(
        frontier.filter(F.col("status") == "open"), batch_size, cfg.max_depth
    )
    salted, salt_counts = with_salt(batch, cfg, origin_counts)
    routed = salted.repartition(partitions, F.col("origin"), F.col("salt"))
    results = routed.mapInPandas(make_fetch_fn(web, cfg, salt_counts), FETCH_SCHEMA)
    results = results.persist()
    n_fetched = results.count()
    edges = expand_links(results, cfg.boundaries, partitions)
    new_open = new_open_rows(edges, frontier, bloom)
    n_new = new_open.count()
    elapsed = time.time() - t0

    results.unpersist()
    frontier.unpersist()
    return {
        "parallelism": parallelism,
        "frontier_rows": n_frontier,
        "urls_fetched": n_fetched,
        "new_urls_deduped": n_new,
        "elapsed_s": round(elapsed, 2),
        "urls_per_sec": round((n_fetched + n_new) / elapsed, 1),
    }
