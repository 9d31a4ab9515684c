"""Delta-mode wave store: O(changes) writes, identical frontiers,
resume across delta boundaries."""

import os

import pytest

from lopez_spark import fixtures as fx
from lopez_spark.catalog import WaveStore
from lopez_spark.crawler.config import Boundaries, CrawlConfig
from lopez_spark.crawler.wave import CrawlEngine
from lopez_spark.crawler.web import SyntheticWeb
from lopez_spark.oracle import oracle_crawl

N = 300


@pytest.fixture(scope="module")
def cfg():
    return CrawlConfig(
        seeds=tuple(fx.seeds(N)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=150,
        max_depth=4,
        batch_size=40,
        partitions=4,
    )


def snapshot_of(df):
    return {r["url"]: (r["status"], r["http_status"], r["depth"]) for r in df.collect()}


def test_delta_mode_matches_oracle_every_wave(spark, cfg, tmp_path):
    want = oracle_crawl(cfg, SyntheticWeb(N))
    store = WaveStore(str(tmp_path), "delta", mode="delta", compact_every=3)
    summary = CrawlEngine(spark, cfg, SyntheticWeb(N), store).crawl()
    assert summary.waves == len(want.snapshots)
    for k in range(summary.waves):
        assert snapshot_of(store.load_frontier(spark, k)) == want.snapshots[k], k

    # deltas actually written between compaction points
    has_delta = any(
        os.path.exists(os.path.join(store._wdir(k), "delta.parquet"))
        for k in range(summary.waves)
    )
    has_compaction = sum(
        os.path.exists(os.path.join(store._wdir(k), "frontier.parquet"))
        for k in range(summary.waves)
    )
    assert has_delta and 1 <= has_compaction < summary.waves


def test_delta_mode_resume(spark, cfg, tmp_path):
    want = oracle_crawl(cfg, SyntheticWeb(N))
    store = WaveStore(str(tmp_path), "dres", mode="delta", compact_every=4)
    CrawlEngine(spark, cfg, SyntheticWeb(N), store).crawl(max_waves=2)
    # resume from a delta wave (wave 1 has no full snapshot)
    store2 = WaveStore(str(tmp_path), "dres", mode="delta", compact_every=4)
    CrawlEngine(spark, cfg, SyntheticWeb(N), store2).crawl()
    latest = store2.latest_wave()
    assert latest == len(want.snapshots) - 1
    assert snapshot_of(store2.load_frontier(spark, latest)) == want.snapshots[-1]
