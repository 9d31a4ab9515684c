"""Everything-on integration: the independently developed engine
features — pipelined commit, broadcast-bloom seen tier, spider-trap
accounting, AIMD adaptive politeness, HLL manifest metric — enabled
TOGETHER in one crawl.  Each has its own suite; this guards the
interactions (e.g. aimd_update and the HLL merge both read the wave's
persisted frames at manifest-assembly time while the pipelined writer
holds them for the in-flight commit)."""

from __future__ import annotations

from lopez_spark import fixtures as fx
from lopez_spark.catalog import WaveStore
from lopez_spark.crawler.config import Boundaries, CrawlConfig
from lopez_spark.crawler.wave import CrawlEngine
from lopez_spark.crawler.web import SyntheticWeb
from lopez_spark.operators.sketches import HLL_M, hll_estimate


def test_all_features_together(tmp_path, spark, monkeypatch):
    monkeypatch.setenv("LOPEZ_WAVE_HLL", "1")
    n = 300
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(n)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=200,
        max_depth=5,
        batch_size=50,
        partitions=4,
        adaptive_politeness=True,
        trap_budget=1000,
        pipeline_commit=True,
        seen_bloom_capacity=100_000,
    )
    store = WaveStore(str(tmp_path), "combo")
    s = CrawlEngine(spark, cfg, SyntheticWeb(n), store).crawl()
    assert s.waves >= 3 and s.processed == cfg.quota

    for m in s.per_wave:
        regs = m["metrics"]["hll_regs"]
        assert len(regs) == HLL_M
        assert m["metrics"]["hll_urls_est"] == hll_estimate(regs)
        assert "politeness_mult" in m
        for v in m["politeness_mult"].values():
            assert 1.0 < v <= cfg.politeness_max_backoff

    # the HLL estimate tracks the true distinct frontier size
    frontier = store.load_frontier(spark, store.latest_wave())
    truth = frontier.select("url").distinct().count()
    est = s.per_wave[-1]["metrics"]["hll_urls_est"]
    assert abs(est - truth) / truth < 0.35, (est, truth)

    # finished-crawl resume: all carried state loads, zero extra waves
    s2 = CrawlEngine(spark, cfg, SyntheticWeb(n), store).crawl()
    assert s2.waves == 0
