"""End-to-end crawl-ordering parity: the Spark wave engine must
reproduce the pure-Python oracle's wave-by-wave frontier snapshots,
edge sets, and final URL-seen set (the north rule's correctness gate).
"""

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
        hot_origin_threshold=10,
        max_salts=4,
    )


@pytest.fixture(scope="module")
def oracle_result(cfg):
    return oracle_crawl(cfg, SyntheticWeb(N))


def snapshot_of(df):
    return {
        r["url"]: (r["status"], r["http_status"], r["depth"])
        for r in df.collect()
    }


def test_wave_by_wave_parity(spark, cfg, oracle_result, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("waves"))
    store = WaveStore(root, "parity")
    engine = CrawlEngine(spark, cfg, SyntheticWeb(N), store)
    summary = engine.crawl()

    assert summary.waves == len(oracle_result.snapshots)
    assert summary.processed == oracle_result.processed

    for k in range(summary.waves):
        got = snapshot_of(store.load_frontier(spark, k))
        want = oracle_result.snapshots[k]
        assert got == want, f"wave {k} frontier mismatch"

        edges = {
            (r["from_url"], r["reason"], r["to_url"], r["depth"])
            for r in spark.read.parquet(f"{store._wdir(k)}/linkage.parquet").collect()
        }
        assert edges == oracle_result.wave_edges[k], f"wave {k} edges mismatch"


def test_final_seen_set(spark, cfg, oracle_result, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("waves2"))
    store = WaveStore(root, "seen")
    engine = CrawlEngine(spark, cfg, SyntheticWeb(N), store)
    engine.crawl()
    latest = store.latest_wave()
    got = {r["url"] for r in store.load_frontier(spark, latest).collect()}
    assert got == oracle_result.final_seen()


def test_resume_from_checkpoint(spark, cfg, oracle_result, tmp_path_factory):
    """Run 2 waves, 'crash', resume — end state identical to a straight run."""
    root = str(tmp_path_factory.mktemp("waves3"))
    store = WaveStore(root, "resume")
    engine = CrawlEngine(spark, cfg, SyntheticWeb(N), store)
    s1 = engine.crawl(max_waves=2)
    assert s1.waves == 2

    engine2 = CrawlEngine(spark, cfg, SyntheticWeb(N), WaveStore(root, "resume"))
    engine2.crawl()

    latest = store.latest_wave()
    assert latest == len(oracle_result.snapshots) - 1
    got = snapshot_of(store.load_frontier(spark, latest))
    assert got == oracle_result.snapshots[-1]


def test_statuses_exercised(oracle_result):
    statuses = {st for snap in oracle_result.snapshots for (st, _h, _d) in snap.values()}
    assert {"open", "closed"} <= statuses
    assert "error" in statuses or "skipped" in statuses
    http = {h for snap in oracle_result.snapshots for (_s, h, _d) in snap.values() if h}
    assert 301 in http or 404 in http
