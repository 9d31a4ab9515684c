"""Engine PageRank entry point (lopez page-rank) + robots walk-up (S4)."""

import pytest

from lopez_spark import fixtures as fx
from lopez_spark.catalog import WaveStore
from lopez_spark.crawler.config import Boundaries, CrawlConfig
from lopez_spark.crawler.robots import get_robots
from lopez_spark.crawler.wave import CrawlEngine
from lopez_spark.crawler.web import SyntheticWeb
from lopez_spark.graph.pagerank import pagerank_numpy


def test_page_rank_over_crawl(spark, tmp_path):
    n = 200
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(n)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=100,
        max_depth=3,
        batch_size=40,
        partitions=4,
    )
    store = WaveStore(str(tmp_path), "pr")
    engine = CrawlEngine(spark, cfg, SyntheticWeb(n), store)
    engine.crawl()

    ranks = engine.page_rank()
    got = {r["url_hash"]: r["rank"] for r in ranks.collect()}
    assert len(got) > 10
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    # oracle: same edge derivation in python from the store
    k = store.latest_wave()
    frontier = store.load_frontier(spark, k)
    closed = {r["url_hash"] for r in frontier.filter("status = 'closed'").collect()}
    edges = {
        (r["from_hash"], r["to_hash"])
        for r in store.load_all_linkage(spark, k).collect()
        if r["reason"] == "ahref" and r["from_hash"] in closed and r["to_hash"] in closed
    }
    want = pagerank_numpy(sorted(edges))
    assert set(got) == set(want)
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, rel=1e-9)

    # named view registered (S7)
    assert spark.sql("select count(*) from named_page_rank").first()[0] == len(got)


def test_get_robots_walkup():
    calls = []

    def fetch(url):
        calls.append(url)
        if url == "https://sub.deep.example.com/robots.txt":
            return (404, None)
        if url == "https://deep.example.com/robots.txt":
            return (301, "https://www.example.com/robots.txt")
        if url == "https://www.example.com/robots.txt":
            return (200, "User-agent: *\nDisallow: /x\n")
        return (404, None)

    body = get_robots(fetch, "https://sub.deep.example.com/page")
    assert body == "User-agent: *\nDisallow: /x\n"
    assert calls[0] == "https://sub.deep.example.com/robots.txt"  # exact origin first

    def never(url):
        return (404, None)

    assert get_robots(never, "https://a.b.example.org/x") is None

    def loop(url):
        return (302, url)  # redirect loop → give up after 5

    assert get_robots(loop, "https://x.example.net/") is None


def test_opic_rank_over_crawl(spark, tmp_path):
    """Engine OPIC entry point (lopez opic) over the same closed→closed
    ahref graph as page_rank — importance sums to 1 and matches the
    dense numpy oracle on the store-derived edge list."""
    from lopez_spark.graph.opic import opic_numpy

    n = 200
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(n)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=100,
        max_depth=3,
        batch_size=40,
        partitions=4,
    )
    store = WaveStore(str(tmp_path), "opic")
    engine = CrawlEngine(spark, cfg, SyntheticWeb(n), store)
    engine.crawl()

    got = {
        r["url_hash"]: r["importance"] for r in engine.opic_rank().collect()
    }
    assert len(got) > 10
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    k = store.latest_wave()
    frontier = store.load_frontier(spark, k)
    closed = {r["url_hash"] for r in frontier.filter("status = 'closed'").collect()}
    edges = {
        (r["from_hash"], r["to_hash"])
        for r in store.load_all_linkage(spark, k).collect()
        if r["reason"] == "ahref" and r["from_hash"] in closed and r["to_hash"] in closed
    }
    want = opic_numpy(sorted(edges))
    assert set(got) == set(want)
    for node, imp in want.items():
        assert got[node] == pytest.approx(imp, rel=1e-9)

    assert spark.sql("select count(*) from named_opic").first()[0] == len(got)
