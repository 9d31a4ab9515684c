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

        # fetch/seen/dup counter set in the committed manifest
        m = store.load_manifest(k)["metrics"]
        assert m["n_links"] == len(oracle_result.wave_edges[k])
        assert m["n_dup"] == m["n_links"] - m["n_new"] >= 0


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


def test_resume_rebuilds_seen_filter(spark, cfg, oracle_result, tmp_path_factory):
    """Resume with the bloom tier on: the filter is rebuilt from the
    loaded frontier at resume, so the continued crawl's end state is
    identical to a straight oracle run (a stale/empty filter would
    re-open already-seen URLs)."""
    import dataclasses

    bcfg = dataclasses.replace(cfg, seen_bloom_capacity=100_000)
    root = str(tmp_path_factory.mktemp("wavesb"))
    store = WaveStore(root, "bres")
    s1 = CrawlEngine(spark, bcfg, SyntheticWeb(N), store).crawl(max_waves=2)
    assert s1.waves == 2
    s2 = CrawlEngine(spark, bcfg, SyntheticWeb(N), WaveStore(root, "bres")).crawl()
    assert s2.seen_tier == "broadcast"
    latest = store.latest_wave()
    assert latest == len(oracle_result.snapshots) - 1
    got = snapshot_of(store.load_frontier(spark, latest))
    assert got == oracle_result.snapshots[-1]


def test_pipelined_commit_parity(spark, cfg, oracle_result, tmp_path_factory):
    """pipeline_commit=True (background snapshot write overlapped with
    lineage + next-wave preselection) must produce wave-for-wave
    identical frontiers, and remain resumable mid-crawl (the manifest
    still commits after the write joins)."""
    import dataclasses

    pcfg = dataclasses.replace(cfg, pipeline_commit=True)
    root = str(tmp_path_factory.mktemp("wavesp"))
    store = WaveStore(root, "pipelined")
    engine = CrawlEngine(spark, pcfg, SyntheticWeb(N), store)
    s1 = engine.crawl(max_waves=2)
    assert s1.waves == 2
    CrawlEngine(spark, pcfg, SyntheticWeb(N), WaveStore(root, "pipelined")).crawl()

    assert store.latest_wave() == len(oracle_result.snapshots) - 1
    for k in range(len(oracle_result.snapshots)):
        got = snapshot_of(store.load_frontier(spark, k))
        assert got == oracle_result.snapshots[k], f"wave {k} frontier mismatch"


def test_frontier_boundary_and_param_policy_parity(spark, tmp_path_factory):
    """frontier pages are fetched but never expanded (F9 frontier-cut,
    boundaries.rs:51-53); use-all/ignore-param policies change canonical
    forms — engine must match the oracle under both."""
    from lopez_spark.urlnorm import ParamPolicy

    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(N)),
        boundaries=Boundaries(
            allowed=(r"^https://h\d+\.example\.test/",),
            frontier=(r"/img-000000[23]\d$",),  # ids 20-39: fetch, don't expand
            params=ParamPolicy(use_all=True, ignore=frozenset({"utm_a"})),
        ),
        quota=120,
        max_depth=4,
        batch_size=35,
        partitions=4,
        hot_origin_threshold=8,
        max_salts=4,
    )
    want = oracle_crawl(cfg, SyntheticWeb(N))
    store = WaveStore(str(tmp_path_factory.mktemp("fr")), "frontier")
    engine = CrawlEngine(spark, cfg, SyntheticWeb(N), store)
    summary = engine.crawl()
    assert summary.waves == len(want.snapshots)
    got = snapshot_of(store.load_frontier(spark, summary.waves - 1))
    assert got == want.snapshots[-1]
    # the frontier-cut actually triggered: some frontier-matching page
    # was fetched (closed) yet none of the edges originate from it
    import re

    frontier_pages = {u for u in got if re.search(r"/img-000000[23]\d$", u)}
    fetched_frontier = {u for u in frontier_pages if got[u][0] == "closed"}
    assert fetched_frontier, "fixture never fetched a frontier page — weak test"
    all_edges = {
        (r["from_url"], r["to_url"])
        for k in range(summary.waves)
        for r in spark.read.parquet(f"{store._wdir(k)}/linkage.parquet").collect()
    }
    assert not any(src in fetched_frontier for src, _ in all_edges)
    # the kept (non-ignored) utm param surfaces in some canonical URL
    assert any("utm_b=" in u for u in got) or all("utm" not in u for u in got)


def test_larger_web_parity(spark, tmp_path_factory):
    """Bigger fixture (more waves, salting and peer-class cutoffs active)."""
    n = 1000
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(n)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=400,
        max_depth=5,
        batch_size=120,
        partitions=4,
        hot_origin_threshold=10,
        max_salts=4,
    )
    want = oracle_crawl(cfg, SyntheticWeb(n))
    store = WaveStore(str(tmp_path_factory.mktemp("big")), "big")
    summary = CrawlEngine(spark, cfg, SyntheticWeb(n), store).crawl()
    assert summary.waves == len(want.snapshots)
    assert summary.processed == want.processed
    got = snapshot_of(store.load_frontier(spark, summary.waves - 1))
    assert got == want.snapshots[-1]


def test_statuses_exercised(oracle_result):
    statuses = {st for snap in oracle_result.snapshots for (st, _h, _d) in snap.values()}
    assert {"open", "closed"} <= statuses
    assert "error" in statuses or "skipped" in statuses
    http = {h for snap in oracle_result.snapshots for (_s, h, _d) in snap.values() if h}
    assert 301 in http or 404 in http


def test_httpweb_html_path_crawls_identically(spark, tmp_path):
    """The real-web pipeline end to end: the same synthetic web served
    as HTML pages with a gzip/deflate/identity Content-Encoding mix,
    fetched by HttpWeb (streaming decode + tree_search extraction)
    through the ENGINE on executors, must produce exactly the
    SyntheticWeb oracle's wave count and final frontier."""
    from lopez_spark.catalog import WaveStore
    from lopez_spark.crawler.wave import CrawlEngine
    from lopez_spark.crawler.web import SyntheticWeb, synthetic_http_web
    from lopez_spark.oracle import oracle_crawl

    n = 200
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(n)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=80,
        max_depth=3,
        batch_size=30,
        partitions=4,
    )
    # pure-Python cross-check first: both providers describe one web
    want = oracle_crawl(cfg, SyntheticWeb(n))
    via_http = oracle_crawl(cfg, synthetic_http_web(n))
    assert via_http.snapshots[-1] == want.snapshots[-1]
    assert via_http.wave_edges == want.wave_edges

    store = WaveStore(str(tmp_path), "httpweb")
    summary = CrawlEngine(spark, cfg, synthetic_http_web(n), store).crawl()
    assert summary.waves == len(want.snapshots)
    got = {
        r["url"]: (r["status"], r["http_status"], r["depth"])
        for r in store.load_frontier(spark, summary.waves - 1).collect()
    }
    assert got == want.snapshots[-1]


def test_wave_profile_phases_in_manifest(spark, cfg, tmp_path_factory, monkeypatch):
    """LOPEZ_WAVE_PROFILE=1 commits a per-phase breakdown
    (select/write/n_new/bloom/lineage) into each wave manifest — the
    committed evidence for the per-wave fixed-cost profile."""
    monkeypatch.setenv("LOPEZ_WAVE_PROFILE", "1")
    store = WaveStore(str(tmp_path_factory.mktemp("prof")), "prof")
    s = CrawlEngine(spark, cfg, SyntheticWeb(N), store).crawl(max_waves=2)
    assert s.waves == 2
    for k in range(2):
        phases = store.load_manifest(k)["metrics"]["phases"]
        assert set(phases) == {"select", "write", "n_new", "bloom", "lineage"}
        assert all(isinstance(v, float) and v >= 0 for v in phases.values())
    # pipelined mode records its own phase set
    import dataclasses

    pcfg = dataclasses.replace(cfg, pipeline_commit=True)
    pstore = WaveStore(str(tmp_path_factory.mktemp("profp")), "profp")
    s2 = CrawlEngine(spark, pcfg, SyntheticWeb(N), pstore).crawl(max_waves=2)
    assert s2.waves == 2
    for k in range(2):
        phases = pstore.load_manifest(k)["metrics"]["phases"]
        assert set(phases) == {"select", "materialize", "drain_prev"}
