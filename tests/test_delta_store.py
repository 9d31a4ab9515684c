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


def test_crash_recovery_discards_uncommitted_wave(spark, cfg, tmp_path):
    """A crash between write_data and commit_manifest leaves a wave dir
    with parquet but no manifest: resume must ignore it, redo the wave
    idempotently, and converge to the oracle state."""
    want = oracle_crawl(cfg, SyntheticWeb(N))
    store = WaveStore(str(tmp_path), "crash")
    CrawlEngine(spark, cfg, SyntheticWeb(N), store).crawl(max_waves=2)
    assert store.latest_wave() == 1

    # simulate the crash: wave 2's data written, manifest never lands
    wdir = store._wdir(2)
    os.makedirs(wdir)
    with open(os.path.join(wdir, "frontier.parquet"), "w") as f:
        f.write("torn write")
    assert store.latest_wave() == 1  # uncommitted dir is invisible

    store2 = WaveStore(str(tmp_path), "crash")
    CrawlEngine(spark, cfg, SyntheticWeb(N), store2).crawl()
    latest = store2.latest_wave()
    assert latest == len(want.snapshots) - 1
    assert snapshot_of(store2.load_frontier(spark, latest)) == want.snapshots[-1]


def test_upsert_mode_matches_oracle_every_wave(spark, cfg, tmp_path):
    """mode='upsert': the store performs the MERGE INTO-equivalent
    keyed upsert itself (previous committed snapshot + delta, matched
    rows replaced, unmatched inserted) — every wave's reconstructed
    state must equal the oracle's, and every wave dir holds a full
    read-optimal snapshot (no delta files)."""
    want = oracle_crawl(cfg, SyntheticWeb(N))
    store = WaveStore(str(tmp_path), "ups", mode="upsert")
    summary = CrawlEngine(spark, cfg, SyntheticWeb(N), store).crawl()
    assert summary.waves == len(want.snapshots)
    for k in range(summary.waves):
        assert snapshot_of(store.load_frontier(spark, k)) == want.snapshots[k], k
        assert os.path.exists(os.path.join(store._wdir(k), "frontier.parquet"))
        assert not os.path.exists(os.path.join(store._wdir(k), "delta.parquet"))


def test_upsert_mode_resume_and_crash_recovery(spark, cfg, tmp_path):
    """Upsert-mode crawl interrupted mid-run (plus a torn uncommitted
    wave dir) resumes idempotently — the store-side merge re-runs and
    converges to the oracle end state."""
    want = oracle_crawl(cfg, SyntheticWeb(N))
    store = WaveStore(str(tmp_path), "upsr", mode="upsert")
    CrawlEngine(spark, cfg, SyntheticWeb(N), store).crawl(max_waves=2)
    assert store.latest_wave() == 1
    # torn write of wave 2: parquet present, manifest never landed
    wdir = store._wdir(2)
    os.makedirs(wdir)
    with open(os.path.join(wdir, "frontier.parquet"), "w") as f:
        f.write("torn write")
    store2 = WaveStore(str(tmp_path), "upsr", mode="upsert")
    CrawlEngine(spark, cfg, SyntheticWeb(N), store2).crawl()
    latest = store2.latest_wave()
    assert latest == len(want.snapshots) - 1
    assert snapshot_of(store2.load_frontier(spark, latest)) == want.snapshots[-1]


@pytest.mark.parametrize(
    "mode,compact_every", [("snapshot", 8), ("delta", 4), ("upsert", 8)]
)
def test_rollback_to_arbitrary_tag_and_recrawl(spark, cfg, tmp_path, mode, compact_every):
    """Resume from an *arbitrary earlier* snapshot tag, not just the
    latest: crawl to completion, roll back to tag 1 (in delta mode a
    delta-only tag — the keyed-upsert merge reconstructs it), and
    re-crawl to the identical oracle end state."""
    want = oracle_crawl(cfg, SyntheticWeb(N))
    store = WaveStore(str(tmp_path), f"rb-{mode}", mode=mode, compact_every=compact_every)
    summary = CrawlEngine(spark, cfg, SyntheticWeb(N), store).crawl()
    assert summary.waves == len(want.snapshots) and summary.waves > 2

    store.rollback(1)
    assert store.latest_wave() == 1
    assert snapshot_of(store.load_frontier(spark, 1)) == want.snapshots[1]

    store2 = WaveStore(str(tmp_path), f"rb-{mode}", mode=mode, compact_every=compact_every)
    CrawlEngine(spark, cfg, SyntheticWeb(N), store2).crawl()
    latest = store2.latest_wave()
    assert latest == len(want.snapshots) - 1
    assert snapshot_of(store2.load_frontier(spark, latest)) == want.snapshots[-1]


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


@pytest.mark.parametrize(
    "mode,compact_every", [("snapshot", 8), ("delta", 3), ("upsert", 8)]
)
def test_expire_snapshots_keeps_resume_points(spark, cfg, tmp_path, mode, compact_every):
    """expire_snapshots drops only superseded frontier state: kept waves
    still load (delta mode gets a materialized snapshot at the oldest
    kept wave first), linkage/manifests survive for every wave, and the
    final frontier is unchanged."""
    want = oracle_crawl(cfg, SyntheticWeb(N))
    store = WaveStore(str(tmp_path), "exp", mode=mode, compact_every=compact_every)
    summary = CrawlEngine(spark, cfg, SyntheticWeb(N), store).crawl()
    latest = store.latest_wave()
    assert latest == summary.waves - 1
    before = snapshot_of(store.load_frontier(spark, latest))
    n_link_before = store.load_all_linkage(spark, latest).count()

    expired = store.expire_snapshots(spark, keep_last=2)
    assert expired, "nothing expired on a multi-wave crawl"
    assert max(expired) < latest - 1
    for j in expired:
        assert not os.path.exists(os.path.join(store._wdir(j), "frontier.parquet"))
        assert not os.path.exists(os.path.join(store._wdir(j), "delta.parquet"))
        # data + lineage facts survive
        assert os.path.exists(os.path.join(store._wdir(j), "manifest.json"))

    # every kept wave is still loadable and oracle-correct
    for k in range(latest - 1, latest + 1):
        assert snapshot_of(store.load_frontier(spark, k)) == want.snapshots[k], k
    assert snapshot_of(store.load_frontier(spark, latest)) == before
    assert store.load_all_linkage(spark, latest).count() == n_link_before

    # and the store still resumes (finished crawl -> 0 extra waves)
    again = CrawlEngine(spark, cfg, SyntheticWeb(N), WaveStore(str(tmp_path), "exp", mode=mode, compact_every=compact_every)).crawl()
    assert again.waves == 0


def test_rollback_below_expiry_horizon_refused(spark, cfg, tmp_path):
    """Rolling back to a wave whose frontier state was expired must be
    refused (it would leave an unreconstructable store); rollback to a
    kept wave still works after expiry."""
    store = WaveStore(str(tmp_path), "rbexp")
    summary = CrawlEngine(spark, cfg, SyntheticWeb(N), store).crawl()
    latest = store.latest_wave()
    assert summary.waves >= 4
    store.expire_snapshots(spark, keep_last=2)
    with pytest.raises(ValueError, match="expired"):
        store.rollback(0)
    store.rollback(latest - 1)  # kept wave: fine
    assert store.latest_wave() == latest - 1
    assert snapshot_of(store.load_frontier(spark, latest - 1))


def test_upsert_mode_with_pipelined_commit(spark, cfg, tmp_path):
    """upsert store × pipeline_commit compose: the background writer's
    store-side merge reads the PREVIOUS wave's snapshot, which the
    drain ordering guarantees is durable before the next writer starts.
    End state must equal the oracle's, resumable mid-crawl."""
    import dataclasses

    want = oracle_crawl(cfg, SyntheticWeb(N))
    pcfg = dataclasses.replace(cfg, pipeline_commit=True)
    store = WaveStore(str(tmp_path), "upspipe", mode="upsert")
    CrawlEngine(spark, pcfg, SyntheticWeb(N), store).crawl(max_waves=2)
    assert store.latest_wave() == 1
    store2 = WaveStore(str(tmp_path), "upspipe", mode="upsert")
    CrawlEngine(spark, pcfg, SyntheticWeb(N), store2).crawl()
    latest = store2.latest_wave()
    assert latest == len(want.snapshots) - 1
    for k in (1, latest):
        assert snapshot_of(store2.load_frontier(spark, k)) == want.snapshots[k], k
