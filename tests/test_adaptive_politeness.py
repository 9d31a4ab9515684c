"""AIMD adaptive per-origin politeness (CrawlConfig.adaptive_politeness
+ fetch.aimd_update): multiplicative backoff on congestion-signal
fetches (status == "error"), additive recovery on clean waves, state
carried in committed manifests and restored on resume.

Beyond-reference: lopez's rate is a fixed `set max_hits_per_sec`
(lib-lopez/src/directives/variable.rs:87); this is its adaptive
extension with the configured rate as the ceiling.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.catalog import WaveStore
from lopez_spark.crawler.config import Boundaries, CrawlConfig
from lopez_spark.crawler.fetch import aimd_update, make_fetch_fn
from lopez_spark.crawler.wave import CrawlEngine
from lopez_spark.crawler.web import SyntheticWeb

_BOUND = Boundaries(allowed=(r"^https://h\d+\.example\.test/",))


def _cfg(**kw) -> CrawlConfig:
    base = dict(
        seeds=tuple(fx.seeds(200)),
        boundaries=_BOUND,
        quota=100,
        max_depth=4,
        batch_size=40,
        partitions=2,
        adaptive_politeness=True,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _results_df(spark, rows):
    # (origin, status) — the two columns aimd_update reads
    return spark.createDataFrame(rows, ["origin", "status"])


def test_aimd_update_backoff_recover_untracked(spark):
    cfg = _cfg()
    df = _results_df(
        spark,
        [
            ("https://a", "error"),
            ("https://a", "closed"),
            ("https://b", "closed"),  # tracked, clean → additive decrease
            ("https://c", "closed"),  # untracked, clean → never collected
        ],
    )
    out = aimd_update({"https://b": 1.5}, df, cfg)
    assert out["https://a"] == 2.0  # 1.0 * backoff
    assert out["https://b"] == 1.25  # 1.5 - recover
    assert "https://c" not in out


def test_aimd_update_cap_drop_and_hold(spark):
    cfg = _cfg()
    df = _results_df(spark, [("https://a", "error"), ("https://b", "closed")])
    # a at 6.0 doubles but caps at 8; b at 1.2 recovers past 1.0 → dropped;
    # d is tracked but absent from the wave → held unchanged
    out = aimd_update({"https://a": 6.0, "https://b": 1.2, "https://d": 3.0}, df, cfg)
    assert out["https://a"] == cfg.politeness_max_backoff
    assert "https://b" not in out
    assert out["https://d"] == 3.0


def test_fetch_delay_scales_by_multiplier():
    """The virtual clock under mult=4 ticks exactly 4× slower — same
    batch, same origin, deterministic."""
    urls = [
        fx.url_of(fx.image_id_of(i))
        for i in range(300)
        if fx.http_status(fx.image_id_of(i)) == 200
    ]
    by_origin: dict[str, list[str]] = {}
    for u in urls:
        o = u.rsplit("/", 1)[0]
        idx = int(o.split("//h", 1)[1].split(".", 1)[0])
        if idx % 7 == 0:  # skip robots Crawl-delay hosts
            continue
        by_origin.setdefault(o, []).append(u)
    origin, ulist = next((o, us) for o, us in by_origin.items() if len(us) >= 3)
    pdf = pd.DataFrame(
        [(u, hash(u), origin, 1, 0) for u in ulist[:3]],
        columns=["url", "url_hash", "origin", "depth", "salt"],
    )
    cfg = _cfg(max_hits_per_sec=10.0)  # nominal delay 0.1 s

    def waits(mult):
        fn = make_fetch_fn(
            SyntheticWeb(300), cfg, {}, origin_mult={origin: mult} if mult else None
        )
        (out,) = list(fn(iter([pdf])))
        return list(out["politeness_wait_s"])

    w1, w4 = waits(None), waits(4.0)
    assert w1 == pytest.approx([0.0, 0.1, 0.2])
    assert w4 == pytest.approx([0.0, 0.4, 0.8])  # exactly 4×


def test_crawl_backs_off_error_origins(tmp_path, spark):
    """e2e: the fixture web has deterministic timeout URLs (~1/31);
    origins that hit them appear in the manifest's politeness_mult with
    a multiplier in (1, max]; every manifest carries the key; and
    multipliers only move by AIMD steps between consecutive waves."""
    cfg = _cfg()
    store = WaveStore(str(tmp_path), "aimd")
    summary = CrawlEngine(spark, cfg, SyntheticWeb(200), store).crawl()
    assert summary.waves >= 2
    mults_seen = {}
    prev: dict[str, float] = {}
    for m in summary.per_wave:
        assert "politeness_mult" in m
        cur = m["politeness_mult"]
        for o, v in cur.items():
            assert 1.0 < v <= cfg.politeness_max_backoff
            if o in prev:
                expect = {
                    min(cfg.politeness_max_backoff, prev[o] * cfg.politeness_backoff),
                    round(prev[o] - cfg.politeness_recover, 4),
                    prev[o],  # held (origin not fetched this wave)
                }
                assert v in expect, (o, prev[o], v)
            else:
                assert v == cfg.politeness_backoff  # fresh backoff from 1.0
        mults_seen.update(cur)
        prev = cur
    assert mults_seen, "no origin ever backed off — fixture errors missing?"


def test_resume_restores_backoff_state(tmp_path, spark):
    """Inject a known multiplier into the last committed manifest, then
    resume: the next wave's manifest must evolve FROM that state (a
    value > backoff is impossible from scratch after one wave)."""
    cfg = _cfg(quota=40)
    store = WaveStore(str(tmp_path), "aimd2")
    CrawlEngine(spark, cfg, SyntheticWeb(200), store).crawl(max_waves=1)
    last = store.latest_wave()
    assert last is not None
    # doctor the committed manifest: origin X enters resume at 4.0
    mpath = os.path.join(str(tmp_path), "aimd2", f"w{last:05d}", "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    x = "https://h1.example.test"
    manifest["politeness_mult"] = {x: 4.0}
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    summary = CrawlEngine(spark, cfg, SyntheticWeb(200), store).crawl(max_waves=1)
    assert summary.waves == 1
    got = summary.per_wave[0]["politeness_mult"].get(x)
    # evolved from 4.0: held (not fetched), recovered, or backed off —
    # every admissible value exceeds the from-scratch maximum of 2.0
    assert got in (4.0, 3.75, 8.0)
    assert got > cfg.politeness_backoff


def test_aimd_skipped_rows_are_not_recovery_evidence(spark):
    """ADVICE r5: a tracked origin whose only rows this wave were
    robots-skipped (never fetched) holds its multiplier — recovery
    evidence must come from statuses that actually ran (closed/error)."""
    cfg = _cfg()
    df = _results_df(
        spark,
        [
            ("https://a", "skipped"),   # tracked, only skipped → hold
            ("https://b", "skipped"),   # tracked, skipped + closed → recover
            ("https://b", "closed"),
        ],
    )
    out = aimd_update({"https://a": 4.0, "https://b": 2.0}, df, cfg)
    assert out["https://a"] == 4.0
    assert out["https://b"] == 1.75


def test_backoff_floor_when_base_delay_is_zero():
    """ADVICE r5: with no configured rate limit (max_hits_per_sec<=0,
    no robots crawl-delay) a backed-off origin pays the floor delay
    times its multiplier instead of silently running at full rate."""
    urls = [
        fx.url_of(fx.image_id_of(i))
        for i in range(300)
        if fx.http_status(fx.image_id_of(i)) == 200
    ]
    by_origin: dict[str, list[str]] = {}
    for u in urls:
        o = u.rsplit("/", 1)[0]
        idx = int(o.split("//h", 1)[1].split(".", 1)[0])
        if idx % 7 == 0:
            continue
        by_origin.setdefault(o, []).append(u)
    origin, ulist = next((o, us) for o, us in by_origin.items() if len(us) >= 3)
    pdf = pd.DataFrame(
        [(u, hash(u), origin, 1, 0) for u in ulist[:3]],
        columns=["url", "url_hash", "origin", "depth", "salt"],
    )
    cfg = _cfg(max_hits_per_sec=0.0)  # unlimited base rate

    def waits(mult):
        fn = make_fetch_fn(
            SyntheticWeb(300), cfg, {}, origin_mult={origin: mult} if mult else None
        )
        (out,) = list(fn(iter([pdf])))
        return list(out["politeness_wait_s"])

    assert waits(None) == pytest.approx([0.0, 0.0, 0.0])  # no limit, no mult
    floor = cfg.politeness_floor_s * 2.0
    assert waits(2.0) == pytest.approx([0.0, floor, 2 * floor])
