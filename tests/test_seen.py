"""Seen-set scale layer (O13): Bloom/cuckoo correctness and the
identical-results guarantee of the bloom-fronted anti-join."""

import numpy as np
import pytest

from lopez_spark.operators.seen import (
    BloomFilter64,
    CuckooFilter64,
    build_bloom,
    seen_anti_join,
)


def test_bloom_no_false_negatives():
    bf = BloomFilter64(capacity=10_000, fpp=0.01)
    keys = np.arange(-5000, 5000, dtype=np.int64) * 7919
    bf.add_many(keys)
    assert bf.might_contain_many(keys).all()


def test_bloom_fpp_reasonable():
    bf = BloomFilter64(capacity=10_000, fpp=0.01)
    bf.add_many(np.arange(10_000, dtype=np.int64))
    probe = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fp_rate = bf.might_contain_many(probe).mean()
    assert fp_rate < 0.03


def test_bloom_merge_roundtrip():
    a, b = BloomFilter64(1000, 0.01), BloomFilter64(1000, 0.01)
    a.add_many(np.array([1, 2, 3], dtype=np.int64))
    b.add_many(np.array([100, 200], dtype=np.int64))
    a.merge(b)
    c = BloomFilter64.loads(a.dumps())
    assert c.might_contain_many(np.array([1, 2, 3, 100, 200], dtype=np.int64)).all()


def test_cuckoo_insert_contains_delete():
    cf = CuckooFilter64(capacity=5_000)
    keys = [int(k) * 104729 for k in range(3_000)]
    for k in keys:
        assert cf.insert(k)
    assert all(cf.contains(k) for k in keys)
    misses = sum(cf.contains(k * 104729 + 13) for k in range(3_000))
    assert misses < 60  # 16-bit fingerprints → tiny fp rate
    for k in keys[:500]:
        assert cf.delete(k)
    stale = sum(cf.contains(k) for k in keys[:500])
    assert stale < 30  # deletions take effect (fp collisions aside)


def test_cuckoo_insert_many_matches_serial():
    """Vectorized bulk insert: no false negatives, fp rate comparable
    to the serial path, works at high load and over delete holes."""
    rng = np.random.default_rng(11)
    for n in (1, 100, 5_000, 60_000):
        keys = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
        cf = CuckooFilter64(capacity=max(n, 64))
        assert cf.insert_many(keys)
        assert cf.contains_many(keys).all(), "bulk insert lost a key"
        other = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
        assert cf.contains_many(other).mean() < 0.01
    # near-full load (just under a power-of-two bucket count)
    n = int(1024 * 4 * 0.93)
    keys = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    cf = CuckooFilter64(capacity=n)
    assert cf.insert_many(keys)
    assert cf.contains_many(keys).all()
    # reinsert into holes left by delete
    for k in keys[:1000]:
        cf.delete(int(k))
    more = rng.integers(-(2**62), 2**62, size=800, dtype=np.int64)
    assert cf.insert_many(more)
    assert cf.contains_many(more).all()
    assert cf.contains_many(keys[1000:]).all()


def test_cuckoo_kick_slot_choice_not_degenerate():
    """Regression: np.uint64 % python-int promotes to float64, which
    made the eviction slot constant 0 and the kick walk cycle among a
    handful of buckets."""
    cf = CuckooFilter64(capacity=64)
    seen = set()
    for _ in range(32):
        cf._rng_state = cf._rng_state  # state advances inside insert
        from lopez_spark.operators.seen import _splitmix

        cf._rng_state = _splitmix(
            np.array([cf._rng_state], dtype=np.uint64)
        )[0]
        seen.add(int(cf._rng_state) % cf.SLOTS)
    assert seen == {0, 1, 2, 3}


def test_cuckoo_contains_many_matches_scalar():
    cf = CuckooFilter64(capacity=2_000)
    keys = [int(k) * 7919 - 500 for k in range(1_500)]
    for k in keys:
        cf.insert(k)
    probe = np.array(keys[:200] + [k * 7919 + 3 for k in range(200)], dtype=np.int64)
    vec = cf.contains_many(probe)
    assert list(vec) == [cf.contains(int(k)) for k in probe]


def test_seen_anti_join_cogrouped_identical(spark):
    from lopez_spark.operators.seen import seen_anti_join_cogrouped

    seen = spark.range(0, 5000).selectExpr("id * 3 as url_hash")
    new = spark.range(0, 3000).selectExpr("id * 2 as url_hash", "id as payload")
    exact = {r["url_hash"] for r in seen_anti_join(new, seen).collect()}
    cg = {r["url_hash"] for r in seen_anti_join_cogrouped(new, seen, partitions=8).collect()}
    assert cg == exact


def test_seen_anti_join_bloom_identical(spark):
    seen = spark.range(0, 5000).selectExpr("id * 3 as url_hash")
    new = spark.range(0, 3000).selectExpr("id * 2 as url_hash", "id as payload")
    exact = {r["url_hash"] for r in seen_anti_join(new, seen).collect()}
    bloom = build_bloom(seen, "url_hash", capacity=5000, fpp=0.05)
    fast = {r["url_hash"] for r in seen_anti_join(new, seen, bloom=bloom).collect()}
    assert fast == exact


def test_crawl_with_bloom_matches_exact(spark, tmp_path):
    """Full engine run with the bloom path on — snapshots identical to oracle."""
    from lopez_spark import fixtures as fx
    from lopez_spark.catalog import WaveStore
    from lopez_spark.crawler.config import Boundaries, CrawlConfig
    from lopez_spark.crawler.wave import CrawlEngine
    from lopez_spark.crawler.web import SyntheticWeb
    from lopez_spark.oracle import oracle_crawl

    n = 200
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(n)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=80,
        max_depth=3,
        batch_size=30,
        partitions=4,
        seen_bloom_capacity=50_000,
    )
    store = WaveStore(str(tmp_path), "bloom")
    summary = CrawlEngine(spark, cfg, SyntheticWeb(n), store).crawl()
    want = oracle_crawl(cfg, SyntheticWeb(n))
    assert summary.waves == len(want.snapshots)
    got = {
        r["url"]: (r["status"], r["http_status"], r["depth"])
        for r in store.load_frontier(spark, summary.waves - 1).collect()
    }
    assert got == want.snapshots[-1]


def test_crawl_cuckoo_tier_matches_exact(spark, tmp_path):
    """Full engine run with seen_tier='cuckoo' (per-partition cogrouped
    cuckoo filters, no standing filter state) — snapshots identical to
    the oracle, and the summary reports the forced tier."""
    from lopez_spark import fixtures as fx
    from lopez_spark.catalog import WaveStore
    from lopez_spark.crawler.config import Boundaries, CrawlConfig
    from lopez_spark.crawler.wave import CrawlEngine
    from lopez_spark.crawler.web import SyntheticWeb
    from lopez_spark.oracle import oracle_crawl

    n = 200
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(n)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=80,
        max_depth=3,
        batch_size=30,
        partitions=4,
        seen_tier="cuckoo",
    )
    store = WaveStore(str(tmp_path), "cuckoo")
    summary = CrawlEngine(spark, cfg, SyntheticWeb(n), store).crawl()
    assert summary.seen_tier == "cuckoo"
    want = oracle_crawl(cfg, SyntheticWeb(n))
    assert summary.waves == len(want.snapshots)
    got = {
        r["url"]: (r["status"], r["http_status"], r["depth"])
        for r in store.load_frontier(spark, summary.waves - 1).collect()
    }
    assert got == want.snapshots[-1]


def test_crawl_banded_no_driver_hash_materialization(spark, tmp_path, monkeypatch):
    """The engine's seen-tier is the banded DataFrame bloom: run a full
    crawl at a simulated north-rule band shape (capacity >> keys, small
    bands → >100 bands) with ``DataFrame.toPandas`` *banned* and every
    ``collect`` size-audited — discovery hashes never reach the driver
    (rounds 1-2 shipped every wave's hashes through toPandas), and the
    final snapshot still matches the exact-oracle run."""
    # patch the concrete class (pyspark 4: instances are
    # sql.classic.dataframe.DataFrame; sql.DataFrame is the facade)
    from pyspark.sql.classic import dataframe as _classic_df

    from lopez_spark import fixtures as fx
    from lopez_spark.catalog import WaveStore
    from lopez_spark.crawler.config import Boundaries, CrawlConfig
    from lopez_spark.crawler.wave import CrawlEngine
    from lopez_spark.crawler.web import SyntheticWeb
    from lopez_spark.operators.seen import BandedBloomSpec

    n = 200
    base = dict(
        seeds=tuple(fx.seeds(n)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=80,
        max_depth=3,
        batch_size=30,
        partitions=4,
    )
    cfg = CrawlConfig(
        **base,
        seen_bloom_capacity=10_000_000,
        seen_band_bytes=64 << 10,
        # force the banded tier (a 10^7-key filter would otherwise fit
        # the broadcast ceiling; at true north-rule capacity the size
        # check picks banded on its own)
        seen_broadcast_max_bytes=0,
    )
    assert BandedBloomSpec(10_000_000, cfg.seen_bloom_fpp, 64 << 10).bands > 100

    collected_sizes: list[int] = []
    real_collect = _classic_df.DataFrame.collect

    def audited_collect(self):
        rows = real_collect(self)
        collected_sizes.append(len(rows))
        return rows

    def banned_topandas(self, *a, **kw):
        raise AssertionError("driver materialization (toPandas) in the wave loop")

    store = WaveStore(str(tmp_path), "banded")
    monkeypatch.setattr(_classic_df.DataFrame, "toPandas", banned_topandas)
    monkeypatch.setattr(_classic_df.DataFrame, "collect", audited_collect)
    try:
        summary = CrawlEngine(spark, cfg, SyntheticWeb(n), store).crawl()
    finally:
        monkeypatch.undo()
    # every driver round-trip in the loop is metadata-sized (histogram
    # classes, cutoff row, lineage partition counts) — never row data
    assert collected_sizes and max(collected_sizes) <= 512

    exact_store = WaveStore(str(tmp_path), "exact")
    exact = CrawlEngine(
        spark, CrawlConfig(**base), SyntheticWeb(n), exact_store
    ).crawl()
    assert summary.waves == exact.waves
    got = {
        r["url"]: (r["status"], r["http_status"], r["depth"])
        for r in store.load_frontier(spark, summary.waves - 1).collect()
    }
    want = {
        r["url"]: (r["status"], r["http_status"], r["depth"])
        for r in exact_store.load_frontier(spark, exact.waves - 1).collect()
    }
    assert got == want


def test_banded_bloom_anti_join_identical(spark):
    from lopez_spark.operators.seen import (
        BandedBloomSpec,
        build_banded_bloom,
        seen_anti_join_banded,
    )

    seen = spark.range(0, 5000).selectExpr("id * 3 as url_hash")
    new = spark.range(0, 3000).selectExpr("id * 2 as url_hash", "id as payload")
    exact = {r["url_hash"] for r in seen_anti_join(new, seen).collect()}
    # tiny bands so the path through many bands is exercised
    spec = BandedBloomSpec(capacity=20_000, fpp=0.02, max_band_bytes=1024)
    assert spec.bands > 4
    bloom_df = build_banded_bloom(seen, "url_hash", spec)
    got = {
        r["url_hash"]
        for r in seen_anti_join_banded(new, seen, "url_hash", bloom_df, spec).collect()
    }
    assert got == exact


def test_banded_bloom_incremental_merge(spark):
    from lopez_spark.operators.seen import (
        BandedBloomSpec,
        build_banded_bloom,
        merge_banded_blooms,
        seen_anti_join_banded,
    )

    spec = BandedBloomSpec(capacity=10_000, fpp=0.02, max_band_bytes=1024)
    old = spark.range(0, 2000).selectExpr("id * 3 as url_hash")
    delta = spark.range(0, 500).selectExpr("id * 7 + 1 as url_hash")
    merged = merge_banded_blooms(
        build_banded_bloom(old, "url_hash", spec),
        build_banded_bloom(delta, "url_hash", spec),
    )
    all_seen = old.unionByName(delta)
    new = spark.range(0, 2000).selectExpr("id as url_hash", "id as payload")
    exact = {r["url_hash"] for r in seen_anti_join(new, all_seen).collect()}
    got = {
        r["url_hash"]
        for r in seen_anti_join_banded(new, all_seen, "url_hash", merged, spec).collect()
    }
    assert got == exact


def test_banded_spec_at_north_rule_capacity():
    """The 10^10-key north-rule config: no single physical filter may
    exceed the band cap, so nothing 12 GB ever exists anywhere; only
    bands that actually hold keys are materialized at all."""
    from lopez_spark.operators.seen import BandedBloomSpec

    spec = BandedBloomSpec(capacity=10_000_000_000, fpp=0.01, max_band_bytes=32 << 20)
    assert spec.band_bytes() <= 32 << 20
    assert spec.bands >= 300  # ~12 GB total / 32 MB bands
    # per-band bits-per-key matches the monolithic design → same fpp
    per_band_capacity = -(-spec.capacity // spec.bands)
    assert spec.m_band / per_band_capacity > 9  # ≈ 9.6 bits/key at fpp 0.01


def test_banded_build_materializes_only_present_bands(spark):
    """A 10^9-capacity banded config built over keys confined to a few
    bands allocates only those bands' bitmaps — the build is incremental
    in the keys, not proportional to capacity (no full-size partials on
    the driver or anywhere else)."""
    from lopez_spark.operators.seen import BandedBloomSpec, build_banded_bloom

    spec = BandedBloomSpec(capacity=1_000_000_000, fpp=0.01, max_band_bytes=4 << 20)
    # keys all ≡ 5 (mod bands) → exactly one band present
    seen = spark.range(0, 200).selectExpr(f"id * {spec.bands} + 5 as url_hash")
    rows = build_banded_bloom(seen, "url_hash", spec).collect()
    assert [r["band"] for r in rows] == [5]
    assert len(rows[0]["bits"]) == spec.band_bytes() <= 4 << 20
