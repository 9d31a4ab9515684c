"""Mergeable metric sketches (operators/sketches.py): HLL register
construction, merge algebra, estimate accuracy, CMS cell algebra, and
the LOPEZ_WAVE_HLL engine integration (registers + estimate in every
committed wave manifest).

Reference counterpart: lib-lopez/src/crawler/counter.rs:9-58 — exact
mergeable counters; these are the sketch generalizations that survive a
10^10-URL frontier.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lopez_spark.operators.sketches import (
    HLL_M,
    cms_cells,
    cms_expand,
    hll_estimate,
    hll_idx_rho,
    hll_merge,
    hll_registers,
)


def _keys(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.concat(F.lit("url:"), F.col("id").cast("string")).alias("url")
    )


def test_hll_merge_is_union(spark):
    """HLL(A ∪ B) == merge(HLL(A), HLL(B)) — exactly, register by
    register, including overlapping key ranges (idempotence)."""
    a = _keys(spark, 0, 700)
    b = _keys(spark, 500, 1300)  # overlaps a on [500, 700)
    both = a.unionByName(b)
    ra, rb = hll_registers(a, "url"), hll_registers(b, "url")
    assert hll_merge(ra, rb) == hll_registers(both, "url")
    # merge algebra: commutative, idempotent
    assert hll_merge(ra, rb) == hll_merge(rb, ra)
    assert hll_merge(ra, ra) == ra


def test_hll_duplicates_free(spark):
    """Duplicate keys cannot move any register (MAX absorbs them)."""
    a = _keys(spark, 0, 400)
    dup = a.unionByName(a).unionByName(a)
    assert hll_registers(a, "url") == hll_registers(dup, "url")


@pytest.mark.parametrize("n", [100, 1000, 5000])
def test_hll_estimate_accuracy(spark, n):
    """m=64 gives ~13% standard error (1.04/sqrt(64)); assert a loose
    3-sigma-ish 35% envelope so the test pins correctness of the
    estimator arithmetic, not hash luck."""
    est = hll_estimate(hll_registers(_keys(spark, 0, n), "url"))
    assert abs(est - n) / n < 0.35, (est, n)


def test_hll_estimate_empty_and_tiny(spark):
    assert hll_estimate([0] * HLL_M) == 0  # linear counting: 64*ln(1)
    est = hll_estimate(hll_registers(_keys(spark, 0, 5), "url"))
    assert 1 <= est <= 15  # linear-counting regime


def test_hll_idx_rho_ranges(spark):
    idx, rho = hll_idx_rho("url", HLL_M)
    row = (
        _keys(spark, 0, 2000)
        .select(idx.alias("i"), rho.alias("r"))
        .agg(
            F.min("i").alias("imin"),
            F.max("i").alias("imax"),
            F.min("r").alias("rmin"),
            F.max("r").alias("rmax"),
        )
        .collect()[0]
    )
    assert 0 <= row["imin"] and row["imax"] < HLL_M
    assert 1 <= row["rmin"] and row["rmax"] <= 33


def test_hll_merge_width_mismatch():
    with pytest.raises(ValueError):
        hll_merge([0] * 64, [0] * 32)


def test_cms_cells_merge_is_addition(spark):
    """Sketch(A + B) == cellwise Sketch(A) + Sketch(B): building from
    two half-weight frames and adding cells equals one full build."""
    full = spark.createDataFrame(
        [(f"h{i}", (i % 7) + 1) for i in range(50)], ["host", "n"]
    )
    halves = full.select("host", (F.col("n") * 2).alias("n"))
    s_full = {
        (r["r"], r["bucket"]): r["tot"]
        for r in cms_cells(full, "host", "n", 4, 16).collect()
    }
    s_double = {
        (r["r"], r["bucket"]): r["tot"]
        for r in cms_cells(halves, "host", "n", 4, 16).collect()
    }
    assert s_double == {k: 2 * v for k, v in s_full.items()}


def test_cms_estimate_never_undercounts(spark):
    """min-over-rows >= true count for every key (the CMS guarantee —
    the safe direction for a hot-host salting trigger)."""
    counts = spark.createDataFrame(
        [(f"h{i}", 1 + (i * 37) % 101) for i in range(120)], ["host", "n"]
    )
    d, w = 4, 16  # heavy collisions on purpose
    cells = cms_expand(counts, "host", "n", d, w)
    sketch = cells.groupBy("r", "bucket").agg(F.sum("wt").alias("tot"))
    est = (
        cells.join(sketch, ["r", "bucket"])
        .groupBy("key")
        .agg(F.min("wt").alias("truth"), F.min("tot").alias("est"))
        .collect()
    )
    assert len(est) == 120
    assert all(r["est"] >= r["truth"] for r in est)


def test_wave_manifests_carry_hll(tmp_path, spark, monkeypatch):
    """LOPEZ_WAVE_HLL=1: every committed manifest carries the register
    list + estimate; the register set grows monotonically wave over
    wave; and the final estimate tracks the TRUE number of distinct
    URLs the frontier ever held (which the crawl summary's frontier
    should equal, since frontier rows are never dropped)."""
    from lopez_spark import fixtures as fx
    from lopez_spark.catalog import WaveStore
    from lopez_spark.crawler.config import Boundaries, CrawlConfig
    from lopez_spark.crawler.wave import CrawlEngine
    from lopez_spark.crawler.web import SyntheticWeb

    monkeypatch.setenv("LOPEZ_WAVE_HLL", "1")
    n = 200
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(n)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=120,
        max_depth=4,
        batch_size=48,
        partitions=2,
    )
    store = WaveStore(str(tmp_path), "hll")
    engine = CrawlEngine(spark, cfg, SyntheticWeb(n), store)
    summary = engine.crawl()
    assert summary.waves >= 2

    prev = [0] * HLL_M
    for m in summary.per_wave:
        regs = m["metrics"]["hll_regs"]
        assert len(regs) == HLL_M
        assert all(a >= b for a, b in zip(regs, prev))  # monotone growth
        assert m["metrics"]["hll_urls_est"] == hll_estimate(regs)
        prev = regs

    frontier = store.load_frontier(spark, store.latest_wave())
    truth = frontier.select("url").distinct().count()
    est = summary.per_wave[-1]["metrics"]["hll_urls_est"]
    assert abs(est - truth) / truth < 0.35, (est, truth)
    # and the committed manifest equals the in-memory summary
    committed = store.load_manifest(store.latest_wave())
    assert committed["metrics"]["hll_regs"] == summary.per_wave[-1]["metrics"]["hll_regs"]


def test_hist_cells_merge_is_addition(spark):
    """hist(A ⊎ B) == cellwise hist(A) + hist(B) — the merge that lets
    per-wave/per-segment histograms combine without re-scanning."""
    from lopez_spark.operators.sketches import hist_cells

    a = spark.range(0, 300).select((F.col("id") % 97).alias("v"))
    b = spark.range(300, 500).select((F.col("id") % 89).alias("v"))
    ha = {r["b"]: r["cnt"] for r in hist_cells(a, "v", 8).collect()}
    hb = {r["b"]: r["cnt"] for r in hist_cells(b, "v", 8).collect()}
    hu = {
        r["b"]: r["cnt"]
        for r in hist_cells(a.unionByName(b), "v", 8).collect()
    }
    assert hu == {k: ha.get(k, 0) + hb.get(k, 0) for k in set(ha) | set(hb)}


# --- hypothesis property fuzz (pure python, no Spark) ---
from hypothesis import given, settings
from hypothesis import strategies as st

_regs = st.lists(st.integers(min_value=0, max_value=33), min_size=64, max_size=64)


@settings(max_examples=200, deadline=None)
@given(_regs, _regs, _regs)
def test_hll_merge_associative_commutative(a, b, c):
    assert hll_merge(a, hll_merge(b, c)) == hll_merge(hll_merge(a, b), c)
    assert hll_merge(a, b) == hll_merge(b, a)
    assert hll_merge(a, a) == a


@settings(max_examples=200, deadline=None)
@given(_regs, _regs)
def test_hll_estimate_total_and_dyadic_monotone(a, b):
    """estimate never crashes and is a nonneg int for EVERY register
    list; and the exact dyadic mass S = Σ 2^(33−M[j]) — the quantity
    the raw estimate divides by — can only shrink under merge (each
    register is MAXed), so the raw-path estimate can only grow.  (The
    END estimate is not asserted monotone across the linear-counting
    branch switch — the paper's correction is a different estimator
    with its own bias, and the crossover is not order-preserving.)"""
    ea = hll_estimate(a)
    assert isinstance(ea, int) and ea >= 0
    assert hll_estimate(hll_merge(a, b)) >= 0

    def s(regs):
        return sum(1 << (33 - mj) for mj in regs)

    assert s(hll_merge(a, b)) <= min(s(a), s(b))


def test_hll_register_width_validated():
    """ADVICE r5: the m>=128 alpha closed form must not be silently
    applied to small or non-power-of-two widths."""
    import pytest

    from lopez_spark.operators.sketches import hll_estimate, hll_idx_rho

    for bad in (8, 48, 63):
        with pytest.raises(ValueError):
            hll_idx_rho("x", m=bad)
        with pytest.raises(ValueError):
            hll_estimate([0] * bad)
    hll_idx_rho("x", m=256)  # closed-form range still allowed
