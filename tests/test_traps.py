"""Spider-trap accounting (crawler/traps.py + CrawlConfig.trap_budget):
template normalization vectors, incremental-merge ≡ full-recount, the
broadcast block-list filter, and an end-to-end crawl against a web with
a binary-exploding calendar trap — the budgeted run bounds the trap
subspace while healthy pages complete; the unbudgeted run drowns in it.
"""

from __future__ import annotations

from dataclasses import dataclass

from lopez_spark.catalog import WaveStore
from lopez_spark.crawler.config import Boundaries, CrawlConfig
from lopez_spark.crawler.traps import (
    count_templates,
    filter_trapped,
    merge_template_counts,
    template_col,
    with_template,
)
from lopez_spark.crawler.wave import CrawlEngine
from lopez_spark.crawler.web import FetchResult, WebProvider

from pyspark.sql import functions as F


def test_template_normalization_vectors(spark):
    cases = {
        "https://a.test/cal/2024/11/30": ("a.test", "/cal/{n}/{n}/{n}"),
        "https://a.test/cal/1999/01/02": ("a.test", "/cal/{n}/{n}/{n}"),
        "https://b.test/p/7?session=123": ("b.test", "/p/{n}?session={n}"),
        "https://b.test/about": ("b.test", "/about"),
        "https://c.test:8080/x9y": ("c.test:8080", "/x{n}y"),
        "https://d.test": ("d.test", ""),
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: (r["host"], r["template"]) for r in with_template(df).collect()}
    assert got == cases


def test_merge_equals_recount(spark):
    urls = [
        (f"https://h{i % 3}.test/cal/{i}",) for i in range(30)
    ] + [(f"https://h{i % 3}.test/static/about",) for i in range(9)]
    full = spark.createDataFrame(urls, "url string")
    expect = {
        (r["host"], r["template"]): r["n_urls"]
        for r in count_templates(full).collect()
    }
    # fold the same rows in three uneven wave-sized batches
    state = count_templates(spark.createDataFrame(urls[:5], "url string"))
    for lo, hi in ((5, 17), (17, 39)):
        state = merge_template_counts(
            state, spark.createDataFrame(urls[lo:hi], "url string")
        )
    got = {(r["host"], r["template"]): r["n_urls"] for r in state.collect()}
    assert got == expect


def test_filter_trapped_drops_only_over_budget(spark):
    seen = spark.createDataFrame(
        [(f"https://t.test/cal/{i}",) for i in range(8)]
        + [("https://t.test/about",)],
        "url string",
    )
    state = count_templates(seen)
    links = spark.createDataFrame(
        [
            ("https://t.test/cal/99", 1),
            ("https://t.test/cal/100", 1),
            ("https://t.test/contact", 1),
            ("https://other.test/cal/1", 1),  # same template, other host
        ],
        "url string, depth int",
    )
    kept = sorted(
        r["url"] for r in filter_trapped(links, state, budget=8).collect()
    )
    assert kept == ["https://other.test/cal/1", "https://t.test/contact"]
    # block list is tiny and aggregated: the filter plan must broadcast
    # the anti-join (no shuffle over the candidate links)
    df = filter_trapped(links, state, budget=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


@dataclass(frozen=True)
class TrapWeb(WebProvider):
    """A 5-page healthy site plus a binary-exploding calendar trap:
    /cal/<n> links to /cal/<2n+1> and /cal/<2n+2> forever."""

    def fetch(self, url: str) -> FetchResult:
        if url == "https://trap.example.test/start":
            return FetchResult(200, None, [("ahref", "https://trap.example.test/cal/0")], None)
        if url.startswith("https://trap.example.test/cal/"):
            n = int(url.rsplit("/", 1)[1])
            return FetchResult(
                200,
                None,
                [
                    ("ahref", f"https://trap.example.test/cal/{2 * n + 1}"),
                    ("ahref", f"https://trap.example.test/cal/{2 * n + 2}"),
                ],
                None,
            )
        if url.startswith("https://ok.example.test/p"):
            i = int(url.rsplit("p", 1)[1])
            links = (
                [("ahref", f"https://ok.example.test/p{i + 1}")] if i < 4 else []
            )
            return FetchResult(200, None, links, None)
        return FetchResult(404, None, [], None)

    def robots(self, origin: str) -> str | None:
        return None


def _trap_crawl(spark, tmp_path, name: str, budget: int | None):
    cfg = CrawlConfig(
        seeds=("https://trap.example.test/start", "https://ok.example.test/p0"),
        boundaries=Boundaries(
            allowed=(r"^https://(trap|ok)\.example\.test/",)
        ),
        quota=80,
        max_depth=50,  # depth alone must NOT save us: the trap explodes wide
        batch_size=64,
        partitions=2,
        max_hits_per_sec=1000.0,
        trap_budget=budget,
    )
    store = WaveStore(str(tmp_path), name)
    CrawlEngine(spark, cfg, TrapWeb(), store).crawl()
    k = store.latest_wave()
    return store.load_frontier(spark, k)


def test_trap_budget_bounds_url_space(spark, tmp_path):
    trapped = _trap_crawl(spark, tmp_path, "budgeted", budget=8)
    cal = trapped.filter(F.col("url").contains("/cal/"))
    n_cal = cal.count()
    # budget 8 with binary growth: counts cross 8 within ~4 waves; the
    # blocked template stops contributing — far below the ~quota-sized
    # explosion of the unbudgeted run
    assert n_cal <= 40, n_cal
    # the healthy site completed in full despite the trap
    ok_closed = trapped.filter(
        (F.col("url").startswith("https://ok.example.test/p"))
        & (F.col("status") == "closed")
    ).count()
    assert ok_closed == 5
    # templates with a bounded URL count are untouched: every /p<i> page
    # shares one template and all five got fetched
    t = trapped.select(template_col(F.col("url")).alias("tpl")).filter(
        F.col("tpl") == "/p{n}"
    )
    assert t.count() == 5


def test_no_budget_drowns_in_trap(spark, tmp_path):
    free = _trap_crawl(spark, tmp_path, "unbudgeted", budget=None)
    n_cal = free.filter(F.col("url").contains("/cal/")).count()
    assert n_cal > 60, n_cal  # the trap ate (nearly) the whole quota
