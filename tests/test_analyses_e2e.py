"""End-to-end: crawl the fixture web with a directives file driving
both the crawl policy (seeds/boundaries/variables) and the analyses;
per-page analysis values must match the interpreter oracle, and
test_url must reproduce the reference's dry-run reports."""

import pytest

from lopez_spark import fixtures as fx
from lopez_spark.analyses import Analyzer, elements_py
from lopez_spark.catalog import WaveStore
from lopez_spark.crawler.dryrun import test_url as run_test_url
from lopez_spark.crawler.wave import CrawlEngine
from lopez_spark.crawler.web import SyntheticWeb
from lopez_spark.directives.parser import parse_directives, to_crawl_config

N = 200

LCD = r"""
seed "https://h22.example.test/img-00000000";
seed "https://h0.example.test/img-00000003";
allow "^https://h\d+\.example\.test/";
set quota = 60;
set max_depth = 3;

select html {
    page-hash: first(html hash);
    caption: first(text);
    noun: first(text capture "a photo of (\w+)" get "1");
}
select img {
    width: first(attr "width" as-number);
    fmt-ok: count(attr "fmt" in ["raw", "qraw"]);
}
select * { n-elements: count; }
"""


@pytest.fixture(scope="module")
def directives():
    return parse_directives(LCD)


def test_directives_drive_crawl_and_analyses(spark, directives, tmp_path_factory):
    cfg = to_crawl_config(directives, batch_size=25, partitions=4)
    assert cfg.quota == 60 and cfg.max_depth == 3
    analyzer = Analyzer(directives)
    images = spark.createDataFrame(fx.images_pandas(N))
    store = WaveStore(str(tmp_path_factory.mktemp("an")), "analyses")
    engine = CrawlEngine(
        spark, cfg, SyntheticWeb(N), store, analyzer=analyzer, images=images
    )
    summary = engine.crawl()
    assert summary.waves > 1

    views = engine.named_views()
    assert "named_analyses" in views
    rows = {r["image_id"]: r.asDict(recursive=True) for r in views["named_analyses"].collect()}
    assert len(rows) > 10

    for image_id, got in list(rows.items())[:20]:
        i = int(image_id.split("-")[1])
        row = fx.image_row(i)
        elements = elements_py(row.image_id, row.w, row.h, row.fmt, row.caption)
        want = analyzer.analyze_py(elements, got["url"])
        for name, _ty in analyzer.schema:
            assert got[name] == want[name], (name, image_id)
        assert got["caption"] == row.caption  # exact caption equality invariant
        assert got["n-elements"] == 4.0


def test_analysis_schema_types(spark, directives):
    from lopez_spark.directives.types import to_spark

    types = dict(Analyzer(directives).schema)
    assert to_spark(types["page-hash"]).simpleString() == "double"
    assert to_spark(types["caption"]).simpleString() == "string"
    assert to_spark(types["fmt-ok"]).simpleString() == "double"


def test_test_url_reports(directives):
    cfg = to_crawl_config(directives)
    web = SyntheticWeb(N)
    analyzer = Analyzer(directives)

    ok = run_test_url(cfg, web, fx.url_of(fx.image_id_of(3)), analyzer)
    assert ok.report_type == "Crawled" and ok.status_code == 200
    assert ok.analyses["caption"] == fx.image_row(3).caption
    assert all(u.startswith("https://h") for _r, u in ok.links)

    out = run_test_url(cfg, web, "https://elsewhere.example.com/x", analyzer)
    assert out.report_type == "DisallowedByDirectives"

    bad = run_test_url(cfg, web, "not a url", analyzer)
    assert bad.report_type == "InvalidUrl"

    # a robots-disallowed page: host h5 (5 % 5 == 0) blocks ids ending 00
    victim = None
    for i in range(N):
        iid = fx.image_id_of(i)
        if iid.endswith("00") and fx.host_index(iid) % 5 == 0:
            victim = fx.url_of(iid)
            break
    if victim:
        rep = run_test_url(cfg, web, victim, analyzer)
        assert rep.report_type == "DisallowedByOrigin"
