"""Single-URL dry run — the reference's ``lopez test <url>`` entry
point (``lib.rs:125-186`` → ``CrawlWorker::test_url``,
``worker/mod.rs:387-417``): canonicalize → boundaries check
(DisallowedByDirectives) → robots check (DisallowedByOrigin) → fetch →
links + analyses report.  Pure Python (interpreter backend) — this is
the reference's own debugging oracle and our per-URL golden-test hook.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..urlnorm import canonicalize, origin_of
from .config import CrawlConfig
from .robots import RobotExclusion
from .web import WebProvider


@dataclass
class TestRunReport:
    actual_url: str | None
    report_type: str  # InvalidUrl | DisallowedByDirectives | DisallowedByOrigin | Crawled
    status_code: int | None = None
    links: list[tuple[str, str]] = field(default_factory=list)
    analyses: dict = field(default_factory=dict)


def test_url(
    cfg: CrawlConfig,
    web: WebProvider,
    url: str,
    analyzer=None,
    elements_fn=None,
) -> TestRunReport:
    canon = canonicalize(url, cfg.boundaries.params)
    if canon is None:
        return TestRunReport(None, "InvalidUrl")
    if not (cfg.boundaries.is_allowed(canon) or cfg.boundaries.is_frontier(canon)):
        return TestRunReport(canon, "DisallowedByDirectives")
    txt = web.robots(origin_of(canon))
    if txt is not None and not RobotExclusion(txt, cfg.user_agent).allows(canon):
        return TestRunReport(canon, "DisallowedByOrigin")

    res = web.fetch(canon)
    if 300 <= res.status_code < 400 and res.location is not None:
        target = cfg.boundaries.clean_redirect(canon, res.location)
        links = [("redirect", target)] if target is not None else []
        return TestRunReport(canon, "Crawled", res.status_code, links)
    if res.status_code == 0:
        return TestRunReport(canon, "Crawled", None)
    links = cfg.boundaries.clean_links(canon, res.links)

    analyses = {}
    if analyzer is not None and res.image_id is not None:
        if elements_fn is None:
            from .. import fixtures as fx
            from ..analyses import elements_py

            def elements_fn(image_id):
                i = int(image_id.split("-")[1])
                row = fx.image_row(i)
                return elements_py(row.image_id, row.w, row.h, row.fmt, row.caption)

        analyses = analyzer.analyze_py(elements_fn(res.image_id), canon)

    return TestRunReport(canon, "Crawled", res.status_code, links, analyses)
