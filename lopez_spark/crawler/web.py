"""Web providers: where page content comes from.

The reference downloads over HTTP (``SimpleDownloader::download``,
``lib-lopez/src/crawler/downloader/mod.rs:73-160``).  In this sandbox the
"web" is the deterministic synthetic corpus of image+caption pages
(fixtures.py), fetched by pure lookup.  A provider must be picklable and
cheap to ship in task closures — it is instantiated once per executor
task and serves whole Arrow batches.
"""

from __future__ import annotations

from dataclasses import dataclass

from .. import fixtures as fx


@dataclass(frozen=True)
class FetchResult:
    status_code: int  # 0 = simulated network error / timeout
    image_id: str | None  # content key (200 only)
    links: list[tuple[str, str]]  # raw (reason, href) pairs as in the DOM
    location: str | None  # redirect Location header (3xx only)


class WebProvider:
    """Interface: batch-free single-URL fetch + per-origin robots."""

    def fetch(self, url: str) -> FetchResult:  # pragma: no cover - interface
        raise NotImplementedError

    def robots(self, origin: str) -> str | None:  # pragma: no cover
        raise NotImplementedError


@dataclass(frozen=True)
class SyntheticWeb(WebProvider):
    """The fixture web: topology is a pure function of image_id
    (FIXTURES.md §2), so executors and the oracle agree bit-for-bit."""

    n: int

    def fetch(self, url: str) -> FetchResult:
        image_id = fx.image_id_from_url(url)
        if image_id is None:
            return FetchResult(404, None, [], None)
        try:
            i = int(image_id.split("-")[1])
        except (IndexError, ValueError):
            return FetchResult(404, None, [], None)
        if not (0 <= i < self.n) or fx.url_of(image_id) != url:
            # unknown id, or a URL pointing at a non-canonical host
            return FetchResult(404, None, [], None)
        status = fx.http_status(image_id)
        if status == 301:
            return FetchResult(301, None, [], fx.url_of(fx.redirect_target(image_id, self.n)))
        if status == 404:
            return FetchResult(404, None, [], None)
        if status == 0:
            return FetchResult(0, None, [], None)
        return FetchResult(200, image_id, fx.raw_links(image_id, self.n), None)

    def robots(self, origin: str) -> str | None:
        host = origin.split("://", 1)[-1]
        if not host.startswith("h") or ".example.test" not in host:
            return None
        try:
            idx = int(host.split(".")[0][1:])
        except ValueError:
            return None
        return fx.robots_txt_of(idx)


class HttpWeb(WebProvider):
    """Real-web provider (UA header, gzip decode, body truncation as in
    the reference downloader).  Networking is out of scope for the
    sandbox — the class documents the integration point."""

    def __init__(self, user_agent: str, timeout: float, max_body: int):
        self.user_agent = user_agent
        self.timeout = timeout
        self.max_body = max_body

    def fetch(self, url: str) -> FetchResult:  # pragma: no cover
        raise NotImplementedError("no network in sandbox; see SyntheticWeb")

    def robots(self, origin: str) -> str | None:  # pragma: no cover
        raise NotImplementedError("no network in sandbox; see SyntheticWeb")
