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
    # raw response body (2xx only) — consumed by the optional WARC
    # content sink (CrawlConfig.warc_dir); None keeps the engine's
    # default store-nothing behavior (the reference stores analysis
    # results, not bodies)
    body: bytes | None = None
    # response Content-Type header when the provider knows it; the WARC
    # sink archives this instead of assuming text/html
    content_type: str = "text/html"


class WebProvider:
    """Interface: batch-free single-URL fetch + per-origin robots."""

    def fetch(self, url: str) -> FetchResult:  # pragma: no cover - interface
        raise NotImplementedError

    def robots(self, origin: str) -> str | None:  # pragma: no cover
        raise NotImplementedError


@dataclass(frozen=True)
class SyntheticWeb(WebProvider):
    """The fixture web: topology is a pure function of image_id
    (FIXTURES.md §2), so executors and the oracle agree bit-for-bit.

    ``with_body=True`` additionally renders the page HTML into
    ``FetchResult.body`` (needed by the WARC content sink); off by
    default so the plain crawl hot path never pays for a page render
    it would discard."""

    n: int
    with_body: bool = False

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
        if 300 <= status < 400:
            return FetchResult(status, None, [], fx.url_of(fx.redirect_target(image_id, self.n)))
        if status == 404:
            return FetchResult(404, None, [], None)
        if status == 0:
            return FetchResult(0, None, [], None)
        return FetchResult(
            200,
            image_id,
            fx.raw_links(image_id, self.n),
            None,
            body=fx.html_of(image_id, self.n).encode() if self.with_body else None,
        )

    def robots(self, origin: str) -> str | None:
        host = origin.split("://", 1)[-1]
        if not host.startswith("h") or ".example.test" not in host:
            return None
        try:
            idx = int(host.split(".")[0][1:])
        except ValueError:
            return None
        return fx.robots_txt_of(idx)


def accumulate_body(chunks, max_body_size: int) -> bytes:
    """Stream-accumulate a response body with the reference's truncation
    rule (``SimpleDownloader::download``, downloader/mod.rs:120-135):
    when the next chunk would overflow ``max_body_size``, keep only the
    prefix that fits and stop reading."""
    content = bytearray()
    for chunk in chunks:
        if len(content) + len(chunk) > max_body_size:
            content += chunk[: max_body_size - len(content)]
            break
        content += chunk
    return bytes(content)


def decode_body(content: bytes, encoding: str) -> bytes:
    """Content-Encoding decode (downloader/mod.rs:137-151): identity /
    gzip / deflate (raw, as flate2's ``DeflateDecoder``); anything else
    raises — the reference turns that into a download error.  A body
    truncated mid-gzip-stream raises too (read_to_end on a truncated
    stream errors in the reference)."""
    import zlib

    if encoding == "identity":
        return content
    if encoding == "gzip":
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out = d.decompress(content)
        if not d.eof:
            raise ValueError("truncated gzip stream")
        return out + d.flush()
    if encoding == "deflate":
        d = zlib.decompressobj(wbits=-zlib.MAX_WBITS)
        out = d.decompress(content)
        if not d.eof:
            raise ValueError("truncated deflate stream")
        return out + d.flush()
    raise ValueError(f"unknown content encoding {encoding}")


def tree_search(html_text: str) -> list[tuple[str, str]]:
    """All (reason, raw-href) pairs of a page: every ``<a>`` with an
    href (reason=ahref), then every ``link[rel="canonical"]`` href
    (reason=canonical) — the exact selector set and output order of the
    reference's ``tree_search`` (lib-lopez/src/directives/mod.rs:36-55).
    stdlib html.parser; tolerant of malformed markup like Html::parse."""
    from html.parser import HTMLParser

    anchors: list[tuple[str, str]] = []
    canonicals: list[tuple[str, str]] = []

    class _Finder(HTMLParser):
        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            if tag == "a" and a.get("href") is not None:
                anchors.append(("ahref", a["href"]))
            elif (
                tag == "link"
                and (a.get("rel") or "").lower() == "canonical"
                and a.get("href") is not None
            ):
                canonicals.append(("canonical", a["href"]))

        handle_startendtag = handle_starttag

    f = _Finder(convert_charrefs=True)
    try:
        f.feed(html_text)
        f.close()
    except Exception:
        pass  # parse as far as possible; Html::parse never fails either
    return anchors + canonicals


class HttpWeb(WebProvider):
    """Real-web provider: UA + Accept-Encoding headers, streaming body
    accumulation with ``max_body_size`` truncation, gzip/deflate decode,
    any-3xx redirect surfacing, and HTML link extraction — the protocol
    logic of ``SimpleDownloader::download`` (downloader/mod.rs:73-160)
    plus ``tree_search`` (directives/mod.rs:36-55).

    ``transport(url) -> (status:int, headers:dict[lower->str],
    chunk_iter)`` is injectable: tests drive it with canned byte
    streams; the default uses urllib without auto-redirects (network —
    unavailable in this sandbox, so only the default transport is
    untested, never the protocol logic)."""

    def __init__(self, user_agent: str, timeout: float, max_body: int, transport=None):
        self.user_agent = user_agent
        self.timeout = timeout
        self.max_body = max_body
        self.transport = transport or self._urllib_transport

    def _urllib_transport(self, url: str):  # pragma: no cover - needs network
        import urllib.request

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, *a, **k):
                return None

        opener = urllib.request.build_opener(_NoRedirect)
        req = urllib.request.Request(
            url,
            headers={
                "User-Agent": self.user_agent,
                "Accept-Encoding": "gzip, deflate",
            },
        )
        try:
            res = opener.open(req, timeout=self.timeout)
        except urllib.error.HTTPError as e:  # non-2xx still has status+headers
            res = e
        headers = {k.lower(): v for k, v in res.headers.items()}

        def chunks(r=res):
            while True:
                b = r.read(65536)
                if not b:
                    return
                yield b

        return res.status, headers, chunks()

    def fetch(self, url: str) -> FetchResult:
        try:
            status, headers, chunks = self.transport(url)
        except Exception:
            return FetchResult(0, None, [], None)  # network error/timeout
        if 300 <= status < 400:
            loc = headers.get("location")
            if loc is None:
                # "no Location header on redirect" is a download error
                return FetchResult(0, None, [], None)
            return FetchResult(status, None, [], loc)
        if 200 <= status < 300:
            try:
                content = accumulate_body(chunks, self.max_body)
                content = decode_body(
                    content, headers.get("content-encoding", "identity")
                )
            except Exception:
                return FetchResult(0, None, [], None)
            links = tree_search(content.decode("utf-8", errors="replace"))
            return FetchResult(status, None, links, None, body=content)
        return FetchResult(status, None, [], None)  # BadStatus

    def fetch_content(self, url: str) -> FetchResult:
        """Like :meth:`fetch` for 2xx pages whose body comes from
        elsewhere (see WebDriverWeb): status/redirect/error handling
        only, no body read."""
        try:
            status, headers, _chunks = self.transport(url)
        except Exception:
            return FetchResult(0, None, [], None)
        if 300 <= status < 400:
            loc = headers.get("location")
            if loc is None:
                return FetchResult(0, None, [], None)
            return FetchResult(status, None, [], loc)
        return FetchResult(status, None, [], None)

    def robots(self, origin: str) -> str | None:
        """robots.txt over the same transport (S4); protocol handling —
        redirects, walk-up — lives in crawler.robots.get_robots."""
        from .robots import get_robots

        def fetch_text(url: str):
            try:
                status, headers, chunks = self.transport(url)
            except Exception:
                return 599, None
            if 300 <= status < 400:
                return status, headers.get("location")
            if 200 <= status < 300:
                try:
                    content = accumulate_body(chunks, self.max_body)
                    content = decode_body(
                        content, headers.get("content-encoding", "identity")
                    )
                except Exception:
                    return 599, None
                return status, content.decode("utf-8", errors="replace")
            return status, None

        return get_robots(fetch_text, origin)


class WebDriverWeb(WebProvider):
    """WebDriver-rendered provider (operator S3): status and redirects
    are determined by a plain HTTP request — exactly the reference's
    ``WebDriverDownloader::download`` (web_driver.rs:62-105), which
    probes via hyper and only on success pulls the *rendered* DOM
    (``document.documentElement.outerHTML`` after ``load``) from the
    WebDriver session (web_driver.rs:45-58, EXTRACT_SOURCE).

    ``render(url) -> str`` is the injectable WebDriver call (fantoccini
    goto + execute_async in the reference; a Selenium/Playwright client
    in a real deployment — no browser in this sandbox, so tests inject
    a fake renderer and the protocol logic is what's verified)."""

    def __init__(self, http: HttpWeb, render):
        self.http = http
        self.render = render

    def fetch(self, url: str) -> FetchResult:
        probe = self.http.fetch_content(url)
        if not (200 <= probe.status_code < 300):
            return probe  # error / redirect / bad status: no render
        try:
            source = self.render(url)
        except Exception:
            return FetchResult(0, None, [], None)  # render failure = download error
        return FetchResult(
            probe.status_code,
            None,
            tree_search(source),
            None,
            body=source.encode(),  # rendered DOM: what the WARC sink archives
        )

    def robots(self, origin: str) -> str | None:
        return self.http.robots(origin)


class SelectiveWeb(WebProvider):
    """Per-URL downloader routing (``SelectiveDownloader``,
    lib-lopez/src/directives/mod.rs:163-178): URLs matching any
    ``use webdriver on "re"`` rule (``WebDriverSelector::use_webdriver``,
    directives.rs:618-628) fetch via the WebDriver provider, everything
    else via the simple one; robots always go to the simple provider."""

    def __init__(self, rules: tuple[str, ...], webdriver: WebProvider, simple: WebProvider):
        import re

        self._rules = tuple(re.compile(r) for r in rules)
        self.webdriver = webdriver
        self.simple = simple

    def use_webdriver(self, url: str) -> bool:
        return any(r.search(url) for r in self._rules)

    def fetch(self, url: str) -> FetchResult:
        if self.use_webdriver(url):
            return self.webdriver.fetch(url)
        return self.simple.fetch(url)

    def robots(self, origin: str) -> str | None:
        return self.simple.robots(origin)


@dataclass(frozen=True)
class SyntheticHttpTransport:
    """The synthetic corpus served as HTTP-shaped responses — real HTML
    bodies (fixtures.html_of), a deterministic Content-Encoding mix
    (identity/gzip/deflate), 3xx with Location headers, robots.txt, and
    raised exceptions for simulated network errors.  ``SyntheticWeb``
    and this transport describe the SAME web, so a crawl through the
    full HttpWeb path (streaming decode + tree_search link extraction)
    must be identical to a SyntheticWeb crawl — the integration proof
    for the real-web pipeline (tests/test_httpweb.py,
    tests/test_crawl_parity.py).  Frozen dataclass → picklable into
    executor task closures."""

    n: int

    def __call__(self, url: str):
        import gzip as _gzip
        import zlib as _zlib

        if url.endswith("/robots.txt"):
            txt = SyntheticWeb(self.n).robots(url[: -len("/robots.txt")])
            if txt is None:
                return 404, {}, iter([])
            return 200, {}, iter([txt.encode()])
        res = SyntheticWeb(self.n).fetch(url)
        if res.status_code == 0:
            raise OSError("synthetic network error")
        if 300 <= res.status_code < 400:
            return res.status_code, {"location": res.location}, iter([])
        if res.status_code != 200:
            return res.status_code, {}, iter([])
        html = fx.html_of(res.image_id, self.n).encode()
        enc = ("identity", "gzip", "deflate")[fx.umod(fx.hk(res.image_id, 77), 3)]
        if enc == "gzip":
            body, headers = _gzip.compress(html), {"content-encoding": "gzip"}
        elif enc == "deflate":
            c = _zlib.compressobj(wbits=-_zlib.MAX_WBITS)
            body, headers = c.compress(html) + c.flush(), {"content-encoding": "deflate"}
        else:
            body, headers = html, {}
        return 200, headers, (body[i : i + 1024] for i in range(0, len(body), 1024))


def synthetic_http_web(n: int, user_agent: str = "lopez_spark", max_body: int = 10 << 20) -> HttpWeb:
    """HttpWeb over the synthetic HTTP transport (picklable)."""
    return HttpWeb(user_agent, timeout=5.0, max_body=max_body, transport=SyntheticHttpTransport(n))
