"""HttpWeb protocol logic (operator S2/O8) on canned byte streams — the
reference's ``SimpleDownloader::download`` semantics
(lib-lopez/src/crawler/downloader/mod.rs:73-160) without a network:
gzip/deflate decode, max_body_size truncation, any-3xx redirect
surfacing, missing-Location error, HTML tree_search link extraction."""

import gzip as gzip_mod
import zlib

from lopez_spark.crawler.web import (
    HttpWeb,
    accumulate_body,
    decode_body,
    tree_search,
)

HTML = (
    b"<html><head><link rel=\"canonical\" href=\"https://ex.test/canon\">"
    b"<link rel=\"stylesheet\" href=\"/style.css\"></head>"
    b"<body><a href=\"/one\">1</a><a name=\"no-href\">x</a>"
    b"<A HREF=\"https://ex.test/two#frag\">2</A>"
    b"<a href=\"\"></a></body></html>"
)


def canned(status, headers, body, chunk=7):
    def transport(url):
        return (
            status,
            {k.lower(): v for k, v in headers.items()},
            (body[i : i + chunk] for i in range(0, len(body), chunk)),
        )

    return transport


def web_with(transport, max_body=10_000_000):
    return HttpWeb("test-agent", timeout=5.0, max_body=max_body, transport=transport)


# ------------------------------------------------------------------- decode


def test_identity_body_roundtrip():
    assert decode_body(b"hello", "identity") == b"hello"


def test_gzip_decode():
    assert decode_body(gzip_mod.compress(HTML), "gzip") == HTML


def test_deflate_decode_raw():
    raw = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    data = raw.compress(HTML) + raw.flush()
    assert decode_body(data, "deflate") == HTML


def test_unknown_encoding_raises():
    try:
        decode_body(b"x", "br")
        assert False, "should raise"
    except ValueError as e:
        assert "unknown content encoding" in str(e)


def test_truncated_gzip_raises():
    data = gzip_mod.compress(b"a" * 100_000)
    try:
        decode_body(data[: len(data) // 2], "gzip")
        assert False, "should raise"
    except Exception:
        pass


# --------------------------------------------------------------- truncation


def test_accumulate_truncates_mid_chunk():
    chunks = [b"aaaa", b"bbbb", b"cccc"]
    assert accumulate_body(iter(chunks), 6) == b"aaaabb"
    assert accumulate_body(iter(chunks), 12) == b"aaaabbbbcccc"
    assert accumulate_body(iter(chunks), 100) == b"aaaabbbbcccc"
    assert accumulate_body(iter([]), 5) == b""


def test_fetch_truncation_of_identity_body():
    body = b"x" * 50
    web = web_with(canned(200, {}, body), max_body=10)
    res = web.fetch("https://ex.test/")
    assert res.status_code == 200  # truncated identity bodies still parse


def test_fetch_truncated_gzip_stream_is_error():
    """Truncation happens on the WIRE bytes, before decode — a gzip body
    cut mid-stream fails decode and becomes a download error, exactly as
    read_to_end errors in the reference."""
    body = gzip_mod.compress(b"y" * 100_000)
    web = web_with(canned(200, {"Content-Encoding": "gzip"}, body), max_body=100)
    assert web.fetch("https://ex.test/").status_code == 0


# ---------------------------------------------------------------- redirects


def test_any_3xx_surfaces_location():
    for code in (301, 302, 303, 307, 308):
        web = web_with(canned(code, {"Location": "https://ex.test/next"}, b""))
        res = web.fetch("https://ex.test/")
        assert res.status_code == code
        assert res.location == "https://ex.test/next"
        assert res.links == []


def test_redirect_without_location_is_error():
    web = web_with(canned(302, {}, b""))
    assert web.fetch("https://ex.test/").status_code == 0


def test_bad_status_closes_without_links():
    web = web_with(canned(404, {}, b"not found"))
    res = web.fetch("https://ex.test/")
    assert res.status_code == 404 and res.links == [] and res.location is None


def test_transport_exception_is_network_error():
    def boom(url):
        raise OSError("connection refused")

    assert web_with(boom).fetch("https://ex.test/").status_code == 0


# ------------------------------------------------------------- tree_search


def test_tree_search_matches_reference_selectors():
    """anchors (any <a> with href, empty included) first, then
    link[rel=canonical] — exact order of tree_search
    (directives/mod.rs:36-55)."""
    links = tree_search(HTML.decode())
    assert links == [
        ("ahref", "/one"),
        ("ahref", "https://ex.test/two#frag"),
        ("ahref", ""),
        ("canonical", "https://ex.test/canon"),
    ]


def test_tree_search_tolerates_malformed_html():
    assert tree_search("<a href='/x'><b><a href=") == [("ahref", "/x")]


def test_fetch_extracts_links_from_gzip_html():
    web = web_with(canned(200, {"Content-Encoding": "gzip"}, gzip_mod.compress(HTML)))
    res = web.fetch("https://ex.test/")
    assert res.status_code == 200
    assert ("canonical", "https://ex.test/canon") in res.links
    assert res.links[0] == ("ahref", "/one")


# ------------------------------------------------------------------ robots


def test_robots_over_transport_with_redirect_and_walkup():
    def transport(url):
        if url == "https://a.sub.example.com/robots.txt":
            return 302, {"location": "https://a.sub.example.com/r2"}, iter([])
        if url == "https://a.sub.example.com/r2":
            return 404, {}, iter([])
        if url == "https://sub.example.com/robots.txt":
            return 200, {}, iter([b"User-agent: *\nDisallow: /priv"])
        return 404, {}, iter([])

    web = web_with(transport)
    assert web.robots("https://a.sub.example.com") == "User-agent: *\nDisallow: /priv"


# ----------------------------------------------------- webdriver + routing


def test_webdriver_renders_only_on_success():
    """2xx probes pull content from the RENDERED DOM; redirects and bad
    statuses never touch the renderer (web_driver.rs:62-105)."""
    from lopez_spark.crawler.web import WebDriverWeb

    rendered = []

    def render(url):
        rendered.append(url)
        return "<a href='/from-js'>x</a>"

    def transport(url):
        if url.endswith("/r"):
            return 302, {"location": "https://ex.test/next"}, iter([])
        if url.endswith("/404"):
            return 404, {}, iter([])
        return 200, {}, iter([b"<a href='/static-only'>unrendered</a>"])

    web = WebDriverWeb(web_with(transport), render)
    res = web.fetch("https://ex.test/page")
    assert res.status_code == 200
    assert res.links == [("ahref", "/from-js")]  # rendered DOM, not the body
    assert rendered == ["https://ex.test/page"]
    assert web.fetch("https://ex.test/r").location == "https://ex.test/next"
    assert web.fetch("https://ex.test/404").status_code == 404
    assert rendered == ["https://ex.test/page"]  # no extra renders


def test_webdriver_render_failure_is_download_error():
    from lopez_spark.crawler.web import WebDriverWeb

    def render(url):
        raise RuntimeError("webdriver session died")

    web = WebDriverWeb(web_with(canned(200, {}, b"<html/>")), render)
    assert web.fetch("https://ex.test/").status_code == 0


def test_selective_routing_matches_reference_selector():
    """SelectiveDownloader semantics: any rule regex match → webdriver;
    robots always via the simple provider."""
    from lopez_spark.crawler.web import FetchResult, SelectiveWeb, WebProvider

    class Tagged(WebProvider):
        def __init__(self, tag):
            self.tag = tag

        def fetch(self, url):
            return FetchResult(200, self.tag, [], None)

        def robots(self, origin):
            return f"robots-from-{self.tag}"

    web = SelectiveWeb((r"\.example\.test/app/", r"spa\."), Tagged("wd"), Tagged("http"))
    assert web.fetch("https://h1.example.test/app/page").image_id == "wd"
    assert web.fetch("https://spa.other.test/x").image_id == "wd"
    assert web.fetch("https://h1.example.test/plain").image_id == "http"
    assert web.robots("https://h1.example.test") == "robots-from-http"


# ------------------------------------------------------ property coverage


def test_accumulate_decode_roundtrip_property():
    """For random bodies, chunkings, and encodings: when the body fits
    max_body, accumulate+decode recovers the original bytes exactly."""
    import random

    from lopez_spark.crawler.web import accumulate_body, decode_body

    rng = random.Random(4242)
    for trial in range(60):
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 2000)))
        enc = rng.choice(["identity", "gzip", "deflate"])
        if enc == "gzip":
            wire = gzip_mod.compress(body)
        elif enc == "deflate":
            c = zlib.compressobj(wbits=-zlib.MAX_WBITS)
            wire = c.compress(body) + c.flush()
        else:
            wire = body
        chunk = rng.randrange(1, 300)
        chunks = (wire[i : i + chunk] for i in range(0, len(wire), chunk))
        acc = accumulate_body(chunks, max_body_size=10_000_000)
        assert decode_body(acc, enc) == body, f"trial {trial} enc {enc}"


def test_html_of_roundtrips_raw_links():
    """tree_search over the rendered fixture page recovers exactly the
    raw_links multiset — the invariant the HTML-path crawl parity test
    rests on."""
    from collections import Counter

    from lopez_spark import fixtures as fx

    for i in range(300):
        iid = fx.image_id_of(i)
        want = Counter(fx.raw_links(iid, 300))
        got = Counter(tree_search(fx.html_of(iid, 300)))
        assert got == want, iid
