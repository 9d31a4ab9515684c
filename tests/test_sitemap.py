"""Sitemap source (sources/sitemap.py): protocol surface golden
vectors, the robots.txt discovery hook against the reference's own
robots corpus, hostile-input containment (DTD bomb, gzip bomb,
truncation, junk), and hypothesis structural fuzzing asserting the
per-row ok=False contract never escalates to a task failure."""

import gzip
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lopez_spark.sources.sitemap import (
    MAX_URLS,
    extract_sitemap_urls,
    parse_sitemap,
    sitemap_entries,
)
from tests.test_robots import REFERENCE_ROBOTS

NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def _urlset(entries: str) -> bytes:
    return f'<?xml version="1.0"?><urlset xmlns="{NS}">{entries}</urlset>'.encode()


def test_urlset_entries_with_metadata():
    kind, es = parse_sitemap(
        _urlset(
            "<url><loc> https://a.example.test/x </loc>"
            "<lastmod>2026-01-02</lastmod><priority>0.8</priority></url>"
            "<url><loc>https://a.example.test/y</loc></url>"
        )
    )
    assert kind == "urlset"
    assert es == [
        {"loc": "https://a.example.test/x", "lastmod": "2026-01-02", "priority": 0.8},
        {"loc": "https://a.example.test/y", "lastmod": None, "priority": None},
    ]


def test_index_and_txt_and_gzip():
    idx = (
        f'<sitemapindex xmlns="{NS}">'
        "<sitemap><loc>https://a.example.test/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://a.example.test/s2.xml.gz</loc>"
        "<lastmod>2026-02-03</lastmod></sitemap></sitemapindex>"
    ).encode()
    kind, es = parse_sitemap(idx)
    assert kind == "index" and [e["loc"] for e in es] == [
        "https://a.example.test/s1.xml",
        "https://a.example.test/s2.xml.gz",
    ]
    kind, es = parse_sitemap(b"https://a.example.test/1\n\nhttps://a.example.test/2\n")
    assert kind == "txt" and len(es) == 2
    kind, es = parse_sitemap(gzip.compress(_urlset("<url><loc>u://x</loc></url>")))
    assert kind == "urlset" and es[0]["loc"] == "u://x"


def test_invalid_priority_ignored_not_fatal():
    _, es = parse_sitemap(
        _urlset("<url><loc>https://a.example.test/</loc><priority>high</priority></url>")
    )
    assert es[0]["priority"] is None


@pytest.mark.parametrize(
    "payload",
    [
        b"",  # empty
        b"   ",  # whitespace only
        b"<urlset><url></url></urlset>",  # entry without loc
        b"<wrongroot/>",  # unknown root
        b"<urlset><url><loc>x</loc>",  # unclosed XML
        b'<?xml version="1.0"?><!DOCTYPE u [<!ENTITY a "b">]><urlset/>',  # DTD
        gzip.compress(b"<urlset/>")[:-4],  # truncated gzip
        b"\x1f\x8b\x08\x00junkjunk",  # corrupt gzip
        b"\xff\xfe garbage \x00",  # undecodable text
    ],
)
def test_malformed_payloads_raise_valueerror(payload):
    with pytest.raises(ValueError):
        parse_sitemap(payload)


def test_gzip_bomb_bounded():
    # 256 MB of zeros compresses to ~256 KB; the bounded inflate must
    # reject it without materializing the plaintext past the 50 MB cap
    bomb = gzip.compress(b"\x00" * (256 << 20), compresslevel=9)
    assert len(bomb) < (1 << 20)
    with pytest.raises(ValueError):
        parse_sitemap(bomb)


def test_entry_count_cap():
    big = "\n".join(f"https://a.example.test/{i}" for i in range(MAX_URLS + 1))
    with pytest.raises(ValueError):
        parse_sitemap(big.encode())


def test_robots_discovery_hook_reference_corpus():
    """The reference's own robots fixture carries a Sitemap: line
    (lib-lopez/src/crawler/robots.rs:116) — extract it."""
    assert extract_sitemap_urls(REFERENCE_ROBOTS) == [
        "https://example.com/sitemap_index.xml"
    ]
    multi = "sitemap: https://a/s1.xml\nSITEMAP:\thttps://a/s2.xml\nsitemap: https://a/s1.xml\n"
    assert extract_sitemap_urls(multi) == ["https://a/s1.xml", "https://a/s2.xml"]
    assert extract_sitemap_urls("") == []


@settings(max_examples=150, deadline=None)
@given(
    data=st.binary(max_size=4096),
    gz=st.booleans(),
    cut=st.integers(min_value=0, max_value=64),
)
def test_fuzz_parse_contained(data, gz, cut):
    """Any byte soup — raw, gzipped, or truncated-gzipped — either
    parses or raises ValueError; nothing else may escape (that is the
    Arrow stage's containment tuple contract)."""
    payload = gzip.compress(data) if gz else data
    payload = payload[: max(0, len(payload) - cut)]
    try:
        kind, entries = parse_sitemap(payload)
        assert kind in ("urlset", "index", "txt")
        assert isinstance(entries, list)
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_fuzz_xml_structure_contained(data):
    """Random nearly-valid XML sitemaps: random tags, missing locs,
    namespace soup — same contract."""
    rnd = data.draw(
        st.lists(
            st.sampled_from(
                [
                    "<url><loc>https://a/x</loc></url>",
                    "<url></url>",
                    "<url><loc></loc></url>",
                    "<junk/>",
                    "<url><loc>https://a/y</loc><priority>zzz</priority></url>",
                    "<sitemap><loc>https://a/s.xml</loc></sitemap>",
                ]
            ),
            max_size=6,
        )
    )
    root = data.draw(st.sampled_from(["urlset", "sitemapindex", "thing"]))
    payload = f"<{root} xmlns=\"{NS}\">{''.join(rnd)}</{root}>".encode()
    try:
        parse_sitemap(payload)
    except ValueError:
        pass


def test_arrow_stage_canonicalizes_and_contains(spark):
    from lopez_spark import fixtures as fx

    url = fx.url_of(fx.image_id_of(0))
    rows = [
        ("ok", bytearray(_urlset(f"<url><loc>{url}</loc><priority>0.5</priority></url>"
                                 "<url><loc>ftp://nope/x</loc></url>"))),
        ("bad", bytearray(b"\x1f\x8b\x08broken")),
        ("nullrow", None),
    ]
    df = spark.createDataFrame(rows, "sitemap_id string, bytes binary")
    got = {
        (r.sitemap_id, r.ord): r for r in sitemap_entries(df).collect()
    }
    assert got[("ok", 0)].ok and got[("ok", 0)].canonical_url == url
    assert got[("ok", 0)].priority_e3 == 500
    assert got[("ok", 1)].ok and got[("ok", 1)].canonical_url == ""
    assert got[("bad", -1)].ok is False and got[("bad", -1)].kind == "err"
    assert got[("nullrow", -1)].ok is False
