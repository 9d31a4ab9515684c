"""Sitemap ingestion — the sitemaps.org protocol (XML urlset, sitemap
index, gzipped variants, plain-text URL lists) as a splittable Spark
source, completing the crawl discovery chain the engine already has
both ends of: robots.txt carries ``Sitemap:`` lines (the reference's
own robots fixture does — lib-lopez/src/crawler/robots.rs:116 — but
the reference never fetches them), and parsed entries feed the wave
seeder through the same `urlnorm.canonicalize` gate as extracted
links.

Hostile-input posture (same contract as the WARC/WDS sources): the
protocol's own caps are enforced BEFORE allocation — 50 MB
uncompressed (gunzip is bounded via ``decompressobj(31)``), 50,000
entries per file; DTDs are rejected outright (sitemaps never need
them; entity expansion is the classic XML bomb); expat parse errors
surface as ValueError so the Arrow stage's per-row containment tuple
maps any malformed payload to one ok=False row, never a task crash.

Scale shape: one sitemap file per row, one Arrow pass, no shuffle —
a 10^6-sitemap discovery sweep is embarrassingly parallel, and the
canonicalized output joins the frontier exactly like extracted links.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..urlnorm import canonicalize

MAX_BYTES = 50 << 20  # protocol cap: 50 MB uncompressed
MAX_URLS = 50_000  # protocol cap: 50,000 entries per file


def _gunzip_bounded(data: bytes, cap: int = MAX_BYTES) -> bytes:
    """gzip-inflate refusing to produce more than ``cap`` bytes; a
    stream that is truncated, corrupt, or inflates past the protocol
    cap is ValueError (contained per-row)."""
    d = zlib.decompressobj(31)
    try:
        out = d.decompress(data, cap + 1)
        if len(out) > cap:
            raise ValueError(f"sitemap gzip inflates past {cap} bytes")
        out += d.flush()
    except zlib.error as err:
        raise ValueError(f"sitemap gzip error: {err}") from err
    if not d.eof:
        raise ValueError("sitemap gzip truncated")
    return out


def _tag(el) -> str:
    return el.tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(data: bytes) -> tuple[str, list[dict]]:
    """One sitemap payload -> (kind, entries); kind is 'urlset',
    'index' (a sitemap index whose entries are child sitemap locs) or
    'txt' (the protocol's plain-text one-URL-per-line alternate).
    Each entry: {loc, lastmod (str|None), priority (float|None)}.
    Malformed payloads raise ValueError."""
    if data is None:
        raise ValueError("NULL payload")
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_bounded(data)
    if len(data) > MAX_BYTES:
        raise ValueError(f"sitemap exceeds {MAX_BYTES} bytes")
    head = data[:4096].lower()
    if b"<!doctype" in head or b"<!entity" in head:
        raise ValueError("DTD in sitemap rejected")
    stripped = data.lstrip()
    if stripped.startswith(b"<"):
        try:
            root = ET.fromstring(data)
        except ET.ParseError as err:
            raise ValueError(f"sitemap XML parse error: {err}") from err
        kind = _tag(root)
        if kind == "sitemapindex":
            entries = []
            for el in root:
                if _tag(el) != "sitemap":
                    continue
                loc = next((c.text for c in el if _tag(c) == "loc"), None)
                if not loc or not loc.strip():
                    raise ValueError("sitemap index entry without <loc>")
                lastmod = next(
                    (c.text for c in el if _tag(c) == "lastmod"), None
                )
                entries.append(
                    {"loc": loc.strip(), "lastmod": lastmod, "priority": None}
                )
                if len(entries) > MAX_URLS:
                    raise ValueError(f"sitemap index exceeds {MAX_URLS} entries")
            return "index", entries
        if kind == "urlset":
            entries = []
            for el in root:
                if _tag(el) != "url":
                    continue
                loc = next((c.text for c in el if _tag(c) == "loc"), None)
                if not loc or not loc.strip():
                    raise ValueError("urlset entry without <loc>")
                lastmod = next(
                    (c.text for c in el if _tag(c) == "lastmod"), None
                )
                prio_txt = next(
                    (c.text for c in el if _tag(c) == "priority"), None
                )
                prio = None
                if prio_txt is not None:
                    try:
                        prio = float(prio_txt)
                    except ValueError:
                        prio = None  # protocol says ignore invalid values
                entries.append(
                    {"loc": loc.strip(), "lastmod": lastmod, "priority": prio}
                )
                if len(entries) > MAX_URLS:
                    raise ValueError(f"urlset exceeds {MAX_URLS} entries")
            return "urlset", entries
        raise ValueError(f"unknown sitemap root <{kind}>")
    text = data.decode("utf-8")  # UnicodeDecodeError ⊂ ValueError
    urls = [ln.strip() for ln in text.splitlines() if ln.strip()]
    if not urls:
        raise ValueError("empty sitemap")
    if len(urls) > MAX_URLS:
        raise ValueError(f"text sitemap exceeds {MAX_URLS} entries")
    return "txt", [{"loc": u, "lastmod": None, "priority": None} for u in urls]


_SITEMAP_LINE = re.compile(r"(?im)^\s*sitemap\s*:\s*(\S+)\s*$")


def extract_sitemap_urls(robots_txt: str) -> list[str]:
    """The ``Sitemap:`` lines of a robots.txt (case-insensitive key,
    absolute URL value, valid OUTSIDE any user-agent group per the
    protocol) — the discovery entry point.  Order preserved,
    duplicates dropped."""
    seen: set[str] = set()
    out: list[str] = []
    for m in _SITEMAP_LINE.finditer(robots_txt or ""):
        u = m.group(1)
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


SITEMAP_ENTRY_SCHEMA = StructType(
    [
        StructField("sitemap_id", StringType()),
        StructField("kind", StringType()),
        StructField("ord", IntegerType()),
        StructField("loc", StringType()),
        StructField("canonical_url", StringType()),
        StructField("lastmod", StringType()),
        StructField("priority_e3", LongType()),
        StructField("ok", BooleanType()),
    ]
)


def sitemap_entries(sitemaps: DataFrame) -> DataFrame:
    """(sitemap_id, bytes) -> one row per entry with the frontier-ready
    canonical URL (urlnorm.canonicalize; NULL for rejected/non-http
    locs — the same gate extracted links pass) and priority quantized
    at e3.  Malformed payloads yield ONE ok=False row per sitemap."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in SITEMAP_ENTRY_SCHEMA.fieldNames()}

            def emit(sid, kind, ord_, loc, canon, lastmod, prio_e3, ok):
                out["sitemap_id"].append(sid)
                out["kind"].append(kind)
                out["ord"].append(ord_)
                out["loc"].append(loc)
                out["canonical_url"].append(canon)
                out["lastmod"].append(lastmod)
                out["priority_e3"].append(prio_e3)
                out["ok"].append(ok)

            for sid, data in zip(pdf["sitemap_id"], pdf["bytes"]):
                try:
                    kind, entries = parse_sitemap(
                        bytes(data) if data is not None else None
                    )
                except (ValueError, zlib.error, MemoryError, IndexError, KeyError):
                    emit(sid, "err", -1, "", "", "", -1, False)
                    continue
                for i, e in enumerate(entries):
                    prio = e["priority"]
                    # '' sentinels (not NULL): a rejected loc has no
                    # canonical form, a missing lastmod stays empty
                    emit(
                        sid,
                        kind,
                        i,
                        e["loc"],
                        canonicalize(e["loc"]) or "",
                        e["lastmod"] or "",
                        int(math.floor(prio * 1000)) if prio is not None else -1,
                        True,
                    )
            pdf_out = pd.DataFrame(out)
            pdf_out["ord"] = pdf_out["ord"].astype("int32")
            pdf_out["priority_e3"] = pd.array(
                out["priority_e3"], dtype="Int64"
            )
            yield pdf_out

    return sitemaps.select("sitemap_id", "bytes").mapInPandas(
        run, SITEMAP_ENTRY_SCHEMA
    )
