"""WET/WAT derivation from WARC archives — the Common Crawl
convention: alongside each crawl's raw WARC, publish WET (extracted
plain text, one record per page) and WAT (per-page metadata: URI,
lengths, out-links).

The split mirrors Common Crawl's pipeline: the Arrow stage
(:func:`warc_documents`) only EXPLODES archives into per-record rows
with the payload decoded to text — everything derived from the text
(tag stripping, entity decoding, whitespace normalization, link
extraction) is columnar JVM expressions (:func:`wet_text_col`,
:func:`wat_links_col`), so at 100 TB the conversion is whole-stage
codegen over the record stream with zero extra shuffles and the WET /
WAT sinks are partition-aligned with the WARC source.

Reference counterpart: none (lopez stores parsed analyses in Postgres,
``postgres-lopez/src/worker.rs``); WET/WAT is the public corpus-export
convention this engine's WARC sink feeds into.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..hashing import xxhash64
from .warc import _parse_raw_records, iter_warc_chunks

WARC_DOCUMENT_SCHEMA = (
    "warc_id string, rec_no int, ok boolean, rec_type string, "
    "target_uri string, content_type string, text string"
)

# text/* payloads larger than this are rejected per-archive (the same
# bomb guard the decoders apply before allocating)
MAX_TEXT_BYTES = 1 << 24


def warc_documents(archives: DataFrame) -> DataFrame:
    """Arrow stage: (warc_id, bytes) → one row per WARC record with
    ``text/*`` payloads decoded to a string column (UTF-8, lossy
    replace — WET is a lossy text view by definition); non-text
    payloads yield text=NULL.  Same containment contract as
    ``warc_records``: a malformed archive is one ok=False row, never a
    task crash, and gzip members are processed one at a time."""
    import pandas as pd

    cols = [
        "warc_id", "rec_no", "ok", "rec_type", "target_uri",
        "content_type", "text",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols}

            def emit(wid, rec_no, ok, rt=None, uri=None, ct=None, tx=None):
                for k, v in zip(cols, (wid, rec_no, ok, rt, uri, ct, tx)):
                    out[k].append(v)

            for warc_id, data in zip(pdf["warc_id"], pdf["bytes"]):
                rows: list[tuple] = []
                try:
                    for raw in iter_warc_chunks(bytes(data)):
                        for r in _parse_raw_records(raw):
                            text = None
                            if r["content_type"].startswith("text/"):
                                if len(r["payload"]) > MAX_TEXT_BYTES:
                                    raise ValueError("text payload too large")
                                text = r["payload"].decode("utf-8", "replace")
                            rows.append(
                                (
                                    r["rec_type"], r["target_uri"],
                                    r["content_type"], text,
                                )
                            )
                except (ValueError, UnicodeDecodeError, TypeError, MemoryError):
                    emit(warc_id, -1, False)
                    continue
                for i, (rt, uri, ct, tx) in enumerate(rows):
                    emit(warc_id, i, True, rt, uri, ct, tx)
            yield pd.DataFrame(out)

    return archives.select("warc_id", "bytes").mapInPandas(
        run, WARC_DOCUMENT_SCHEMA
    )


_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so &amp;lt; does not double-decode
]


def wet_text_col(html: Column) -> Column:
    """Plain-text extraction as JVM expressions (the WET payload):
    drop <script>/<style> subtrees, strip tags, decode the common
    entities, collapse whitespace.  Mirrors what Common Crawl's WET
    extractor produces for simple documents; a DOM-aware extractor can
    replace this column without touching the pipeline shape."""
    t = F.regexp_replace(html, r"(?is)<(script|style)\b.*?</\1>", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def wat_links_col(html: Column) -> Column:
    """Out-link list (the WAT `Links` field) in document order:
    href attribute values, raw (canonicalization is the frontier's
    job, ``urlnorm.py``)."""
    return F.regexp_extract_all(html, F.lit('href="([^"]*)"'), 1)


def wet_text_py(html: str) -> str:
    """Pure-Python replica of :func:`wet_text_col` for oracles/tests
    (same regexes; fixture corpora are ASCII so Java-vs-Python \\s
    semantics agree)."""
    import re

    t = re.sub(r"(?is)<(script|style)\b.*?</\1>", " ", html)
    t = re.sub(r"<[^>]*>", " ", t)
    for ent, ch in _ENTITIES:
        t = t.replace(ent, ch)
    return re.sub(r"\s+", " ", t).strip()


def wat_links_py(html: str) -> list[str]:
    import re

    return re.findall(r'href="([^"]*)"', html)


def wet_wat_stats(docs: DataFrame) -> DataFrame:
    """Per-page WET/WAT summary over html response records: text
    length + hash (WET side), link count + hash of the ordered link
    list (WAT side).  All columnar; the hashes make the whole derived
    text and every link byte-checkable."""
    pages = docs.filter(
        F.col("ok")
        & (F.col("rec_type") == "response")
        & (F.col("content_type") == "text/html")
    )
    wet = wet_text_col(F.col("text"))
    links = wat_links_col(F.col("text"))
    return pages.select(
        "warc_id",
        "rec_no",
        "target_uri",
        F.length(wet).alias("wet_n_chars"),
        F.xxhash64(wet).alias("wet_hash"),
        F.size(links).alias("n_links"),
        F.xxhash64(F.concat_ws("\n", links)).alias("links_hash"),
    )


def wet_wat_stats_py(html: str) -> tuple[int, int, int, int]:
    """Oracle-side replica of one page's :func:`wet_wat_stats` row."""
    wet = wet_text_py(html)
    links = wat_links_py(html)
    return (
        len(wet),
        xxhash64(wet.encode("utf-8")),
        len(links),
        xxhash64("\n".join(links).encode("utf-8")),
    )
