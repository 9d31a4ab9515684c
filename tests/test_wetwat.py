"""WET/WAT derivation from WARC (sources/wetwat.py) — the Common
Crawl export convention: plain-text records (WET) and per-page
metadata/out-links (WAT), derived columnar from the WARC record
stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from lopez_spark import fixtures as fx
from lopez_spark.sources.warc import build_warc
from lopez_spark.sources.wetwat import (
    warc_documents,
    wat_links_py,
    wet_text_py,
    wet_wat_stats,
    wet_wat_stats_py,
)


def test_wet_text_py_strips_and_decodes():
    html = (
        "<html><head><style>p{color:red}</style>"
        "<script>var x = '<p>';</script></head>"
        "<body><p>a &amp; b &lt;tag&gt;  c</p>\n<div>d</div></body></html>"
    )
    assert wet_text_py(html) == "a & b <tag> c d"


def test_wet_text_py_nested_entity_not_double_decoded():
    # &amp;lt; must become '&lt;' (literal), not '<'
    assert wet_text_py("<p>&amp;lt;</p>") == "&lt;"


def test_wat_links_document_order():
    html = '<a href="u1">x</a><p></p><a href="u2">y</a><a href="">z</a>'
    assert wat_links_py(html) == ["u1", "u2", ""]


def _archive(pages=5, warc_id="w0"):
    recs = []
    htmls = []
    for j in range(pages):
        iid = fx.image_id_of(j)
        html = fx.html_of(iid, 400)
        htmls.append(html)
        recs.append(
            {
                "rec_type": "response",
                "rec_id": f"urn:uuid:t-{j}",
                "target_uri": fx.url_of(iid),
                "date": "2026-08-18T00:00:00Z",
                "content_type": "text/html",
                "payload": html.encode(),
            }
        )
    recs.append(
        {
            "rec_type": "resource",
            "rec_id": "urn:uuid:t-bin",
            "target_uri": "https://h0.example.test/a.bin",
            "date": "2026-08-18T00:00:00Z",
            "content_type": "application/octet-stream",
            "payload": b"\x00\x01\x02",
        }
    )
    return build_warc(recs), htmls


def test_spark_stats_match_python_replica(spark):
    data, htmls = _archive()
    df = spark.createDataFrame(
        [("w0", bytearray(data))], "warc_id string, bytes binary"
    )
    rows = {r.rec_no: r for r in wet_wat_stats(warc_documents(df)).collect()}
    assert len(rows) == len(htmls)  # binary record filtered out
    for j, html in enumerate(htmls):
        wl, wh, nl, lh = wet_wat_stats_py(html)
        r = rows[j]
        assert (r.wet_n_chars, r.wet_hash, r.n_links, r.links_hash) == (
            wl, wh, nl, lh,
        )


def test_binary_payload_has_null_text(spark):
    data, htmls = _archive(pages=1)
    df = spark.createDataFrame(
        [("w0", bytearray(data))], "warc_id string, bytes binary"
    )
    docs = warc_documents(df).collect()
    by_no = {r.rec_no: r for r in docs}
    assert by_no[0].text is not None
    assert by_no[1].text is None and by_no[1].ok


def test_truncated_archive_contained(spark):
    data, _ = _archive(pages=2)
    df = spark.createDataFrame(
        [("bad", bytearray(data[: len(data) // 2]))],
        "warc_id string, bytes binary",
    )
    docs = warc_documents(df).collect()
    assert len(docs) == 1 and docs[0].ok is False
    assert wet_wat_stats(warc_documents(df)).count() == 0


def test_stats_plan_is_codegen_no_python_after_arrow(spark):
    data, _ = _archive(pages=1)
    df = spark.createDataFrame(
        [("w0", bytearray(data))], "warc_id string, bytes binary"
    )
    plan = (
        wet_wat_stats(warc_documents(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one Python stage (the WARC explode); derivation is JVM
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan  # zero shuffles
