"""WARC source: round-trip, gzip-member splitting, malformed handling,
and the Arrow ingest stage."""

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.sources.warc import build_warc, parse_warc, warc_records


def _recs(n=3):
    return [
        {
            "rec_type": "response",
            "rec_id": f"urn:uuid:test-{j}",
            "target_uri": fx.url_of(fx.image_id_of(j)),
            "date": "2026-08-17T00:00:00Z",
            "content_type": "text/html",
            "payload": fx.html_of(fx.image_id_of(j), 100).encode(),
        }
        for j in range(n)
    ]


def test_warc_roundtrip_gz_and_plain():
    recs = _recs()
    for compress in (True, False):
        data = build_warc(recs, compress=compress)
        got = parse_warc(data)
        assert len(got) == len(recs)
        for a, b in zip(recs, got):
            for k in ("rec_type", "rec_id", "target_uri", "date",
                      "content_type", "payload"):
                assert a[k] == b[k], k


def test_warc_deterministic_bytes():
    assert build_warc(_recs()) == build_warc(_recs())


def test_warc_malformed_raises():
    data = build_warc(_recs())
    with pytest.raises(ValueError):
        parse_warc(data[: len(data) // 2])  # truncated member
    with pytest.raises(ValueError):
        parse_warc(b"\x1f\x8bgarbage")
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n")  # not WARC
    # payload overrun: lie about Content-Length
    plain = build_warc(_recs(1), compress=False)
    bad = plain.replace(b"Content-Length: ", b"Content-Length: 9", 1)
    with pytest.raises(ValueError):
        parse_warc(bad)


def test_warc_records_stage(spark):
    from lopez_spark.hashing import xxhash64

    good = build_warc(_recs(2))
    df = spark.createDataFrame(
        [
            ("w0", bytearray(good)),
            ("w1", bytearray(b"\x1f\x8bnope")),
            ("w2", None),  # NULL archive: contained, not a task crash
        ],
        "warc_id string, bytes binary",
    )
    rows = sorted(
        warc_records(df).collect(), key=lambda r: (r["warc_id"], r["rec_no"])
    )
    assert [r["warc_id"] for r in rows] == ["w0", "w0", "w1", "w2"]
    assert rows[0]["ok"] and rows[1]["ok"]
    assert not rows[2]["ok"] and not rows[3]["ok"]
    assert rows[0]["payload_hash"] == xxhash64(_recs(1)[0]["payload"])
    assert rows[2]["rec_no"] == -1 and rows[3]["rec_no"] == -1
    # half-good archive (first member intact, second truncated) is
    # all-or-nothing: one ok=False row, no partial records
    half = good[: len(good) - 7]
    df2 = spark.createDataFrame(
        [("h0", bytearray(half))], "warc_id string, bytes binary"
    )
    hrows = warc_records(df2).collect()
    assert len(hrows) == 1 and not hrows[0]["ok"]


def test_crawl_warc_content_sink(spark, tmp_path):
    """End-to-end: a crawl with ``warc_dir`` set exports every fetched
    2xx page as a WARC response record whose payload is exactly the
    page body, one .warc.gz per fetch task."""
    import glob

    from lopez_spark.catalog import WaveStore
    from lopez_spark.crawler.config import Boundaries, CrawlConfig
    from lopez_spark.crawler.wave import CrawlEngine
    from lopez_spark.crawler.web import SyntheticWeb

    n = 60
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(6)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=40,
        max_depth=4,
        batch_size=16,
        partitions=2,
        warc_dir=str(tmp_path / "warc"),
    )
    store = WaveStore(str(tmp_path / "store"), "warc-sink")
    engine = CrawlEngine(spark, cfg, SyntheticWeb(n, with_body=True), store)
    engine.crawl()
    frontier = store.load_frontier(spark, store.latest_wave())
    closed_2xx = {
        r["url"]
        for r in frontier.collect()
        if r["status"] == "closed"
        and r["http_status"] is not None
        and 200 <= r["http_status"] < 300
    }
    assert closed_2xx, "crawl fetched no 2xx pages"
    recs = {}
    rec_ids = set()
    for path in glob.glob(str(tmp_path / "warc" / "*.warc.gz")):
        for r in parse_warc(open(path, "rb").read()):
            assert r["rec_type"] == "response"
            assert r["content_type"] == "application/http;msgtype=response"
            rec_ids.add(r["rec_id"])
            recs[r["target_uri"]] = r["payload"]
    assert set(recs) == closed_2xx
    assert len(rec_ids) == len(recs)  # per-record unique ids
    for url, payload in recs.items():
        # payload is a full HTTP message (ISO 28500 response record)
        head, _, body = payload.partition(b"\r\n\r\n")
        assert head.startswith(b"HTTP/1.1 2")
        assert f"Content-Length: {len(body)}".encode() in head
        iid = fx.image_id_from_url(url)
        assert body == fx.html_of(iid, n).encode()
    assert not glob.glob(str(tmp_path / "warc" / "*.tmp"))


def test_iter_warc_chunks_file_small_blocks(tmp_path):
    """Members spanning many read blocks reassemble exactly (block=7
    forces every member across dozens of reads); truncation raises."""
    import io

    from lopez_spark.sources.warc import iter_warc_chunks, iter_warc_chunks_file

    data = build_warc(_recs(4))
    want = list(iter_warc_chunks(data))
    got = list(iter_warc_chunks_file(io.BytesIO(data), block=7))
    assert got == want
    with pytest.raises(ValueError):
        list(iter_warc_chunks_file(io.BytesIO(data[: len(data) - 9]), block=7))
    # plain (uncompressed) archive streams record-by-record
    plain = build_warc(_recs(2), compress=False)
    chunks = list(iter_warc_chunks_file(io.BytesIO(plain), block=7))
    assert len(chunks) == 2 and b"".join(chunks) == plain


def test_warc_records_from_paths_matches_bytes(spark, tmp_path):
    from lopez_spark.sources.warc import warc_records_from_paths

    paths = []
    for a in range(2):
        p = tmp_path / f"a{a}.warc.gz"
        p.write_bytes(build_warc(_recs(3 + a)))
        paths.append(str(p))
    garbage = tmp_path / "bad.warc.gz"
    garbage.write_bytes(b"\x1f\x8b broken" * 20)
    all_paths = paths + [str(garbage), str(tmp_path / "missing.warc.gz")]
    got = warc_records_from_paths(
        spark.createDataFrame([(p,) for p in all_paths], "path string")
    ).collect()
    bad = [r for r in got if not r["ok"]]
    assert len(bad) == 2 and all(r["rec_no"] == -1 for r in bad)
    via_bytes = warc_records(
        spark.createDataFrame(
            [(p, bytearray(open(p, "rb").read())) for p in paths],
            "warc_id string, bytes binary",
        )
    ).collect()
    keyf = lambda d: (d["warc_id"], d["rec_no"])  # noqa: E731
    assert sorted((r.asDict() for r in got if r["ok"]), key=keyf) == sorted(
        (r.asDict() for r in via_bytes), key=keyf
    )


def test_iter_warc_chunks_file_one_byte_carry(tmp_path):
    """A gzip member boundary that leaves <2 bytes of the next member's
    magic in the carry buffer must top up, not reject (regression:
    1-in-block per member rejected valid archives)."""
    import io

    from lopez_spark.sources.warc import iter_warc_chunks, iter_warc_chunks_file

    data = build_warc(_recs(3))
    want = list(iter_warc_chunks(data))
    # find the first member's compressed end: walk with a decompressobj
    import zlib

    d = zlib.decompressobj(wbits=31)
    d.decompress(data)
    first_end = len(data) - len(d.unused_data)
    for carry in (1, 2):  # first read leaves `carry` bytes of member 2
        got = list(
            iter_warc_chunks_file(io.BytesIO(data), block=first_end + carry)
        )
        assert got == want, carry


def test_plain_archive_streams_record_by_record(tmp_path):
    """Uncompressed archives no longer buffer whole-file: the stream
    yields one record per chunk, and reassembly equals the file."""
    import io

    from lopez_spark.sources.warc import _parse_raw_records, iter_warc_chunks_file

    plain = build_warc(_recs(3), compress=False)
    chunks = list(iter_warc_chunks_file(io.BytesIO(plain), block=64))
    assert len(chunks) == 3 and b"".join(chunks) == plain
    assert [r["rec_id"] for c in chunks for r in _parse_raw_records(c)] == [
        r["rec_id"] for r in _recs(3)
    ]


def test_warc_paths_null_path_contained(spark):
    from lopez_spark.sources.warc import warc_records_from_paths

    got = warc_records_from_paths(
        spark.createDataFrame([(None,)], "path string")
    ).collect()
    assert len(got) == 1 and not got[0]["ok"] and got[0]["rec_no"] == -1


def test_hostile_plain_archives_rejected_not_hung():
    """Negative Content-Length and unbounded headers must raise, not
    hang the task or buffer the file whole."""
    import io

    from lopez_spark.sources.warc import iter_warc_chunks_file, parse_warc

    evil = b"WARC/1.0\r\nContent-Length: -1000000\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_chunks_file(io.BytesIO(evil), block=64))
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(evil)
    # >1MB with no header terminator: errors after the cap, not at EOF
    blob = io.BytesIO(b"A" * (3 << 20))
    with pytest.raises(ValueError, match="1 MB"):
        list(iter_warc_chunks_file(blob, block=1 << 20))
    assert blob.tell() <= (2 << 20) + (1 << 20)  # stopped near the cap


def test_crlf_in_header_value_rejected():
    """A CR/LF in any header value would terminate the header early and
    corrupt the framing of every following record (round-4 ADVICE)."""
    for field, value in [
        ("target_uri", "https://h0.example.test/\r\nWARC-Type: smuggled"),
        ("rec_id", "urn:uuid:x\n"),
        ("content_type", "text/html\r"),
    ]:
        recs = _recs(1)
        recs[0][field] = value
        with pytest.raises(ValueError, match="CR/LF"):
            build_warc(recs)


def test_engine_warc_real_status_line_and_mime(spark, tmp_path):
    """The crawl WARC sink archives the actual status reason phrase and
    the provider's content type, not hardcoded 'OK'/'text/html'."""
    import glob

    from lopez_spark.catalog import WaveStore
    from lopez_spark.crawler.config import Boundaries, CrawlConfig
    from lopez_spark.crawler.wave import CrawlEngine
    from lopez_spark.crawler.web import SyntheticWeb

    warc_dir = str(tmp_path / "warc")
    cfg = CrawlConfig(
        seeds=tuple(fx.seeds(12)),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        quota=30,
        max_depth=2,
        batch_size=16,
        partitions=2,
        warc_dir=warc_dir,
    )
    store = WaveStore(str(tmp_path / "store"), "warc-mime")
    CrawlEngine(spark, cfg, SyntheticWeb(12, with_body=True), store).crawl()
    payloads = []
    for p in sorted(glob.glob(f"{warc_dir}/*.warc.gz")):
        payloads += [r["payload"] for r in parse_warc(open(p, "rb").read())]
    assert payloads
    for body in payloads:
        head = body.split(b"\r\n\r\n", 1)[0]
        # the synthetic web serves 200 HTML pages: real reason phrase
        assert head.startswith(b"HTTP/1.1 200 OK")
        assert b"Content-Type: text/html" in head
