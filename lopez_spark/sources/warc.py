"""WARC (ISO 28500) reader/writer — the web-crawl corpus container
(Common Crawl ships petabytes of it).

Implements the public format from scratch: records are
``WARC/1.0\\r\\n`` + named headers + CRLF CRLF + payload + CRLF CRLF;
in a ``.warc.gz`` every record is its own gzip member so a reader can
split the file at member boundaries and fan records out without
decompressing the whole archive serially (the property that makes WARC
splittable at 100 TB — each member is an independent work unit).

Spark surface: :func:`warc_records` explodes opaque archive payloads
(``binary`` column) into one row per record inside an Arrow
``mapInPandas`` stage — the same one-payload-per-row,
embarrassingly-parallel shape as the image codec stages.  The writer
(:func:`build_warc`) makes the crawler's fetched pages exportable in
the format every downstream crawl consumer already reads, and supplies
deterministic fixtures for the oracle gate.

Reference counterpart: lopez stores fetched pages in Postgres rows
(`postgres-lopez/src/sql/`); WARC export is the Spark-native corpus
interchange equivalent.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

from ..hashing import xxhash64

_CRLF = b"\r\n"


def build_warc(records: list[dict], compress: bool = True) -> bytes:
    """Serialize records → WARC bytes (gzip member per record when
    ``compress``).  Each record dict: ``rec_type`` (response/request/
    resource/metadata/...), ``target_uri``, ``date`` (ISO-8601 string),
    ``rec_id``, ``content_type``, ``payload`` (bytes)."""
    out = bytearray()
    for r in records:
        payload = r["payload"]
        # CR/LF in a header value would terminate the header early and
        # corrupt the framing of every following record in the archive
        # (a crafted target_uri could smuggle fake headers); reject here
        # so one hostile URL fails one record build, not the archive.
        for key in ("rec_type", "rec_id", "date", "target_uri", "content_type"):
            if "\r" in r[key] or "\n" in r[key]:
                raise ValueError(f"CR/LF in WARC header field {key}: {r[key]!r}")
        hdr = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + r["rec_type"].encode() + _CRLF
            + b"WARC-Record-ID: <" + r["rec_id"].encode() + b">" + _CRLF
            + b"WARC-Date: " + r["date"].encode() + _CRLF
            + b"WARC-Target-URI: " + r["target_uri"].encode() + _CRLF
            + b"Content-Type: " + r["content_type"].encode() + _CRLF
            + b"Content-Length: " + str(len(payload)).encode() + _CRLF
            + _CRLF
        )
        rec = hdr + payload + _CRLF + _CRLF
        if compress:
            # mtime=0 + fixed OS byte: byte-deterministic archives
            out += gzip.compress(rec, 6, mtime=0)
        else:
            out += rec
    return bytes(out)


def iter_warc_chunks(data: bytes) -> Iterator[bytes]:
    """Yield the raw (decompressed) bytes of each gzip member of a
    ``.warc.gz`` — or the whole buffer once for a plain archive.  This
    is the streaming unit: each member decompresses independently, so
    a consumer can parse and summarize member-by-member without ever
    materializing the full uncompressed archive (the property that
    makes multi-GB Common Crawl files tractable per executor)."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    rest = data
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise ValueError("garbage between WARC gzip members")
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(rest)
        except zlib.error as err:
            raise ValueError(f"corrupt WARC gzip member: {err}") from err
        if not d.eof:
            raise ValueError("truncated WARC gzip member")
        rest = d.unused_data
        yield chunk


def iter_warc_chunks_file(fh, block: int = 1 << 20) -> Iterator[bytes]:
    """Like :func:`iter_warc_chunks` but streamed from an open binary
    file object in ``block``-sized reads: peak memory is one
    decompressed member (one *record* for plain archives) plus one
    read block, independent of archive size — the shape for multi-GB
    .warc(.gz) files on disk or a mount."""
    buf = fh.read(block)
    if buf[:2] != b"\x1f\x8b":  # plain archive: record-by-record
        yield from _iter_plain_records_file(fh, buf, block)
        return
    while buf:
        # a member boundary can leave <2 carry bytes: top up before
        # judging the magic (1-in-`block` per member otherwise rejects
        # a valid archive)
        while len(buf) < 2:
            b = fh.read(block)
            if not b:
                raise ValueError("truncated WARC gzip member")
            buf += b
        if buf[:2] != b"\x1f\x8b":
            raise ValueError("garbage between WARC gzip members")
        d = zlib.decompressobj(wbits=31)
        try:
            parts = [d.decompress(buf)]
            while not d.eof:
                b = fh.read(block)
                if not b:
                    raise ValueError("truncated WARC gzip member")
                parts.append(d.decompress(b))
        except zlib.error as err:
            raise ValueError(f"corrupt WARC gzip member: {err}") from err
        yield b"".join(parts)
        buf = d.unused_data or fh.read(block)


_MAX_PLAIN_HEADER = 1 << 20  # a WARC header block beyond 1 MB is garbage


def _iter_plain_records_file(fh, buf: bytes, block: int) -> Iterator[bytes]:
    """Incrementally split an UNCOMPRESSED archive stream into single
    WARC records (header + Content-Length payload + CRLF CRLF), so the
    plain path honors the same one-record memory bound as the gzip
    path.  Yields one complete record's raw bytes at a time.  Payload
    bytes accumulate in a parts list (one join per record, no O(n²)
    re-copying); the header search is bounded so a large non-WARC file
    errors after ~1 MB instead of buffering it whole; a negative or
    missing Content-Length raises (a hostile negative length would
    otherwise loop forever yielding empty slices)."""
    while True:
        end_hdr = buf.find(_CRLF + _CRLF)
        while end_hdr < 0:
            if len(buf) > _MAX_PLAIN_HEADER:
                raise ValueError("WARC record header exceeds 1 MB")
            b = fh.read(block)
            if not b:
                if buf:
                    raise ValueError("WARC record header not terminated")
                return
            scan_from = max(0, len(buf) - 3)  # terminator may straddle
            buf += b
            end_hdr = buf.find(_CRLF + _CRLF, scan_from)
        head = buf[:end_hdr].decode("utf-8", "strict")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError("not a WARC record at stream position")
        clen = None
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if sep and k.strip().lower() == "content-length":
                clen = int(v.strip())
        if clen is None or clen < 0:
            raise ValueError("WARC record missing/negative Content-Length")
        need = end_hdr + 4 + clen + 4
        parts = [buf]
        have = len(buf)
        while have < need:
            b = fh.read(block)
            if not b:
                raise ValueError("WARC payload overruns archive")
            parts.append(b)
            have += len(b)
        whole = b"".join(parts)
        yield whole[:need]
        buf = whole[need:]


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (gzipped members or plain) → list of record
    dicts {rec_type, rec_id, target_uri, date, content_type, payload}.
    Malformed input raises ``ValueError`` — truncated members, bad
    headers, Content-Length overruns are all rejected, never guessed
    at.  Materializes every payload: convenient for moderate archives;
    the Arrow ingest stage (:func:`warc_records`) instead iterates
    :func:`iter_warc_chunks` and keeps only per-record summaries."""
    records = []
    for raw in iter_warc_chunks(data):
        records.extend(_parse_raw_records(raw))
    return records


def _parse_raw_records(raw: bytes) -> list[dict]:
    records = []
    pos = 0
    n = len(raw)
    while pos < n:
        end_hdr = raw.find(_CRLF + _CRLF, pos)
        if end_hdr < 0:
            raise ValueError("WARC record header not terminated")
        head = raw[pos:end_hdr].decode("utf-8", "strict")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}")
        fields = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError) as err:
            raise ValueError("WARC record missing Content-Length") from err
        if clen < 0:
            # a negative length would step `pos` BACKWARDS and loop
            raise ValueError("WARC record has negative Content-Length")
        body_start = end_hdr + 4
        if body_start + clen + 4 > n:
            raise ValueError("WARC payload overruns archive")
        payload = raw[body_start : body_start + clen]
        if raw[body_start + clen : body_start + clen + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record not terminated by CRLF CRLF")
        records.append(
            {
                "rec_type": fields.get("warc-type", ""),
                "rec_id": fields.get("warc-record-id", "").strip("<>"),
                "target_uri": fields.get("warc-target-uri", ""),
                "date": fields.get("warc-date", ""),
                "content_type": fields.get("content-type", ""),
                "payload": payload,
            }
        )
        pos = body_start + clen + 4
    return records


WARC_RECORD_SCHEMA = (
    "warc_id string, rec_no int, ok boolean, rec_type string, "
    "target_uri string, content_type string, payload_len int, "
    "payload_hash long"
)


def warc_records(archives):
    """Arrow stage: (warc_id, bytes) → one row per WARC record with the
    payload summarized as (length, xxhash64) — the ingest fan-out of a
    crawl-corpus pipeline.  Gzip members are decompressed, parsed and
    dropped ONE AT A TIME (``iter_warc_chunks``): peak memory is one
    member's records, never the whole uncompressed archive.  Malformed
    or NULL archives yield a single ok=False row, never a task crash.
    At 100 TB each gzip member is an independent unit: partition the
    archive table freely."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "warc_id", "rec_no", "ok", "rec_type", "target_uri",
            "content_type", "payload_len", "payload_hash",
        ]
        for pdf in batches:
            out = {k: [] for k in cols}

            def emit(wid, rec_no, ok, rt=None, uri=None, ct=None,
                     plen=None, ph=None):
                for k, v in zip(cols, (wid, rec_no, ok, rt, uri, ct, plen, ph)):
                    out[k].append(v)

            for warc_id, data in zip(pdf["warc_id"], pdf["bytes"]):
                # summaries buffer per archive: payloads are dropped
                # member-by-member, and a parse failure anywhere voids
                # the whole archive (one ok=False row — an archive is
                # either fully ingested or rejected, never half)
                summaries: list[tuple] = []
                try:
                    for raw in iter_warc_chunks(bytes(data)):
                        for r in _parse_raw_records(raw):
                            summaries.append(
                                (
                                    r["rec_type"], r["target_uri"],
                                    r["content_type"], len(r["payload"]),
                                    xxhash64(r["payload"]),
                                )
                            )
                except (ValueError, UnicodeDecodeError, TypeError):
                    # TypeError: NULL bytes column (bytes(None))
                    emit(warc_id, -1, False)
                    continue
                for i, (rt, uri, ct, plen, ph) in enumerate(summaries):
                    emit(warc_id, i, True, rt, uri, ct, plen, ph)
            yield pd.DataFrame(out)

    return archives.select("warc_id", "bytes").mapInPandas(
        run, WARC_RECORD_SCHEMA
    )


def warc_records_from_paths(paths):
    """Same per-record summary as :func:`warc_records`, but STREAMED
    from archive *paths* (column ``path``; warc_id = path) — each task
    opens its archives and walks gzip members through
    :func:`iter_warc_chunks_file`, so peak memory is one decompressed
    member plus a read block, independent of archive size.  This is
    the production ingest shape for multi-GB Common Crawl files; the
    binary-column variant stays as the small-payload / gate
    instrument.  Unreadable or malformed archives yield one ok=False
    row, never a task crash."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "warc_id", "rec_no", "ok", "rec_type", "target_uri",
            "content_type", "payload_len", "payload_hash",
        ]
        for pdf in batches:
            for path in pdf["path"]:
                out = {k: [] for k in cols}

                def emit(rec_no, ok, rt=None, uri=None, ct=None,
                         plen=None, ph=None):
                    for k, v in zip(
                        cols, (path, rec_no, ok, rt, uri, ct, plen, ph)
                    ):
                        out[k].append(v)

                summaries: list[tuple] = []
                try:
                    with open(path, "rb") as fh:
                        for raw in iter_warc_chunks_file(fh):
                            for r in _parse_raw_records(raw):
                                summaries.append(
                                    (
                                        r["rec_type"], r["target_uri"],
                                        r["content_type"],
                                        len(r["payload"]),
                                        xxhash64(r["payload"]),
                                    )
                                )
                except (ValueError, UnicodeDecodeError, OSError, TypeError):
                    # TypeError: NULL path column (open(None)).  `out` is
                    # still empty here — rows emit only after the full
                    # parse succeeds (archives ingest whole or not at all)
                    emit(-1, False)
                    yield pd.DataFrame(out)
                    continue
                for i, (rt, uri, ct, plen, ph) in enumerate(summaries):
                    emit(i, True, rt, uri, ct, plen, ph)
                yield pd.DataFrame(out)

    return paths.select("path").mapInPandas(run, WARC_RECORD_SCHEMA)
