"""WebDataset shards — the de-facto image-training corpus layout
(POSIX tar of sample-grouped files, consumed sequentially by training
loaders; https://github.com/webdataset/webdataset — the LAION-scale
convention).

A shard is a plain ustar tar: every sample is a basename group
(``000000017.jpg`` + ``000000017.txt`` + ``000000017.json`` …), files
of one sample adjacent.  The format is public and trivial (tar), the
engineering content is the Spark shape:

  * **Export** (:func:`write_shards`): one tar per task partition —
    repartition the corpus to the target shard size and every executor
    streams its partition straight into a shard; no shuffle beyond the
    one explicit repartition, deterministic bytes (zeroed mtime/uid —
    byte-identical re-runs), tmp-then-rename publication.
  * **Ingest** (:func:`wds_samples`): Arrow stage exploding opaque
    shard payloads into one row per sample with per-extension lengths
    and hashes, malformed shards contained per-row.

Tar member headers are written by the stdlib ``tarfile`` against an
in-memory buffer; nothing here depends on local-filesystem semantics
beyond the directory the caller points at (a shared mount on
multi-node clusters, same contract as the WARC sink).
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

from ..hashing import xxhash64


def build_shard(samples: list[dict]) -> bytes:
    """Serialize samples → deterministic uncompressed tar bytes.  Each
    sample dict: ``key`` (basename) plus ``files`` mapping extension →
    bytes (e.g. {"jpg": ..., "txt": ...}); files of one sample are
    written adjacently in sorted-extension order (the WebDataset
    grouping contract)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for s in samples:
            for ext in sorted(s["files"]):
                data = s["files"][ext]
                info = tarfile.TarInfo(name=f"{s['key']}.{ext}")
                info.size = len(data)
                info.mtime = 0  # deterministic bytes
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def parse_shard(data: bytes) -> list[dict]:
    """Parse tar bytes → list of {key, files: {ext: bytes}} in shard
    order.  A sample's files must be adjacent (the WebDataset layout
    contract ``build_shard`` writes); a key reappearing after another
    key intervened raises ValueError so this whole-shard path and the
    streamed :func:`iter_shard_samples` agree on every shard — they
    previously disagreed (merge vs split) on adjacency violations."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
        members = tf.getmembers()
    except (tarfile.TarError, EOFError) as err:
        raise ValueError(f"malformed WebDataset shard: {err}") from err
    order: list[str] = []
    samples: dict[str, dict] = {}
    last_key: str | None = None
    for m in members:
        if not m.isfile():
            continue
        key, dot, ext = m.name.rpartition(".")
        if not dot or not key:
            raise ValueError(f"shard member {m.name!r} has no extension")
        fh = tf.extractfile(m)
        if fh is None:  # pragma: no cover - isfile() guards this
            continue
        if key in samples and key != last_key:
            raise ValueError(
                f"shard violates WebDataset adjacency: key {key!r} "
                "reappears after its sample was flushed"
            )
        if key not in samples:
            samples[key] = {"key": key, "files": {}}
            order.append(key)
        samples[key]["files"][ext] = fh.read()
        last_key = key
    return [samples[k] for k in order]


def iter_shard_samples(fileobj) -> Iterator[dict]:
    """STREAM a shard from an open binary file object: yields
    {key, files} sample dicts one at a time with bounded memory (one
    sample, not one shard — the shape that holds at 1 GB+ shards).
    Relies on the WebDataset adjacency contract: a sample's files are
    adjacent in the tar, so a basename change flushes the previous
    sample (``build_shard`` writes that layout).  A shard that violates
    adjacency (a key reappearing after its sample was flushed) raises
    ValueError — the whole-shard :func:`parse_shard` would silently
    merge such members, and two ingest surfaces disagreeing on sample
    count/content_hash is worse than rejecting the malformed shard
    (per-row containment maps the raise to ok=False)."""
    try:
        with tarfile.open(fileobj=fileobj, mode="r|") as tf:
            cur: dict | None = None
            flushed: set[str] = set()
            for m in tf:
                if not m.isfile():
                    continue
                key, dot, ext = m.name.rpartition(".")
                if not dot or not key:
                    raise ValueError(f"shard member {m.name!r} has no extension")
                fh = tf.extractfile(m)
                if fh is None:  # pragma: no cover - isfile() guards this
                    continue
                if cur is not None and cur["key"] != key:
                    yield cur
                    flushed.add(cur["key"])
                    cur = None
                if key in flushed:
                    raise ValueError(
                        f"shard violates WebDataset adjacency: key {key!r} "
                        "reappears after its sample was flushed"
                    )
                if cur is None:
                    cur = {"key": key, "files": {}}
                cur["files"][ext] = fh.read()
            if cur is not None:
                yield cur
    except (tarfile.TarError, EOFError) as err:
        raise ValueError(f"malformed WebDataset shard: {err}") from err


def write_shards(df, out_dir: str, prefix: str = "shard") -> None:
    """Export a corpus DataFrame with columns (key string, ext string,
    bytes binary) as WebDataset tar shards, ONE PER PARTITION —
    repartition upstream to choose the shard size (the standard 10k-
    samples/1GB convention).  Rows are sorted within the partition by
    (key, ext) so the tar streams member-by-member straight to disk:
    peak memory is one file's payload, never the whole shard.
    Attempt-unique tmp + atomic rename (same publication contract as
    the WARC sink; point ``out_dir`` at a shared mount on multi-node
    clusters).  NULL payloads are skipped (a NULL has no byte
    representation in a tar)."""

    def write_partition(rows):
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        path = os.path.join(out_dir, f"{prefix}-{pid:06d}.tar")
        tmp = f"{path}.{attempt}.tmp"
        tf = None
        prev = None
        try:
            for row in rows:
                if row.bytes is None:
                    continue
                if (row.key, row.ext) == prev:
                    # duplicate (key, ext) rows (routine in crawl data)
                    # must not emit same-named tar members — external
                    # WebDataset loaders reject those; first one wins
                    continue
                prev = (row.key, row.ext)
                if tf is None:  # defer creation: empty partition -> no file
                    os.makedirs(out_dir, exist_ok=True)
                    tf = tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT)
                data = bytes(row.bytes)
                info = tarfile.TarInfo(name=f"{row.key}.{row.ext}")
                info.size = len(data)
                info.mtime = 0  # deterministic bytes
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
        finally:
            if tf is not None:
                tf.close()
        if tf is not None:
            os.replace(tmp, path)

    df.select("key", "ext", "bytes").sortWithinPartitions(
        "key", "ext"
    ).foreachPartition(write_partition)


def export_corpus(
    df,
    out_dir: str,
    target_shard_bytes: int = 1 << 30,
    prefix: str = "shard",
) -> int:
    """Export the image+caption corpus table (BASELINE input_hint
    schema: image_id/bytes/fmt/caption…) as WebDataset shards — each
    sample is ``<image_id>.<fmt>`` (the image payload) plus
    ``<image_id>.txt`` (the caption).  Returns the shard count.

    Scale shape: ONE aggregate job sizes the shard count from the
    corpus's actual byte volume (the ~1 GB/shard convention; tar
    overhead estimated at 512-byte header + ≤511 padding per file),
    then ONE hash repartition on image_id both co-locates each
    sample's files and spreads samples evenly regardless of corpus
    ordering — no payload ever reaches the driver.  Rows with NULL
    image bytes are dropped (nothing to train on); a NULL caption
    exports as an empty .txt."""
    from pyspark.sql import functions as F

    df = df.filter(F.col("bytes").isNotNull())
    est = df.select(
        (
            F.coalesce(F.length("bytes"), F.lit(0))
            + F.coalesce(F.octet_length("caption"), F.lit(0))
            + F.lit(2 * 1024)  # 2 files/sample tar header+padding bound
        ).alias("sz")
    ).agg(F.sum("sz").alias("total")).collect()[0]["total"] or 0
    n_shards = max(1, -(-int(est) // int(target_shard_bytes)))
    pairs = df.select(
        F.col("image_id").alias("key"),
        F.explode(
            F.array(
                F.struct(
                    F.col("fmt").alias("ext"), F.col("bytes").alias("bytes")
                ),
                F.struct(
                    F.lit("txt").alias("ext"),
                    F.encode(
                        F.coalesce("caption", F.lit("")), "UTF-8"
                    ).alias("bytes"),
                ),
            )
        ).alias("f"),
    ).select("key", "f.ext", "f.bytes")
    write_shards(pairs.repartition(n_shards, "key"), out_dir, prefix=prefix)
    return n_shards


WDS_SAMPLE_SCHEMA = (
    "shard_id string, sample_no int, ok boolean, key string, "
    "n_files int, exts string, bytes_total long, content_hash long"
)


def wds_samples(shards, with_arrival_ts: bool = False):
    """Arrow stage: (shard_id, bytes) → one row per WebDataset sample
    with the file group summarized (extension list, total bytes, a
    hash over the sorted (ext, payload) stream).  Malformed or NULL
    shards yield one ok=False row, never a task crash.  With
    ``with_arrival_ts`` the input must carry an ``arrival_ts``
    timestamp column (e.g. binaryFile's modificationTime) which is
    copied onto every sample row — the event-time column the
    bounded-state streaming dedup watermarks on."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "shard_id", "sample_no", "ok", "key", "n_files", "exts",
            "bytes_total", "content_hash",
        ] + (["arrival_ts"] if with_arrival_ts else [])
        for pdf in batches:
            out = {k: [] for k in cols}
            ts_col = (
                pdf["arrival_ts"] if with_arrival_ts else [None] * len(pdf)
            )

            def emit(sid, no, ok, key=None, nf=None, exts=None,
                     total=None, ch=None, ts=None):
                vals = (sid, no, ok, key, nf, exts, total, ch) + (
                    (ts,) if with_arrival_ts else ()
                )
                for k, v in zip(cols, vals):
                    out[k].append(v)

            for shard_id, data, ts in zip(pdf["shard_id"], pdf["bytes"], ts_col):
                try:
                    samples = parse_shard(bytes(data))
                except (ValueError, TypeError):
                    emit(shard_id, -1, False, ts=ts)
                    continue
                for i, s in enumerate(samples):
                    blob = b"".join(
                        ext.encode() + b"\x00" + s["files"][ext]
                        for ext in sorted(s["files"])
                    )
                    emit(
                        shard_id, i, True, s["key"], len(s["files"]),
                        ",".join(sorted(s["files"])),
                        sum(len(v) for v in s["files"].values()),
                        xxhash64(blob),
                        ts=ts,
                    )
            yield pd.DataFrame(out)

    in_cols = ["shard_id", "bytes"] + (["arrival_ts"] if with_arrival_ts else [])
    schema = WDS_SAMPLE_SCHEMA + (
        ", arrival_ts timestamp" if with_arrival_ts else ""
    )
    return shards.select(*in_cols).mapInPandas(
        run, schema
    )


def wds_samples_from_paths(paths):
    """Same per-sample summary as :func:`wds_samples`, but STREAMED
    from shard *paths* (column ``path``; shard_id = path) — each task
    opens its shards and walks the tar sequentially via
    :func:`iter_shard_samples`, so peak memory is one sample, not one
    shard.  This is the production ingest shape at the 1 GB-shard
    convention; the binary-column variant stays as the small-payload /
    gate instrument.  Unreadable or malformed shards yield one
    ok=False row, never a task crash."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "shard_id", "sample_no", "ok", "key", "n_files", "exts",
            "bytes_total", "content_hash",
        ]
        for pdf in batches:
            for path in pdf["path"]:
                out = {k: [] for k in cols}

                def emit(no, ok, key=None, nf=None, exts=None,
                         total=None, ch=None):
                    for k, v in zip(
                        cols, (path, no, ok, key, nf, exts, total, ch)
                    ):
                        out[k].append(v)

                try:
                    with open(path, "rb") as fh:
                        for i, s in enumerate(iter_shard_samples(fh)):
                            blob = b"".join(
                                ext.encode() + b"\x00" + s["files"][ext]
                                for ext in sorted(s["files"])
                            )
                            emit(
                                i, True, s["key"], len(s["files"]),
                                ",".join(sorted(s["files"])),
                                sum(len(v) for v in s["files"].values()),
                                xxhash64(blob),
                            )
                except (ValueError, OSError, TypeError):
                    # TypeError: NULL path column (open(None))
                    out = {k: [] for k in cols}
                    emit(-1, False)
                yield pd.DataFrame(out)

    return paths.select("path").mapInPandas(run, WDS_SAMPLE_SCHEMA)
