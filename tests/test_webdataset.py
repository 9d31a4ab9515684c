"""WebDataset shards: round-trip, determinism, Spark export + ingest."""

import glob

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.sources.webdataset import (
    build_shard,
    export_corpus,
    parse_shard,
    wds_samples,
    wds_samples_from_paths,
    write_shards,
)


def _samples(n=4):
    out = []
    for i in range(n):
        px = fx.oracle_pixels(i)
        out.append(
            {
                "key": f"{i:09d}",
                "files": {
                    "raw": fx.encode_image(px, "raw"),
                    "txt": f"caption for image {i}".encode(),
                    "json": b'{"w": %d}' % px.shape[1],
                },
            }
        )
    return out


def test_shard_roundtrip_and_determinism():
    s = _samples()
    data = build_shard(s)
    assert data == build_shard(_samples())  # byte-deterministic
    got = parse_shard(data)
    assert [g["key"] for g in got] == [x["key"] for x in s]
    for a, b in zip(s, got):
        assert a["files"] == b["files"]


def test_shard_malformed_raises():
    with pytest.raises(ValueError):
        parse_shard(b"definitely not a tar" * 40)
    data = build_shard(_samples(1))
    with pytest.raises(ValueError):
        parse_shard(data[: 700])  # truncated mid-member


def test_spark_export_then_ingest(spark, tmp_path):
    rows = [
        (s["key"], ext, bytearray(payload))
        for s in _samples(6)
        for ext, payload in s["files"].items()
    ]
    df = spark.createDataFrame(rows, "key string, ext string, bytes binary")
    write_shards(df.repartition(2, "key"), str(tmp_path / "wds"))
    paths = sorted(glob.glob(str(tmp_path / "wds" / "shard-*.tar")))
    assert 1 <= len(paths) <= 2 and not glob.glob(str(tmp_path / "wds" / "*.tmp"))
    # every sample comes back intact across shards
    seen = {}
    for p in paths:
        for s in parse_shard(open(p, "rb").read()):
            seen[s["key"]] = s["files"]
    expect = {s["key"]: s["files"] for s in _samples(6)}
    assert seen == expect
    # ingest stage summarizes per sample; garbage shard contained
    shards_df = spark.createDataFrame(
        [(p, bytearray(open(p, "rb").read())) for p in paths]
        + [("bad", bytearray(b"nope" * 200)), ("null", None)],
        "shard_id string, bytes binary",
    )
    rows = wds_samples(shards_df).collect()
    ok = [r for r in rows if r["ok"]]
    bad = [r for r in rows if not r["ok"]]
    assert len(ok) == 6 and len(bad) == 2
    assert all(r["n_files"] == 3 and r["exts"] == "json,raw,txt" for r in ok)


def test_streaming_paths_ingest_matches_bytes_ingest(spark, tmp_path):
    """wds_samples_from_paths (streamed tar walk, one-sample memory)
    agrees row-for-row with the binary-column wds_samples on the same
    shards; unreadable/garbage paths are contained per-row."""
    rows = [
        (s["key"], ext, bytearray(payload))
        for s in _samples(6)
        for ext, payload in s["files"].items()
    ]
    df = spark.createDataFrame(rows, "key string, ext string, bytes binary")
    write_shards(df.repartition(2, "key"), str(tmp_path / "w"))
    paths = sorted(glob.glob(str(tmp_path / "w" / "shard-*.tar")))
    garbage = tmp_path / "w" / "garbage.tar"
    garbage.write_bytes(b"not a tar at all" * 64)
    all_paths = paths + [str(garbage), str(tmp_path / "w" / "missing.tar")]
    got = wds_samples_from_paths(
        spark.createDataFrame([(p,) for p in all_paths], "path string")
    ).collect()
    bad = [r for r in got if not r["ok"]]
    assert len(bad) == 2 and all(r["sample_no"] == -1 for r in bad)
    via_bytes = wds_samples(
        spark.createDataFrame(
            [(p, bytearray(open(p, "rb").read())) for p in paths],
            "shard_id string, bytes binary",
        )
    ).collect()
    assert sorted(
        (r.asDict() for r in got if r["ok"]), key=lambda d: (d["shard_id"], d["sample_no"])
    ) == sorted((r.asDict() for r in via_bytes), key=lambda d: (d["shard_id"], d["sample_no"]))


def test_export_corpus_sizes_shards_from_bytes(spark, tmp_path):
    """input_hint corpus -> <image_id>.<fmt> + <image_id>.txt samples;
    shard count = ceil(estimated bytes / target)."""
    rows = []
    payloads = {}
    for i in range(8):
        px = fx.oracle_pixels(i)
        data = fx.encode_image(px, "raw")
        iid = f"img-{i:04d}"
        payloads[iid] = (data, f"caption {i}")
        rows.append(
            (iid, bytearray(data), int(px.shape[1]), int(px.shape[0]),
             "raw", f"caption {i}", i)
        )
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    total = sum(len(d) + len(c) + 2048 for d, c in payloads.values())
    target = (total + 2) // 3  # => ceil(total/target) == 3
    n = export_corpus(df, str(tmp_path / "o"), target_shard_bytes=target)
    paths = sorted(glob.glob(str(tmp_path / "o" / "shard-*.tar")))
    assert n == 3 and 1 <= len(paths) <= 3  # hash split may leave empties
    seen = {}
    for p in paths:
        for s in parse_shard(open(p, "rb").read()):
            assert sorted(s["files"]) == ["raw", "txt"]
            seen[s["key"]] = (s["files"]["raw"], s["files"]["txt"].decode())
    assert seen == payloads


def test_export_corpus_null_rows_and_null_paths(spark, tmp_path):
    """NULL image bytes drop the sample, NULL caption exports as empty
    .txt (never a task crash); NULL shard path is contained per-row."""
    px = fx.oracle_pixels(0)
    rows = [
        ("img-ok", bytearray(fx.encode_image(px, "raw")),
         int(px.shape[1]), int(px.shape[0]), "raw", None, 0),
        ("img-null", None, 1, 1, "raw", "cap", 1),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    export_corpus(df, str(tmp_path / "o"))
    samples = {
        s["key"]: s["files"]
        for p in glob.glob(str(tmp_path / "o" / "shard-*.tar"))
        for s in parse_shard(open(p, "rb").read())
    }
    assert set(samples) == {"img-ok"}
    assert samples["img-ok"]["txt"] == b""  # NULL caption -> empty txt
    got = wds_samples_from_paths(
        spark.createDataFrame([(None,)], "path string")
    ).collect()
    assert len(got) == 1 and not got[0]["ok"]


def test_duplicate_key_ext_rows_emit_one_member(spark, tmp_path):
    """Duplicate (key, ext) rows must not produce same-named tar
    members (external WebDataset loaders reject those): first wins."""
    rows = [
        ("k0", "raw", bytearray(b"first")),
        ("k0", "raw", bytearray(b"second")),
        ("k0", "txt", bytearray(b"cap")),
    ]
    df = spark.createDataFrame(rows, "key string, ext string, bytes binary")
    write_shards(df.repartition(1), str(tmp_path / "w"))
    import tarfile as _tar

    p = glob.glob(str(tmp_path / "w" / "shard-*.tar"))[0]
    names = [m.name for m in _tar.open(p).getmembers()]
    assert sorted(names) == ["k0.raw", "k0.txt"]  # no duplicate member


def test_adjacency_violation_rejected_both_surfaces():
    """A key reappearing after its sample flushed must raise on BOTH
    ingest surfaces (round-4 ADVICE: they previously disagreed — the
    streamed path split such keys into two samples, the whole-shard
    path silently merged them, so third-party shards violating the
    adjacency convention got different sample counts/content hashes
    depending on which surface read them)."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in [
            ("a.txt", b"one"),
            ("b.txt", b"two"),
            ("a.json", b"{}"),  # key 'a' reappears non-adjacently
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    bad = buf.getvalue()

    from lopez_spark.sources.webdataset import iter_shard_samples

    with pytest.raises(ValueError, match="adjacency"):
        parse_shard(bad)
    with pytest.raises(ValueError, match="adjacency"):
        list(iter_shard_samples(io.BytesIO(bad)))

    # adjacent multi-file samples still parse identically on both
    good = build_shard(_samples(3))
    a = parse_shard(good)
    b = list(iter_shard_samples(io.BytesIO(good)))
    assert a == b
