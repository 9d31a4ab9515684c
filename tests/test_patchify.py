"""ViT patchify + NaViT patch packing (ops/multimodal.py).

Patch grid per Dosovitskiy 2020 (crop-to-multiple, row-major tiles);
packing per Dehghani 2023 "Patch n' Pack" (whole images, greedy
next-fit within hash shards).  The reference has no image layer at all
(Rust crawl engine); both are beyond-reference training-data ops.
"""

from __future__ import annotations

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.hashing import umod, xxhash64, xxhash64_str
from lopez_spark.ops.multimodal import (
    pack_patch_sequences,
    patchify,
    patchify_pixels,
)

CAP = 64
GROUPS = 4


def test_patchify_pixels_handcrafted():
    # 8x16 image, patch 8 -> 1x2 grid; values chosen so tile means differ
    px = np.zeros((8, 16, 3), dtype=np.uint8)
    px[:, 8:, :] = 255
    tiles = patchify_pixels(px, 8)
    assert [t[0] for t in tiles] == [0, 1]
    assert tiles[0][1] == xxhash64(px[:, :8].tobytes())
    assert tiles[1][1] == xxhash64(np.ascontiguousarray(px[:, 8:]).tobytes())
    assert tiles[0][2] == pytest.approx(0.0)
    assert tiles[1][2] == pytest.approx(255.0)


def test_patchify_pixels_crops_remainder():
    px = np.arange(13 * 19 * 3, dtype=np.uint8).reshape(13, 19, 3)
    tiles = patchify_pixels(px, 8)
    assert len(tiles) == (13 // 8) * (19 // 8)  # 1x2
    # sub-patch image yields nothing
    assert patchify_pixels(px[:7, :7], 8) == []


def test_patchify_dataframe_matches_replica(spark):
    n = 12
    out = patchify(fx.images_df(spark, n, partitions=3), patch=8)
    rows = {(r.image_id, r.patch_no): r for r in out.collect()}
    total = 0
    for i in range(n):
        r = fx.image_row(i)
        px = fx.decode_image(r.bytes, r.w, r.h, r.fmt)
        expect = patchify_pixels(px, 8)
        total += len(expect)
        for no, ph, ml in expect:
            got = rows[(r.image_id, no)]
            assert got.ok and got.patch_hash == ph
            assert got.mean_luma == pytest.approx(ml)
            assert (got.ny, got.nx) == (r.h // 8, r.w // 8)
    assert len(rows) == total


def test_patchify_contains_garbage_row(spark):
    bad = spark.createDataFrame(
        [("garbage", bytearray(b"\x00not-zlib"), 8, 8, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = patchify(bad, patch=8).collect()
    assert len(rows) == 1 and rows[0].ok is False


def _greedy_replica(n: int):
    groups: dict[int, list[tuple[str, int]]] = {}
    for i in range(n):
        iid = fx.image_id_of(i)
        w = 16 + umod(fx.hk(iid, 1), 48)
        h = 16 + umod(fx.hk(iid, 2), 48)
        groups.setdefault(umod(xxhash64_str(iid), GROUPS), []).append(
            (iid, (h // 8) * (w // 8))
        )
    out = {}
    for g, items in groups.items():
        bin_no, fill = 0, 0
        for iid, np_ in sorted(items):
            if fill > 0 and fill + np_ > CAP:
                bin_no, fill = bin_no + 1, 0
            out[iid] = (np_, g * 1_000_000_000 + bin_no, fill)
            fill += np_
    return out


def test_pack_matches_replica_and_respects_capacity(spark):
    n = 60
    from pyspark.sql import functions as F

    meta = fx.images_df(spark, n, partitions=3).select(
        "image_id",
        (F.floor(F.col("h") / 8) * F.floor(F.col("w") / 8)).alias("n_patches"),
    )
    got = {
        r.image_id: (r.n_patches, r.seq_id, r.seq_pos)
        for r in pack_patch_sequences(meta, capacity=CAP, groups=GROUPS).collect()
    }
    assert got == _greedy_replica(n)
    # no sequence exceeds capacity; images never split
    fills: dict[int, int] = {}
    for np_, seq, pos in got.values():
        fills[seq] = max(fills.get(seq, 0), pos + np_)
    assert all(f <= CAP for f in fills.values())


def test_pack_oversize_image_gets_own_sequence(spark):
    meta = spark.createDataFrame(
        [("img-a", 100), ("img-b", 10), ("img-c", 10)],
        "image_id string, n_patches int",
    )
    rows = pack_patch_sequences(meta, capacity=CAP, groups=1).collect()
    by_id = {r.image_id: r for r in rows}
    # img-a (100 > 64) sits alone at pos 0 of its own sequence
    a = by_id["img-a"]
    assert a.seq_pos == 0
    assert sum(1 for r in rows if r.seq_id == a.seq_id) == 1
