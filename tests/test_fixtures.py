"""Fixture-corpus invariants (BASELINE.json input_hint): exact decode for
lossless rows, PSNR ≥ 40 dB for lossy rows, exact caption equality,
deterministic topology."""

import numpy as np

from lopez_spark import fixtures as fx


def test_raw_roundtrip_exact():
    for i in [0, 3, 17]:
        iid = fx.image_id_of(i)
        if fx.fmt_of(iid) != "raw":
            continue
        px = fx.oracle_pixels(i)
        data = fx.encode_image(px, "raw")
        dec = fx.decode_image(data, px.shape[1], px.shape[0], "raw")
        assert np.array_equal(px, dec)


def test_qraw_psnr_at_least_40db():
    found = 0
    for i in range(100):
        iid = fx.image_id_of(i)
        if fx.fmt_of(iid) != "qraw":
            continue
        found += 1
        px = fx.oracle_pixels(i)
        data = fx.encode_image(px, "qraw")
        dec = fx.decode_image(data, px.shape[1], px.shape[0], "qraw")
        assert fx.psnr(px, dec) >= 40.0
    assert found > 0, "no lossy rows in first 100 — fixture drift"


def test_image_row_invariant():
    r = fx.image_row(5)
    dec = fx.decode_image(r.bytes, r.w, r.h, r.fmt)
    assert dec.shape == (r.h, r.w, 3)
    assert fx.psnr(fx.oracle_pixels(5), dec) >= 40.0
    assert r.caption == fx.caption_of(r.image_id)
    assert r.caption.startswith("a photo of ")


def test_topology_deterministic():
    iid = fx.image_id_of(12)
    assert fx.url_of(iid) == fx.url_of(iid)
    assert fx.raw_links(iid, 100) == fx.raw_links(iid, 100)
    assert fx.image_id_from_url(fx.url_of(iid)) == iid


def test_hot_host_skew():
    n = 2000
    hot = sum(1 for i in range(n) if fx.host_index(fx.image_id_of(i)) == 0)
    assert 0.22 < hot / n < 0.38  # ~30% on h0


def test_images_df_matches_pandas(spark):
    n = 40
    pdf = fx.images_pandas(n)
    sdf = fx.images_df(spark, n, partitions=3).orderBy("image_id").toPandas()
    assert list(sdf["image_id"]) == list(pdf["image_id"])
    assert list(sdf["phash"]) == list(pdf["phash"])
    assert list(sdf["caption"]) == list(pdf["caption"])
    assert bytes(sdf["bytes"][0]) == bytes(pdf["bytes"][0])


def test_fixture_web_emits_mixed_3xx_codes():
    """The parity suite must exercise every redirect class the reference
    follows (any 3xx, downloader/mod.rs:92) — not just 301."""
    from lopez_spark import fixtures as fx

    codes = {fx.http_status(fx.image_id_of(i)) for i in range(2000)}
    assert {301, 302, 303, 307, 308} <= {c for c in codes if 300 <= c < 400}
