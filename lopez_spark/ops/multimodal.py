"""Multimodal column operators: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed in Arrow-batched
``mapInPandas`` stages.

This is the training-data-pipeline layer over the BASELINE.json corpus
shape ``(image_id, bytes, w, h, fmt, caption, phash)``.  The Spark-side
plumbing (schemas, batch shapes, partitioning, UDF signatures) is real
and tested; *external* codec backends (PIL/ffmpeg — not in this
sandbox) are cleanly stubbed behind ``try``-imports and raise
``NotImplementedError`` with the integration point documented, while
the fixture codecs (``raw``/``qraw`` — zlib, SURVEY §7) decode for
real, which is what the per-row invariant (decoded-pixel allclose,
PSNR ≥ 40 dB; exact caption equality) is verified against.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import fixtures as fx
from ..hashing import xxhash64

try:  # pragma: no cover - not present in sandbox
    from PIL import Image as _PIL_Image  # noqa: N816
except ImportError:
    _PIL_Image = None


def decode_pixels(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode one payload to uint8 (h, w, 3).  Fixture codecs decode
    via zlib; PNG (every color-type/depth, Adam7), JPEG (baseline +
    progressive, any chroma sampling, restarts, grayscale), GIF
    (LZW, interlace, animation, transparency), BMP (24-bit + 8-bit
    palette), lossless WebP (VP8L: prefix codes, LZ77 + color
    cache, all four transforms) and baseline TIFF (none/deflate
    strips, predictor 2, II/MM, EXIF orientation applied) decode for
    real (ops/{png,jpeg,gif,bmp,vp8l,tiff}.py — pure numpy per the
    public specs); lossy-VP8 webp and other formats require PIL
    (absent here).  A NULL payload raises ValueError so every Arrow
    stage's per-row containment tuple catches it (a bare bytes(None)
    is TypeError, which the tuples deliberately do NOT contain)."""
    if data is None:
        raise ValueError("NULL payload")
    if fmt in ("raw", "qraw"):
        return fx.decode_image(data, w, h, fmt)
    if fmt == "png":
        from .png import decode_png

        return decode_png(data)
    if fmt == "jpeg":
        from .container_probe import probe_jpeg
        from .jpeg import decode_jpeg
        from .tiff import apply_orientation

        px = decode_jpeg(data)
        # normalize Exif APP1 orientation (real-world camera JPEGs) so
        # downstream operators always see upright pixels, same as TIFF.
        # A malformed Exif block must not reject a JPEG whose pixel
        # data decoded fine — fall back to upright.
        try:
            orient = probe_jpeg(data)["orientation"]
        except ValueError:
            orient = 1
        return apply_orientation(px, orient)
    if fmt == "gif":  # first frame (LZW + interlace + transparency)
        from .gif import decode_gif

        return decode_gif(data, max_frames=1)[0]
    if fmt == "bmp":
        from .bmp import decode_bmp

        return decode_bmp(data)
    if fmt == "webp":  # lossless VP8L; lossy VP8 raises (external codec)
        from .vp8l import decode_webp

        return decode_webp(data)[:, :, :3].copy()
    if fmt == "tiff":  # baseline RGB, none/deflate strips; upright
        from .tiff import decode_tiff

        return decode_tiff(data)
    if _PIL_Image is None:
        raise NotImplementedError(
            f"decoding fmt={fmt!r} requires PIL; sandbox provides the "
            "raw/qraw fixture codecs and the built-in PNG/JPEG codecs only"
        )
    import io  # pragma: no cover

    return np.asarray(_PIL_Image.open(io.BytesIO(data)).convert("RGB"))


DECODE_STATS_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("phash_recomputed", LongType()),
        StructField("phash_matches", BooleanType()),
        StructField("mean_luma", DoubleType()),
        StructField("psnr_db", DoubleType()),  # vs quantized re-encode; inf→1e9
    ]
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode + verify stage: recompute the content hash from decoded
    pixels and check it against the stored ``phash`` (the per-row
    invariant's machinery), plus cheap pixel features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in DECODE_STATS_SCHEMA.fieldNames()}
            for image_id, data, w, h, fmt, phash in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["phash"]
            ):
                try:
                    px = decode_pixels(bytes(data), int(w), int(h), fmt)
                    rehash = xxhash64(px.tobytes())
                    if fmt == "png":  # lossless round-trip (PSNR → inf)
                        from .png import decode_png, encode_png

                        re_enc = decode_png(encode_png(px))
                    elif fmt == "jpeg":  # lossy: q98 holds PSNR ≥ 40 dB
                        from .jpeg import decode_jpeg, encode_jpeg

                        re_enc = decode_jpeg(encode_jpeg(px, 98))
                    elif fmt == "gif":  # palette decode is lossless
                        re_enc = px
                    elif fmt == "bmp":  # lossless round-trip
                        from .bmp import decode_bmp, encode_bmp

                        re_enc = decode_bmp(encode_bmp(px))
                    elif fmt == "webp":  # VP8L is lossless
                        from .vp8l import decode_webp, encode_webp

                        re_enc = decode_webp(encode_webp(px))[:, :, :3]
                    elif fmt == "tiff":  # lossless round-trip
                        from .tiff import decode_tiff, encode_tiff

                        re_enc = decode_tiff(
                            encode_tiff(px, compression=8, predictor=2)
                        )
                    else:
                        re_enc = fx.decode_image(
                            fx.encode_image(px, fmt), int(w), int(h), fmt
                        )
                    p = fx.psnr(px, re_enc)
                    out["image_id"].append(image_id)
                    out["ok"].append(True)
                    out["phash_recomputed"].append(rehash)
                    out["phash_matches"].append(rehash == int(phash))
                    out["mean_luma"].append(float(px.mean()))
                    out["psnr_db"].append(min(p, 1e9))
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    struct.error,
                    IndexError,
                    KeyError,
                    MemoryError,
                ):
                    # malformed or out-of-scope payloads: truncated
                    # JPEG (ValueError, struct.error on short segment
                    # bodies, IndexError on empty SOS, KeyError on
                    # missing Huffman tables), arithmetic-coded JPEG,
                    # corrupt deflate — per-row ok=False, never a
                    # task-killing raise.  (Progressive JPEG and
                    # palette/16-bit/Adam7 PNG decode for real now.)
                    out["image_id"].append(image_id)
                    out["ok"].append(False)
                    out["phash_recomputed"].append(None)
                    out["phash_matches"].append(None)
                    out["mean_luma"].append(None)
                    out["psnr_db"].append(None)
            yield pd.DataFrame(out)

    return images.mapInPandas(run, DECODE_STATS_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def resize(images: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize (pure numpy — real, not stubbed); output
    re-encoded with the lossless fixture codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = decode_pixels(bytes(data), int(w), int(h), fmt)
                yi = (np.arange(target_h) * h // target_h).astype(np.int64)
                xi = (np.arange(target_w) * w // target_w).astype(np.int64)
                rs = px[yi[:, None], xi[None, :]]
                out["image_id"].append(image_id)
                out["bytes"].append(fx.encode_image(rs, "raw"))
                out["w"].append(target_w)
                out["h"].append(target_h)
                out["fmt"].append("raw")
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, RESIZE_SCHEMA
    )


def bilinear_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized bilinear resample (half-pixel centers, edge clamp —
    the standard convention) of a (h, w, 3) uint8 image, float64
    accumulation with a fixed op order so driver and executor runs are
    bit-identical."""
    h, w = px.shape[:2]
    src = px.astype(np.float64)

    def axis_coords(n_out: int, n_in: int):
        x = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
        x0 = np.floor(x)
        frac = x - x0
        i0 = np.clip(x0, 0, n_in - 1).astype(np.int64)
        i1 = np.clip(x0 + 1, 0, n_in - 1).astype(np.int64)
        return i0, i1, frac

    y0, y1, fy = axis_coords(out_h, h)
    x0, x1, fx_ = axis_coords(out_w, w)
    fy = fy[:, None, None]
    fx_ = fx_[None, :, None]
    top = src[y0][:, x0] * (1.0 - fx_) + src[y0][:, x1] * fx_
    bot = src[y1][:, x0] * (1.0 - fx_) + src[y1][:, x1] * fx_
    out = top * (1.0 - fy) + bot * fy
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def letterbox_pixels(
    px: np.ndarray, target_w: int, target_h: int, fill: int = 114
) -> tuple[np.ndarray, float, int, int]:
    """Aspect-preserving bilinear resize + centered pad to exactly
    (target_h, target_w): the standard vision-model input prep.
    Returns (pixels, scale, pad_x, pad_y)."""
    h, w = px.shape[:2]
    scale = min(target_w / w, target_h / h)
    new_w = max(1, min(target_w, int(round(w * scale))))
    new_h = max(1, min(target_h, int(round(h * scale))))
    rs = bilinear_resize(px, new_w, new_h)
    out = np.full((target_h, target_w, 3), fill, dtype=np.uint8)
    pad_x = (target_w - new_w) // 2
    pad_y = (target_h - new_h) // 2
    out[pad_y : pad_y + new_h, pad_x : pad_x + new_w] = rs
    return out, scale, pad_x, pad_y


QUALITY_FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("blur_var", DoubleType()),  # variance of Laplacian
        StructField("entropy_bits", DoubleType()),  # luma histogram
        StructField("colorfulness", DoubleType()),  # Hasler-Süsstrunk
    ]
)


def _luma601(px: np.ndarray) -> np.ndarray:
    w601 = np.array([0.299, 0.587, 0.114], dtype=np.float64)
    return px.astype(np.float64) @ w601


def laplacian_variance(px: np.ndarray) -> float:
    """Blur score: variance of the 4-neighbour Laplacian response on
    Rec.601 luma (interior pixels only) — the classic focus measure;
    sharp detail scores high, blurry/flat images near zero.  Images
    smaller than 3x3 score 0.0."""
    y = _luma601(px) if px.ndim == 3 else px.astype(np.float64)
    if y.shape[0] < 3 or y.shape[1] < 3:
        return 0.0
    lap = (
        y[:-2, 1:-1] + y[2:, 1:-1] + y[1:-1, :-2] + y[1:-1, 2:]
        - 4.0 * y[1:-1, 1:-1]
    )
    return float(lap.var())


def luma_entropy_bits(px: np.ndarray) -> float:
    """Shannon entropy (bits) of the 256-bin luma histogram — near 0
    for flat/synthetic junk, up to 8 for full-range natural content."""
    y = _luma601(px) if px.ndim == 3 else px.astype(np.float64)
    hist = np.bincount(
        np.clip(np.floor(y + 0.5), 0, 255).astype(np.int64).ravel(), minlength=256
    ).astype(np.float64)
    p = hist / hist.sum()
    nz = p[p > 0.0]
    return float(-(nz * np.log2(nz)).sum())


def colorfulness_hs(px: np.ndarray) -> float:
    """Hasler & Süsstrunk 2003 colorfulness metric:
    sqrt(var(rg)+var(yb)) + 0.3*sqrt(mean(rg)^2+mean(yb)^2) over the
    opponent axes rg = R-G, yb = (R+G)/2 - B.  Grayscale content
    scores 0."""
    f = px.astype(np.float64)
    rg = f[..., 0] - f[..., 1]
    yb = 0.5 * (f[..., 0] + f[..., 1]) - f[..., 2]
    return float(
        np.sqrt(rg.var() + yb.var())
        + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    )


def quality_features(images: DataFrame) -> DataFrame:
    """Image-quality curation features in one Arrow pass: blur
    (variance of Laplacian), information content (luma-histogram
    entropy) and colorfulness (Hasler-Süsstrunk) — the cheap junk
    filters a corpus pipeline applies right after decode.  All
    vectorized numpy float64 with a fixed op order (executor ≡ driver
    bit-identical); malformed payloads yield ok=False per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in QUALITY_FEATURES_SCHEMA.fieldNames()}
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                row = dict.fromkeys(out)
                row["image_id"] = image_id
                try:
                    px = decode_pixels(bytes(data), int(w), int(h), fmt)
                    row.update(
                        ok=True,
                        blur_var=laplacian_variance(px),
                        entropy_bits=luma_entropy_bits(px),
                        colorfulness=colorfulness_hs(px),
                    )
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    struct.error,
                    IndexError,
                    KeyError,
                    MemoryError,
                ):
                    row["ok"] = False
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, QUALITY_FEATURES_SCHEMA
    )


LETTERBOX_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("bytes", BinaryType()),  # lossless fixture codec
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("scale", DoubleType()),
        StructField("pad_x", IntegerType()),
        StructField("pad_y", IntegerType()),
    ]
)


def letterbox(
    images: DataFrame, target_w: int, target_h: int, fill: int = 114
) -> DataFrame:
    """Training-input prep stage: decode → aspect-preserving bilinear
    resize → centered constant-fill pad to a fixed (target_w, target_h)
    canvas, emitting the scale/pad metadata a downstream pipeline needs
    to map labels back to source coordinates.  Output re-encoded with
    the lossless fixture codec so every image operator composes.
    Malformed payloads yield ok=False per row, never a task crash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in LETTERBOX_SCHEMA.fieldNames()}
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                row = dict.fromkeys(out)
                row["image_id"] = image_id
                try:
                    px = decode_pixels(bytes(data), int(w), int(h), fmt)
                    lb, scale, pad_x, pad_y = letterbox_pixels(
                        px, target_w, target_h, fill
                    )
                    row.update(
                        ok=True,
                        bytes=fx.encode_image(lb, "raw"),
                        w=target_w,
                        h=target_h,
                        fmt="raw",
                        scale=scale,
                        pad_x=pad_x,
                        pad_y=pad_y,
                    )
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    struct.error,
                    IndexError,
                    KeyError,
                    MemoryError,
                ):
                    row["ok"] = False
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, LETTERBOX_SCHEMA
    )


EMBED_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def pixel_embedding(images: DataFrame, dim: int = 64) -> DataFrame:
    """Feature-extraction stage: a deterministic pixel-statistics
    embedding (channel-wise histogram, L2-normalized).  Stands in for a
    model encoder; the Spark plumbing (Arrow batch → numpy → fixed-dim
    float vector) is exactly what a real encoder needs."""
    bins = dim // 4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = decode_pixels(bytes(data), int(w), int(h), fmt).astype(np.float64)
                feats = [np.histogram(px[..., c], bins=bins, range=(0, 256), density=True)[0]
                         for c in range(3)]
                luma = np.histogram(px.mean(axis=2), bins=bins, range=(0, 256), density=True)[0]
                v = np.concatenate(feats + [luma])
                n = np.linalg.norm(v)
                vecs.append((v / n if n > 0 else v).astype(np.float32).tolist())
                ids.append(image_id)
            yield pd.DataFrame({"image_id": ids, "embedding": vecs})

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, EMBED_SCHEMA
    )


DETAIL_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("ssim", DoubleType()),  # vs aggressive JPEG re-encode
    ]
)


def detail_score(images: DataFrame, quality: int = 35) -> DataFrame:
    """Perceptual detail/compressibility score: SSIM (Wang et al. 2004,
    ops/ssim.py) between the decoded image and its aggressive JPEG
    re-encode (real T.81 codec, default q35).  Flat or blurry images
    survive recompression nearly unchanged (SSIM → 1); detail-rich
    images lose structure (lower SSIM) — a standard curation signal for
    filtering low-information images out of a training corpus.
    Malformed payloads yield ok=False per row, never a task crash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg, encode_jpeg
        from .ssim import ssim

        for pdf in batches:
            out = {k: [] for k in DETAIL_SCHEMA.fieldNames()}
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                try:
                    px = decode_pixels(bytes(data), int(w), int(h), fmt)
                    deg = decode_jpeg(encode_jpeg(px, quality))
                    s = ssim(px, deg)
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    struct.error,
                    IndexError,
                    KeyError,
                    MemoryError,
                ):
                    out["image_id"].append(image_id)
                    out["ok"].append(False)
                    out["ssim"].append(None)
                    continue
                out["image_id"].append(image_id)
                out["ok"].append(True)
                out["ssim"].append(s)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, DETAIL_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_no", IntegerType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def frame_sample(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: one output row per sampled frame, each
    re-encoded with the lossless image fixture codec so every
    downstream image operator (decode_stats / resize / pixel_embedding
    / phash dedup) composes directly.  The 'vraw' fixture codec,
    animated GIF (ops/gif.py — composited frames per the disposal
    rules), **MJPEG-in-AVI** (ops/avi.py container walk) and
    **Motion-JPEG MP4** (ops/mp4.py stsz/stsc/stco sample-table walk)
    decode for real through the built-in JPEG codec; only SAMPLED
    frames are ever entropy-decoded — frame independence is MJPEG's
    skip-decode property.  Inter-frame codecs (avc1/hev1/webm) need an
    ffmpeg backend — not in this sandbox — and raise with the
    integration point documented.  A malformed AVI/MP4 yields one
    frame_no=-1 fmt='err' row, never a task crash.  Partition by
    video_id upstream when per-video work is skewed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in FRAME_SCHEMA.fieldNames()}

            def emit(vid, no, data, w, h, f):
                out["video_id"].append(vid)
                out["frame_no"].append(no)
                out["bytes"].append(data)
                out["w"].append(w)
                out["h"].append(h)
                out["fmt"].append(f)

            for video_id, data, w, h, n_frames, fmt in zip(
                pdf["video_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["n_frames"], pdf["fmt"],
            ):
                if fmt in ("avi", "mp4"):
                    from .jpeg import decode_jpeg

                    if fmt == "avi":
                        from .avi import iter_avi_frames as frame_iter
                    else:
                        from .mp4 import iter_mp4_jpeg_samples as frame_iter

                    try:
                        if data is None:
                            raise ValueError("NULL payload")
                        for k, payload in enumerate(frame_iter(bytes(data))):
                            if k % every_n:
                                continue  # skip-decode: never parsed
                            px = decode_jpeg(payload)
                            emit(
                                video_id, k, fx.encode_image(px, "raw"),
                                int(px.shape[1]), int(px.shape[0]), "raw",
                            )
                    except (ValueError, struct.error, IndexError, MemoryError):
                        emit(video_id, -1, None, -1, -1, "err")
                    continue
                if fmt == "gif":
                    from .gif import decode_gif

                    frames = decode_gif(bytes(data))
                    n_frames = len(frames)
                    h, w = frames[0].shape[:2]
                elif fmt == "vraw":
                    frames = fx.decode_video(
                        bytes(data), int(n_frames), int(w), int(h)
                    )
                else:
                    raise NotImplementedError(
                        f"decoding video fmt={fmt!r} requires ffmpeg; sandbox "
                        "provides the vraw fixture codec, animated GIF, and "
                        "Motion-JPEG AVI/MP4 only"
                    )
                for k in range(0, int(n_frames), every_n):
                    emit(
                        video_id, k, fx.encode_image(frames[k], "raw"),
                        int(w), int(h), "raw",
                    )
            yield pd.DataFrame(out)

    return videos.select(
        "video_id", "bytes", "w", "h", "n_frames", "fmt"
    ).mapInPandas(run, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", IntegerType()),
        StructField("peak", IntegerType()),
    ]
)


CONTAINER_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("duration_s", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("codec", StringType()),
        StructField("err", StringType()),
    ]
)


def container_metadata(media: DataFrame) -> DataFrame:
    """Cheap pre-decode metadata probe over opaque media payloads
    (mp4 box walk / mp3 frame headers, ops/container_probe.py) — the
    filter a curation pipeline runs before paying for a real decode.
    Rows: (media_id, bytes, fmt) with fmt in {mp4, mp3, webp, gif,
    tiff, jpeg, avi}; malformed payloads yield ok=False with the
    reason, never a crash."""
    from .avi import probe_avi
    from .container_probe import (
        probe_gif,
        probe_jpeg,
        probe_mp3,
        probe_mp4,
        probe_tiff,
        probe_webp,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in CONTAINER_META_SCHEMA.fieldNames()}
            for media_id, data, fmt in zip(pdf["media_id"], pdf["bytes"], pdf["fmt"]):
                row = dict.fromkeys(out)
                row["media_id"] = media_id
                try:
                    if fmt == "mp4":
                        m = probe_mp4(bytes(data))
                        row.update(
                            ok=True,
                            duration_s=m["duration_s"],
                            width=m["width"],
                            height=m["height"],
                            codec=",".join(m["codecs"]) or None,
                        )
                    elif fmt == "mp3":
                        m = probe_mp3(bytes(data))
                        row.update(
                            ok=True, duration_s=m["duration_s"], codec="mp3"
                        )
                    elif fmt == "webp":
                        m = probe_webp(bytes(data))
                        row.update(
                            ok=True,
                            width=m["width"],
                            height=m["height"],
                            codec=m["codec"],
                        )
                    elif fmt == "gif":
                        m = probe_gif(bytes(data))
                        row.update(
                            ok=True,
                            width=m["width"],
                            height=m["height"],
                            codec=f"gif:{m['n_frames']}f",
                        )
                    elif fmt == "tiff":
                        m = probe_tiff(bytes(data))
                        row.update(
                            ok=True,
                            width=m["width"],
                            height=m["height"],
                            codec=(
                                f"tiff:{m['n_pages']}p:o{m['orientation']}"
                                f":c{m['compression']}"
                            ),
                        )
                    elif fmt == "jpeg":
                        m = probe_jpeg(bytes(data))
                        row.update(
                            ok=True,
                            width=m["width"],
                            height=m["height"],
                            codec=(
                                f"jpeg:{'prog' if m['progressive'] else 'base'}"
                                f":o{m['orientation']}"
                            ),
                        )
                    elif fmt == "avi":
                        m = probe_avi(bytes(data))
                        row.update(
                            ok=True,
                            duration_s=(
                                m["n_frames"] / m["fps"] if m["fps"] else None
                            ),
                            width=m["width"],
                            height=m["height"],
                            codec=f"avi:{m['codec']}:{m['n_frames']}f",
                        )
                    else:
                        raise ValueError(f"unknown container fmt {fmt!r}")
                except (ValueError, struct.error, IndexError, MemoryError) as e:
                    # probe_mp4/probe_mp3 surface truncation as struct.error
                    # or IndexError; all three mean "malformed payload".
                    row.update(ok=False, err=str(e) or type(e).__name__)
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.select("media_id", "bytes", "fmt").mapInPandas(
        run, CONTAINER_META_SCHEMA
    )


SCRUB_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("bytes", BinaryType()),
        StructField("n_removed", IntegerType()),
        StructField("bytes_removed", IntegerType()),
    ]
)


def scrub_metadata(images: DataFrame) -> DataFrame:
    """Privacy-scrub stage: strip embedded metadata (Exif GPS/serial,
    XMP, ICC, comments) from image payloads before they enter a
    training corpus — JPEG via the APPn/COM segment walk
    (``strip_jpeg_metadata``); formats without embedded metadata
    containers pass through unchanged.  Pixels are untouched (the
    stream segments are copied verbatim), malformed payloads yield
    ok=False per row, never a task crash."""
    from .container_probe import strip_jpeg_metadata

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in SCRUB_SCHEMA.fieldNames()}
            for image_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                row = dict.fromkeys(out)
                row["image_id"] = image_id
                try:
                    if fmt == "jpeg":
                        s, nr, br = strip_jpeg_metadata(bytes(data))
                    else:
                        s, nr, br = bytes(data), 0, 0
                    row.update(
                        ok=True, bytes=s, n_removed=nr, bytes_removed=br
                    )
                except (ValueError, struct.error, IndexError, MemoryError):
                    row["ok"] = False
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, SCRUB_SCHEMA
    )


def audio_features(audios: DataFrame) -> DataFrame:
    """Audio feature extraction over opaque binary PCM: RMS, zero
    crossings, peak — vectorized numpy per clip inside one Arrow batch.
    The 'araw' fixture codec (zlib int16 PCM) and real RIFF/WAV
    (ops/wav.py, 16-bit PCM per the public format) decode for real;
    compressed formats (mp3/ogg) need an audio backend and raise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in AUDIO_FEATURES_SCHEMA.fieldNames()}
            for audio_id, data, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                if fmt == "araw":
                    pcm = fx.decode_audio(bytes(data)).astype(np.float64)
                elif fmt == "wav":
                    from .wav import decode_wav

                    pcm = decode_wav(bytes(data))[0].astype(np.float64)
                else:
                    raise NotImplementedError(
                        f"decoding audio fmt={fmt!r} requires an audio backend; "
                        "sandbox provides the araw fixture codec and the "
                        "built-in WAV (PCM16) codec only"
                    )
                out["audio_id"].append(audio_id)
                out["n_samples"].append(len(pcm))
                out["rms"].append(float(np.sqrt(np.mean(pcm**2))))
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.diff(np.signbit(pcm))))
                )
                out["peak"].append(int(np.max(np.abs(pcm))))
            yield pd.DataFrame(out)

    return audios.select("audio_id", "bytes", "fmt").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


AUDIO_LOGMEL_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("n_frames", IntegerType()),
        StructField("n_mels", IntegerType()),
        StructField("dominant_mel", IntegerType()),
        StructField("mean_e3", LongType()),
        StructField("max_e3", LongType()),
        StructField("mfcc1_e3", LongType()),
    ]
)


def audio_logmel(audios: DataFrame) -> DataFrame:
    """Log-mel spectrogram summary per clip (ops/logmel.py — the
    standard audio-training front-end): strided framing + batched rFFT
    + one filterbank matmul, all inside one Arrow batch.  The 'araw'
    fixture codec and real RIFF/WAV decode for real; malformed or
    unsupported payloads yield ok=False rows, never a task crash."""
    from .logmel import logmel_stats

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = AUDIO_LOGMEL_SCHEMA.fieldNames()
        for pdf in batches:
            out = {k: [] for k in cols}
            for audio_id, data, fmt, rate in zip(
                pdf["audio_id"], pdf["bytes"], pdf["fmt"], pdf["sample_rate"]
            ):
                try:
                    if data is None:
                        raise ValueError("NULL payload")
                    if fmt == "araw":
                        pcm = fx.decode_audio(bytes(data))
                    elif fmt == "wav":
                        from .wav import decode_wav

                        pcm, rate = decode_wav(bytes(data))
                    else:
                        raise ValueError(f"unsupported audio fmt {fmt!r}")
                    st = logmel_stats(pcm, int(rate))
                    row = (audio_id, True, st["n_frames"], st["n_mels"],
                           st["dominant_mel"], st["mean_e3"], st["max_e3"],
                           st["mfcc1_e3"])
                except (ValueError, zlib.error, struct.error, IndexError, MemoryError):
                    row = (audio_id, False, -1, -1, -1, -1, -1, -1)
                for k, v in zip(cols, row):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return audios.select("audio_id", "bytes", "fmt", "sample_rate").mapInPandas(
        run, AUDIO_LOGMEL_SCHEMA
    )


PHASH_DCT_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("phash", LongType()),
    ]
)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the JPEG/pHash transform), float64
    with a fixed op order so driver and executor runs are
    bit-identical on the same host."""
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    c = np.cos(np.pi * (2.0 * i + 1.0) * k / (2.0 * n))
    c[0] *= np.sqrt(1.0 / n)
    c[1:] *= np.sqrt(2.0 / n)
    return c


def phash_dct(px: np.ndarray, size: int = 32, low: int = 8) -> int:
    """64-bit DCT perceptual hash (the classic pHash recipe): Rec.601
    luma of the bilinear 32x32 thumbnail -> 2-D DCT-II -> top-left 8x8
    low-frequency block -> 1 bit per coefficient, set iff above the
    block median.  Perceptually-close images (re-encodes, light noise,
    small crops) land within a few Hamming bits; unrelated images are
    ~32 bits apart.  Returned as a SIGNED int64 (two's-complement
    wrap) so it drops straight into the `phash` bigint column shape
    and the banded-Hamming dedup operators.

    No BLAS on the hot path: a threaded dgemm's summation order may
    vary with the process's thread pool, and this hash is compared
    bit-exactly between driver and executor runs — so the two small
    DCT contractions are elementwise-multiply + np.sum pairwise
    reductions, deterministic regardless of threading."""
    thumb = bilinear_resize(px, size, size).astype(np.float64)
    g = 0.299 * thumb[..., 0] + 0.587 * thumb[..., 1] + 0.114 * thumb[..., 2]
    cl = _dct_matrix(size)[:low]  # (low, size) — only low rows needed
    tmp = (cl[:, :, None] * g[None, :, :]).sum(axis=1)  # (low, size)
    d = (tmp[:, None, :] * cl[None, :, :]).sum(axis=2)  # (low, low)
    block = d.ravel()
    med = float(np.median(block))
    val = 0
    for coef in block:
        val = (val << 1) | int(coef > med)
    return int(np.int64(np.uint64(val)))


def perceptual_hash(images: DataFrame) -> DataFrame:
    """Arrow-batched DCT pHash over (image_id, bytes, w, h, fmt)
    rows: decode (any built-in codec) -> `phash_dct`.  One pass, no
    shuffle; malformed payloads yield ok=False per row, never a task
    crash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in PHASH_DCT_SCHEMA.fieldNames()}
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                try:
                    if data is None:
                        raise ValueError("NULL payload")
                    px = decode_pixels(bytes(data), int(w), int(h), fmt)
                    ph = phash_dct(px)
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    struct.error,
                    IndexError,
                    KeyError,
                    MemoryError,
                ):
                    out["image_id"].append(image_id)
                    out["ok"].append(False)
                    out["phash"].append(None)
                    continue
                out["image_id"].append(image_id)
                out["ok"].append(True)
                out["phash"].append(ph)
            pdf_out = pd.DataFrame(out)
            # nullable Int64, NOT object/float64: a None in the batch
            # would otherwise route the column through float64 in the
            # Arrow conversion and truncate hashes below 2^53 (found
            # live: trailing hash bits zeroed in the garbage row's
            # batch).
            pdf_out["phash"] = pd.array(out["phash"], dtype="Int64")
            yield pdf_out

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, PHASH_DCT_SCHEMA
    )


PATCHIFY_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("ny", IntegerType()),  # patch grid height (h // patch)
        StructField("nx", IntegerType()),  # patch grid width  (w // patch)
        StructField("patch_no", IntegerType()),  # row-major grid index
        StructField("patch_hash", LongType()),  # xxhash64 of raw RGB tile
        StructField("mean_luma", DoubleType()),
    ]
)


def patchify_pixels(px: np.ndarray, patch: int) -> list[tuple[int, int, float]]:
    """Pure helper: split (h, w, 3) uint8 pixels into the ViT patch
    grid (Dosovitskiy 2020) — non-overlapping ``patch``×``patch``
    tiles, row-major, right/bottom remainder cropped away (the
    standard crop-to-multiple preprocessing).  Returns
    ``(patch_no, xxhash64(tile bytes), tile mean Rec.601 luma)`` per
    tile; images smaller than one patch yield []."""
    h, w = px.shape[:2]
    ny, nx = h // patch, w // patch
    out = []
    for gy in range(ny):
        for gx in range(nx):
            tile = px[gy * patch : (gy + 1) * patch, gx * patch : (gx + 1) * patch]
            out.append(
                (
                    gy * nx + gx,
                    xxhash64(np.ascontiguousarray(tile).tobytes()),
                    float(_luma601(tile).mean()),
                )
            )
    return out


def patchify(images: DataFrame, patch: int = 8) -> DataFrame:
    """ViT patch extraction over the image corpus: decode → crop to a
    multiple of ``patch`` → emit one row per non-overlapping tile with
    its exact content hash and mean luma.  One Arrow pass, no shuffle —
    the patch stream inherits the input partitioning, which is what a
    10^10-image tokenization job wants (patch rows are consumed by the
    packer / encoder in the same stage or written partition-aligned).
    Malformed payloads yield one ok=False row, never a task crash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in PATCHIFY_SCHEMA.fieldNames()}

            def emit(image_id, ok, ny, nx, no, ph, ml):
                out["image_id"].append(image_id)
                out["ok"].append(ok)
                out["ny"].append(ny)
                out["nx"].append(nx)
                out["patch_no"].append(no)
                out["patch_hash"].append(ph)
                out["mean_luma"].append(ml)

            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                try:
                    px = decode_pixels(bytes(data), int(w), int(h), fmt)
                    tiles = patchify_pixels(px, patch)
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    struct.error,
                    IndexError,
                    KeyError,
                    MemoryError,
                ):
                    emit(image_id, False, None, None, None, None, None)
                    continue
                ny, nx = px.shape[0] // patch, px.shape[1] // patch
                for no, ph, ml in tiles:
                    emit(image_id, True, ny, nx, no, ph, ml)
            pdf_out = pd.DataFrame(out)
            # Int64 (nullable), never float64: hashes above 2^53 would
            # silently lose trailing bits through a float column (same
            # failure mode as PHASH_DCT_SCHEMA's note above).
            pdf_out["patch_hash"] = pd.array(out["patch_hash"], dtype="Int64")
            for c in ("ny", "nx", "patch_no"):
                pdf_out[c] = pd.array(out[c], dtype="Int32")
            yield pdf_out

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, PATCHIFY_SCHEMA
    )


PATCH_PACK_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("n_patches", IntegerType()),
        StructField("seq_id", LongType()),
        StructField("seq_pos", IntegerType()),  # first-patch offset in seq
    ]
)


def pack_patch_sequences(
    meta: DataFrame, capacity: int, groups: int = 8
) -> DataFrame:
    """NaViT-style "Patch n' Pack" (Dehghani 2023): pack whole images'
    patch sequences into fixed-``capacity`` training sequences without
    splitting an image across sequences.  Greedy next-fit in image_id
    order *within a hash group*: an image opens a new sequence when it
    does not fit the current one (an image larger than ``capacity``
    gets a sequence of its own).

    Input: ``(image_id, n_patches)``.  The group key is
    ``pmod(xxhash64(image_id), groups)`` computed JVM-side; packing is
    sequential only within a group, so ``groups`` = O(cluster
    parallelism) and no global order exists — exactly how a
    10^10-image packing job shards (each group's sequences are
    independent; ids namespace by group).  Deterministic: same corpus
    → same packing, any partitioning."""

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(key[0])
        pdf = pdf.sort_values("image_id").reset_index(drop=True)
        seq_ids, seq_pos = [], []
        bin_no, fill = 0, 0
        for n in pdf["n_patches"]:
            n = int(n)
            if fill > 0 and fill + n > capacity:
                bin_no += 1
                fill = 0
            seq_ids.append(g * 1_000_000_000 + bin_no)
            seq_pos.append(fill)
            fill += n
        return pd.DataFrame(
            {
                "image_id": pdf["image_id"],
                "n_patches": pdf["n_patches"].astype("int32"),
                "seq_id": pd.array(seq_ids, dtype="int64"),
                "seq_pos": pd.array(seq_pos, dtype="int32"),
            }
        )

    keyed = meta.select(
        "image_id",
        F.col("n_patches").cast("int").alias("n_patches"),
        F.pmod(F.xxhash64("image_id"), F.lit(groups)).alias("_g"),
    )
    return keyed.groupBy("_g").applyInPandas(pack, PATCH_PACK_SCHEMA)


AUGMENT_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("flipped", BooleanType()),
        StructField("crop_x", IntegerType()),
        StructField("crop_y", IntegerType()),
        StructField("crop_w", IntegerType()),
        StructField("crop_h", IntegerType()),
        StructField("bright_e3", IntegerType()),  # factor * 1000
        StructField("aug_hash", LongType()),  # xxhash64 of output pixels
        StructField("bytes", BinaryType()),  # lossless re-encode
    ]
)


def augment_params(image_id: str, w: int, h: int) -> tuple:
    """Deterministic per-image augmentation draw — the seeded policy a
    reproducible training pipeline needs (same image_id → same crop/
    flip/brightness on every run, any partitioning, any retry).  All
    integer arithmetic off the same xxhash64 the engine uses for page
    ids: crop keeps 75–100% per axis, brightness scales 0.800–1.200."""
    from ..hashing import umod, xxhash64_str

    def draw(tag: str, m: int) -> int:
        return umod(xxhash64_str(f"{image_id}#{tag}"), m)

    flipped = draw("flip", 2) == 1
    cw = w - draw("cw", w // 4 + 1)
    ch = h - draw("ch", h // 4 + 1)
    x0 = draw("x0", w - cw + 1)
    y0 = draw("y0", h - ch + 1)
    bright_e3 = 800 + draw("bright", 401)
    return flipped, x0, y0, cw, ch, bright_e3


def augment_pixels(px: np.ndarray, params: tuple) -> np.ndarray:
    """Apply (crop → hflip → brightness) with pure integer arithmetic
    (uint16 multiply, //1000, clamp 255) so the output bytes are exact
    across any numpy/JVM/replica implementation — no float rounding to
    disagree on."""
    flipped, x0, y0, cw, ch, bright_e3 = params
    out = px[y0 : y0 + ch, x0 : x0 + cw]
    if flipped:
        out = out[:, ::-1]
    scaled = out.astype(np.uint32) * bright_e3 // 1000
    return np.minimum(scaled, 255).astype(np.uint8)


def augment(images: DataFrame) -> DataFrame:
    """Seeded augmentation stage over the image corpus: decode → crop/
    flip/brightness per :func:`augment_params` → lossless re-encode +
    exact output hash.  One Arrow pass, no shuffle; malformed payloads
    yield ok=False per row, never a task crash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in AUGMENT_SCHEMA.fieldNames()}
            for image_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                row = dict.fromkeys(out)
                row["image_id"] = image_id
                try:
                    px = decode_pixels(bytes(data), int(w), int(h), fmt)
                    params = augment_params(image_id, px.shape[1], px.shape[0])
                    aug = augment_pixels(px, params)
                    flipped, x0, y0, cw, ch, be3 = params
                    row.update(
                        ok=True,
                        flipped=flipped,
                        crop_x=x0,
                        crop_y=y0,
                        crop_w=cw,
                        crop_h=ch,
                        bright_e3=be3,
                        aug_hash=xxhash64(np.ascontiguousarray(aug).tobytes()),
                        bytes=fx.encode_image(aug, "raw"),
                    )
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    struct.error,
                    IndexError,
                    KeyError,
                    MemoryError,
                ):
                    row["ok"] = False
                for k, v in row.items():
                    out[k].append(v)
            pdf_out = pd.DataFrame(out)
            pdf_out["aug_hash"] = pd.array(out["aug_hash"], dtype="Int64")
            for c in ("crop_x", "crop_y", "crop_w", "crop_h", "bright_e3"):
                pdf_out[c] = pd.array(out[c], dtype="Int32")
            yield pdf_out

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, AUGMENT_SCHEMA
    )
