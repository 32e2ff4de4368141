"""pngcodec: real PNG decode/encode (stdlib zlib + numpy) and its
multimodal seam integration (decode_stub='png')."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from shaclapi_ray.pipelines.multimodal import (
    decode_bmp,
    encode_bmp,
    featurize_media,
    resize_media,
)
from shaclapi_ray.pipelines.pngcodec import _chunk, decode_png, encode_png

_SIG = b"\x89PNG\r\n\x1a\n"


def _raw_png(pixels: np.ndarray, ctype: int, palette=None, depth=8, interlace=0):
    """Independent minimal PNG writer (filter 0 only) used to craft
    payloads the repo encoder does not produce: every color type,
    bad depths, interlace flags."""
    h, w = pixels.shape[:2]
    flat = pixels.reshape(h, -1)
    body = b"".join(b"\x00" + flat[y].astype(np.uint8).tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    chunks = _SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        chunks += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    return chunks + _chunk(b"IDAT", zlib.compress(body)) + _chunk(b"IEND", b"")


def _img(h, w, seed=0):
    return (
        np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(filter_type):
    for h, w, seed in [(1, 1, 1), (1, 7, 2), (7, 1, 3), (13, 9, 4), (16, 16, 5)]:
        img = _img(h, w, seed)
        out = decode_png(encode_png(img, filter_type=filter_type))
        np.testing.assert_array_equal(out, img)


def test_roundtrip_extreme_values():
    # all-0 / all-255 planes stress the wraparound arithmetic of
    # Sub/Average/Paeth
    for fill in (0, 255):
        img = np.full((9, 5, 3), fill, np.uint8)
        for f in range(5):
            np.testing.assert_array_equal(decode_png(encode_png(img, f)), img)


def test_grayscale_decode():
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = decode_png(_raw_png(g, ctype=0))
    np.testing.assert_array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_palette_decode():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    out = decode_png(_raw_png(idx, ctype=3, palette=pal))
    np.testing.assert_array_equal(out, pal[idx])


def test_palette_missing_plte_and_oob_index():
    idx = np.array([[0]], np.uint8)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(_raw_png(idx, ctype=3))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_raw_png(np.array([[9]], np.uint8), ctype=3, palette=[[1, 2, 3]]))


def test_gray_alpha_and_rgba_decode():
    rng = np.random.default_rng(7)
    ga = rng.integers(0, 256, (3, 4, 2)).astype(np.uint8)
    out = decode_png(_raw_png(ga, ctype=4))
    np.testing.assert_array_equal(out, np.repeat(ga[:, :, :1], 3, axis=2))
    rgba = rng.integers(0, 256, (5, 3, 4)).astype(np.uint8)
    out = decode_png(_raw_png(rgba, ctype=6))
    np.testing.assert_array_equal(out, rgba[:, :, :3])


def test_crc_corruption_rejected():
    raw = bytearray(encode_png(_img(4, 4)))
    # flip a byte inside the IDAT payload (skip signature+IHDR = 8+25)
    raw[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|corrupt"):
        decode_png(bytes(raw))


def test_unsupported_variants_rejected_loudly():
    img = np.zeros((2, 2, 3), np.uint8)
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(_raw_png(img, ctype=2, depth=16))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(_raw_png(img, ctype=2, interlace=2))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + b"\x00" * 60)
    with pytest.raises(ValueError, match="color type"):
        decode_png(_raw_png(img, ctype=5))


def test_paeth_matches_spec_scalar():
    # reference scalar Paeth from the PNG spec, applied per byte
    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb and pa_ <= pc_:
            return a
        return b if pb <= pc_ else c

    img = _img(6, 6, seed=11)
    rows = img.reshape(6, 18).astype(int)
    filt = np.zeros_like(rows)
    for y in range(6):
        for i in range(18):
            a = rows[y, i - 3] if i >= 3 else 0
            b = rows[y - 1, i] if y >= 1 else 0
            c = rows[y - 1, i - 3] if y >= 1 and i >= 3 else 0
            filt[y, i] = (rows[y, i] - paeth(a, b, c)) % 256
    body = b"".join(b"\x04" + filt[y].astype(np.uint8).tobytes() for y in range(6))
    raw = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 6, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(body))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(raw), img)


def test_featurize_png_matches_bmp_features(ray_session):
    import ray.data

    # identical pixels through the BMP and PNG seams must yield
    # identical features (both decode to exact RGB)
    imgs = [_img(20, 17, s) for s in range(4)]
    ds_png = ray.data.from_arrow(
        pa.table(
            {
                "url": [f"u{i}" for i in range(4)],
                "html": [encode_png(im, filter_type=4) for im in imgs],
            }
        )
    )
    ds_bmp = ray.data.from_arrow(
        pa.table(
            {
                "url": [f"u{i}" for i in range(4)],
                "html": [encode_bmp(im) for im in imgs],
            }
        )
    )
    f_png = featurize_media(ds_png, decode_stub="png").to_pandas().sort_values("url")
    f_bmp = featurize_media(ds_bmp, decode_stub="bmp").to_pandas().sort_values("url")
    for a, b in zip(f_png["feature"], f_bmp["feature"]):
        np.testing.assert_allclose(a, b)
    # width/height land in the first two feature slots
    assert f_png["feature"].iloc[0][0] == 17 and f_png["feature"].iloc[0][1] == 20


def test_resize_png_pipeline(ray_session):
    import ray.data

    img = _img(32, 24, seed=42)
    ds = ray.data.from_arrow(
        pa.table({"url": ["a"], "html": [encode_png(img, filter_type=2)]})
    )
    out = resize_media(ds, width=8, height=6, decode_stub="png").to_pandas()
    assert (out["width"].iloc[0], out["height"].iloc[0]) == (8, 6)
    got = decode_png(out["media"].iloc[0])
    from shaclapi_ray.pipelines.multimodal import _nn_resize

    np.testing.assert_array_equal(got, _nn_resize(img, 8, 6))


def _interlaced_png(pixels: np.ndarray, ctype: int, filter_type: int = 0):
    """Independent Adam7 writer: split into the seven passes, filter
    each pass's rows (filter 0 or 2 — 2 exercises the per-pass
    prev-row reset), concatenate."""
    adam7 = [
        (0, 0, 8, 8),
        (4, 0, 8, 8),
        (0, 4, 4, 8),
        (2, 0, 4, 4),
        (0, 2, 2, 4),
        (1, 0, 2, 2),
        (0, 1, 1, 2),
    ]
    h, w = pixels.shape[:2]
    px3 = pixels if pixels.ndim == 3 else pixels[:, :, None]
    body = b""
    for x0, y0, dx, dy in adam7:
        sub = px3[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        rows = sub.reshape(sub.shape[0], -1).astype(np.int16)
        if filter_type == 2:
            filt = rows.copy()
            filt[1:] -= rows[:-1]
        else:
            filt = rows
        body += b"".join(
            bytes([filter_type]) + (r % 256).astype(np.uint8).tobytes()
            for r in filt
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 2])
def test_adam7_interlaced_decode(filter_type):
    for h, w, seed in [(1, 1, 1), (3, 3, 2), (5, 7, 3), (8, 8, 4), (16, 13, 5)]:
        img = _img(h, w, seed)
        out = decode_png(_interlaced_png(img, ctype=2, filter_type=filter_type))
        np.testing.assert_array_equal(out, img)


def test_adam7_grayscale():
    g = np.arange(9 * 11, dtype=np.uint8).reshape(9, 11)
    out = decode_png(_interlaced_png(g, ctype=0))
    np.testing.assert_array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_adam7_wrong_length_rejected():
    # an interlaced stream with trailing junk bytes must fail loudly
    rebuilt = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 7))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="wrong length"):
        decode_png(rebuilt)


def test_media_golden_carries_png_kind():
    # the driver-checked media_features golden must keep all three
    # decode seams non-degenerate (CLAUDE.md fixture-profile rationale)
    import os

    import pyarrow.parquet as pq

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures/goldens/sf0.001/media_features_feat.parquet",
    )
    if not os.path.exists(path):
        pytest.skip("goldens not generated")
    t = pq.read_table(path)
    kinds = set(t["kind"].to_pylist())
    assert {"feat", "wav", "png", "gif", "jpeg", "jprog", "flac"} <= kinds
    # in-golden cross-checks: progressive rows must EQUAL the
    # baseline-jpeg rows (same pixels through the SOF2 path) and the
    # flac rows must EQUAL the wav rows (lossless compressed audio)
    df = t.to_pandas()
    for a, b in (("jpeg", "jprog"), ("wav", "flac")):
        x = df[df.kind == a].sort_values(["url", "idx", "value"])
        y = df[df.kind == b].sort_values(["url", "idx", "value"])
        assert (x["value"].values == y["value"].values).all(), (a, b)
    vals = np.array(
        [v for k, v in zip(t["kind"].to_pylist(), t["value"].to_pylist()) if k == "png"]
    )
    assert vals.size and vals.std() > 0
    # the resize seam too: transform_media carries kind='png' rows whose
    # values are crcs of DECODED pixels (zlib-build-independent)
    t2 = pq.read_table(
        os.path.join(os.path.dirname(path), "transform_media.parquet")
    )
    pv = [
        v
        for k, v in zip(t2["kind"].to_pylist(), t2["value"].to_pylist())
        if k == "png"
    ]
    assert pv and len(set(pv)) > 1


def test_png_bmp_cross_transcode():
    img = _img(11, 13, seed=9)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(decode_png(encode_png(img)))), img)
