"""gifcodec: from-scratch variable-width LZW GIF decode/encode and its
multimodal seam integration (decode_stub='gif')."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from shaclapi_ray.pipelines.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from shaclapi_ray.pipelines.multimodal import featurize_media, resize_media


def _img(h, w, ncolors, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
    return pal[rng.integers(0, ncolors, (h, w))]


def test_lzw_roundtrip_exercises_width_growth():
    rng = np.random.default_rng(1)
    for n, alphabet in [(10, 4), (500, 4), (5000, 16), (20000, 64)]:
        idx = rng.integers(0, alphabet, n).astype(np.uint8)
        min_code = max(2, int(alphabet - 1).bit_length())
        got = _lzw_decode(_lzw_encode(idx, min_code), min_code, n)
        np.testing.assert_array_equal(got, idx)


def test_lzw_dictionary_reset_at_4096():
    # long low-entropy stream forces the dictionary past 4096 entries
    idx = np.tile(np.arange(8, dtype=np.uint8), 4000)
    got = _lzw_decode(_lzw_encode(idx, 3), 3, idx.size)
    np.testing.assert_array_equal(got, idx)


def test_lzw_kwkwk_case():
    # 'aaaa...' is the canonical KwKwK trigger (code == next table slot)
    idx = np.zeros(50, np.uint8)
    got = _lzw_decode(_lzw_encode(idx, 2), 2, 50)
    np.testing.assert_array_equal(got, idx)


@pytest.mark.parametrize("h,w,ncolors", [(1, 1, 1), (5, 7, 2), (16, 16, 8), (23, 11, 200)])
def test_gif_roundtrip(h, w, ncolors):
    img = _img(h, w, ncolors, seed=h * 31 + w)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_gif_too_many_colors_rejected():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (20, 20, 3)).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_gif89a_with_extensions_and_local_table():
    # hand-build a GIF89a: graphics-control extension + local color table
    img = _img(4, 6, 3, seed=9)
    base = bytearray(encode_gif(img))
    # splice: header says 89a, insert an extension before the descriptor
    out = bytearray(b"GIF89a") + base[6:13]
    n_table = 2 << (base[10] & 7)
    gct = base[13 : 13 + 3 * n_table]
    rest = base[13 + 3 * n_table :]
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])  # GCE + terminator
    out += gct + ext + rest
    np.testing.assert_array_equal(decode_gif(bytes(out)), img)


def test_gif_interlaced_decode():
    # build an interlaced variant: reorder rows into pass order and set
    # the interlace flag; decode must scatter them back
    img = _img(13, 5, 4, seed=3)
    h = img.shape[0]
    rows = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    raw = bytearray(encode_gif(img[rows]))  # pass-order image, same palette
    # image descriptor packed byte: offset = 13 + 3*gct + 9th byte of 0x2C block
    n_table = 2 << (raw[10] & 7)
    desc = 13 + 3 * n_table
    assert raw[desc] == 0x2C
    raw[desc + 9] |= 0x40  # set interlace flag
    np.testing.assert_array_equal(decode_gif(bytes(raw)), img)


def test_gif_corruption_rejected():
    img = _img(6, 6, 4, seed=5)
    raw = encode_gif(img)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG" + raw[3:])
    with pytest.raises(ValueError, match="wrong length|truncated|corrupt"):
        decode_gif(raw[: len(raw) // 2] + b"\x00\x3b")


def test_featurize_and_resize_gif(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.multimodal import _nn_resize, decode_bmp, encode_bmp

    imgs = [_img(20, 17, 12, s) for s in range(3)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": [f"u{i}" for i in range(3)],
                "html": [encode_gif(im) for im in imgs],
            }
        )
    )
    f_gif = featurize_media(ds, decode_stub="gif").to_pandas().sort_values("url")
    ds_bmp = ray.data.from_arrow(
        pa.table(
            {
                "url": [f"u{i}" for i in range(3)],
                "html": [encode_bmp(im) for im in imgs],
            }
        )
    )
    f_bmp = featurize_media(ds_bmp, decode_stub="bmp").to_pandas().sort_values("url")
    for a, b in zip(f_gif["feature"], f_bmp["feature"]):
        np.testing.assert_allclose(a, b)  # identical pixels -> identical features
    out = resize_media(ds, width=8, height=5, decode_stub="gif").to_pandas()
    got = decode_gif(out["media"].iloc[0])
    np.testing.assert_array_equal(got, _nn_resize(imgs[0], 8, 5))
