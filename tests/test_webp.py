"""webpcodec.py: the from-scratch WebP-lossless (VP8L) codec — every
decoder kernel driven through real encode->decode roundtrips (the
encode_png filter_type pattern), hand-built bitstream vectors for the
paths the encoder never emits (repeat codes), the loud-ValueError
contract, and the multimodal seam."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from shaclapi_ray.pipelines.webpcodec import (
    _BitReader,
    _BitWriter,
    _PrefixCode,
    _prefix_decode,
    _prefix_encode,
    _read_prefix_code,
    decode_webp_lossless,
    encode_webp_lossless,
)


def _rng_img(seed, h, w):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_plain_roundtrip():
    img = _rng_img(0, 12, 17)
    assert np.array_equal(decode_webp_lossless(encode_webp_lossless(img)), img)


@pytest.mark.parametrize("mode", range(14))
def test_every_predictor_mode_roundtrips(mode):
    img = _rng_img(mode + 1, 11, 13)
    out = decode_webp_lossless(encode_webp_lossless(img, predictor=mode))
    assert np.array_equal(out, img), f"predictor {mode}"


def test_subtract_green_and_color_transform():
    img = _rng_img(7, 9, 14)
    for kw in (
        dict(subtract_green=True),
        dict(color_transform=(17, 250, 5)),
        dict(color_transform=(3, 7, 9), subtract_green=True),
    ):
        assert np.array_equal(
            decode_webp_lossless(encode_webp_lossless(img, **kw)), img
        )


@pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 17, 200])
def test_palette_all_bundling_widths(n_colors):
    """<=2 -> 8 indices/byte, <=4 -> 4, <=16 -> 2, else plain — each
    bundling width plus non-multiple widths hit the truncation path."""
    rng = np.random.default_rng(n_colors)
    colors = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    idx = rng.integers(0, n_colors, (7, 11))
    img = colors[idx]
    out = decode_webp_lossless(encode_webp_lossless(img, palette=True))
    assert np.array_equal(out, img)


def test_cache_and_lz77():
    tile = np.array([[10, 200, 30], [10, 200, 30], [90, 14, 77]], np.uint8)
    img = np.tile(tile, (6, 5, 1))[:13, :9]
    for kw in (
        dict(cache_bits=4),
        dict(use_lz77=True),
        dict(use_lz77=True, cache_bits=5),
        dict(subtract_green=True, use_lz77=True, cache_bits=3),
    ):
        assert np.array_equal(
            decode_webp_lossless(encode_webp_lossless(img, **kw)), img
        )


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    knob=st.integers(0, 5),
)
def test_property_roundtrip_any_image(seed, h, w, knob):
    img = _rng_img(seed, h, w)
    kw = [
        {},
        dict(subtract_green=True),
        dict(predictor=seed % 14),
        dict(use_lz77=True, cache_bits=4),
        dict(color_transform=(seed % 256, (seed // 7) % 256, (seed // 11) % 256)),
        dict(subtract_green=True, predictor=11),
    ][knob]
    out = decode_webp_lossless(encode_webp_lossless(img, **kw))
    assert np.array_equal(out, img)


def test_prefix_value_coding_involutes():
    for v in list(range(1, 70)) + [127, 128, 1000, 4096]:
        sym, extra_v, extra_n = _prefix_encode(v)
        bw = _BitWriter()
        bw.write(extra_v, extra_n)
        br = _BitReader(bw.getvalue() or b"\x00")
        assert _prefix_decode(br, sym) == v


def test_repeat_codes_16_17_18():
    """The encoder writes lengths literally, so the 16/17/18 repeat
    paths need hand-built vectors: a normal code whose lengths are
    emitted via repeats must decode to the same table."""
    # target: 280-symbol alphabet, symbols 0..255 length 8, rest 0
    bw = _BitWriter()
    bw.write(0, 1)  # normal form
    # CLC: symbols used: 8 (len), 16 (repeat prev), 18 (zero-run)
    # order: 17,18,0,1,2,3,4,5,16,6,7,8,... -> need up to position of 8
    clc = {8: 1, 16: 2, 18: 2}
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8)
    bw.write(len(order) - 4, 4)
    for s in order:
        bw.write(clc.get(s, 0), 3)
    bw.write(0, 1)  # no max-symbol limit
    # canonical codes over lengths {8:1,16:2,18:2}: 8 -> 0; 16 -> 10; 18 -> 11
    def put(sym):
        if sym == 8:
            bw.write(0b0, 1)
        elif sym == 16:
            bw.write(0b01, 2)  # LSB-first of MSB code 10
        else:
            bw.write(0b11, 2)  # code 11
    put(8)  # symbol 0: length 8 (sets prev_len=8)
    emitted = 1
    while emitted < 256:
        put(16)  # repeat prev length 3..6 times
        rep = min(6, 256 - emitted)
        bw.write(rep - 3, 2)
        emitted += rep
    put(18)  # zero-run 11..138 — covers the 24 remaining
    bw.write(24 - 11, 7)
    br = _BitReader(bw.getvalue())
    code = _read_prefix_code(br, 280)
    # decode a symbol: all 256 lengths equal 8 -> canonical code of 'A'
    # (65) is 65 reversed into the stream
    from shaclapi_ray.pipelines.webpcodec import _canonical_codes, _write_code

    codes = _canonical_codes([8] * 256 + [0] * 24)
    bw2 = _BitWriter()
    _write_code(bw2, codes, 65)
    assert code.read(_BitReader(bw2.getvalue())) == 65


def test_loud_valueerror_contract():
    img = _rng_img(3, 8, 8)
    valid = encode_webp_lossless(img)
    assert decode_webp_lossless(valid).shape == img.shape
    for cut in range(len(valid)):
        try:
            decode_webp_lossless(valid[:cut])
        except ValueError:
            pass
    rng = np.random.default_rng(5)
    for i in rng.integers(0, len(valid), 200):
        bad = bytearray(valid)
        bad[int(i)] ^= 0xA5
        try:
            decode_webp_lossless(bytes(bad))
        except ValueError:
            pass


def test_lossy_and_extended_named_loudly():
    riff = lambda fourcc: (
        b"RIFF" + (len(fourcc + b"\x00" * 8) + 4).to_bytes(4, "little")
        + b"WEBP" + fourcc + b"\x00" * 8
    )
    with pytest.raises(ValueError, match="lossy"):
        decode_webp_lossless(riff(b"VP8 "))
    with pytest.raises(ValueError, match="VP8X"):
        decode_webp_lossless(riff(b"VP8X"))
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp_lossless(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)


def test_multimodal_seam_decodes_webp(ray_session):
    """decode_stub='webp' runs the real VP8L decoder through the
    featurize/resize actor pools with the per-item on_error policy."""
    import pyarrow as pa
    import ray.data

    from shaclapi_ray.pipelines.multimodal import featurize_media

    good = encode_webp_lossless(_rng_img(9, 10, 12), subtract_green=True)
    rows = [("g", good), ("bad", b"RIFFxxxxWEBPVP8L"), ("null", None)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": [r[0] for r in rows],
                "html": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
    )
    out = (
        featurize_media(ds, decode_stub="webp", on_error="flag")
        .to_pandas()
        .set_index("url")
    )
    assert bool(out.loc["g", "decode_ok"])
    assert not out.loc["bad", "decode_ok"] and not out.loc["null", "decode_ok"]
    assert len(out.loc["g", "feature"]) > 0


def test_resize_media_webp_lossless_roundtrip(ray_session):
    import pyarrow as pa
    import ray.data

    from shaclapi_ray.pipelines.multimodal import resize_media

    img = _rng_img(11, 12, 16)
    ds = ray.data.from_arrow(
        pa.table({"url": ["a"], "html": pa.array([encode_webp_lossless(img)], pa.binary())})
    )
    out = resize_media(ds, width=6, height=5, decode_stub="webp").to_pandas()
    back = decode_webp_lossless(out["media"][0])
    assert back.shape == (5, 6, 3)
    # lossless re-encode: resized pixels round-trip exactly
    from shaclapi_ray.pipelines.multimodal import _nn_resize

    assert np.array_equal(back, _nn_resize(img, 6, 5))


def test_max_pixels_guard_no_allocation():
    """A ~30-byte forged/legal header claiming 16383x16383 must raise
    from the pixel cap BEFORE any raster allocation (no payload-size
    consistency check exists for VP8L — see decode_webp_lossless)."""
    solid = encode_webp_lossless(np.zeros((1, 1, 3), np.uint8))
    # patch the dimension bits to claim 16383x16383 (14 bits each, LSB
    # first right after the signature byte inside the VP8L chunk)
    data = bytearray(solid)
    bw = _BitWriter()
    bw.write(16382, 14)
    bw.write(16382, 14)
    dims = bw.getvalue()
    off = 21  # RIFF(12) + 'VP8L'+size(8) + signature(1)
    # 28 dimension bits = 3 full bytes + the low nibble of the 4th
    data[off] = dims[0]
    data[off + 1] = dims[1]
    data[off + 2] = dims[2]
    data[off + 3] = (data[off + 3] & ~0x0F) | (dims[3] & 0x0F)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_webp_lossless(bytes(data))
    # the cap is a dial, not a constant: a legit image over a small cap
    # raises, and the explicit opt-in admits it
    img = _rng_img(1, 3, 3)
    enc = encode_webp_lossless(img)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_webp_lossless(enc, max_pixels=4)
    assert np.array_equal(decode_webp_lossless(enc, max_pixels=9), img)
