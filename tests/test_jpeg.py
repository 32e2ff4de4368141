"""jpegcodec: from-scratch baseline JPEG. Round trips bound the loss;
the zigzag order, Annex K Huffman codes, DCT and color transform are
each pinned against independently hard-coded spec values so a shared
encoder/decoder error cannot cancel out; hand-built 4:2:0 and
restart-marker streams cover the decoder paths our encoder never emits."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from shaclapi_ray.pipelines.jpegcodec import (
    _C,
    HUFF_DC_LUMA,
    ZIGZAG,
    _BitWriter,
    _canonical_codes,
    _encode_block,
    decode_jpeg,
    encode_jpeg,
)

# ---------------------------------------------------------------------------
# independent spec pins (anti-cancellation)
# ---------------------------------------------------------------------------


def test_zigzag_matches_spec():
    # T.81 Figure A.6, re-derived here by walking the diagonals
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(-1, s - 8), -1) if s % 2 else range(
            max(0, s - 7), min(s, 7) + 1
        )
        for i in rng:
            r, c = (i, s - i) if s % 2 == 0 else (i, s - i)
        # walk properly below
    # explicit diagonal walk: even diagonals go up-right, odd go down-left
    order = []
    r = c = 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    np.testing.assert_array_equal(ZIGZAG, np.array(order))


def test_dct_matrix_against_cosine_sum():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 8))
    got = _C @ x @ _C.T
    exp = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
            cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
            s = 0.0
            for i in range(8):
                for j in range(8):
                    s += (
                        x[i, j]
                        * np.cos((2 * i + 1) * u * np.pi / 16)
                        * np.cos((2 * j + 1) * v * np.pi / 16)
                    )
            exp[u, v] = cu * cv * s
    np.testing.assert_allclose(got, exp, atol=1e-10)
    np.testing.assert_allclose(_C @ _C.T, np.eye(8), atol=1e-12)


def test_annex_k_dc_luma_codes():
    # T.81 Table K.3: category -> (code length, code bits)
    codes = _canonical_codes(*HUFF_DC_LUMA)
    expected = {
        0: (0b00, 2),
        1: (0b010, 3),
        2: (0b011, 3),
        3: (0b100, 3),
        4: (0b101, 3),
        5: (0b110, 3),
        6: (0b1110, 4),
        7: (0b11110, 5),
        8: (0b111110, 6),
        9: (0b1111110, 7),
        10: (0b11111110, 8),
        11: (0b111111110, 9),
    }
    assert codes == expected


def test_color_transform_known_points():
    # pure white / black / red through encode->decode at quality 100
    for rgbv, tol in [((255, 255, 255), 1), ((0, 0, 0), 1), ((255, 0, 0), 3)]:
        img = np.full((8, 8, 3), rgbv, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert np.abs(out.astype(int) - np.array(rgbv)).max() <= tol


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


def test_flat_block_exact():
    img = np.full((8, 8, 3), 128, np.uint8)
    np.testing.assert_array_equal(decode_jpeg(encode_jpeg(img, quality=95)), img)


def test_smooth_gradient_tight_bound():
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack(
        [np.clip(x * 4, 0, 255), np.clip(y * 6, 0, 255), np.clip(120 + x - y, 0, 255)],
        axis=2,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_noise_bound_and_odd_sizes():
    rng = np.random.default_rng(1)
    for h, w in [(24, 24), (13, 9), (8, 17), (1, 1)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 8


def test_grayscale_roundtrip():
    g = np.clip(np.mgrid[0:16, 0:16][0] * 8, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (16, 16, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 2
    np.testing.assert_array_equal(out[:, :, 0], out[:, :, 1])


def test_quality_monotone():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    errs = []
    for q in (30, 60, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]
    assert len(encode_jpeg(img, 30)) < len(encode_jpeg(img, 95))


def test_rejections():
    img = np.zeros((4, 4, 3), np.uint8)
    raw = bytearray(encode_jpeg(img))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"GIF87a" + bytes(raw)[6:])
    # flip SOF0 -> SOF3 (lossless — unsupported frame type)
    i = bytes(raw).find(b"\xff\xc0")
    raw[i + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF0/SOF1.*SOF2"):
        decode_jpeg(bytes(raw))
    # SOF2-labelled stream with a baseline full-band scan header is
    # malformed progressive (DC scan must have Se == 0) — still loud
    raw[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se == 0"):
        decode_jpeg(bytes(raw))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(img, quality=0)


# ---------------------------------------------------------------------------
# hand-built streams for decoder-only paths (4:2:0, restart markers)
# ---------------------------------------------------------------------------


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dqt_ones(tid):
    return _seg(0xDB, bytes([tid]) + b"\x01" * 64)


def _dht_all():
    from shaclapi_ray.pipelines.jpegcodec import (
        HUFF_AC_CHROMA,
        HUFF_AC_LUMA,
        HUFF_DC_CHROMA,
    )

    out = b""
    for cls, tid, (bits, vals) in (
        (0, 0, HUFF_DC_LUMA),
        (0, 1, HUFF_DC_CHROMA),
        (1, 0, HUFF_AC_LUMA),
        (1, 1, HUFF_AC_CHROMA),
    ):
        out += _seg(0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))
    return out


def _flat_zz(level_shifted_val):
    zz = np.zeros(64, np.int64)
    zz[0] = 8 * level_shifted_val  # DC of a flat block under q=1
    return zz


def test_hand_built_420_stream():
    from shaclapi_ray.pipelines.jpegcodec import (
        HUFF_AC_CHROMA,
        HUFF_AC_LUMA,
        HUFF_DC_CHROMA,
    )

    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)
    # one 16x16 MCU: 4 Y blocks (TL,TR,BL,BR) + 1 Cb + 1 Cr (all flat)
    yvals = [-64, -32, 0, 32]  # level-shifted per quadrant
    cb, cr = 10, -20
    w = _BitWriter()
    prev = 0
    for v in yvals:
        prev = _encode_block(w, _flat_zz(v), prev, dc_l, ac_l)
    _encode_block(w, _flat_zz(cb), 0, dc_c, ac_c)
    _encode_block(w, _flat_zz(cr), 0, dc_c, ac_c)
    w.flush()
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += struct.pack(">BBB", 1, 0x22, 0)  # Y: h=2, v=2
    sof += struct.pack(">BBB", 2, 0x11, 1)
    sof += struct.pack(">BBB", 3, 0x11, 1)
    sos = b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    raw = (
        b"\xff\xd8"
        + _dqt_ones(0)
        + _dqt_ones(1)
        + _seg(0xC0, sof)
        + _dht_all()
        + _seg(0xDA, sos)
        + bytes(w.out)
        + b"\xff\xd9"
    )
    out = decode_jpeg(raw).astype(float)
    # expected: per-quadrant Y (+128), flat chroma, JFIF inverse
    for qi, (y0, x0) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
        yv = yvals[qi] + 128
        exp_r = np.clip(yv + 1.402 * cr, 0, 255)
        exp_g = np.clip(yv - 0.344136 * cb - 0.714136 * cr, 0, 255)
        exp_b = np.clip(yv + 1.772 * cb, 0, 255)
        quad = out[y0 : y0 + 8, x0 : x0 + 8]
        assert np.abs(quad[:, :, 0] - exp_r).max() <= 1
        assert np.abs(quad[:, :, 1] - exp_g).max() <= 1
        assert np.abs(quad[:, :, 2] - exp_b).max() <= 1


def test_hand_built_restart_markers():
    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    from shaclapi_ray.pipelines.jpegcodec import HUFF_AC_LUMA

    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    # grayscale 8x16 = two MCUs, restart interval 1: RST0 between them,
    # DC predictor must reset (second block coded from 0, not from -800)
    w1 = _BitWriter()
    _encode_block(w1, _flat_zz(-100), 0, dc_l, ac_l)
    w1.flush()
    w2 = _BitWriter()
    _encode_block(w2, _flat_zz(50), 0, dc_l, ac_l)  # fresh predictor
    w2.flush()
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + struct.pack(">BBB", 1, 0x11, 0)
    sos = b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00"
    raw = (
        b"\xff\xd8"
        + _dqt_ones(0)
        + _seg(0xC0, sof)
        + _dht_all()
        + _seg(0xDD, struct.pack(">H", 1))
        + _seg(0xDA, sos)
        + bytes(w1.out)
        + b"\xff\xd0"
        + bytes(w2.out)
        + b"\xff\xd9"
    )
    out = decode_jpeg(raw)
    assert abs(int(out[0, 0, 0]) - 28) <= 1  # -100+128
    assert abs(int(out[0, 8, 0]) - 178) <= 1  # 50+128


def test_featurize_and_resize_jpeg(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.multimodal import featurize_media, resize_media

    y, x = np.mgrid[0:24, 0:20]
    img = np.stack(
        [np.clip(x * 8, 0, 255), np.clip(y * 8, 0, 255), np.full_like(x, 60)], axis=2
    ).astype(np.uint8)
    ds = ray.data.from_arrow(
        pa.table({"url": ["a"], "html": [encode_jpeg(img, quality=95)]})
    )
    f = featurize_media(ds, decode_stub="jpeg").to_pandas()
    feat = f["feature"].iloc[0]
    assert feat[0] == 20 and feat[1] == 24  # true dimensions
    out = resize_media(ds, width=10, height=6, decode_stub="jpeg").to_pandas()
    got = decode_jpeg(out["media"].iloc[0])
    assert got.shape == (6, 10, 3)
