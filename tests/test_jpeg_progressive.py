"""Progressive (SOF2) JPEG decode: exact equality with the baseline
decode on shared coefficients, EOB-run coalescing, DC successive
approximation round trips, and a hand-built AC-refinement scan checked
against hand-derived coefficients."""

import struct

import numpy as np
import pytest

from shaclapi_ray.pipelines.jpegcodec import (
    _C,
    HUFF_AC_LUMA,
    HUFF_DC_LUMA,
    ZIGZAG,
    _BitWriter,
    _canonical_codes,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_progressive_equals_baseline_exactly():
    # same quantized coefficients, different scan order -> identical pixels
    for h, w, seed in [(8, 8, 1), (16, 24, 2), (13, 9, 3), (40, 33, 4)]:
        img = _img(h, w, seed)
        base = decode_jpeg(encode_jpeg(img, quality=85))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=85))
        np.testing.assert_array_equal(prog, base)


def test_dc_successive_approximation_roundtrip():
    for seed in (5, 6):
        img = _img(24, 16, seed)
        base = decode_jpeg(encode_jpeg(img, quality=80))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=80, dc_approx=True))
        np.testing.assert_array_equal(prog, base)


def test_eob_run_coalescing():
    # large flat regions -> many empty AC bands -> EOBn runs > 1
    img = np.full((64, 64, 3), 90, np.uint8)
    img[0:8, 0:8] = 200  # one busy block per component
    raw = encode_jpeg_progressive(img, quality=85)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    np.testing.assert_array_equal(decode_jpeg(raw), base)
    # the progressive stream should be written with EOBn coalescing:
    # far fewer AC symbols than one-EOB-per-block would need
    assert len(raw) < len(encode_jpeg(img, quality=85)) + 200


def test_progressive_smooth_image_loss_bound():
    y, x = np.mgrid[0:32, 0:24]
    img = np.stack(
        [np.clip(x * 8, 0, 255), np.clip(y * 8, 0, 255), np.full_like(x, 77)], axis=2
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(img, quality=95))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def test_hand_built_ac_refinement():
    """Single 8x8 grayscale block, q=1 everywhere, coefficients
    (zigzag) [0, 5, -3, 0, 1, 0...]: first AC scan at Al=1 codes the
    truncated-toward-zero halves [2, -1, 0, 0], the Ah=1 refinement
    carries the low bits — symbol/bit stream hand-derived from T.81
    G.1.2.3. The decoded pixels must match the IDCT of the exact
    coefficients."""
    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)

    def dht_all():
        from shaclapi_ray.pipelines.jpegcodec import HUFF_DC_CHROMA, HUFF_AC_CHROMA

        out = b""
        for cls, tid, (bits, vals) in (
            (0, 0, HUFF_DC_LUMA),
            (1, 0, HUFF_AC_LUMA),
        ):
            out += _seg(0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))
        return out

    # scan 1: DC, Ss=0 Se=0 Ah=0 Al=0 — category 0 (DC stays 0)
    w1 = _BitWriter()
    code, ln = dc_l[0]
    w1.write(code, ln)
    w1.flush()
    # scan 2: AC first pass Ss=1 Se=63 Ah=0 Al=1 — values t=[2,-1] at k=1,2
    w2 = _BitWriter()
    for run, v in ((0, 2), (0, -1)):
        cat, bits = _magnitude(v)
        code, ln = ac_l[(run << 4) | cat]
        w2.write(code, ln)
        w2.write(bits, cat)
    code, ln = ac_l[0x00]  # EOB
    w2.write(code, ln)
    w2.flush()
    # scan 3: AC refinement Ss=1 Se=63 Ah=1 Al=0:
    #   symbol (r=1, s=1) + sign(positive) for the new coef at k=4,
    #   correction bits 1 (k=1: 5 has low bit 1) and 1 (k=2: -3 low bit),
    #   then EOB (r=0) covering the rest of the band
    w3 = _BitWriter()
    code, ln = ac_l[0x11]
    w3.write(code, ln)
    w3.write(1, 1)  # sign: positive -> +1
    w3.write(1, 1)  # correction for k=1 (2<<1=4 -> 5)
    w3.write(1, 1)  # correction for k=2 (-1<<1=-2 -> -3)
    code, ln = ac_l[0x00]
    w3.write(code, ln)
    w3.flush()

    sof = struct.pack(">BHHB", 8, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0)
    raw = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + b"\x01" * 64)  # q = all ones
        + _seg(0xC2, sof)
        + dht_all()
        + _seg(0xDA, b"\x01" + bytes([1, 0x00]) + bytes([0, 0, 0x00]))
        + bytes(w1.out)
        + _seg(0xDA, b"\x01" + bytes([1, 0x00]) + bytes([1, 63, 0x01]))
        + bytes(w2.out)
        + _seg(0xDA, b"\x01" + bytes([1, 0x00]) + bytes([1, 63, 0x10]))
        + bytes(w3.out)
        + b"\xff\xd9"
    )
    got = decode_jpeg(raw)
    # expected: IDCT of the exact coefficient block
    zz = np.zeros(64, np.int64)
    zz[1], zz[2], zz[4] = 5, -3, 1
    nat = np.zeros(64, np.int64)
    nat[ZIGZAG] = zz
    pix = _C.T @ nat.reshape(8, 8).astype(np.float64) @ _C
    exp = np.clip(pix + 128.0, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got[:, :, 0], exp)
    np.testing.assert_array_equal(got[:, :, 0], got[:, :, 1])


def test_hand_built_eobrun_gt_one():
    """eobrun > 1 needs EOBn symbols the Annex K tables don't define —
    build a custom one-symbol AC table (code '0' -> 0x20, i.e. EOB4)
    over a 4-block DC-only grayscale image: one symbol + two extra bits
    must cover all four blocks' AC bands."""
    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    # DC scan: 4 blocks with DC values 8, 16, 24, 32 (diffs of 8)
    w1 = _BitWriter()
    prev = 0
    for dc in (8, 16, 24, 32):
        cat, bits = _magnitude(dc - prev)
        code, ln = dc_l[cat]
        w1.write(code, ln)
        w1.write(bits, cat)
        prev = dc
    w1.flush()
    # AC scan: single EOBn symbol 0x20 (custom table: 1-bit code '0'),
    # extra bits '00' -> eobrun = (1<<2)-1+0 = 3 -> covers 4 blocks
    w2 = _BitWriter()
    w2.write(0, 1)
    w2.write(0, 2)
    w2.flush()
    ac_bits = [1] + [0] * 15
    sof = struct.pack(">BHHB", 8, 8, 32, 1) + struct.pack(">BBB", 1, 0x11, 0)
    raw = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + b"\x01" * 64)
        + _seg(0xC2, sof)
        + _seg(
            0xC4,
            bytes([0x00]) + bytes(HUFF_DC_LUMA[0]) + bytes(HUFF_DC_LUMA[1]),
        )
        + _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x20]))
        + _seg(0xDA, b"\x01" + bytes([1, 0x00]) + bytes([0, 0, 0x00]))
        + bytes(w1.out)
        + _seg(0xDA, b"\x01" + bytes([1, 0x00]) + bytes([1, 63, 0x00]))
        + bytes(w2.out)
        + b"\xff\xd9"
    )
    got = decode_jpeg(raw)
    assert got.shape == (8, 32, 3)
    # DC-only blocks: each 8x8 block is flat at dc/8 + 128
    for bi, dc in enumerate((8, 16, 24, 32)):
        block = got[:, bi * 8 : (bi + 1) * 8, 0].astype(int)
        assert (block == dc // 8 + 128).all(), bi


def test_progressive_fuzz_loud_valueerror():
    raw = encode_jpeg_progressive(_img(10, 12, 9), quality=80)
    assert decode_jpeg(raw).shape == (10, 12, 3)
    for cut in range(0, len(raw), 3):
        try:
            decode_jpeg(raw[:cut])
        except ValueError:
            pass
    for i in range(0, len(raw), 3):
        bad = bytearray(raw)
        bad[i] ^= 0xA5
        try:
            decode_jpeg(bytes(bad))
        except ValueError:
            pass
