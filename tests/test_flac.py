"""flaccodec: real FLAC decode — lossless round trips through the
subset encoder (constant/verbatim/fixed+rice), hand-built streams for
every decoder path the encoder cannot emit (LPC, wasted bits, stereo
decorrelation, partition orders, 5-bit params, raw-bits escape), and
the wav-equivalence + multimodal seam checks."""

import numpy as np
import pyarrow as pa
import pytest

from shaclapi_ray.pipelines.flaccodec import (
    _BitW,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def _sig(n, seed=0, amp=3000, ch=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    base = (amp * np.sin(t / 7.0)).astype(np.int64)
    out = np.stack(
        [base + rng.integers(-40, 41, n) for _ in range(ch)], axis=1
    ).astype(np.int16)
    return out if ch > 1 else out[:, 0]


def test_roundtrip_mono_and_stereo():
    for n, ch, seed in [(100, 1, 1), (4096, 1, 2), (5000, 2, 3), (12000, 2, 4)]:
        x = _sig(n, seed, ch=ch)
        got, rate = decode_flac(encode_flac(x, rate=22050))
        assert rate == 22050
        ref = x if x.ndim == 2 else x[:, None]
        np.testing.assert_array_equal(got, ref.astype(np.int32))


def test_roundtrip_constant_and_noise_blocks():
    # constant blocks take the CONSTANT subframe; white noise falls back
    # to VERBATIM; the smooth signal uses FIXED+rice — all three in one
    # stream across blocks
    rng = np.random.default_rng(5)
    x = np.concatenate(
        [
            np.full(4096, 123, np.int16),
            rng.integers(-30000, 30000, 4096).astype(np.int16),
            _sig(4096, 6),
        ]
    )
    got, _ = decode_flac(encode_flac(x))
    np.testing.assert_array_equal(got[:, 0], x.astype(np.int32))


def test_compression_actually_happens():
    x = _sig(16384, 7)
    raw = encode_flac(x)
    assert len(raw) < x.size * 2 * 0.8  # fixed+rice beats raw PCM


def _flac_stream(streaminfo_bps, nch, total, frame_bits: _BitW, rate=16000):
    si = _BitW()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(streaminfo_bps - 1, 5)
    si.write(total, 36)
    body = bytes(si.out) + b"\x00" * 16
    return (
        b"fLaC"
        + bytes([0x80])
        + len(body).to_bytes(3, "big")
        + body
        + bytes(frame_bits.out)
    )


def _frame_header(w, nch_code, bs, bps_code=4):
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)  # 16-bit blocksize follows
    w.write(0, 4)  # rate from streaminfo
    w.write(nch_code, 4)
    w.write(bps_code, 3)
    w.write(0, 1)
    for byte in _utf8_number(0):
        w.write(byte, 8)
    w.write(bs - 1, 16)
    w.write(0, 8)  # crc8


def test_hand_built_lpc_subframe():
    # order-2 LPC, coefs [3, -1], shift 1: s[i] = (3*s[i-1] - s[i-2])>>1 + res
    warm = [100, 110]
    res = [5, -3, 0, 7]
    w = _BitW()
    _frame_header(w, 0, 6)
    w.write(0, 1)
    w.write(33, 6)  # LPC order 2 (32 + order-1)
    w.write(0, 1)  # no wasted bits
    w.write_signed(100, 16)
    w.write_signed(110, 16)
    w.write(3, 4)  # precision-1 -> 4 bits
    w.write_signed(1, 5)  # shift
    w.write_signed(3, 4)
    w.write_signed(-1, 4)
    w.write(0, 2)  # rice method 0
    w.write(0, 4)  # partition order 0
    w.write(0, 4)  # k = 0
    for v in res:
        zz = (v << 1) if v >= 0 else ((-v << 1) - 1)
        for _ in range(zz):
            w.write(0, 1)
        w.write(1, 1)
    w.align()
    w.write(0, 16)
    got, _ = decode_flac(_flac_stream(16, 1, 6, w))
    exp = [100, 110]
    for r in res:
        exp.append(((3 * exp[-1] - exp[-2]) >> 1) + r)
    np.testing.assert_array_equal(got[:, 0], np.array(exp, np.int32))


def test_hand_built_wasted_bits_and_escape():
    # constant subframe with 2 wasted bits: value coded at bps-2, output
    # shifted left by 2; second frame uses the raw-bits escape partition
    w = _BitW()
    _frame_header(w, 0, 3)
    w.write(0, 1)
    w.write(0, 6)  # CONSTANT
    w.write(1, 1)  # wasted flag
    w.write(0, 1)  # unary: one zero ...
    w.write(1, 1)  # ... then the stop bit -> wasted = 2
    w.write_signed(25, 14)  # bps 16 - 2
    w.align()
    w.write(0, 16)
    got, _ = decode_flac(_flac_stream(16, 1, 3, w))
    np.testing.assert_array_equal(got[:, 0], np.full(3, 100, np.int32))  # 25 << 2

    w2 = _BitW()
    _frame_header(w2, 0, 4)
    w2.write(0, 1)
    w2.write(8, 6)  # FIXED order 0
    w2.write(0, 1)
    w2.write(0, 2)  # method 0
    w2.write(0, 4)  # po 0
    w2.write(15, 4)  # escape
    w2.write(7, 5)  # raw 7-bit residuals
    for v in (1, -2, 3, -4):
        w2.write_signed(v, 7)
    w2.align()
    w2.write(0, 16)
    got2, _ = decode_flac(_flac_stream(16, 1, 4, w2))
    np.testing.assert_array_equal(got2[:, 0], np.array([1, -2, 3, -4], np.int32))


def test_hand_built_partition_order():
    # FIXED order 0, blocksize 8, partition order 1 -> two partitions
    # with different k (0 and 2)
    vals = [0, 1, -1, 2, 4, -4, 8, -8]
    w = _BitW()
    _frame_header(w, 0, 8)
    w.write(0, 1)
    w.write(8, 6)
    w.write(0, 1)
    w.write(0, 2)
    w.write(1, 4)  # po = 1
    # partition 1: first 4 residuals, k=0
    w.write(0, 4)
    for v in vals[:4]:
        zz = (v << 1) if v >= 0 else ((-v << 1) - 1)
        for _ in range(zz):
            w.write(0, 1)
        w.write(1, 1)
    # partition 2: k=2
    w.write(2, 4)
    for v in vals[4:]:
        zz = (v << 1) if v >= 0 else ((-v << 1) - 1)
        q, rbits = zz >> 2, zz & 3
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        w.write(rbits, 2)
    w.align()
    w.write(0, 16)
    got, _ = decode_flac(_flac_stream(16, 1, 8, w))
    np.testing.assert_array_equal(got[:, 0], np.array(vals, np.int32))


@pytest.mark.parametrize("mode", [8, 9, 10])
def test_hand_built_stereo_decorrelation(mode):
    left = np.array([100, 102, 98, 96], np.int64)
    right = np.array([90, 95, 99, 101], np.int64)
    side = left - right
    mid = (left + right) >> 1
    w = _BitW()
    _frame_header(w, mode, 4)

    def verbatim(vals, bits):
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in vals:
            w.write_signed(int(v), bits)

    if mode == 8:  # left/side
        verbatim(left, 16)
        verbatim(side, 17)
    elif mode == 9:  # side/right
        verbatim(side, 17)
        verbatim(right, 16)
    else:  # mid/side
        verbatim(mid, 16)
        verbatim(side, 17)
    w.align()
    w.write(0, 16)
    got, _ = decode_flac(_flac_stream(16, 2, 4, w))
    np.testing.assert_array_equal(got[:, 0], left.astype(np.int32))
    np.testing.assert_array_equal(got[:, 1], right.astype(np.int32))


def test_wav_flac_feature_equivalence(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.multimodal import encode_wav, featurize_media

    xs = [_sig(3000, s, ch=2) for s in range(3)]
    t_wav = pa.table(
        {
            "url": [f"u{i}" for i in range(3)],
            "html": [encode_wav(x, 16000) for x in xs],
        }
    )
    t_flac = pa.table(
        {
            "url": [f"u{i}" for i in range(3)],
            "html": [encode_flac(x, 16000) for x in xs],
        }
    )
    f_wav = (
        featurize_media(ray.data.from_arrow(t_wav), decode_stub="wav")
        .to_pandas()
        .sort_values("url")
    )
    f_flac = (
        featurize_media(ray.data.from_arrow(t_flac), decode_stub="flac")
        .to_pandas()
        .sort_values("url")
    )
    for a, b in zip(f_wav["feature"], f_flac["feature"]):
        np.testing.assert_allclose(a, b)  # lossless -> identical features


def test_loud_valueerror_contract():
    x = _sig(2000, 9)
    raw = encode_flac(x)
    assert decode_flac(raw)[0].shape == (2000, 1)
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFF" + raw[4:])
    for cut in range(0, len(raw), 7):
        try:
            decode_flac(raw[:cut])
        except ValueError:
            pass
    for i in range(0, len(raw), 11):
        bad = bytearray(raw)
        bad[i] ^= 0x55
        try:
            decode_flac(bytes(bad))
        except ValueError:
            pass
