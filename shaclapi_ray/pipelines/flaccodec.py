"""Real FLAC decoder — pure numpy/stdlib, no external audio library.

Speech corpora ship FLAC (LibriSpeech, MLS, CommonVoice exports), so a
training-data engine's audio seam needs it the way the image seam needs
JPEG. This implements native FLAC (frames after the fLaC metadata
stream) from the public format spec (RFC 9639):

- decode: STREAMINFO parsing + metadata skip, frame headers (sync,
  blocksize/rate/sample-size codes, UTF-8-coded frame number, CRC-8
  field present), ALL subframe types — CONSTANT, VERBATIM, FIXED
  (orders 0-4) and LPC (any order, signed quantized coefficients +
  shift) — wasted-bits unary prefix, Rice-coded residuals with
  partition orders and both 4- and 5-bit parameter widths plus the
  raw-bits escape, and the four channel assignments (independent,
  left/side, right/side, mid/side). Returns int32 samples
  (frames, channels) + rate. Frame CRC-16 trailers are skipped (the
  bit-exact reconstruction is what tests pin); non-FLAC payloads and
  malformed streams raise ValueError (decoders' loud contract).
- encode (`encode_flac`): a correct-subset encoder for round-trip
  tests and fixtures — 16-bit, constant/verbatim subframes plus
  FIXED order-2 with real Rice coding (parameter chosen per block),
  independent channels, single partition. Every decoder path the
  encoder cannot emit (LPC, wasted bits, stereo decorrelation,
  partition orders, 5-bit params, escapes) is exercised by hand-built
  streams in tests/test_flac.py.

Like the image codecs, entropy decoding is bit-serial per frame — a
bounded Python loop feeding numpy reconstruction (the fixed/LPC
predictors vectorize per subframe via lfilter-style recurrences only
where order permits; the general recurrence runs per sample over the
block, which is the same cost contract as JPEG's Huffman loop).
"""

from __future__ import annotations

import struct

import numpy as np

_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
    8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        d = self.data
        for _ in range(n):
            if self.byte >= len(d):
                raise ValueError("truncated FLAC stream")
            v = (v << 1) | ((d[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway FLAC unary code")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(b: _Bits) -> int:
    first = b.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("bad FLAC frame number coding")
    v = first & (mask - 1)
    for _ in range(n):
        c = b.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC frame number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _rice_residual(b: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = b.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = b.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        k = b.read(plen)
        if k == escape:
            raw = b.read(5)
            for _ in range(cnt):
                out[idx] = b.read_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(cnt):
                q = b.read_unary()
                v = (q << k) | (b.read(k) if k else 0)
                out[idx] = (v >> 1) ^ -(v & 1)  # zigzag -> signed
                idx += 1
    return out


def _subframe(b: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if b.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    typ = b.read(6)
    wasted = 0
    if b.read(1):
        wasted = 1 + b.read_unary()
        bps -= wasted
    if typ == 0:  # CONSTANT
        out = np.full(blocksize, b.read_signed(bps), dtype=np.int64)
    elif typ == 1:  # VERBATIM
        out = np.array([b.read_signed(bps) for _ in range(blocksize)], np.int64)
    elif 8 <= typ <= 12:  # FIXED order 0..4
        order = typ - 8
        warm = [b.read_signed(bps) for _ in range(order)]
        res = _rice_residual(b, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = pred + res[i - order]
    elif typ >= 32:  # LPC order 1..32
        order = typ - 31
        warm = [b.read_signed(bps) for _ in range(order)]
        prec = b.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = b.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [b.read_signed(prec) for _ in range(order)]
        res = _rice_residual(b, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * int(out[i - 1 - j])
            out[i] = (pred >> shift) + res[i - order]
    else:
        raise ValueError(f"reserved FLAC subframe type {typ}")
    return out << wasted if wasted else out


def decode_flac(raw: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((frames, channels) int32 samples, sample rate)."""
    try:
        return _decode_flac_inner(raw)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"corrupt FLAC stream: {type(e).__name__}: {e}") from e


def _decode_flac_inner(raw: bytes) -> tuple[np.ndarray, int]:
    if len(raw) < 42 or raw[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    # metadata blocks
    while True:
        if pos + 4 > len(raw):
            raise ValueError("truncated FLAC metadata")
        hdr = raw[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + raw[pos + 1 : pos + 4])
        body = raw[pos + 4 : pos + 4 + ln]
        if len(body) < ln:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if ln < 34:
                raise ValueError("short FLAC STREAMINFO")
            streaminfo = body
        pos += 4 + ln
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    si = _Bits(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)
    si.read(24)
    rate = si.read(20)
    nch = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    if rate == 0:
        raise ValueError("FLAC sample rate 0")
    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    n_done = 0
    while pos < len(raw) and (total == 0 or n_done < total):
        b = _Bits(raw, pos)
        sync = b.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        b.read(1)  # reserved
        b.read(1)  # blocking strategy
        bs_code = b.read(4)
        rate_code = b.read(4)
        ch_code = b.read(4)
        sz_code = b.read(3)
        b.read(1)  # reserved
        _read_utf8_number(b)
        if bs_code == 0:
            raise ValueError("reserved FLAC blocksize code")
        elif bs_code == 6:
            blocksize = b.read(8) + 1
        elif bs_code == 7:
            blocksize = b.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if rate_code == 12:
            b.read(8)
        elif rate_code in (13, 14):
            b.read(16)
        elif rate_code == 15:
            raise ValueError("invalid FLAC rate code")
        fbps = bps if sz_code == 0 else _BPS_CODE.get(sz_code)
        if fbps is None:
            raise ValueError("reserved FLAC sample size code")
        b.read(8)  # CRC-8 (not verified; reconstruction is bit-exact)
        if ch_code < 8:
            fch = ch_code + 1
            if fch != nch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            subs = [_subframe(b, blocksize, fbps) for _ in range(fch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _subframe(b, blocksize, fbps)
                side = _subframe(b, blocksize, fbps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _subframe(b, blocksize, fbps + 1)
                right = _subframe(b, blocksize, fbps)
                subs = [right + side, right]
            else:  # mid/side
                mid = _subframe(b, blocksize, fbps)
                side = _subframe(b, blocksize, fbps + 1)
                mid2 = (mid << 1) | (side & 1)
                subs = [(mid2 + side) >> 1, (mid2 - side) >> 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        b.align()
        b.read(16)  # frame CRC-16 (skipped)
        for c in range(nch):
            chans[c].append(subs[c])
        n_done += blocksize
        pos = b.byte
    if not chans[0]:
        raise ValueError("FLAC contains no audio frames")
    out = np.stack([np.concatenate(c) for c in chans], axis=1)
    if total:
        out = out[:total]
    return out.astype(np.int32), rate


# ---------------------------------------------------------------------------
# subset encoder (round-trip fixtures)
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_signed(self, v: int, bits: int) -> None:
        self.write(v & ((1 << bits) - 1), bits)

    def align(self) -> None:
        while self.n:
            self.write(0, 1)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    # 2-byte form suffices for our frame counts
    if n < 1 << 11:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    raise ValueError("frame number too large for subset encoder")


def _rice_write(w: _BitW, res: np.ndarray) -> None:
    """Single-partition 4-bit-parameter Rice coding, k chosen from the
    mean magnitude (the standard estimate)."""
    zz = np.where(res >= 0, res.astype(np.int64) << 1, ((-res).astype(np.int64) << 1) - 1)
    mean = float(zz.mean()) if zz.size else 0.0
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    w.write(0, 2)  # method 0: 4-bit params
    w.write(0, 4)  # partition order 0
    w.write(k, 4)
    for v in zz.tolist():
        q = v >> k
        if q > 1 << 20:
            raise ValueError("rice parameter too small for residual")
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        if k:
            w.write(v & ((1 << k) - 1), k)


def encode_flac(samples: np.ndarray, rate: int = 16000, block: int = 4096) -> bytes:
    """(n,) or (n, ch) int16 -> FLAC bytes (16-bit, independent
    channels; per block per channel the smallest of CONSTANT, FIXED
    order-2 + Rice, or VERBATIM)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape
    if n == 0 or not 1 <= nch <= 8:
        raise ValueError("encode_flac expects 1..8 channels and > 0 samples")
    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(int(rate), 20)
    si.write(nch - 1, 3)
    si.write(15, 5)  # bps 16
    si.write(n, 36)
    body = bytes(si.out) + b"\x00" * 16  # md5 zeroed (unverified)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    def subframe_bits(x: np.ndarray) -> _BitW:
        w = _BitW()
        if np.all(x == x[0]):
            w.write(0, 1)
            w.write(0, 6)  # CONSTANT
            w.write(0, 1)
            w.write_signed(int(x[0]), 16)
            return w
        if x.size > 2:
            res = x[2:] - (2 * x[1:-1] - x[:-2])
            if np.abs(res).max() < 1 << 28:
                w.write(0, 1)
                w.write(10, 6)  # FIXED order 2
                w.write(0, 1)
                w.write_signed(int(x[0]), 16)
                w.write_signed(int(x[1]), 16)
                _rice_write(w, res)
                vb_bits = 7 + 1 + x.size * 16
                if len(w.out) * 8 + w.n < vb_bits:
                    return w
        w = _BitW()
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in x.tolist():
            w.write_signed(int(v), 16)
        return w

    for fi, start in enumerate(range(0, n, block)):
        blk = s[start : start + block]
        bs = blk.shape[0]
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # blocksize: 16-bit value follows
        w.write(0, 4)  # rate: from STREAMINFO
        w.write(nch - 1, 4)
        w.write(4, 3)  # 16 bps
        w.write(0, 1)
        hdr_tail = _utf8_number(fi) + bytes([bs - 1 >> 8, (bs - 1) & 0xFF])
        for byte in hdr_tail:
            w.write(byte, 8)
        w.write(0, 8)  # CRC-8 placeholder (decoder skips)
        for c in range(nch):
            sw = subframe_bits(blk[:, c])
            for byte in sw.out:
                w.write(byte, 8)
            if sw.n:
                w.write(sw.acc, sw.n)
        w.align()
        w.write(0, 16)  # CRC-16 placeholder
        out += bytes(w.out)
    return bytes(out)
