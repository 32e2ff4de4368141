"""Real baseline JPEG codec — pure numpy/stdlib, no external library.

The last big web-image format behind the multimodal decode seam. This
implements ITU-T T.81 baseline sequential JPEG from scratch:

- decode: SOI/APP/DQT/SOF0/DHT/DRI/SOS parsing, canonical Huffman
  decoding (DC magnitude categories + AC run/size with ZRL and EOB),
  0xFF00 byte-unstuffing, RSTn restart handling with DC-predictor
  reset, dequantization, inverse zigzag, batched orthonormal IDCT
  (one einsum over all blocks per component), arbitrary chroma
  sampling factors h,v in {1,2,4} (4:4:4 / 4:2:2 / 4:2:0 via
  nearest-neighbor upsampling), JFIF YCbCr->RGB — AND progressive
  (SOF2) streams: T.81 Annex G successive approximation with
  interleaved DC first/refine scans, non-interleaved AC scans, EOBn
  run coding and the correction-bit refinement algorithm, accumulated
  in a per-component coefficient store and assembled once at EOI.
  Arithmetic coding and 12-bit precision are rejected loudly.
- encode: (h, w, 3) uint8 RGB -> 4:4:4 baseline JPEG with the Annex K
  example quantization tables (quality-scaled, the libjpeg formula)
  and the Annex K typical Huffman tables. Lossy by nature — tests pin
  exact single-block cases and error bounds on smooth images, never
  byte-for-byte pixel equality. `encode_jpeg_progressive` emits the
  SOF2 scan script (spectral selection + optional DC successive
  approximation) with the SAME coefficients, so progressive-vs-baseline
  decode equality is testable EXACTLY.

Anti-cancellation testing note (tests/test_jpeg.py): because encoder
and decoder live in one module, a shared systematic error (e.g. a
mirrored zigzag) would survive round-trip tests — so the zigzag order,
the Annex K Huffman code lengths, the DCT (against the literal cosine
sum) and the color transform are each pinned against independently
hard-coded spec values in the tests.

JPEG entropy decoding is bit-serial per scan (each Huffman symbol's
length depends on the previous bits), so decode is a bounded Python
loop over symbols feeding batched numpy block math — the same cost
contract as the BMP/WAV/PNG/GIF paths: per-image work inside the
actor-pool featurize/resize stages, never inside a wide shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)  # zigzag index -> natural (row-major) index
ZIGZAG_INV = np.argsort(ZIGZAG)  # natural index -> zigzag position

Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)  # natural order

Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K "typical" Huffman tables: (bits[1..16], values)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II matrix: block_dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables (natural order)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (Q_LUMA, Q_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


def _canonical_codes(bits: list[int], values: list[int]):
    """(code, length) per symbol in Annex C canonical order."""
    codes = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extend-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_block(
    w: _BitWriter, zz: np.ndarray, prev_dc: int, dc_codes, ac_codes
) -> int:
    dc = int(zz[0])
    cat, bits = _magnitude(dc - prev_dc)
    code, ln = dc_codes[cat]
    w.write(code, ln)
    if cat:
        w.write(bits, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            w.write(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        w.write(code, ln)
        w.write(bits, cat)
        run = 0
    return dc


def encode_jpeg(rgb: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) -> baseline 4:4:4 JFIF
    JPEG bytes (lossy; grayscale emits a 1-component frame)."""
    img = np.ascontiguousarray(rgb, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        comps = [img.astype(np.float64) - 128.0]
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w, _ = img.shape
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        raise ValueError("encode_jpeg expects (h, w, 3) RGB or (h, w) gray")
    if h == 0 or w == 0:
        raise ValueError("zero-dimension image")
    nc = len(comps)
    ql, qc = _quality_tables(quality)
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    nby, nbx = hp // 8, wp // 8
    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)
    # DCT + quantize every component's blocks up front (vectorized)
    zz_all = []
    for ci, plane in enumerate(comps):
        p = np.pad(plane, ((0, hp - h), (0, wp - w)), mode="edge")
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        d = np.einsum("ij,yxjk,lk->yxil", _C, blocks, _C)
        q = (ql if ci == 0 else qc).reshape(8, 8)
        coef = np.round(d / q).astype(np.int64)
        # gather natural-order coefficients into zigzag order
        zz_all.append(coef.reshape(nby, nbx, 64)[:, :, ZIGZAG])
    wtr = _BitWriter()
    prev = [0] * nc
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(nc):
                prev[ci] = _encode_block(
                    wtr,
                    zz_all[ci][by, bx],
                    prev[ci],
                    dc_l if ci == 0 else dc_c,
                    ac_l if ci == 0 else ac_c,
                )
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(ql[ZIGZAG].astype(np.uint8)))
    if nc == 3:
        out += seg(0xDB, b"\x01" + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cid, tq in ((1, 0), (2, 1), (3, 1))[:nc]:
        sof += struct.pack(">BBB", cid, 0x11, tq)  # 4:4:4
    out += seg(0xC0, sof)
    huffs = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA)]
    if nc == 3:
        huffs += [(0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)]
    for cls, tid, (bits, vals) in huffs:
        out += seg(0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))
    sos = struct.pack(">B", nc)
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11))[:nc]:
        sos += struct.pack(">BB", cid, tabs)
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    rgb: np.ndarray, quality: int = 90, dc_approx: bool = False
) -> bytes:
    """(h, w, 3) uint8 RGB -> PROGRESSIVE (SOF2) 4:4:4 JFIF JPEG.

    Scan script: one interleaved DC scan (split into an Al=1 first pass
    plus an Ah=1 refinement when ``dc_approx``) followed by one
    full-band AC scan per component, with consecutive empty bands
    coalesced into EOBn run codes — so a round trip exercises the
    decoder's multi-scan accumulation, non-interleaved block order,
    EOB runs > 1 and (optionally) DC successive approximation.
    Produces the same pixels as the baseline encoder at the same
    quality (identical coefficients, different scan order)."""
    img = np.ascontiguousarray(rgb, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg_progressive expects (h, w, 3) RGB")
    h, w, _ = img.shape
    if h == 0 or w == 0:
        raise ValueError("zero-dimension image")
    ql, qc = _quality_tables(quality)
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    comps = [
        0.299 * r + 0.587 * g + 0.114 * b - 128.0,
        -0.168736 * r - 0.331264 * g + 0.5 * b,
        0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    nby, nbx = hp // 8, wp // 8
    zz_all = []
    for ci, plane in enumerate(comps):
        p = np.pad(plane, ((0, hp - h), (0, wp - w)), mode="edge")
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        d = np.einsum("ij,yxjk,lk->yxil", _C, blocks, _C)
        q = (ql if ci == 0 else qc).reshape(8, 8)
        zz_all.append(
            np.round(d / q).astype(np.int64).reshape(nby, nbx, 64)[:, :, ZIGZAG]
        )
    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)

    def dc_scan_bits(al: int) -> bytes:
        wtr = _BitWriter()
        prev = [0, 0, 0]
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(3):
                    v = int(zz_all[ci][by, bx, 0]) >> al  # arithmetic shift
                    cat, bits = _magnitude(v - prev[ci])
                    code, ln = (dc_l if ci == 0 else dc_c)[cat]
                    wtr.write(code, ln)
                    if cat:
                        wtr.write(bits, cat)
                    prev[ci] = v
        wtr.flush()
        return bytes(wtr.out)

    def dc_refine_bits(al: int) -> bytes:
        wtr = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(3):
                    wtr.write((int(zz_all[ci][by, bx, 0]) >> al) & 1, 1)
        wtr.flush()
        return bytes(wtr.out)

    def ac_scan_bits(ci: int) -> bytes:
        wtr = _BitWriter()
        codes = ac_l if ci == 0 else ac_c
        eobrun = 0

        def flush_eobrun():
            # the Annex K "typical" AC tables define no EOBn symbols
            # beyond plain EOB (0x00), so runs emit as repeated EOBs;
            # eobrun > 1 decoding is pinned by a hand-built stream with
            # a custom DHT in tests/test_jpeg_progressive.py
            nonlocal eobrun
            while eobrun > 0:
                rr = min(eobrun.bit_length() - 1, 14)
                while rr and (rr << 4) not in codes:
                    rr -= 1
                take = min(eobrun, (1 << (rr + 1)) - 1)
                code, ln = codes[rr << 4]
                wtr.write(code, ln)
                if rr:
                    wtr.write(take - (1 << rr), rr)
                eobrun -= take

        for by in range(nby):
            for bx in range(nbx):
                zz = zz_all[ci][by, bx]
                last_nz = int(np.max(np.nonzero(zz[1:])[0])) + 1 if np.any(zz[1:]) else 0
                if last_nz == 0:
                    eobrun += 1
                    continue
                flush_eobrun()
                run = 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = codes[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    cat, bits = _magnitude(v)
                    code, ln = codes[(run << 4) | cat]
                    wtr.write(code, ln)
                    wtr.write(bits, cat)
                    run = 0
                if last_nz < 63:
                    eobrun += 1
        flush_eobrun()
        wtr.flush()
        return bytes(wtr.out)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(ql[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, b"\x01" + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)
    out += seg(0xC2, sof)  # SOF2: progressive
    for cls, tid, (bits_, vals) in (
        (0, 0, HUFF_DC_LUMA),
        (0, 1, HUFF_DC_CHROMA),
        (1, 0, HUFF_AC_LUMA),
        (1, 1, HUFF_AC_CHROMA),
    ):
        out += seg(0xC4, bytes([cls << 4 | tid]) + bytes(bits_) + bytes(vals))

    def sos(scomps, ss, se, ah, al) -> bytes:
        body = bytes([len(scomps)])
        for cid, tabs in scomps:
            body += bytes([cid, tabs])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    dc_comps = [(1, 0x00), (2, 0x10), (3, 0x10)]
    if dc_approx:
        out += sos(dc_comps, 0, 0, 0, 1) + dc_scan_bits(1)
        out += sos(dc_comps, 0, 0, 1, 0) + dc_refine_bits(0)
    else:
        out += sos(dc_comps, 0, 0, 0, 0) + dc_scan_bits(0)
    for ci, cid in enumerate((1, 2, 3)):
        tabs = 0x00 if ci == 0 else 0x01
        out += sos([(cid, tabs)], 1, 63, 0, 0) + ac_scan_bits(ci)
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment; handles 0xFF00
    unstuffing and stops at markers (returned via .marker)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        while self.pos < len(d):
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    return True
                self.marker = nxt  # a real marker terminates the scan
                return False
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
            return True
        return False

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("truncated JPEG entropy stream")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def skip_to_marker(self) -> int:
        """Consume the next RSTn marker (after align)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _decode_huff_tree(bits: list[int], values: list[int]):
    """dict[(length, code)] = symbol — canonical codes per Annex C."""
    table = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _read_symbol(r: _BitReader, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def decode_jpeg(raw: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB.

    Loud-ValueError contract: EVERY malformed input fails with
    ValueError. Parse-time guards catch the structured cases; the
    wrapper converts the long tail a byte-fuzzer can reach (truncated
    segment bodies, out-of-range indices) that would otherwise leak
    IndexError/struct.error/KeyError."""
    try:
        return _decode_jpeg_inner(raw)
    except ValueError:
        raise
    except (IndexError, KeyError, ZeroDivisionError, OverflowError, struct.error) as e:
        raise ValueError(f"corrupt JPEG stream: {type(e).__name__}: {e}") from e


def _decode_jpeg_inner(raw: bytes) -> np.ndarray:
    if len(raw) < 4 or raw[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    progressive = False
    store = None  # progressive coefficient accumulator, keyed by cid
    n = len(raw)
    while pos + 4 <= n:
        if raw[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = raw[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", raw, pos + 2)
        body = raw[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq != 0:
                    raise ValueError("only 8-bit quantization tables supported")
                zz = np.frombuffer(body[p + 1 : p + 65], np.uint8).astype(np.int64)
                nat = np.zeros(64, np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1):
            prec, ih, iw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit-precision JPEGs supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (ih, iw, comps)
        elif marker == 0xC2:
            prec, ih, iw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit-precision JPEGs supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (ih, iw, comps)
            progressive = True
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEGs supported"
            )
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                htables[(cls, tid)] = _decode_huff_tree(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 15))
            if not progressive:
                return _decode_scan(
                    raw,
                    pos + 2 + seglen,
                    sof,
                    scan,
                    qtables,
                    htables,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if store is None:
                store = _prog_store(sof)
            pos = _decode_prog_scan(
                raw,
                pos + 2 + seglen,
                sof,
                scan,
                htables,
                restart_interval,
                store,
                ss,
                se,
                ahal >> 4,
                ahal & 15,
            )
            continue
        pos += 2 + seglen
    if progressive and store is not None:
        return _assemble_planes(sof, store, qtables)
    raise ValueError("JPEG contains no scan data")


def _decode_scan(raw, pos, sof, scan, qtables, htables, restart_interval):
    ih, iw, comps = sof
    if ih == 0 or iw == 0:
        raise ValueError("zero-dimension JPEG")
    byid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    for _, hs, vs, _ in comps:
        if hs not in (1, 2, 4) or vs not in (1, 2, 4):
            raise ValueError("unsupported JPEG sampling factors")
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = -(-iw // (8 * hmax))
    mcuy = -(-ih // (8 * vmax))
    r = _BitReader(raw, pos)
    # per scan component: collected zigzag blocks (mcu-order)
    blocks: dict[int, list[np.ndarray]] = {cid: [] for cid, _, _ in scan}
    prev_dc = {cid: 0 for cid, _, _ in scan}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            mk = r.skip_to_marker()
            if not 0xD0 <= mk <= 0xD7:
                raise ValueError("missing JPEG restart marker")
            for cid in prev_dc:
                prev_dc[cid] = 0
        for cid, dc_t, ac_t in scan:
            if cid not in byid:
                raise ValueError("JPEG scan names a component absent from SOF")
            hs, vs, _ = byid[cid]
            dct = htables.get((0, dc_t))
            act = htables.get((1, ac_t))
            if dct is None or act is None:
                raise ValueError("JPEG scan references a missing Huffman table")
            for _ in range(hs * vs):
                zz = np.zeros(64, np.int64)
                cat = _read_symbol(r, dct)
                diff = _extend(r.read_bits(cat), cat) if cat else 0
                prev_dc[cid] += diff
                zz[0] = prev_dc[cid]
                k = 1
                while k < 64:
                    rs = _read_symbol(r, act)
                    rrrr, ssss = rs >> 4, rs & 15
                    if ssss == 0:
                        if rrrr == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += rrrr
                    if k > 63:
                        raise ValueError("JPEG AC run overflows the block")
                    zz[k] = _extend(r.read_bits(ssss), ssss)
                    k += 1
                blocks[cid].append(zz)
    # dequantize + batched IDCT + reassemble each component plane
    planes = {}
    for cid, hs, vs, tq in comps:
        if cid not in blocks:
            raise ValueError("JPEG scan does not cover every frame component")
        q = qtables.get(tq)
        if q is None:
            raise ValueError("JPEG frame references a missing quantization table")
        bz = np.stack(blocks[cid])  # (nblocks, 64) zigzag
        nat = np.zeros_like(bz)
        nat[:, ZIGZAG] = bz
        coef = nat.reshape(-1, 8, 8) * q
        pix = np.einsum("ji,bjk,kl->bil", _C, coef.astype(np.float64), _C)
        # blocks arrive MCU-major: per MCU, hs*vs blocks raster-ordered
        cw, ch = mcux * hs * 8, mcuy * vs * 8
        plane = np.zeros((ch, cw))
        bi = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for byy in range(vs):
                    for bxx in range(hs):
                        y0 = (my * vs + byy) * 8
                        x0 = (mx * hs + bxx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = pix[bi]
                        bi += 1
        # upsample to full resolution then crop
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[cid] = plane[:ih, :iw] + 128.0
    return _color_convert(planes, comps)


def _color_convert(planes: dict, comps) -> np.ndarray:
    """Component planes (level-unshifted, +128 applied) -> uint8 RGB —
    shared by the baseline and progressive assembly paths."""
    ids = [cid for cid, _, _, _ in comps]
    if len(ids) == 1:
        y = np.clip(planes[ids[0]], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(ids) != 3:
        raise ValueError("only 1- or 3-component JPEGs supported")
    y, cb, cr = planes[ids[0]], planes[ids[1]] - 128.0, planes[ids[2]] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    return np.clip(np.stack([r_, g_, b_], axis=2), 0, 255).astype(np.uint8)


def _frame_geometry(sof):
    """Validated (ih, iw, comps, hmax, vmax, mcux, mcuy)."""
    ih, iw, comps = sof
    if ih == 0 or iw == 0:
        raise ValueError("zero-dimension JPEG")
    for _, hs, vs, _ in comps:
        if hs not in (1, 2, 4) or vs not in (1, 2, 4):
            raise ValueError("unsupported JPEG sampling factors")
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = -(-iw // (8 * hmax))
    mcuy = -(-ih // (8 * vmax))
    return ih, iw, comps, hmax, vmax, mcux, mcuy


def _prog_store(sof) -> dict:
    """Per-component zigzag coefficient grids on the MCU-padded block
    layout (interleaved DC scans code the padding blocks; the
    non-interleaved AC scans cover the ceil grid subset)."""
    _, _, comps, _, _, mcux, mcuy = _frame_geometry(sof)
    return {
        cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
        for cid, hs, vs, _ in comps
    }


def _refine_nonzero(r: _BitReader, blk: np.ndarray, k: int, al: int) -> None:
    """One AC-refinement correction bit for a nonzero-history coef."""
    if r.read_bit() and (int(blk[k]) & (1 << al)) == 0:
        blk[k] += (1 << al) if blk[k] >= 0 else -(1 << al)


def _decode_prog_scan(
    raw, pos, sof, scan, htables, restart_interval, store, ss, se, ah, al
):
    """Decode ONE progressive scan into ``store``; returns the byte
    offset of the next marker. Implements T.81 Annex G successive
    approximation: DC first/refine (interleaved), AC first/refine
    (non-interleaved, EOB-run coding, correction bits)."""
    ih, iw, comps, hmax, vmax, mcux, mcuy = _frame_geometry(sof)
    byid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    for cid, _, _ in scan:
        if cid not in byid:
            raise ValueError("JPEG scan names a component absent from SOF")
    r = _BitReader(raw, pos)
    pred = {cid: 0 for cid, _, _ in scan}
    eobrun = 0
    n_units_done = 0

    def maybe_restart() -> None:
        nonlocal eobrun
        if restart_interval and n_units_done and n_units_done % restart_interval == 0:
            mk = r.skip_to_marker()
            if not 0xD0 <= mk <= 0xD7:
                raise ValueError("missing JPEG restart marker")
            for cid in pred:
                pred[cid] = 0
            eobrun = 0

    if ss == 0:
        # DC scan (must be the whole DC band)
        if se != 0:
            raise ValueError("progressive DC scan must have Se == 0")
        tables = {}
        for cid, dc_t, _ in scan:
            t = htables.get((0, dc_t))
            if t is None and ah == 0:
                raise ValueError("JPEG scan references a missing Huffman table")
            tables[cid] = t

        def dc_unit(cid, by, bx):
            blk = store[cid][by, bx]
            if ah == 0:
                cat = _read_symbol(r, tables[cid])
                diff = _extend(r.read_bits(cat), cat) if cat else 0
                pred[cid] += diff
                blk[0] = pred[cid] << al
            else:
                if r.read_bit():
                    blk[0] |= 1 << al

        if len(scan) > 1:
            for _m in range(mcux * mcuy):
                maybe_restart()
                my, mx = divmod(_m, mcux)
                for cid, _, _ in scan:
                    hs, vs, _ = byid[cid]
                    for byy in range(vs):
                        for bxx in range(hs):
                            dc_unit(cid, my * vs + byy, mx * hs + bxx)
                n_units_done += 1
        else:
            cid = scan[0][0]
            hs, vs, _ = byid[cid]
            cw = -(-iw * hs // hmax)
            ch = -(-ih * vs // vmax)
            nbx1, nby1 = -(-cw // 8), -(-ch // 8)
            for b in range(nbx1 * nby1):
                maybe_restart()
                by, bx = divmod(b, nbx1)
                dc_unit(cid, by, bx)
                n_units_done += 1
    else:
        # AC scan: exactly one component, non-interleaved block order
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        if se > 63 or ss > se:
            raise ValueError("bad progressive spectral band")
        cid, _, ac_t = scan[0]
        act = htables.get((1, ac_t))
        if act is None:
            raise ValueError("JPEG scan references a missing Huffman table")
        hs, vs, _ = byid[cid]
        cw = -(-iw * hs // hmax)
        ch = -(-ih * vs // vmax)
        nbx1, nby1 = -(-cw // 8), -(-ch // 8)
        p1, m1 = 1 << al, -(1 << al)
        for b in range(nbx1 * nby1):
            maybe_restart()
            by, bx = divmod(b, nbx1)
            blk = store[cid][by, bx]
            if ah == 0:
                # AC first pass
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = _read_symbol(r, act)
                        rr, s = rs >> 4, rs & 15
                        if s == 0:
                            if rr == 15:
                                k += 16  # ZRL
                                continue
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += r.read_bits(rr)
                            break
                        k += rr
                        if k > se:
                            raise ValueError("JPEG AC run overflows the band")
                        blk[k] = _extend(r.read_bits(s), s) << al
                        k += 1
            else:
                # AC refinement (T.81 G.1.2.3, libjpeg structure)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _read_symbol(r, act)
                        rr, s = rs >> 4, rs & 15
                        coef_new = 0
                        if s == 0:
                            if rr < 15:
                                eobrun = 1 << rr
                                if rr:
                                    eobrun += r.read_bits(rr)
                                break
                            # rr == 15: ZRL — skip 16 zero-history coefs
                        else:
                            if s != 1:
                                raise ValueError("bad AC refinement symbol")
                            coef_new = p1 if r.read_bit() else m1
                        while k <= se:
                            if blk[k] != 0:
                                _refine_nonzero(r, blk, k, al)
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if coef_new and k <= se:
                            blk[k] = coef_new
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if blk[k] != 0:
                            _refine_nonzero(r, blk, k, al)
                        k += 1
                    eobrun -= 1
            n_units_done += 1
    # advance to the next marker (skip pad bits; stuffed FF00 is data)
    p = r.pos
    nn = len(raw)
    while p + 1 < nn and not (raw[p] == 0xFF and raw[p + 1] != 0x00):
        p += 1
    return p


def _assemble_planes(sof, store, qtables) -> np.ndarray:
    """Progressive assembly: dequantize + batched IDCT per component
    grid, grid-major placement (no MCU loop needed), upsample, crop."""
    ih, iw, comps, hmax, vmax, _, _ = _frame_geometry(sof)
    planes = {}
    for cid, hs, vs, tq in comps:
        q = qtables.get(tq)
        if q is None:
            raise ValueError("JPEG frame references a missing quantization table")
        g = store[cid]
        nby, nbx = g.shape[0], g.shape[1]
        nat = np.zeros_like(g.reshape(-1, 64))
        nat[:, ZIGZAG] = g.reshape(-1, 64)
        coef = nat.reshape(-1, 8, 8) * q
        pix = np.einsum("ji,bjk,kl->bil", _C, coef.astype(np.float64), _C)
        plane = (
            pix.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[cid] = plane[:ih, :iw] + 128.0
    return _color_convert(planes, comps)
