"""Real PNG codec — stdlib zlib + numpy, no external imaging library.

Upgrades the multimodal decode seam (multimodal.py:39) from "BMP real,
compressed formats stubbed" to "PNG — the dominant lossless web image
format — real too": the container, the DEFLATE stream (zlib is baked into
this environment) and all five scanline filters are handled in-repo.

Scope (loud ValueError outside it):
- decode: 8-bit-per-sample PNGs of every color type — 0 (gray), 2
  (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) — both non-interlaced
  and Adam7-interlaced, to an (h, w, 3) uint8 RGB array (alpha is
  dropped, not composited; palette indices resolve through PLTE).
  Chunk CRCs are verified. 16-bit depth is rejected loudly.
- encode: (h, w, 3) uint8 RGB to a valid RGB PNG. `filter_type`
  selects the per-scanline filter (0..4) so tests can drive every
  unfilter path through a real encode→decode round trip; filtering at
  encode time is a pure function of the reconstructed image, so every
  filter vectorizes.

Determinism: decoding is exact — inflate recovers the filtered bytes
bit-for-bit regardless of which zlib build produced them, so PIXELS and
any feature derived from them are safe to golden. ENCODED bytes are
zlib-build-dependent (fixtures/goldens/ZLIB_VERSION.txt rationale) —
never golden the compressed output, only what decodes from it.

Unfilter cost: one Python iteration per row; Sub rows vectorize via a
uint8 np.add.accumulate over the per-pixel lanes, Up rows are one
vector add, Average/Paeth rows need the per-pixel left recurrence
(vectorized across the bpp lanes). The per-image work is bounded and
runs inside the actor-pool featurize/resize stages, so the Ray-side
shape (small batches × actor concurrency) is unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel for each supported color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Paeth predictor, elementwise over int16+ arrays -> uint8 values."""
    p = left + up - upleft
    pa_ = np.abs(p - left)
    pb = np.abs(p - up)
    pc_ = np.abs(p - upleft)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, upleft))
    return out.astype(np.uint8)


def encode_png(rgb: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> non-interlaced 8-bit RGB PNG bytes.

    filter_type 0..4 applies that filter to EVERY scanline (the spec
    allows per-row choice; a fixed one keeps the encoder simple and lets
    tests exercise each unfilter kernel). Compressed bytes are
    zlib-build-dependent — golden decoded pixels, never these bytes."""
    img = np.ascontiguousarray(rgb, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png expects an (h, w, 3) uint8 array")
    if not 0 <= filter_type <= 4:
        raise ValueError("PNG filter type must be 0..4")
    h, w, _ = img.shape
    rows = img.reshape(h, w * 3).astype(np.int16)
    left = np.zeros_like(rows)
    left[:, 3:] = rows[:, :-3]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    upleft = np.zeros_like(rows)
    upleft[1:, 3:] = rows[:-1, :-3]
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        filt = rows - left
    elif filter_type == 2:
        filt = rows - up
    elif filter_type == 3:
        filt = rows - ((left + up) >> 1)
    else:
        filt = rows - _paeth(left, up, upleft)
    body = np.empty((h, w * 3 + 1), dtype=np.uint8)
    body[:, 0] = filter_type
    body[:, 1:] = filt.astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Filtered scanline bytes (h rows of 1 + w*bpp) -> (h, w, bpp) uint8."""
    stride = w * bpp
    if raw.size != h * (stride + 1):
        raise ValueError("PNG pixel data has the wrong length")
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    if ftypes.size and ftypes.max(initial=0) > 4:
        raise ValueError("invalid PNG scanline filter type")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        row = raw[y, 1:]
        if f == 0:
            cur = row.copy()
        elif f == 1:
            # recon[x] = filt[x] + recon[x-bpp]: a mod-256 prefix sum per
            # pixel lane — uint8 accumulate wraps exactly like the spec
            cur = np.add.accumulate(
                row.reshape(w, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif f == 2:
            cur = row + prev  # uint8 wraparound
        else:
            # Average/Paeth carry a left-pixel recurrence the row loop
            # must walk; lanes (bpp samples) stay vectorized per step
            cur = np.empty(stride, dtype=np.uint8)
            up_px = prev.reshape(w, bpp).astype(np.int16)
            row_px = row.reshape(w, bpp).astype(np.int16)
            cur_px = cur.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int16)
            upleft = np.zeros(bpp, dtype=np.int16)
            if f == 3:
                for x in range(w):
                    left = (row_px[x] + ((left + up_px[x]) >> 1)) & 0xFF
                    cur_px[x] = left.astype(np.uint8)
            else:
                for x in range(w):
                    left = (
                        row_px[x] + _paeth(left, up_px[x], upleft)
                    ) & 0xFF
                    upleft = up_px[x]
                    cur_px[x] = left.astype(np.uint8)
        out[y] = cur
        prev = cur
    return out.reshape(h, w, bpp)


# Adam7 pass layout: (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _deinterlace(pixels: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Adam7: seven independently-filtered sub-images scattered onto the
    full raster. Each pass's scanlines carry their own filter bytes and
    filter against the PREVIOUS ROW OF THE SAME PASS.

    The expected filtered-byte total is validated against the ACTUAL
    inflated payload BEFORE the (h, w, bpp) raster is allocated — a
    forged header claiming 65535x65535 over a 100-byte payload must
    raise ValueError, not attempt a multi-GiB np.zeros (MemoryError
    escapes the decode actor pools' on_error ValueError policy)."""
    passes = []
    expected = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        passes.append((x0, y0, dx, dy, pw, ph))
        expected += ph * (1 + pw * bpp)
    if expected != pixels.size:
        raise ValueError("PNG pixel data has the wrong length")
    out = np.zeros((h, w, bpp), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy, pw, ph in passes:
        nbytes = ph * (1 + pw * bpp)
        out[y0::dy, x0::dx] = _unfilter(pixels[pos : pos + nbytes], ph, pw, bpp)
        pos += nbytes
    return out


def decode_png(raw: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB.

    Supports 8-bit color types 0/2/3/4/6, both non-interlaced and
    Adam7-interlaced; verifies chunk CRCs; raises ValueError on
    anything else (truncation, 16-bit, unknown critical chunks).
    Structural parse errors (struct/index) normalize to ValueError like
    the other codecs, so the featurize/resize actor pools' per-item
    on_error='skip'/'flag' policy holds for any byte payload."""
    try:
        return _decode_png_inner(raw)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt PNG structure: {e}") from e


def _decode_png_inner(raw: bytes) -> np.ndarray:
    if len(raw) < len(_SIG) + 25 or raw[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload")
    pos = len(_SIG)
    ihdr = None
    palette = None
    idat = []
    n = len(raw)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", raw, pos)
        typ = raw[pos + 4 : pos + 8]
        data_end = pos + 8 + length
        if data_end + 4 > n:
            raise ValueError("truncated PNG chunk")
        data = raw[pos + 8 : data_end]
        (crc,) = struct.unpack_from(">I", raw, data_end)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            if length != 13:
                raise ValueError(f"PNG IHDR length {length} != 13")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not divisible by 3")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        elif not typ[0] & 0x20:  # critical bit clear = critical chunk
            raise ValueError(f"unsupported critical PNG chunk {typ!r}")
        pos = data_end + 4
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError("only 8-bit-per-sample PNGs are decodable")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}")
    if comp or filt:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    bpp = _CHANNELS[ctype]
    try:
        pixels = np.frombuffer(
            zlib.decompress(b"".join(idat)), dtype=np.uint8
        )
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    img = (
        _deinterlace(pixels, h, w, bpp)
        if interlace
        else _unfilter(pixels, h, w, bpp)
    )
    if ctype == 2:
        return img
    if ctype == 0:
        return np.repeat(img, 3, axis=2)
    if ctype == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    if ctype == 6:
        return np.ascontiguousarray(img[:, :, :3])
    # ctype == 3: palette
    if palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    idx = img[:, :, 0]
    if idx.max(initial=0) >= len(palette):
        raise ValueError("PNG palette index out of range")
    return palette[idx]
