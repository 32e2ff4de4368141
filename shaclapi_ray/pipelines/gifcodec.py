"""Real GIF codec — pure numpy/stdlib, no external imaging library.

Completes the multimodal decode seam's compressed-format coverage with
the OTHER classic web codec family: where pngcodec.py handles DEFLATE
(zlib), this implements variable-width LZW (GIF87a/89a) from scratch —
the full dictionary-growth scheme with clear/end codes, LSB-first bit
packing, deferred width bumps and the KwKwK self-reference case.

Scope (loud ValueError outside it):
- decode: the FIRST image of a GIF87a/GIF89a stream — global or local
  color table, non-interlaced or 4-pass interlaced — to (h, w, 3)
  uint8 RGB. Extension blocks (graphics control, comments,
  application) are skipped; transparency is dropped, matching
  decode_png's alpha policy.
- encode: (h, w, 3) uint8 RGB with <= 256 distinct colors to a
  non-interlaced GIF87a (palette built from the image, row-major
  first-occurrence order — deterministic; unlike PNG/zlib the encoded
  bytes depend only on this module, so GIF bytes ARE stable enough to
  golden, though pixels remain the safer contract).

LZW is inherently sequential per image (each code extends the
dictionary the previous one built), so decode is a bounded Python loop
per payload — the same cost contract as the BMP/WAV/PNG paths: it runs
inside the actor-pool featurize/resize stages where per-image work is
the point, and never inside a wide shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 1 << 12  # GIF caps LZW codes at 12 bits


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Palette indices -> GIF LZW bytes (variable width, LSB-first)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    prefix = b""
    for v in indices.tolist():
        cand = prefix + bytes([v])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= _MAX_CODE:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = bytes([v])
    if prefix:
        emit(table[prefix])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW bytes -> palette indices (uint8, exactly n_pixels)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("invalid GIF LZW minimum code size")
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW stream (bad first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream (code out of range)")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data has the wrong length")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def encode_gif(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB (<= 256 distinct colors) -> GIF87a bytes."""
    img = np.ascontiguousarray(rgb, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_gif expects an (h, w, 3) uint8 array")
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(
        flat.view([("r", np.uint8), ("g", np.uint8), ("b", np.uint8)]).ravel(),
        return_inverse=True,
    )
    if len(colors) > 256:
        raise ValueError("encode_gif supports at most 256 distinct colors")
    # palette in first-occurrence (row-major) order — deterministic
    first = np.full(len(colors), len(idx), dtype=np.int64)
    np.minimum.at(first, idx, np.arange(len(idx)))
    order = np.argsort(first, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    indices = rank[idx].astype(np.uint8)
    palette = np.stack(
        [colors[order]["r"], colors[order]["g"], colors[order]["b"]], axis=1
    )
    size_bits = max(1, int(len(colors) - 1).bit_length())
    table = np.zeros((1 << size_bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code = max(2, size_bits)
    lzw = _lzw_encode(indices, min_code)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(raw: bytes) -> np.ndarray:
    """GIF bytes -> (h, w, 3) uint8 RGB of the first image.

    Loud-ValueError contract: the wrapper converts the stray
    IndexError/struct.error a truncated container can reach (e.g. cut
    right after the image descriptor) so every malformed input fails
    the same way."""
    try:
        return _decode_gif_inner(raw)
    except ValueError:
        raise
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt GIF stream: {type(e).__name__}: {e}") from e


def _decode_gif_inner(raw: bytes) -> np.ndarray:
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        global_table = np.frombuffer(raw[pos : pos + 3 * n], np.uint8)
        if global_table.size != 3 * n:
            raise ValueError("truncated GIF global color table")
        global_table = global_table.reshape(n, 3)
        pos += 3 * n
    while pos < len(raw):
        block = raw[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(raw) and raw[pos]:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unsupported GIF block 0x{block:02x}")
        if pos + 9 > len(raw):
            raise ValueError("truncated GIF image descriptor")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", raw, pos)
        pos += 9
        table = global_table
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            table = np.frombuffer(raw[pos : pos + 3 * n], np.uint8)
            if table.size != 3 * n:
                raise ValueError("truncated GIF local color table")
            table = table.reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        if w == 0 or h == 0:
            raise ValueError("zero-dimension GIF")
        min_code = raw[pos]
        pos += 1
        data = bytearray()
        while pos < len(raw) and raw[pos]:
            ln = raw[pos]
            data += raw[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decode(bytes(data), min_code, w * h)
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF palette index out of range")
        img = table[idx].reshape(h, w, 3)
        if ipacked & 0x40:  # 4-pass interlace: scatter rows
            rows = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            out = np.empty_like(img)
            out[rows] = img
            return out
        return img
    raise ValueError("GIF contains no image data")
