"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Compressed image/audio decode libraries are not available in this
environment, so the DEFAULT decode step is a stub (clearly marked):
`decode_stub='fake'` produces a deterministic feature vector from the
bytes; `decode_stub='error'` raises NotImplementedError exactly where a
real decoder (PIL/torchaudio/ffmpeg) would plug in. SIX REAL paths,
all dependency-free: `decode_stub='bmp'` (in-repo numpy codec,
encode_bmp/decode_bmp), `decode_stub='png'` (stdlib-zlib + numpy,
pngcodec.py: all 5 scanline filters, color types 0/2/3/4/6, Adam7,
CRC verification), `decode_stub='gif'` (from-scratch variable-width
LZW, gifcodec.py), `decode_stub='jpeg'` (from-scratch baseline AND
progressive Huffman+DCT, jpegcodec.py), `decode_stub='webp'`
(from-scratch VP8L — WebP lossless — webpcodec.py, r5; lossy VP8 stays
on the PIL seam), and `decode_stub='wav'`
(stdlib `wave` + numpy signal features — see encode_wav/decode_wav).
`decode_stub='real'` remains the PIL ACTIVATION PATH for the one
format left (LOSSY WebP — a VP8 intra-frame loop is a video codec,
out of honest from-scratch scope); the import is try-gated.

Corrupt payloads are ubiquitous in web crawls, so the decode stages
take a per-ITEM `on_error` policy: 'raise' (default), 'skip' (drop
the row) or 'flag' (keep it with decode_ok=False) — one bad image
never fails a batch task. Everything Ray-side — schema, actor-pool
stage shape, batch sizing for large binary payloads, output layout —
is real and tested in every mode.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.pipelines.gifcodec import decode_gif, encode_gif  # noqa: F401
from shaclapi_ray.pipelines.jpegcodec import decode_jpeg, encode_jpeg  # noqa: F401
from shaclapi_ray.pipelines.pngcodec import decode_png, encode_png  # noqa: F401

FEATURE_DIM = 8

try:  # pragma: no cover - not installed here
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


# --------------------------------------------------------------------------
# Real BMP codec — uncompressed 24-bit BI_RGB, the one raster format fully
# decodable from the public spec with numpy alone (no codec libraries).
# This upgrades the decode seam from "stub only" to "BMP real, compressed
# formats stubbed": pipelines that carry BMP payloads decode/resize for
# real in this environment; JPEG/PNG still need the PIL activation path.
# --------------------------------------------------------------------------

_BMP_HEADER = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP bytes."""
    import struct

    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    head = struct.pack(
        "<2sIHHI", b"BM", _BMP_HEADER + len(body), 0, 0, _BMP_HEADER
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return head + body


def decode_bmp(raw: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> (h, w, 3) uint8 RGB (top-down
    and bottom-up row orders both handled). Raises ValueError on
    anything that is not a plain BI_RGB 24bpp BMP."""
    import struct

    if len(raw) < _BMP_HEADER or raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", raw, 10)
    w, h = struct.unpack_from("<ii", raw, 18)
    (bpp,) = struct.unpack_from("<H", raw, 28)
    (compression,) = struct.unpack_from("<I", raw, 30)
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        raise ValueError("only uncompressed 24-bit BI_RGB BMPs are decodable")
    ah = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(raw) < offset + stride * ah:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(raw, dtype=np.uint8, count=stride * ah, offset=offset)
    rgb = rows.reshape(ah, stride)[:, : w * 3].reshape(ah, w, 3)[:, :, ::-1]
    return rgb[::-1] if h > 0 else rgb  # positive height = bottom-up


# --------------------------------------------------------------------------
# Real WAV (PCM) codec — stdlib `wave` + numpy, no external audio library.
# Upgrades the AUDIO side of the decode seam the same way BMP upgraded the
# image side: 16-bit PCM WAV payloads featurize for real in this
# environment; compressed audio (mp3/ogg/flac) still needs an external
# decoder behind the 'error' stub.
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 samples -> 16-bit PCM WAV bytes (the
    in-repo fixture generator for the real audio decode path)."""
    import io
    import wave

    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(rate))
        w.writeframes(np.ascontiguousarray(s, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV bytes -> ((frames, channels) int16 array, rate).
    Raises ValueError on non-PCM-16 payloads (compressed audio belongs to
    an external decoder)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(raw), "rb") as w:
            rate, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
            data = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a WAV payload: {e}") from e
    if sw != 2:
        raise ValueError("only 16-bit PCM WAV is decodable without audio libs")
    return np.frombuffer(data, dtype="<i2").reshape(-1, nch), rate


def _wav_features(raw: bytes) -> np.ndarray:
    """REAL audio features from a PCM WAV payload: [rate, channels,
    frames, rms, mean, peak, zero_crossings, duration_ms] — FEATURE_DIM
    wide like the image paths."""
    return _signal_features(*decode_wav(raw))


def _flac_features(raw: bytes) -> np.ndarray:
    """Same feature contract over a FLAC payload (flaccodec.py — the
    compressed speech-corpus format, decoded for real in-repo)."""
    from shaclapi_ray.pipelines.flaccodec import decode_flac

    return _signal_features(*decode_flac(raw))


def _signal_features(x: np.ndarray, rate: int) -> np.ndarray:
    mono = x.astype(np.float64).mean(axis=1) if x.size else np.zeros(0)
    if mono.size:
        rms = float(np.sqrt(np.mean(mono * mono)))
        zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        mean, peak = float(mono.mean()), float(np.abs(mono).max())
    else:
        rms = zc = mean = peak = 0
    return np.array(
        [
            rate,
            x.shape[1] if x.size else 0,
            x.shape[0],
            rms,
            mean,
            peak,
            zc,
            x.shape[0] * 1000.0 / rate if rate else 0.0,
        ],
        dtype=np.float64,
    )


def _gray(rgb: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, float64."""
    return rgb @ np.array([0.299, 0.587, 0.114])


def _nn_resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W[, C]) array to (h, w[, C])."""
    ys = (np.arange(h, dtype=np.int64) * img.shape[0]) // h
    xs = (np.arange(w, dtype=np.int64) * img.shape[1]) // w
    return img[ys][:, xs]


def media_metadata(ds, binary_col: str = "html", id_col: str = "url"):
    """(id, n_bytes): typed metadata of an opaque binary column —
    vectorized, no decode."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bytes": pc.cast(pc.binary_length(batch[binary_col]), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class MediaFeaturizer:
    """Actor-pool decode/feature-extract stage over binary payloads.

    Real decoders are stateful and expensive to construct — that state
    belongs in __init__ (once per actor). Use small batch_size for large
    payloads so batch x concurrency fits worker heaps."""

    def __init__(self, decode_stub: str = "fake", on_error: str = "raise"):
        if decode_stub == "real" and not _HAVE_PIL:
            raise NotImplementedError(
                "real image decode requires PIL, not available in this "
                "environment — use decode_stub='fake' (or 'bmp' for real "
                "no-dependency BMP decode)"
            )
        if on_error not in ("raise", "skip", "flag"):
            raise ValueError("on_error must be 'raise', 'skip' or 'flag'")
        self.mode = decode_stub
        self.on_error = on_error

    def _decode(self, raw: bytes) -> np.ndarray:
        if self.mode == "error":
            raise NotImplementedError("decoder stub: no media libs installed")
        if self.mode == "wav":
            # REAL audio decode (stdlib wave + numpy): rate/channels/
            # frames/rms/mean/peak/zero-crossings/duration features
            return _wav_features(raw)
        if self.mode == "flac":
            # REAL compressed-audio decode (flaccodec.py — the speech-
            # corpus format): same feature contract as 'wav'
            return _flac_features(raw)
        if self.mode in ("bmp", "png", "gif", "jpeg", "webp"):
            # REAL decode (in-repo codecs): same feature contract as the
            # PIL path — 16x16 gray resample stats + true dimensions.
            # 'png' handles DEFLATE via stdlib zlib + numpy (pngcodec.py:
            # all 5 filters, color types 0/2/3/4/6, Adam7); 'gif' is the
            # from-scratch variable-width LZW decoder (gifcodec.py);
            # 'jpeg' the from-scratch baseline Huffman+DCT decoder
            # (jpegcodec.py: 4:4:4/4:2:2/4:2:0, restart markers)
            if self.mode == "webp":
                # r5: from-scratch VP8L (WebP-lossless) decoder —
                # webpcodec.py; lossy VP8 stays on the PIL seam
                from shaclapi_ray.pipelines.webpcodec import decode_webp_lossless

                rgb = decode_webp_lossless(raw)
            else:
                rgb = {
                    "bmp": decode_bmp,
                    "png": decode_png,
                    "gif": decode_gif,
                    "jpeg": decode_jpeg,
                }[self.mode](raw)
            px = _gray(_nn_resize(rgb, 16, 16))
            return np.array(
                [
                    rgb.shape[1],
                    rgb.shape[0],
                    px.mean(),
                    px.std(),
                    px[:8].mean(),
                    px[8:].mean(),
                    px.min(),
                    px.max(),
                ],
                dtype=np.float64,
            )
        if self.mode == "real":  # pragma: no cover - pillow absent here
            import io

            from PIL import Image  # gated: __init__ verified _HAVE_PIL

            img = Image.open(io.BytesIO(raw)).convert("L")
            w, h = img.size
            px = np.asarray(img.resize((16, 16)), dtype=np.float64)
            return np.array(
                [
                    w,
                    h,
                    px.mean(),
                    px.std(),
                    px[:8].mean(),
                    px[8:].mean(),
                    px.min(),
                    px.max(),
                ],
                dtype=np.float64,
            )
        # deterministic fake feature: length, crc windows, byte stats
        if not raw:
            return np.zeros(FEATURE_DIM)
        arr = np.frombuffer(raw[: 1 << 16], dtype=np.uint8)
        return np.array(
            [
                len(raw),
                zlib.crc32(raw) & 0xFFFF,
                int(arr.mean() * 1000),
                int(arr.std() * 1000),
                int(arr[: len(arr) // 2].mean() * 1000),
                int(arr[len(arr) // 2 :].mean() * 1000) if len(arr) > 1 else 0,
                int(arr.min()),
                int(arr.max()),
            ],
            dtype=np.float64,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(0)
        raws = batch.column(1).to_pylist()
        if self.on_error == "raise":
            feats = [self._decode(r if r is not None else b"") for r in raws]
            ok = None
        else:
            # corrupt payloads are ubiquitous in web crawls — the error
            # policy is per ITEM (a bad image must not fail the batch
            # task): 'skip' drops the row, 'flag' keeps it with ok=False
            # and an empty feature so downstream joins stay total
            feats, ok = [], []
            for r in raws:
                try:
                    feats.append(self._decode(r if r is not None else b""))
                    ok.append(True)
                except ValueError:
                    feats.append(np.empty(0, dtype=np.float64))
                    ok.append(False)
        cols = {
            batch.column_names[0]: ids,
            "feature": pa.array(
                [f.tolist() for f in feats], type=pa.list_(pa.float64())
            ),
        }
        out = pa.table(cols)
        if ok is None:
            return out
        if self.on_error == "skip":
            return out.filter(pa.array(ok, pa.bool_()))
        return out.append_column("decode_ok", pa.array(ok, pa.bool_()))


class MediaResizer:
    """Actor-pool resize stage: decode -> resize -> re-encode, emitting a
    new binary column plus typed (width, height) metadata.

    The decode/encode pair is the stub seam (`decode_stub='error'` raises
    exactly where PIL's open/resize/save would run); the fake path
    deterministically resamples the payload bytes to width*height via a
    strided view, so output sizes, schema and batch shape are the real
    thing."""

    def __init__(
        self,
        width: int,
        height: int,
        decode_stub: str = "fake",
        on_error: str = "raise",
    ):
        if decode_stub == "real" and not _HAVE_PIL:
            raise NotImplementedError(
                "real image resize requires PIL, not available in this "
                "environment — use decode_stub='fake'"
            )
        if on_error not in ("raise", "skip", "flag"):
            raise ValueError("on_error must be 'raise', 'skip' or 'flag'")
        self.w, self.h, self.mode = int(width), int(height), decode_stub
        self.on_error = on_error

    def _resize(self, raw: bytes) -> bytes:
        if self.mode == "error":
            raise NotImplementedError("resize stub: no media libs installed")
        if self.mode == "bmp":
            # REAL decode -> nearest-neighbor resize -> re-encode
            return encode_bmp(_nn_resize(decode_bmp(raw), self.w, self.h))
        if self.mode == "png":
            # REAL compressed-format path (pngcodec.py): inflate +
            # unfilter -> resize -> refilter + deflate. Output bytes are
            # zlib-build-dependent — compare decoded pixels, not bytes.
            return encode_png(_nn_resize(decode_png(raw), self.w, self.h))
        if self.mode == "gif":
            # REAL LZW path (gifcodec.py); nearest-neighbor resize never
            # invents colors, so the <=256-color encode bound holds
            return encode_gif(_nn_resize(decode_gif(raw), self.w, self.h))
        if self.mode == "jpeg":
            # REAL baseline JPEG path (jpegcodec.py); re-encode is lossy
            # by nature — pixel-proximity, never byte equality
            return encode_jpeg(_nn_resize(decode_jpeg(raw), self.w, self.h))
        if self.mode == "webp":
            # REAL VP8L path (webpcodec.py, r5): lossless both ways, so
            # decoded pixels round-trip exactly (bytes are deterministic
            # too — no zlib involvement — but pixels stay the contract)
            from shaclapi_ray.pipelines.webpcodec import (
                decode_webp_lossless,
                encode_webp_lossless,
            )

            return encode_webp_lossless(
                _nn_resize(decode_webp_lossless(raw), self.w, self.h)
            )
        if self.mode == "real":  # pragma: no cover - pillow absent here
            import io

            from PIL import Image  # gated: __init__ verified _HAVE_PIL

            img = Image.open(io.BytesIO(raw)).resize((self.w, self.h))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()
        n = self.w * self.h
        if not raw:
            return bytes(n)
        arr = np.frombuffer(raw, dtype=np.uint8)
        idx = (np.arange(n, dtype=np.int64) * len(arr)) // n
        return arr[idx].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(0)
        raws = batch.column(1).to_pylist()
        if self.on_error == "raise":
            out = [self._resize(r if r is not None else b"") for r in raws]
            ok = None
        else:
            out, ok = [], []
            for r in raws:
                try:
                    out.append(self._resize(r if r is not None else b""))
                    ok.append(True)
                except ValueError:
                    out.append(b"")
                    ok.append(False)
        n = batch.num_rows
        t = pa.table(
            {
                batch.column_names[0]: ids,
                "media": pa.array(out, type=pa.binary()),
                "width": pa.array([self.w] * n, pa.int32()),
                "height": pa.array([self.h] * n, pa.int32()),
            }
        )
        if ok is None:
            return t
        if self.on_error == "skip":
            return t.filter(pa.array(ok, pa.bool_()))
        return t.append_column("decode_ok", pa.array(ok, pa.bool_()))


def resize_media(
    ds,
    width: int = 64,
    height: int = 64,
    binary_col: str = "html",
    id_col: str = "url",
    batch_size: int = 256,
    concurrency=(1, 4),
    decode_stub: str = "fake",
    on_error: str = "raise",
):
    """(id, media binary, width, height): actor-pool image resize.
    ``on_error`` as in featurize_media ('flag' adds decode_ok, the
    failed rows carrying empty media bytes)."""
    if on_error not in ("raise", "skip", "flag"):
        raise ValueError("on_error must be 'raise', 'skip' or 'flag'")
    return ds.select_columns([id_col, binary_col]).map_batches(
        MediaResizer,
        fn_constructor_kwargs={
            "width": width,
            "height": height,
            "decode_stub": decode_stub,
            "on_error": on_error,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool frame-sampling stage: one video payload row explodes
    into (id, frame_idx, frame binary) rows — every ``every_n``-th frame,
    at most ``max_frames`` per video.

    Fake container format: the payload is treated as a concatenation of
    fixed-size ``frame_bytes`` frames (a real implementation swaps the
    frame iterator for ffmpeg/pyav at the marked seam; the explode
    shape, ordering and bounds are the real plumbing)."""

    def __init__(
        self,
        every_n: int = 2,
        max_frames: int = 8,
        frame_bytes: int = 4096,
        decode_stub: str = "fake",
    ):
        if decode_stub == "real":
            raise NotImplementedError(
                "real frame sampling requires ffmpeg/pyav, not available "
                "in this environment — use decode_stub='fake'"
            )
        self.every_n, self.max_frames = int(every_n), int(max_frames)
        self.frame_bytes, self.mode = int(frame_bytes), decode_stub

    def _frames(self, raw: bytes):
        if self.mode == "error":
            raise NotImplementedError("frame decode stub: no media libs")
        fb = self.frame_bytes
        n_frames = max(0, len(raw)) // fb
        taken = 0
        for i in range(0, n_frames, self.every_n):
            if taken >= self.max_frames:
                break
            yield i, raw[i * fb : (i + 1) * fb]
            taken += 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idxs, frames = [], [], []
        id_vals = batch.column(0).to_pylist()
        for vid, raw in zip(id_vals, batch.column(1).to_pylist()):
            for i, frame in self._frames(raw if raw is not None else b""):
                ids_out.append(vid)
                idxs.append(i)
                frames.append(frame)
        return pa.table(
            {
                batch.column_names[0]: pa.array(
                    ids_out, type=batch.column(0).type
                ),
                "frame_idx": pa.array(idxs, pa.int64()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def sample_frames(
    ds,
    every_n: int = 2,
    max_frames: int = 8,
    frame_bytes: int = 4096,
    binary_col: str = "html",
    id_col: str = "url",
    batch_size: int = 64,
    concurrency=(1, 4),
    decode_stub: str = "fake",
):
    """(id, frame_idx, frame binary): actor-pool frame sampling — the
    exploding stage of a video pipeline (small batch_size: each input row
    can emit max_frames × frame_bytes of output)."""
    return ds.select_columns([id_col, binary_col]).map_batches(
        FrameSampler,
        fn_constructor_kwargs={
            "every_n": every_n,
            "max_frames": max_frames,
            "frame_bytes": frame_bytes,
            "decode_stub": decode_stub,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def featurize_media(
    ds,
    binary_col: str = "html",
    id_col: str = "url",
    batch_size: int = 256,
    concurrency=(1, 4),
    decode_stub: str = "fake",
    on_error: str = "raise",
):
    """(id, feature list<float64>): actor-pool decode + feature
    extraction. ``on_error``: 'raise' (default), 'skip' (drop corrupt
    payloads) or 'flag' (keep rows, add a decode_ok column) — per ITEM,
    so one bad crawl payload never fails a batch task."""
    if on_error not in ("raise", "skip", "flag"):
        raise ValueError("on_error must be 'raise', 'skip' or 'flag'")
    return ds.select_columns([id_col, binary_col]).map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"decode_stub": decode_stub, "on_error": on_error},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
