"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so the
decode step is STUBBED (clearly marked): `decode_stub='fake'` produces a
deterministic feature vector from the bytes; `decode_stub='error'` raises
NotImplementedError exactly where a real decoder (PIL/torchaudio/ffmpeg)
would plug in. Everything Ray-side — schema, actor-pool stage shape,
batch sizing for large binary payloads, output layout — is real and
tested.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FEATURE_DIM = 8

try:  # pragma: no cover - not installed here
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


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

    def __init__(self, decode_stub: str = "fake"):
        if decode_stub == "real" and not _HAVE_PIL:
            raise NotImplementedError(
                "real image decode requires PIL, not available in this "
                "environment — use decode_stub='fake'"
            )
        self.mode = decode_stub

    def _decode(self, raw: bytes) -> np.ndarray:
        if self.mode == "error":
            raise NotImplementedError("decoder stub: no media libs installed")
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
        feats = [self._decode(r if r is not None else b"") for r in raws]
        return pa.table(
            {
                batch.column_names[0]: ids,
                "feature": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float64())
                ),
            }
        )


def featurize_media(
    ds,
    binary_col: str = "html",
    id_col: str = "url",
    batch_size: int = 256,
    concurrency=(1, 4),
    decode_stub: str = "fake",
):
    """(id, feature list<float64>): actor-pool decode + feature extraction."""
    return ds.select_columns([id_col, binary_col]).map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"decode_stub": decode_stub},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
