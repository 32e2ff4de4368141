"""Broadcast lookup structures with O(1) per-task setup.

pc.is_in / pa.Table.join rebuild their hash state in EVERY task, so with a
large broadcast side the total build cost grows with the number of tasks —
i.e. with cluster size: anti-scaling by construction. Instead we broadcast
a SORTED uint64 hash array (polars' vectorized string hash, process-stable
for a fixed seed) and probe with np.searchsorted — zero per-task setup,
~20ns per probe, 8 bytes per key.

Collision caveat: membership/lookup is by 64-bit hash equality. Expected
collisions ≈ n^2/2^65 — negligible below ~10^9 keys; beyond that use the
hash-partitioned bucket join (JobConfig.ref_strategy='bucket'), which is
exact at any scale.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

HASH_SEED = 0


def hash_strings(values) -> np.ndarray:
    """Vectorized, process-stable 64-bit hash of a string column."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        s = pl.from_arrow(values)
    else:
        s = pl.Series(list(values))
    return s.fill_null("\0null\0").hash(seed=HASH_SEED).to_numpy()


def build_hash_set(values) -> np.ndarray:
    """Sorted uint64 hash array for membership tests."""
    return np.sort(hash_strings(values))


def contains(sorted_hashes: np.ndarray, values) -> np.ndarray:
    """Vectorized membership: values (string column) in the hash set."""
    if sorted_hashes.size == 0:
        n = len(values)
        return np.zeros(n, dtype=bool)
    h = hash_strings(values)
    pos = np.searchsorted(sorted_hashes, h)
    pos = np.minimum(pos, sorted_hashes.size - 1)
    return sorted_hashes[pos] == h


def build_hash_map(keys, vals) -> tuple[np.ndarray, np.ndarray]:
    """(sorted key hashes, values aligned to them) for value lookup."""
    h = hash_strings(keys)
    order = np.argsort(h, kind="stable")
    v = np.asarray(vals, dtype=np.int64)
    return h[order], v[order]


def lookup(
    hash_map: tuple[np.ndarray, np.ndarray], keys, default: int = 0
) -> np.ndarray:
    hk, hv = hash_map
    n = len(keys)
    if hk.size == 0:
        return np.full(n, default, dtype=np.int64)
    h = hash_strings(keys)
    pos = np.searchsorted(hk, h)
    pos = np.minimum(pos, hk.size - 1)
    hit = hk[pos] == h
    out = np.full(n, default, dtype=np.int64)
    out[hit] = hv[pos[hit]]
    return out
