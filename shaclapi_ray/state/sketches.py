"""Mergeable sketches: Bloom filter, HyperLogLog, t-digest.

Pure-numpy implementations of standard public algorithms (Bloom 1970;
Flajolet et al. 2007 HyperLogLog; Dunning & Ertl t-digest). All three are
commutative-merge structures, which is what makes them the checkpoint unit
of the engine (north_star): per-batch/per-actor partials are serialized,
merged order-insensitively, and persisted in the run manifest.

The reference has no sketch analog — its closest structure is the join's
in-memory RJT hash tables (/root/reference/shaclapi/multiprocessing/Xgjoin/
Xgjoin.py:24-26); sketches are the scale path the north rule adds
(uniqueness, referential membership, distribution drift at 10^12 rows).
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pyarrow as pa


def _hash64_array(values) -> np.ndarray:
    """Deterministic, process-stable 64-bit hashes of a string column —
    vectorized (polars xxhash, the same kernel as stages/hashset): the
    per-row blake2b loop this replaces was the one Python-per-row cost
    inside every HLL/Bloom/CMS add on the fused checkpoint path. None
    hashes like '' (the old None -> b'' rule preserved). Estimates are
    hash-dependent, so the HLL/CMS goldens were regenerated with this
    kernel in the same commit."""
    import polars as pl

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        s = pl.from_arrow(values)
    else:
        s = pl.Series(list(values), dtype=pl.String)
    return s.fill_null("").hash(seed=41).to_numpy().astype(np.uint64)


def _column_values(col) -> list:
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        return col.to_pylist()
    return list(col)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


class BloomFilter:
    """Standard k-hash Bloom filter over a bit array; merge = bitwise OR."""

    def __init__(self, m: int, k: int, bits: np.ndarray | None = None):
        self.m = int(m)
        self.k = int(k)
        self.bits = (
            bits if bits is not None else np.zeros((self.m + 7) // 8, dtype=np.uint8)
        )

    @classmethod
    def sized(cls, n: int, fp_rate: float = 0.01) -> "BloomFilter":
        m = max(64, int(-n * math.log(fp_rate) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2))) if n else 1
        return cls(m=m, k=min(k, 16))

    @classmethod
    def from_bytes(cls, raw: bytes, m: int, k: int) -> "BloomFilter":
        return cls(m=m, k=k, bits=np.frombuffer(raw, dtype=np.uint8).copy())

    def _positions(self, values) -> np.ndarray:
        h = _hash64_array(values)
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = h >> np.uint64(32)
        ks = np.arange(self.k, dtype=np.uint64)
        # double hashing: pos_i = (h1 + i*h2) % m  (Kirsch-Mitzenmacher)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.m)

    def add_array(self, col) -> None:
        if len(col) == 0:
            return
        pos = self._positions(col).ravel()
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def contains_array(self, col) -> np.ndarray:
        if len(col) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(col)
        bitvals = (self.bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
        return bitvals.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_bytes(self) -> bytes:
        return pickle.dumps({"m": self.m, "k": self.k, "bits": self.bits.tobytes()})

    @classmethod
    def loads(cls, raw: bytes) -> "BloomFilter":
        d = pickle.loads(raw)
        return cls.from_bytes(d["bits"], m=d["m"], k=d["k"])


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


class HyperLogLog:
    """HLL with 2^p registers; merge = elementwise max. Standard bias-free
    variant with small/large range corrections (Flajolet et al. 2007)."""

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_array(self, col) -> None:
        if len(col) == 0:
            return
        h = _hash64_array(col)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of remaining 64-p bits, +1
        lz = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # bit_length via log2 is unsafe for uint64; use np.frexp-free loop
            # over the (vector) values with numpy: 64 - floor(log2(rest)) is
            # fine since rest != 0 and we only need <= 51 significant bits of
            # precision for the exponent
            r = rest[nz]
            exp = np.zeros(r.shape, dtype=np.int64)
            rr = r.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                mask = rr >= (np.uint64(1) << np.uint64(shift))
                exp[mask] += shift
                rr[mask] >>= np.uint64(shift)
            lz_nz = (63 - exp + 1).astype(np.uint8)
            lz[nz] = lz_nz
        np.maximum.at(self.registers, idx, lz)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * math.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return pickle.dumps({"p": self.p, "registers": self.registers.tobytes()})

    @classmethod
    def loads(cls, raw: bytes) -> "HyperLogLog":
        d = pickle.loads(raw)
        return cls(p=d["p"], registers=np.frombuffer(d["registers"], dtype=np.uint8).copy())


# ---------------------------------------------------------------------------
# t-digest (simplified merging digest)
# ---------------------------------------------------------------------------


class TDigest:
    """Merging t-digest (Dunning & Ertl): centroids compressed against the
    k1 scale function. merge = concatenate + recompress (commutative up to
    compression error; deterministic given sorted centroid input)."""

    def __init__(self, compression: float = 100.0):
        self.compression = compression
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)

    def add_array(self, values) -> None:
        # numeric Arrow/numpy input stays vectorized (the fused
        # checkpoint pass feeds utf8_length columns here per batch);
        # generic iterables fall back to the row filter
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            arr = values.drop_null().to_numpy(zero_copy_only=False).astype(
                np.float64
            )
        elif isinstance(values, np.ndarray):
            arr = values.astype(np.float64)
        else:
            arr = np.asarray(
                [v for v in _column_values(values) if v is not None],
                dtype=np.float64,
            )
        if arr.size == 0:
            return
        self.means = np.concatenate([self.means, arr])
        self.weights = np.concatenate([self.weights, np.ones(arr.size)])
        if self.means.size > 8 * self.compression:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        q0 = 0.0
        cur_m, cur_w = means[0], weights[0]
        for m, w in zip(means[1:], weights[1:]):
            q = q0 + (cur_w + w) / total
            limit = total * self._k_limit(q0)
            if cur_w + w <= limit:
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def _k_limit(self, q: float) -> float:
        # k1 scale: centroid size limit 4 * q(1-q) / compression-ish
        return max(4.0 * q * (1 - q) / self.compression, 1e-9)

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        cum = np.cumsum(weights) - weights / 2
        target = q * weights.sum()
        return float(np.interp(target, cum, means))

    def cdf(self, x: np.ndarray) -> np.ndarray:
        if self.means.size == 0:
            return np.zeros_like(np.asarray(x, dtype=np.float64))
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        cum = np.cumsum(weights) - weights / 2
        return np.interp(np.asarray(x, dtype=np.float64), means, cum / weights.sum())

    def to_bytes(self) -> bytes:
        self._compress()
        return pickle.dumps(
            {
                "compression": self.compression,
                "means": self.means.tobytes(),
                "weights": self.weights.tobytes(),
            }
        )

    @classmethod
    def loads(cls, raw: bytes) -> "TDigest":
        d = pickle.loads(raw)
        td = cls(compression=d["compression"])
        td.means = np.frombuffer(d["means"], dtype=np.float64).copy()
        td.weights = np.frombuffer(d["weights"], dtype=np.float64).copy()
        return td

    @classmethod
    def merge_many(cls, digests) -> "TDigest":
        """ORDER-INSENSITIVE n-way merge: concatenate every input's
        centroids, lexsort by (mean, weight), compress once. Unlike a
        chain of pairwise ``merge`` calls (lossy compression after each
        step, so the result depends on merge order), this is a pure
        function of the input centroid MULTISET — the property the
        distributed groupby('host') drift merge relies on, since rows
        arrive at a group in shuffle-dependent order."""
        digests = list(digests)
        if not digests:
            return cls()
        td = cls(compression=digests[0].compression)
        means = np.concatenate([d.means for d in digests])
        weights = np.concatenate([d.weights for d in digests])
        order = np.lexsort((weights, means))
        td.means = means[order]
        td.weights = weights[order]
        td._compress()
        return td


def ks_statistic(a: TDigest, b: TDigest, n_points: int = 256) -> float:
    """Approximate two-sample KS statistic from two digests' CDFs."""
    if a.means.size == 0 or b.means.size == 0:
        return 0.0
    lo = min(a.means.min(), b.means.min())
    hi = max(a.means.max(), b.means.max())
    xs = np.linspace(lo, hi, n_points)
    return float(np.max(np.abs(a.cdf(xs) - b.cdf(xs))))


def psi_statistic(a: TDigest, b: TDigest, n_bins: int = 10) -> float:
    """Population-stability index between two digests over a's deciles."""
    if a.means.size == 0 or b.means.size == 0:
        return 0.0
    edges = [a.quantile(i / n_bins) for i in range(n_bins + 1)]
    edges = np.unique(np.asarray(edges))
    if edges.size < 2:
        return 0.0
    pa_ = np.diff(a.cdf(edges))
    pb = np.diff(b.cdf(edges))
    pa_ = np.clip(pa_, 1e-6, None)
    pb = np.clip(pb, 1e-6, None)
    return float(np.sum((pa_ - pb) * np.log(pa_ / pb)))


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): a (depth, width)
    int64 count matrix; add/estimate use Kirsch-Mitzenmacher double
    hashing over a vectorized 64-bit polars string hash (no per-value
    Python in the hot path, unlike the Bloom/HLL classes whose inputs
    are bounded). Merge = elementwise add, so partials from any block
    layout combine to the identical sketch — the frequency member of
    the engine's mergeable-sketch checkpoint family (HLL uniqueness,
    Bloom membership, t-digest distribution, CMS frequency).

    Estimates overcount only: est(x) >= true(x), with overflow
    probability exp(-depth) for error > 2N/width (N = total adds)."""

    def __init__(self, width: int = 8192, depth: int = 4, counts=None):
        self.width = int(width)
        self.depth = int(depth)
        self.counts = (
            counts
            if counts is not None
            else np.zeros((self.depth, self.width), dtype=np.int64)
        )

    def _positions(self, col) -> np.ndarray:
        """(n, depth) table positions for a string array/ChunkedArray."""
        import polars as pl

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pl.from_arrow(col if isinstance(col, pa.Array) else pa.array(col))
        h1 = s.fill_null("").hash(seed=101).to_numpy().astype(np.uint64)
        h2 = s.fill_null("").hash(seed=211).to_numpy().astype(np.uint64) | np.uint64(1)
        ks = np.arange(self.depth, dtype=np.uint64)
        return ((h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.width)).astype(
            np.int64
        )

    def add_array(self, col, weights=None) -> None:
        """Add each value once, or ``weights[i]`` times — weighted adds
        let the sketch ingest pre-aggregated (value, count) partials."""
        pos = self._positions(col)
        if pos.size == 0:
            return
        rows = np.broadcast_to(
            np.arange(self.depth, dtype=np.int64), pos.shape
        ).ravel()
        if weights is None:
            w = 1
        else:
            w = np.repeat(np.asarray(weights, dtype=np.int64), self.depth)
        np.add.at(self.counts, (rows, pos.ravel()), w)

    def estimate_array(self, col) -> np.ndarray:
        pos = self._positions(col)
        if pos.size == 0:
            return np.zeros(0, dtype=np.int64)
        rows = np.arange(self.depth, dtype=np.int64)
        return self.counts[rows[None, :], pos].min(axis=1)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.width == other.width and self.depth == other.depth
        self.counts += other.counts
        return self

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {"width": self.width, "depth": self.depth, "counts": self.counts.tobytes()}
        )

    @classmethod
    def loads(cls, raw: bytes) -> "CountMinSketch":
        d = pickle.loads(raw)
        return cls(
            width=d["width"],
            depth=d["depth"],
            counts=np.frombuffer(d["counts"], dtype=np.int64)
            .reshape(d["depth"], d["width"])
            .copy(),
        )
