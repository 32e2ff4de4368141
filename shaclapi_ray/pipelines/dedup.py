"""Deduplication operators over a documents table (doc_id, text).

- exact_dedup:      content-hash groupby, keep min doc_id per group
- minhash_lsh:      shingle -> minhash -> banded LSH buckets -> candidate
                    pairs -> verified Jaccard -> connected components
- simhash:          64-bit simhash signatures (+ hamming-band buckets)
- ngram_jaccard:    exact character-n-gram Jaccard on LSH candidates
- embedding near-dup: cosine >= tau pairs (brute-force or hyperplane-LSH)

Scale design: every per-doc signature is computed batch-parallel in
map_batches; the only shuffles are groupbys on narrow (hash, id) tables;
candidate verification joins fetch texts via broadcast only at test scale
(documented; the bucket-join path reuses stages.referential).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count

MERSENNE = np.uint64((1 << 61) - 1)


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def exact_dedup(docs_ds, text_col: str = "text"):
    """(doc_id, n_dups): one surviving row (min doc_id) per distinct text.

    Hash-partition on the content hash, per-group first — the exact-dedup
    pattern; the md5 keeps the shuffled key narrow (16B vs document size).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode()).hexdigest() if t is not None else ""
            for t in batch[text_col].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"], "h": pa.array(hs)})

    hashed = docs_ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    def keep_first(group):
        import pandas as pd

        return pd.DataFrame(
            {"doc_id": [group["doc_id"].min()], "n_dups": [len(group)]}
        )

    out = hashed.groupby("h").map_groups(keep_first, batch_format="pandas")
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_dups": pc.cast(t["n_dups"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Actor-pool stage: char-k-shingle minhash signatures, banded.

    Emits (band_id, band_hash, doc_id) rows — the LSH explode step.
    Shingle hashing is vectorized: ALL shingles of a batch go through one
    polars hash call (process-stable, seeded); universal-hash permutations
    and band mixing are numpy — no per-shingle python hashing. Permutation
    parameters derive deterministically from a seed in __init__ (once per
    actor)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        # band mixing weights (deterministic)
        self.band_w = rng.integers(1, MERSENNE, size=self.rows_per_band, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        k = self.k
        doc_ids_in = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        all_shingles: list[str] = []
        offsets = [0]
        kept_docs: list[int] = []
        for doc_id, text in zip(doc_ids_in, texts):
            if text is None or len(text) < k:
                continue
            sh = {text[i : i + k] for i in range(len(text) - k + 1)}
            all_shingles.extend(sh)
            offsets.append(len(all_shingles))
            kept_docs.append(doc_id)
        if not kept_docs:
            return pa.table(
                {
                    "band_id": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        base = pl.Series(all_shingles).hash(seed=13).to_numpy()
        band_ids: list[int] = []
        band_hashes: list[int] = []
        doc_ids: list[int] = []
        r = self.rows_per_band
        for d, doc_id in enumerate(kept_docs):
            seg = base[offsets[d] : offsets[d + 1]]
            vals = (self.a[None, :] * seg[:, None] + self.b[None, :]) % MERSENNE
            sig = vals.min(axis=0)
            # mix each band's rows into one 64-bit band hash
            mixed = (
                sig.reshape(self.bands, r) * self.band_w[None, :]
            ).sum(axis=1, dtype=np.uint64)
            for band in range(self.bands):
                band_ids.append(band)
                band_hashes.append(int(mixed[band]) - (1 << 63))
                doc_ids.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.int64()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
            }
        )


def minhash_lsh_clusters(
    docs_ds,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    concurrency=(1, 4),
):
    """(doc_id, cluster_id): near-duplicate clusters via banded MinHash-LSH.

    cluster_id = min doc_id of the connected component over candidate
    pairs. Candidate pairs come back to the driver for union-find — valid
    while candidates << corpus (they are, by construction of LSH); the
    scale path is iterative min-label propagation (documented in
    SURVEY.md §2.6 guide pattern).
    """
    sigs = docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )

    def bucket_pairs(group):
        import pandas as pd

        ids = sorted(set(group["doc_id"].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}, dtype="int64")
        root = ids[0]
        return pd.DataFrame({"a": [root] * (len(ids) - 1), "b": ids[1:]})

    # band rows are narrow (int32, int64, int64): below the driver-merge
    # limit, group them on the driver with pandas instead of paying a Ray
    # shuffle; the keyed-shuffle path remains for huge corpora
    import ray as _ray

    from shaclapi_ray.stages.aggregates import DRIVER_MERGE_LIMIT

    sigs_m = sigs.materialize()
    if sigs_m.count() <= DRIVER_MERGE_LIMIT:
        import pandas as pd

        sig_tables = [_ray.get(r) for r in sigs_m.to_arrow_refs()]
        sig_tables = [t for t in sig_tables if t.num_rows]
        if sig_tables:
            sdf = pa.concat_tables(sig_tables).to_pandas()
            groups = sdf.groupby(["band_id", "band_hash"])["doc_id"].agg(
                lambda s: sorted(set(s))
            )
        else:
            groups = []
        rows_a: list[int] = []
        rows_b: list[int] = []
        for ids in groups:
            if len(ids) > 1:
                rows_a.extend([ids[0]] * (len(ids) - 1))
                rows_b.extend(ids[1:])
        pair_rows = pd.DataFrame({"a": rows_a, "b": rows_b}, dtype="int64")
    else:
        pairs = sigs_m.groupby(["band_id", "band_hash"]).map_groups(
            bucket_pairs, batch_format="pandas"
        )
        pair_rows = pairs.to_pandas()

    # driver-side union-find over candidate edges
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry

    for a, b in zip(pair_rows["a"].tolist(), pair_rows["b"].tolist()):
        union(int(a), int(b))

    cluster_of = {d: find(d) for d in list(parent)}

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "cluster_id": pa.array(
                    [cluster_of.get(d, d) for d in ids], type=pa.int64()
                ),
            }
        )

    return docs_ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash over whitespace tokens; bucket = top-16-bit prefix."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        tok = re.compile(r"\S+")
        sims: list[int] = []
        for text in batch["text"].to_pylist():
            if not text:
                sims.append(0)
                continue
            acc = np.zeros(64, dtype=np.int64)
            for w in tok.findall(text):
                h = _md5_64(w)
                bits = (h >> np.arange(64, dtype=np.uint64)) & 1
                acc += np.where(bits == 1, 1, -1)
            val = 0
            for i in range(64):
                if acc[i] > 0:
                    val |= 1 << i
            sims.append(val - (1 << 63))
        arr = pa.array(sims, type=pa.int64())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": arr,
                "bucket": pc.cast(
                    pc.bit_wise_and(pc.shift_right(arr, 48), 0xFFFF), pa.int32()
                ),
            }
        )


def simhash_signatures(docs_ds, concurrency=(1, 4)):
    return docs_ds.map_batches(
        SimHasher, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs_ds, k: int = 5, threshold: float = 0.5, **lsh_kwargs):
    """(a, b, inter_size, union_size): exact char-k-gram Jaccard for every
    LSH candidate pair with Jaccard >= threshold. Integer set sizes keep
    the output engine-exact."""
    clusters = minhash_lsh_clusters(docs_ds, k=k, **lsh_kwargs).to_pandas()
    by_cluster: dict[int, list[int]] = {}
    for d, c in zip(clusters["doc_id"], clusters["cluster_id"]):
        by_cluster.setdefault(int(c), []).append(int(d))
    cand_pairs = [
        (a, b)
        for ids in by_cluster.values()
        if len(ids) > 1
        for i, a in enumerate(sorted(ids))
        for b in sorted(ids)[i + 1 :]
    ]
    texts = {
        int(r["doc_id"]): r["text"]
        for r in docs_ds.select_columns(["doc_id", "text"]).iter_rows()
    }

    rows = {"a": [], "b": [], "inter_size": [], "union_size": []}
    for a, b in cand_pairs:
        sa = {texts[a][i : i + k] for i in range(max(0, len(texts[a]) - k + 1))}
        sb = {texts[b][i : i + k] for i in range(max(0, len(texts[b]) - k + 1))}
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if inter / union >= threshold:
            rows["a"].append(a)
            rows["b"].append(b)
            rows["inter_size"].append(inter)
            rows["union_size"].append(union)
    return pa.table(
        {kk: pa.array(vv, type=pa.int64()) for kk, vv in rows.items()}
    )


# ---------------------------------------------------------------------------
# Embedding near-dup / cosine
# ---------------------------------------------------------------------------


class _HyperplaneBucketer:
    """Random-hyperplane LSH signatures for embedding vectors."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        signs = (emb @ self.planes) > 0
        buckets = signs @ (1 << np.arange(signs.shape[1], dtype=np.int64))
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(buckets, type=pa.int64()),
            }
        )


def embedding_neardup_pairs(
    emb_ds, tau: float = 0.95, method: str = "bruteforce", concurrency=(1, 4)
):
    """(a, b): pairs with cosine similarity >= tau.

    bruteforce: normalized matrix broadcast via ray.put, per-batch matmul —
    exact, the baseline. lsh: hyperplane buckets -> within-bucket exact
    verify — the scale path (misses across buckets possible; recall
    controlled by n_planes)."""
    import ray

    tbl = pa.concat_tables([ray.get(r) for r in emb_ds.to_arrow_refs()])
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.clip(norms, 1e-12, None)

    if method == "bruteforce":
        mat_ref = ray.put((ids, mat))

        class PairFinder:
            def __init__(self):
                self.ids, self.mat = ray.get(mat_ref)
                self.index = {v: i for i, v in enumerate(self.ids)}

            def __call__(self, batch: pa.Table) -> pa.Table:
                bids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
                bemb = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
                bemb = bemb / np.clip(
                    np.linalg.norm(bemb, axis=1, keepdims=True), 1e-12, None
                )
                sims = bemb @ self.mat.T
                ai, bj = np.nonzero(sims >= tau)
                a = bids[ai]
                b = self.ids[bj]
                keep = a < b  # dedupe symmetric pairs + drop self
                return pa.table(
                    {
                        "a": pa.array(a[keep], type=pa.int64()),
                        "b": pa.array(b[keep], type=pa.int64()),
                    }
                )

        return emb_ds.map_batches(
            PairFinder,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )

    if method == "lsh":
        dim = mat.shape[1]
        buckets = emb_ds.map_batches(
            _HyperplaneBucketer,
            fn_constructor_kwargs={"dim": dim},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
        id_to_vec = {int(v): mat[i] for i, v in enumerate(ids)}

        def verify(group):
            import pandas as pd

            vids = sorted(int(v) for v in group["vec_id"].tolist())
            rows = {"a": [], "b": []}
            for i, a in enumerate(vids):
                for b in vids[i + 1 :]:
                    if float(id_to_vec[a] @ id_to_vec[b]) >= tau:
                        rows["a"].append(a)
                        rows["b"].append(b)
            return pd.DataFrame(rows, dtype="int64")

        return buckets.groupby("bucket").map_groups(verify, batch_format="pandas")

    raise ValueError(f"unknown method {method!r}")


def dedup_counts(survivors_ds):
    """Summary: total surviving docs + duplicate-group count."""
    return survivors_ds.groupby("n_dups").aggregate(Count(alias_name="groups"))
