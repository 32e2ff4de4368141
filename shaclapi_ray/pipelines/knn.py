"""Approximate/exact nearest-neighbor search over an embedding column.

- knn_bruteforce: exact cosine top-k — query matrix broadcast once via
  ray.put, per-batch numpy matmul, per-batch local top-k, then a small
  groupby(query_id) final top-k. The per-batch candidate cut keeps the
  shuffle at O(num_batches * Q * k) rows instead of O(N * Q).
- knn_ivf: IVF-style scale path — k-means-lite coarse centroids (sampled,
  driver-side), vectors bucketed by nearest centroid, queries probe the
  nprobe nearest buckets only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from shaclapi_ray.pipelines.textstats import TOKEN_RE


def _to_matrix(col) -> np.ndarray:
    """Arrow list<float> column -> (n, dim) float64 matrix, zero-copy.

    Flattens the list column's contiguous value buffer directly
    (``flatten()`` honors slicing/offsets) instead of round-tripping
    through Python lists — the hottest conversion in every matmul stage.
    Fixed-length vectors assumed (ragged input raises)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if flat.size % n:
        raise ValueError("ragged embedding column (expected fixed-length vectors)")
    return flat.astype(np.float64, copy=False).reshape(n, flat.size // n)


def _ids(col) -> np.ndarray:
    """Arrow int column -> int64 numpy, without a Python-list detour."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _pack_matrix(mat: np.ndarray) -> pa.Array:
    """(n, d) float matrix -> plain ``binary`` array (d*8-byte float64
    rows), built from ONE contiguous buffer — no per-row Python. Arrow's
    hash join rejects list-typed payload columns; flat binary passes
    through, and `_unpack_matrix` restores the matrix vectorized."""
    m = np.ascontiguousarray(mat, dtype=np.float64)
    n, d = m.shape
    w = d * 8
    offsets = pa.py_buffer(np.arange(0, (n + 1) * w, w, dtype=np.int32).tobytes())
    return pa.Array.from_buffers(pa.binary(), n, [None, offsets, pa.py_buffer(m.tobytes())])


def _unpack_matrix(col) -> np.ndarray:
    """binary column of fixed-width float64 rows -> (n, d) matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    flat = np.frombuffer(data.tobytes(), dtype=np.float64)  # copy = alignment-safe
    return flat.reshape(n, flat.size // n)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


def knn_bruteforce(
    emb_ds, query_ids: list[int], k: int = 10, concurrency=(1, 4), merge: str = "auto"
):
    """(query_id, neighbor_id, rank): exact cosine top-k per query vector.

    Excludes self-matches. rank is 1-based by (similarity desc, neighbor_id
    asc) — the deterministic tie-break shared with the SQL oracle.

    ``merge`` picks the final candidate merge: ``'driver'`` (pandas
    DataFrame result; candidates are bounded by num_batches × Q × k, fine
    for interactive Q), ``'grouped'`` (hash-shuffle by query_id +
    per-group top-k; returns a Dataset — the scale path when Q is large
    enough that the candidate set no longer fits one machine), or
    ``'auto'`` (grouped above GROUPED_MERGE_Q queries)."""
    import ray

    qset = set(int(q) for q in query_ids)

    def pick_queries(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(
            batch["vec_id"], value_set=pa.array(sorted(qset), type=pa.int64())
        )
        return batch.filter(mask)

    qtbl = pa.concat_tables(
        [
            ray.get(r)
            for r in emb_ds.map_batches(
                pick_queries, batch_format="pyarrow"
            ).to_arrow_refs()
        ]
    )
    q_ids = _ids(qtbl["vec_id"])
    q_mat = _normalize(_to_matrix(qtbl["embedding"]))
    q_ref = ray.put((q_ids, q_mat))

    def batch_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(q_ref)  # plasma-cached, zero-copy per worker
        ids = _ids(batch["vec_id"])
        mat = _normalize(_to_matrix(batch["embedding"]))
        sims = q_mat @ mat.T  # Q x B
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        kk = min(k, sims.shape[1])
        for qi, qid in enumerate(q_ids):
            s = sims[qi]
            mask = ids != qid
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            order = cand[np.lexsort((ids[cand], -s[cand]))][:kk]
            rows["query_id"].extend([int(qid)] * len(order))
            rows["neighbor_id"].extend(ids[order].tolist())
            rows["sim"].extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "sim": pa.array(rows["sim"], type=pa.float64()),
            }
        )

    candidates = emb_ds.map_batches(
        batch_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    if merge == "grouped" or (merge == "auto" and len(qset) > GROUPED_MERGE_Q):
        return _final_topk_grouped(candidates, k)
    return _final_topk_driver(candidates, k)


GROUPED_MERGE_Q = 256  # 'auto' switches to the distributed merge above this


def _final_topk_grouped(candidates, k: int):
    """Distributed final merge: hash-shuffle the bounded per-batch
    candidates by query_id, take each group's top-k. Returns a Dataset
    (same (query_id, neighbor_id, rank) contract as the driver merge) —
    the scale path when Q × num_batches × k outgrows driver memory."""

    def topk(g):
        import pandas as pd

        g = (
            g.sort_values(["sim", "neighbor_id"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "neighbor_id": g["neighbor_id"].astype("int64"),
                "rank": (g.index + 1).astype("int64"),
            }
        )

    return candidates.groupby("query_id").map_groups(topk, batch_format="pandas")


def _final_topk_driver(candidates, k: int):
    """Merge per-batch candidate top-ks on the driver.

    Candidates are bounded by num_batches x Q x k regardless of corpus
    size (the per-batch cut is the reduction), so the driver merge is the
    scale-correct final step — no keyed shuffle needed."""
    import pandas as pd
    import ray

    tables = [ray.get(r) for r in candidates.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "rank": pd.Series(dtype="int64"),
            }
        )
    import pyarrow as _pa

    df = _pa.concat_tables(tables).to_pandas()
    df = df.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    return df[["query_id", "neighbor_id", "rank"]].astype("int64").reset_index(
        drop=True
    )


KNUTH = 2654435761  # Knuth multiplicative hash (shared with sample_corpus)


def _train_centroids(
    emb_ds, n_centroids: int, sample_size: int, seed: int
) -> np.ndarray:
    """k-means-lite coarse centroids from a driver-side SAMPLE (bounded by
    sample_size regardless of corpus size).

    Sampling is a deterministic Knuth-hash cut on vec_id — NOT
    ds.random_sample, whose draw depends on the block layout (and the
    layout depends on cluster CPU count), which would make the trained
    centroids (hence every IVF result) non-reproducible across cluster
    sizes."""
    import ray as _ray

    rows = max(1, emb_ds.count())
    # oversample slightly so the hash cut lands >= sample_size, then trim
    threshold = min(1 << 32, int((1 << 32) * min(1.0, 1.25 * sample_size / rows)))

    def pick(batch: pa.Table) -> pa.Table:
        ids = _ids(batch["vec_id"]).astype(np.uint64)
        keep = ((ids + np.uint64(seed)) * np.uint64(KNUTH)) % np.uint64(1 << 32) < threshold
        return batch.filter(pa.array(keep))

    tbl = pa.concat_tables(
        _ray.get(
            emb_ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs()
        )
    )
    order = np.argsort(_ids(tbl["vec_id"]), kind="stable")[:sample_size]
    smat = _normalize(_to_matrix(tbl["embedding"])[order])
    rng = np.random.default_rng(seed)
    cent = smat[rng.choice(len(smat), size=min(n_centroids, len(smat)), replace=False)]
    for _ in range(5):  # lloyd iterations
        assign = np.argmax(smat @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = smat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def content_fingerprint(emb_ds) -> tuple[int, int]:
    """(rows, fp): dataset-identity stamp for on-disk index reuse.

    A content fingerprint, not just a row count: a different corpus with
    the same cardinality (or even the same vec_ids — the sf0.001 and
    sf0.01 fixtures share ids with different vectors) must NOT silently
    reuse a stale on-disk index. The fingerprint is an order- and
    layout-independent wrapping-uint64 sum over each row's raw vector
    bits weighted by (vec_id + 1) — exact (no float accumulation), so
    it never spuriously invalidates across block layouts."""
    import ray as _ray_fp

    def fp_partial(batch: pa.Table) -> pa.Table:
        ids = _ids(batch["vec_id"]).astype(np.uint64)
        n = len(ids)
        if n == 0:
            return pa.table(
                {"n": pa.array([0], pa.int64()), "fp": pa.array(["0"], pa.string())}
            )
        arr = batch["embedding"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        bits = (
            flat.view(np.uint32).astype(np.uint64)
            if flat.dtype == np.float32
            else flat.view(np.uint64)
        )
        row_sums = bits.reshape(n, bits.size // n).sum(axis=1, dtype=np.uint64)
        total = ((ids + np.uint64(1)) * row_sums).sum(dtype=np.uint64)
        return pa.table(
            {"n": pa.array([n], pa.int64()), "fp": pa.array([str(int(total))], pa.string())}
        )

    rows_total, fp_total = 0, 0
    for t in _ray_fp.get(
        emb_ds.map_batches(fp_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        for nn, fp in zip(t["n"].to_pylist(), t["fp"].to_pylist()):
            rows_total += nn
            fp_total = (fp_total + int(fp)) % (1 << 64)  # wrapping merge
    return rows_total, fp_total


def fetch_query_matrix(
    emb_ds,
    query_ids,
    query_vectors=None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """(q_ids int64 array, raw float matrix): query vectors either PASSED
    DIRECTLY (``query_vectors`` row-aligned with ``query_ids`` — the
    corpus-free probe path: a production search serves queries from a
    request, not by scanning the corpus for them) or fetched from the
    corpus with one pruned scan."""
    import pyarrow.compute as pc
    import ray

    ids = np.asarray([int(x) for x in query_ids], dtype=np.int64)
    if query_vectors is not None:
        # float64 like the corpus path (_to_matrix); float32 callers
        # (pq/cluster) downcast via _normalize32 themselves
        q = np.asarray(query_vectors, dtype=np.float64)
        if q.ndim != 2 or q.shape[0] != ids.size:
            raise ValueError(
                f"query_vectors must be (len(query_ids), dim); got {q.shape} "
                f"for {ids.size} ids"
            )
        return ids, q

    qset = sorted(int(x) for x in query_ids)

    def pick_queries(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch[id_col], value_set=pa.array(qset, type=pa.int64()))
        )

    qtbl = pa.concat_tables(
        ray.get(
            emb_ds.select_columns([id_col, vec_col])
            .map_batches(pick_queries, batch_format="pyarrow")
            .to_arrow_refs()
        )
    )
    return _ids(qtbl[id_col]), _to_matrix(qtbl[vec_col])


def _structural_reuse(manifest: str, artifacts: list[str], structural: dict):
    """verify=False fast path: reuse an existing index when the manifest's
    STRUCTURAL params match, without re-fingerprinting the corpus (no
    corpus scan — a probe must not touch the corpus at 100 TB). Returns
    the manifest dict on match, else None."""
    import json
    import os

    if not all(os.path.exists(p) for p in [manifest, *artifacts]):
        return None
    with open(manifest) as f:
        stamp = json.load(f)
    if all(stamp.get(k) == v for k, v in structural.items()):
        return stamp
    return None


def build_ivf_index(
    emb_ds,
    index_dir: str,
    n_centroids: int = 16,
    sample_size: int = 2048,
    seed: int = 3,
    quantize: bool = False,
    verify: bool = True,
) -> np.ndarray:
    """One-time index build: train centroids, assign every vector to its
    nearest centroid, and persist the corpus as BUCKET-PARTITIONED parquet
    (``bucket=<id>/`` hive dirs) so probes read ONLY the probed buckets'
    files — IVF's I/O pruning, not an in-memory filter over a full scan.

    ``quantize=True`` stores symmetric int8 vectors instead of float32
    (4x smaller index and probe I/O). Per-vector scale factors CANCEL
    under the probe's normalization, so the int8 list is written under
    the same ``embedding`` column and the probe path needs no change —
    only ranking near-ties can flip (int8 grid noise).

    Idempotent per content fingerprint: a manifest records the build
    params + an exact corpus fingerprint; matching manifests reuse the
    on-disk index. ``verify=False`` skips the fingerprint RE-check on
    reuse (structural params only — rows/content_fp are trusted): the
    fingerprint costs one full corpus pass, which a probe must not pay
    at scale; keep the default True anywhere a different corpus could
    plausibly alias the same index_dir. Returns the centroid matrix
    (also persisted)."""
    import json
    import os

    import ray

    structural = {
        "train_ver": 3,
        "n_centroids": int(n_centroids),
        "seed": int(seed),
        "sample_size": int(sample_size),
        "quantize": bool(quantize),
    }
    manifest = os.path.join(index_dir, "_IVF_MANIFEST.json")
    cent_path = os.path.join(index_dir, "_centroids.npy")
    if not verify:
        if _structural_reuse(manifest, [cent_path], structural) is not None:
            return np.load(cent_path)

    rows_total, fp_total = content_fingerprint(emb_ds)
    stamp = {
        **structural,  # train_ver bumps when training/fingerprint changes
        "rows": int(rows_total),
        "content_fp": str(int(fp_total)),
    }
    if os.path.exists(manifest) and os.path.exists(cent_path):
        with open(manifest) as f:
            if json.load(f) == stamp:
                return np.load(cent_path)
        import shutil

        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    cent = _train_centroids(emb_ds, n_centroids, sample_size, seed)
    cent_ref = ray.put(cent)

    def assigner(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _normalize(_to_matrix(batch["embedding"]))
        bucket = np.argmax(mat @ c.T, axis=1)
        if quantize:
            n, dim = mat.shape
            amax = np.abs(mat).max(axis=1)
            safe = np.where(amax > 0, amax / 127.0, 1.0)
            q = np.rint(mat / safe[:, None]).astype(np.int8)
            offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
            batch = pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "embedding": pa.ListArray.from_arrays(offs, pa.array(q.ravel())),
                }
            )
        # 'bucket' moves into the partition path on write; 'b' stays a
        # data column so probe tasks can group candidates per bucket
        out = batch.append_column("bucket", pa.array(bucket, type=pa.int64()))
        return out.append_column("b", pa.array(bucket, type=pa.int64()))

    bucketed = emb_ds.map_batches(
        assigner, batch_format="pyarrow", zero_copy_batch=True
    )
    bucketed.write_parquet(index_dir, partition_cols=["bucket"])
    np.save(cent_path, cent)
    with open(manifest, "w") as f:
        json.dump(stamp, f)
    return cent


def _probed_bucket_paths(index_dir: str, buckets: set[int]) -> list[str]:
    import os

    out = []
    for b in sorted(buckets):
        p = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
    return out


def knn_ivf(
    emb_ds,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 8,
    sample_size: int = 2048,
    seed: int = 3,
    concurrency=(1, 4),
    index_dir: str | None = None,
    merge: str = "auto",
    quantize: bool = False,
    verify_index: bool = True,
    query_vectors=None,
):
    """IVF approximate top-k with REAL probe pruning: the corpus lives in
    bucket-partitioned parquet (build_ivf_index); a search reads only the
    union of the queries' nprobe bucket partitions, so probe I/O and
    compute scale with nprobe/n_centroids — not with corpus size.

    Returns (query_id, neighbor_id, rank) like knn_bruteforce; approximate
    (recall < 1 when true neighbors fall outside probed buckets).
    Operating-point note: the fixture embeddings are near-uniform random
    vectors, so recall tracks the probed fraction almost linearly
    (measured at sf0.1: 0.54 @ 4/16, 0.70 @ 6/16, 0.83 @ 8/16) — the
    worst case for IVF; real clustered embeddings sit far above that
    line at the same nprobe/n_centroids.

    ``verify_index=False`` skips the content-fingerprint re-check when a
    structurally-matching index exists (no corpus scan at probe time —
    the at-scale mode once the index is built); the default True guards
    against a different corpus aliasing the same index_dir."""
    import ray
    import ray.data

    if index_dir is None:
        index_dir = f"/tmp/shaclapi_ray_ivf/c{n_centroids}_s{seed}" + (
            "_q8" if quantize else ""
        )
    cent = build_ivf_index(
        emb_ds,
        index_dir,
        n_centroids=n_centroids,
        sample_size=sample_size,
        seed=seed,
        quantize=quantize,
        verify=verify_index,
    )

    q_ids, q_raw = fetch_query_matrix(emb_ds, query_ids, query_vectors)
    q_mat = _normalize(q_raw)
    q_buckets = {
        int(qid): np.argsort(-(q_mat[i] @ cent.T))[:nprobe].tolist()
        for i, qid in enumerate(q_ids)
    }
    probed: set[int] = set()
    for bs in q_buckets.values():
        probed.update(int(b) for b in bs)
    paths = _probed_bucket_paths(index_dir, probed)
    if not paths:
        return _final_topk_driver(
            ray.data.from_arrow(
                pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "neighbor_id": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            ),
            k,
        )
    probe_ref = ray.put((q_ids, q_mat, q_buckets))

    def probe_topk(batch: pa.Table) -> pa.Table:
        p_ids, p_mat, p_buckets = ray.get(probe_ref)
        ids = _ids(batch["vec_id"])
        buckets = _ids(batch["b"])
        mat = _normalize(_to_matrix(batch["embedding"]))
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi, qid in enumerate(p_ids):
            probe = p_buckets[int(qid)]
            mask = np.isin(buckets, probe) & (ids != qid)
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            s = mat[cand] @ p_mat[qi]
            order = cand[np.lexsort((ids[cand], -s))][: min(k, cand.size)]
            sims = mat[order] @ p_mat[qi]
            rows["query_id"].extend([int(qid)] * len(order))
            rows["neighbor_id"].extend(ids[order].tolist())
            rows["sim"].extend(sims.tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "sim": pa.array(rows["sim"], type=pa.float64()),
            }
        )

    candidates = ray.data.read_parquet(
        paths, columns=["vec_id", "embedding", "b"]
    ).map_batches(probe_topk, batch_format="pyarrow", zero_copy_batch=True)
    if merge == "grouped" or (merge == "auto" and len(q_ids) > GROUPED_MERGE_Q):
        return _final_topk_grouped(candidates, k)
    return _final_topk_driver(candidates, k)


def ivf_recall_vs_bruteforce(emb_ds, query_ids: list[int], k: int = 10, **ivf_kwargs):
    """Fraction of bruteforce top-k neighbors the IVF probe recovers —
    reported in the bench JSON per the measurement plan."""
    bf = knn_bruteforce(emb_ds, query_ids, k=k)
    iv = knn_ivf(emb_ds, query_ids, k=k, **ivf_kwargs)
    bset = set(zip(bf["query_id"], bf["neighbor_id"]))
    iset = set(zip(iv["query_id"], iv["neighbor_id"]))
    return len(bset & iset) / max(1, len(bset))


EMBED_DIM = 64
EMBED_HASH_SEED = 0x5EED


class TextEmbedder:
    """Actor-pool batched "model inference" stage: text -> embedding.

    The model seam is __init__ — that is where real encoder weights load
    ONCE PER ACTOR (not per batch); this environment ships no model libs,
    so the default model='hash' is a deterministic feature-hashing
    embedding (the hashing trick: l2-normalized token-hash bucket counts
    — cosine similarity then reflects token overlap, so near-duplicate
    documents genuinely score high), and model='error' raises exactly
    where a real encoder.forward() would run. The Ray-side plumbing —
    callable class for map_batches, batch sizing, list<float32> output
    schema — is the production shape either way.

    Per-batch work is fully vectorized: one polars token explode, one
    vectorized hash, one np.bincount over row*dim+bucket, one matrix
    normalize."""

    def __init__(self, dim: int = EMBED_DIM, model: str = "hash"):
        if model not in ("hash", "error"):
            raise ValueError(f"unknown model {model!r}")
        self.dim = int(dim)
        self.model = model

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.model == "error":
            raise NotImplementedError(
                "encoder stub: no model runtime installed — use model='hash'"
            )
        import polars as pl

        n = batch.num_rows
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        ex = (
            df.with_row_index("row")
            .with_columns(pl.col("text").str.extract_all(TOKEN_RE).alias("t"))
            .drop("text")
            .explode("t")
            .filter(pl.col("t").is_not_null())
        )
        mat = np.zeros((n, self.dim), dtype=np.float64)
        if len(ex):
            buckets = (
                ex["t"].hash(seed=EMBED_HASH_SEED).to_numpy() % self.dim
            ).astype(np.int64)
            rows = ex["row"].to_numpy().astype(np.int64)
            flat = np.bincount(rows * self.dim + buckets, minlength=n * self.dim)
            mat = flat.reshape(n, self.dim).astype(np.float64)
        mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        # list<float32> column from one flat buffer — no per-row Python
        flat32 = pa.array(np.ascontiguousarray(mat, dtype=np.float32).ravel())
        offs = pa.array(np.arange(0, (n + 1) * self.dim, self.dim, dtype=np.int32))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "embedding": pa.ListArray.from_arrays(offs, flat32),
            }
        )


def embed_corpus(
    docs_ds, dim: int = EMBED_DIM, model: str = "hash", batch_size: int = 4096
):
    """(doc_id, embedding list<float32>): embed every document with an
    actor pool (TextEmbedder state built once per actor). batch_size
    bounds batch x concurrency memory; at GPU scale add num_gpus to the
    map_batches resources and size the pool to the accelerator count."""
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        TextEmbedder,
        fn_constructor_kwargs={"dim": dim, "model": model},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 4),
    )


def quantize_embeddings(emb_ds, vec_col: str = "embedding"):
    """(vec_id, qvec list<int8>, scale float32): symmetric per-vector
    int8 quantization (q = round(v * 127 / max|v|)) — 4x smaller than
    float32 through the object store, shuffles, and the on-disk IVF
    index; the compression lever that turns 100 TB of embeddings into
    25 TB. Zero-copy Arrow in and out (flat value buffers, no per-row
    Python); all-zero vectors get scale 0 and an all-zero qvec."""

    def fn(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch[vec_col])
        n, dim = mat.shape if mat.size else (batch.num_rows, 0)
        amax = np.abs(mat).max(axis=1) if mat.size else np.zeros(n)
        scale = (amax / 127.0).astype(np.float32)
        safe = np.where(scale > 0, scale, 1.0)
        q = np.rint(mat / safe[:, None]).astype(np.int8)
        offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "qvec": pa.ListArray.from_arrays(offs, pa.array(q.ravel())),
                "scale": pa.array(scale),
            }
        )

    return emb_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def dequantize_embeddings(q_ds):
    """Inverse of quantize_embeddings: (vec_id, embedding list<float32>)
    with embedding = qvec * scale (lossy — int8 grid)."""

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch["qvec"]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        n = len(arr)
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
        dim = flat.size // n if n else 0
        scale = batch["scale"].to_numpy(zero_copy_only=False).astype(np.float32)
        mat = flat.reshape(n, dim) * scale[:, None]
        offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": pa.ListArray.from_arrays(
                    offs, pa.array(np.ascontiguousarray(mat).ravel())
                ),
            }
        )

    return q_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
