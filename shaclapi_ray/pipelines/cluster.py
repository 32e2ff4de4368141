"""Distributed k-means + semantic (cluster-scoped) embedding dedup.

The scale path for embedding near-dup at 100 TB is neither all-pairs
(O(n^2)) nor pure hyperplane LSH (recall collapses at low tau): cluster
the corpus with k-means and compare cosine similarity only WITHIN each
cluster — the SemDeDup recipe (Abbas et al., arXiv:2303.09540). The
reference (SDM-TIB/shaclAPI) has no clustering; this extends the engine's
embedding operators (pipelines/knn.py) with the missing piece between
`embedding_neardup` (exact, quadratic) and `embedding_neardup_lsh`
(approximate, hash-recall-bound).

Ray-Data shapes:
- `kmeans_fit` — Lloyd's iterations as repeated STREAMING passes: each
  iteration broadcasts the (k, dim) centroid matrix once via ``ray.put``
  and runs one `map_batches` pass emitting per-batch partial sums; the
  driver combines k rows per batch (never corpus-proportional). No
  shuffle at any scale; at 100 TB each iteration re-reads from Parquet
  (the object store never holds the corpus).
- Partial sums accumulate in EXACT int64 (vectors quantized at 2^20)
  so the combine is commutative/associative with no float rounding —
  the fitted centroids are byte-identical regardless of block layout /
  cluster size, which is what lets the goldens pin them.
- `semantic_dedup` — one `groupby(cluster)` shuffle, then a vectorized
  per-group pairwise-cosine pass (chunked matmul, memory O(chunk * g)).
  Per-group work is O(g^2): size k so the mean group n/k stays in the
  ~10^4..10^5 band (SemDeDup uses k ~ 10^4-10^5 clusters at corpus
  scale; the group matmul at g=10^5, dim 64 is ~0.6 TFLOP — seconds on
  one core's BLAS, and clusters shard across the cluster).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from shaclapi_ray.pipelines.knn import KNUTH, _ids, _to_matrix

QSCALE = 1 << 20  # vector quantization step for exact int64 accumulation


def _normalize32(mat: np.ndarray) -> np.ndarray:
    """Unit-normalize in float32: the per-group similarity matmuls run
    ~4x faster than float64 on this BLAS and the goldens pin the (still
    fully deterministic) float32 results. The knn/__ray_entry__ paths
    keep float64 `_normalize` for DuckDB-SQL oracle parity."""
    m = np.ascontiguousarray(mat, dtype=np.float32)
    if m.size == 0:
        return m
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n > 0, n, 1.0).astype(np.float32)


def _sample_matrix(
    emb_ds, sample_size: int, seed: int, vec_col: str, id_col: str
) -> np.ndarray:
    """Deterministic sample of normalized vectors: the ``sample_size``
    rows with globally smallest Knuth hash of (id + seed) — ONE pass
    (per-batch bottom-k partials, driver merge of <= sample_size rows
    per block), reproducible across block layouts (ds.random_sample
    would depend on the layout, and a threshold-filter sample would
    need an extra count() pass)."""
    import ray

    def pick(batch: pa.Table) -> pa.Table:
        ids = _ids(batch[id_col]).astype(np.uint64)
        h = (ids + np.uint64(seed)) * np.uint64(KNUTH)  # wraps mod 2^64
        k = min(sample_size, len(h))
        part = np.argpartition(h, k - 1)[:k] if len(h) > k else np.arange(len(h))
        sub = batch.take(pa.array(part))
        return sub.append_column("__h", pa.array(h[part].view(np.int64)))

    tbl = pa.concat_tables(
        ray.get(emb_ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs())
    )
    if tbl.num_rows == 0:  # empty refs drop the schema — can't index columns
        return np.empty((0, 0), dtype=np.float32)
    h = tbl["__h"].to_numpy(zero_copy_only=False).view(np.uint64)
    order = np.lexsort((_ids(tbl[id_col]), h))[:sample_size]
    return _normalize32(_to_matrix(tbl[vec_col])[order])


def kmeans_fit(
    emb_ds,
    k: int = 8,
    iters: int = 10,
    seed: int = 7,
    sample_size: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Distributed Lloyd's k-means over unit-normalized vectors (cosine
    geometry: assignment = argmax dot product, centroids re-normalized).

    Returns the (k, dim) float32 centroid matrix. Deterministic for a
    given (k, iters, seed, corpus) independent of block layout: per-batch
    partial sums are exact int64 (see module docstring) and the combine
    is a plain integer np.add.at. Empty clusters keep their previous
    centroid. Stops early when an iteration leaves every centroid
    byte-identical."""
    import ray

    smat = _sample_matrix(emb_ds, sample_size, seed, vec_col, id_col)
    if len(smat) == 0:
        raise ValueError("kmeans_fit: empty embedding dataset")
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(smat))
    cent = _normalize32(smat[rng.choice(len(smat), size=k_eff, replace=False)])

    for _ in range(iters):
        ref = ray.put(np.ascontiguousarray(cent))

        def partial(batch: pa.Table, _ref=ref, _k=k_eff) -> pa.Table:
            c = ray.get(_ref)
            mat = _normalize32(_to_matrix(batch[vec_col]))
            if mat.size == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "count": pa.array([], pa.int64()),
                        "qsum": pa.array([], pa.list_(pa.int64())),
                    }
                )
            assign = np.argmax(mat @ c.T, axis=1)
            q = np.rint(mat * QSCALE).astype(np.int64)
            sums = np.zeros((_k, q.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, q)
            counts = np.bincount(assign, minlength=_k).astype(np.int64)
            nz = np.nonzero(counts)[0]
            dim = q.shape[1]
            offs = pa.array(np.arange(0, (len(nz) + 1) * dim, dim, dtype=np.int32))
            return pa.table(
                {
                    "cluster": pa.array(nz.astype(np.int64)),
                    "count": pa.array(counts[nz]),
                    "qsum": pa.ListArray.from_arrays(offs, pa.array(sums[nz].ravel())),
                }
            )

        parts = pa.concat_tables(
            ray.get(
                emb_ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
            )
        )
        if len(parts) == 0:
            break
        cl = parts["cluster"].to_numpy(zero_copy_only=False)
        cnt = parts["count"].to_numpy(zero_copy_only=False)
        qflat = parts["qsum"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        dim = qflat.size // len(parts)
        qmat = qflat.reshape(len(parts), dim)
        tot = np.zeros((k_eff, dim), dtype=np.int64)
        np.add.at(tot, cl, qmat)
        totc = np.zeros(k_eff, dtype=np.int64)
        np.add.at(totc, cl, cnt)
        new = cent.copy()
        nz = totc > 0
        # exact int64 sums -> float64 means -> float32 cast: still a
        # deterministic function of the (layout-independent) totals
        new[nz] = (tot[nz] / (totc[nz, None] * float(QSCALE))).astype(np.float32)
        new = _normalize32(new)
        if np.array_equal(new, cent):
            break
        cent = new
    return cent


def kmeans_assign(emb_ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Append a ``cluster`` (int64) column = nearest centroid by cosine.
    Centroids broadcast once via ray.put; per-batch argmax matmul."""
    import ray

    ref = ray.put(np.ascontiguousarray(centroids, dtype=np.float32))

    def fn(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = _normalize32(_to_matrix(batch[vec_col]))
        a = (
            np.argmax(mat @ c.T, axis=1).astype(np.int64)
            if mat.size
            else np.empty(0, np.int64)
        )
        return batch.append_column("cluster", pa.array(a))

    return emb_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SIM_CHUNK = 2048  # rows of the per-group similarity matmul held at once


def _group_dedup(t: pa.Table, tau: float, vec_col: str, id_col: str) -> pa.Table:
    """Within one cluster: connected components of the cosine>=tau graph,
    rep = min id per component, keep = (id == rep). Chunked matmul keeps
    memory at O(_SIM_CHUNK * g) for a group of g rows."""
    from shaclapi_ray.pipelines.dedup import _union_find_labels

    ids = _ids(t[id_col])
    n = len(ids)
    if n == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "rep_id": pa.array([], pa.int64()),
                "keep": pa.array([], pa.bool_()),
            }
        )
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = _normalize32(_to_matrix(t[vec_col])[order])
    cluster = int(t["cluster"][0].as_py())
    ea_all, eb_all = [], []
    for s in range(0, n, _SIM_CHUNK):
        e = min(n, s + _SIM_CHUNK)
        sims = mat[s:e] @ mat.T
        ii, jj = np.nonzero(sims >= tau)
        gi = ii + s
        m = jj > gi  # strict upper triangle: each pair once, no self-pairs
        ea_all.append(gi[m])
        eb_all.append(jj[m])
    ea = np.concatenate(ea_all) if ea_all else np.empty(0, np.int64)
    eb = np.concatenate(eb_all) if eb_all else np.empty(0, np.int64)
    labels = _union_find_labels({"a": ids[ea], "b": ids[eb]})
    rep = np.array([labels.get(int(i), int(i)) for i in ids], dtype=np.int64)
    return pa.table(
        {
            id_col: pa.array(ids),
            "cluster": pa.array(np.full(n, cluster, dtype=np.int64)),
            "rep_id": pa.array(rep),
            "keep": pa.array(ids == rep),
        }
    )


def semantic_dedup(
    emb_ds,
    k: int = 8,
    tau: float = 0.9,
    iters: int = 10,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
):
    """SemDeDup: k-means partition, then per-cluster cosine components.

    Returns Dataset[(vec_id, cluster, rep_id, keep)] — one row per input
    vector; ``keep`` is False for every vector whose component already
    has a smaller-id member in the SAME cluster (cross-cluster near-dups
    are the documented approximation, exactly SemDeDup's). Deterministic
    across layouts (exact k-means + min-id reps), hence golden-pinnable.
    One groupby(cluster) shuffle; everything else is map_batches."""
    cent = (
        centroids
        if centroids is not None
        else kmeans_fit(
            emb_ds, k=k, iters=iters, seed=seed, vec_col=vec_col, id_col=id_col
        )
    )
    assigned = kmeans_assign(emb_ds, cent, vec_col=vec_col)

    def fn(t: pa.Table) -> pa.Table:
        return _group_dedup(t, tau, vec_col, id_col)

    return assigned.groupby("cluster").map_groups(fn, batch_format="pyarrow")
