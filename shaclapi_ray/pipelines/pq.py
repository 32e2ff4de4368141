"""Product quantization for embedding ANN (Jegou, Douze, Schmid 2011).

The compression lever beyond int8 (pipelines/knn.quantize_embeddings):
PQ stores each unit-normalized vector as ``m`` uint8 codebook indices —
64 float32 dims (256 B) become 8 bytes (32x) — and searches with
asymmetric distance computation (ADC): the query stays exact, each
candidate's score is a sum of ``m`` table lookups, no decode. This is
the standard shape for 100 TB embedding corpora (FAISS IVF-PQ): codes
small enough to shuffle/broadcast freely, scan cost m lookups/vector.

Ray-Data shapes:
- ``pq_train`` — codebooks fit driver-side on the deterministic
  bottom-k-by-hash sample (cluster._sample_matrix, ONE streaming pass);
  per-subspace exact float32 Lloyd's. Sample-fit is the standard PQ
  recipe (training needs ~100x k points, not the corpus) and keeps the
  model a layout-independent function of the dataset.
- ``pq_encode`` — one map_batches pass; codebooks broadcast once via
  ray.put; per-subspace argmin over ||x - c||^2 fully vectorized.
- ``pq_search`` — ADC: per-query (m, k) dot-product LUT broadcast once;
  per batch of codes the score matrix is m fancy-indexed adds (no
  per-row Python); local top-k then the shared driver/grouped merge
  from pipelines/knn (same contract and tie-breaks as knn_bruteforce).

No counterpart in the reference (SDM-TIB/shaclAPI has no vector
search); extends the engine's ANN surface (knn_bruteforce exact,
knn_ivf partition-pruned, PQ compressed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from shaclapi_ray.pipelines.cluster import _normalize32, _sample_matrix
from shaclapi_ray.pipelines.knn import (
    GROUPED_MERGE_Q,
    _final_topk_driver,
    _final_topk_grouped,
    _ids,
    _to_matrix,
)


def _driver_kmeans(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Exact float32 Lloyd's over a driver-held sample; deterministic for
    (x, k, iters, seed). Empty clusters keep their previous centroid."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(x))
    cent = x[rng.choice(len(x), size=k_eff, replace=False)].copy()
    for _ in range(iters):
        # argmin ||x-c||^2 = argmin (||c||^2 - 2 x.c)
        d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (x @ cent.T)
        assign = np.argmin(d, axis=1)
        sums = np.zeros((k_eff, x.shape[1]), dtype=np.float64)
        np.add.at(sums, assign, x)  # scatter-sum, no per-centroid loop
        counts = np.bincount(assign, minlength=k_eff)
        new = cent.copy()
        nz = counts > 0
        new[nz] = (sums[nz] / counts[nz, None]).astype(np.float32)
        if np.array_equal(new, cent):
            break
        cent = new
    return cent


def pq_train(
    emb_ds,
    m: int = 8,
    k: int = 256,
    iters: int = 20,
    seed: int = 7,
    sample_size: int = 8192,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Fit per-subspace codebooks. Returns {'codebooks': (m, k, dsub)
    float32, 'm': m, 'dsub': dsub}. Vectors are unit-normalized before
    splitting (the search ranks by approximate cosine)."""
    smat = _sample_matrix(emb_ds, sample_size, seed, vec_col, id_col)
    if len(smat) == 0:
        raise ValueError("pq_train: empty embedding dataset")
    return _fit_codebooks(smat, m, k, iters, seed)


def _fit_codebooks(smat: np.ndarray, m: int, k: int, iters: int, seed: int) -> dict:
    """Per-subspace k-means over an in-memory training matrix — shared by
    pq_train (raw normalized vectors) and the residual IVF-PQ build
    (vectors minus their coarse centroid)."""
    dim = smat.shape[1]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.stack(
        [
            _driver_kmeans(smat[:, j * dsub : (j + 1) * dsub], k, iters, seed + j)
            for j in range(m)
        ]
    )
    return {"codebooks": books, "m": m, "dsub": dsub}


def pq_encode(emb_ds, model: dict, vec_col: str = "embedding", id_col: str = "vec_id"):
    """(vec_id, code list<uint8>): each vector's m codebook indices."""
    import ray

    ref = ray.put(np.ascontiguousarray(model["codebooks"]))
    m, dsub = model["m"], model["dsub"]

    def fn(batch: pa.Table) -> pa.Table:
        books = ray.get(ref)
        mat = _normalize32(_to_matrix(batch[vec_col]))
        n = mat.shape[0] if mat.size else batch.num_rows
        codes = np.zeros((n, m), dtype=np.uint8)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub] if mat.size else mat
            c = books[j]
            if sub.size:
                d = (c * c).sum(axis=1)[None, :] - 2.0 * (sub @ c.T)
                codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
        offs = pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32))
        return pa.table(
            {
                id_col: batch[id_col],
                "code": pa.ListArray.from_arrays(offs, pa.array(codes.ravel())),
            }
        )

    return emb_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _exact_rerank(emb_ds, cand_df, q_ids, q_mat, k, vec_col, id_col):
    """Rerank ADC candidates with exact cosine — the standard PQ recipe
    (quantized scan finds the neighborhood, a bounded exact pass fixes
    the fine order). One streaming filter pass pulls ONLY the candidate
    vectors (|candidates| <= Q * window, never corpus-proportional);
    the rerank itself is a driver-side (Q, window) matmul."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    if hasattr(cand_df, "to_pandas"):
        cand_df = cand_df.to_pandas()
    need = sorted(set(int(i) for i in cand_df["neighbor_id"]))
    if not need:
        return cand_df.iloc[:0][["query_id", "neighbor_id", "rank"]]

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch[id_col], value_set=pa.array(need, type=pa.int64()))
        )

    tbl = pa.concat_tables(
        ray.get(emb_ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs())
    )
    nid = _ids(tbl[id_col])
    nmat = _normalize32(_to_matrix(tbl[vec_col]))
    pos = {int(i): p for p, i in enumerate(nid)}
    qpos = {int(q): i for i, q in enumerate(q_ids)}
    rows = []
    for qid, grp in cand_df.groupby("query_id"):
        qi = qpos[int(qid)]
        cand = np.array([pos[int(i)] for i in grp["neighbor_id"]], dtype=np.int64)
        sims = (nmat[cand] @ q_mat[qi]).astype(np.float64)
        cids = nid[cand]
        order = np.lexsort((cids, -sims))[: min(k, len(cand))]
        for r, oi in enumerate(order, 1):
            rows.append((int(qid), int(cids[oi]), r))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"]).astype(
        "int64"
    )


def pq_search(
    emb_ds,
    query_ids: list[int],
    k: int = 10,
    model: dict | None = None,
    codes_ds=None,
    merge: str = "auto",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rerank_window: int | None = None,
    query_vectors=None,
    **train_kwargs,
):
    """(query_id, neighbor_id, rank): approximate cosine top-k via ADC.

    Queries are read EXACT from ``emb_ds`` (asymmetric: only candidates
    are quantized); ``codes_ds`` reuses a persisted pq_encode output,
    otherwise codes are computed in-pipeline. Self-matches excluded;
    ties break (score desc, neighbor_id asc) exactly like
    knn_bruteforce, so outputs are layout-independent and
    golden-pinnable. ``rerank_window``: take that many ADC candidates
    per query, then rerank them with EXACT cosine (one bounded filter
    pass) — restores fine ordering PQ quantization blurs."""
    import ray

    if model is None:
        model = pq_train(emb_ds, vec_col=vec_col, id_col=id_col, **train_kwargs)
    m, dsub = model["m"], model["dsub"]
    books = model["codebooks"]  # (m, kc, dsub)

    from shaclapi_ray.pipelines.knn import fetch_query_matrix

    q_ids, q_raw = fetch_query_matrix(
        emb_ds, query_ids, query_vectors, vec_col=vec_col, id_col=id_col
    )
    q_mat = _normalize32(q_raw)
    # per-query LUT of subspace dot products: (Q, m, kc) — score of a
    # candidate = sum_j LUT[q, j, code_j] ~= cosine(q, candidate)
    Q = len(q_ids)
    lut = (
        np.einsum("qjd,jkd->qjk", q_mat.reshape(Q, m, dsub), books)
        if Q
        else np.zeros((0, m, books.shape[1]), np.float32)
    )
    lut_ref = ray.put((q_ids, np.ascontiguousarray(lut, dtype=np.float32)))

    codes = codes_ds if codes_ds is not None else pq_encode(emb_ds, model, vec_col, id_col)
    sel_k = rerank_window if rerank_window else k

    def batch_topk(batch: pa.Table) -> pa.Table:
        q_ids, lut = ray.get(lut_ref)
        ids = _ids(batch[id_col])
        col = batch["code"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        n = len(ids)
        cmat = flat.reshape(n, m).astype(np.int64)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        if n == 0 or len(q_ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        # scores (Q, n): m fancy-indexed adds, no per-row Python
        scores = np.zeros((len(q_ids), n), dtype=np.float32)
        for j in range(m):
            scores += lut[:, j, cmat[:, j]]
        kk = min(sel_k, n)
        for qi, qid in enumerate(q_ids):
            s = scores[qi].astype(np.float64)
            cand = np.nonzero(ids != qid)[0]
            if cand.size == 0:
                continue
            order = cand[np.lexsort((ids[cand], -s[cand]))][:kk]
            out["query_id"].extend([int(qid)] * len(order))
            out["neighbor_id"].extend(ids[order].tolist())
            out["sim"].extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
            }
        )

    candidates = codes.map_batches(
        batch_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    if rerank_window:
        cand = _final_topk_driver(candidates, sel_k)
        return _exact_rerank(emb_ds, cand, q_ids, q_mat, k, vec_col, id_col)
    if merge == "grouped" or (merge == "auto" and len(q_ids) > GROUPED_MERGE_Q):
        return _final_topk_grouped(candidates, k)
    return _final_topk_driver(candidates, k)


def build_ivf_pq_index(
    emb_ds,
    index_dir: str,
    n_centroids: int = 16,
    m: int = 8,
    k: int = 256,
    sample_size: int = 2048,
    seed: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    verify: bool = True,
    residual: bool = False,
):
    """IVF-PQ index: bucket-partitioned parquet of (vec_id, code, b) —
    the canonical 100-TB ANN layout (FAISS IVFADC): probes read ONLY the
    probed buckets' files (IVF's I/O pruning) and each file holds m
    uint8 codes per vector instead of the float32 vector (PQ's 32×
    compression), so probe I/O shrinks by BOTH factors. Idempotent per
    content fingerprint (same stamp discipline as knn.build_ivf_index).
    Returns (coarse_centroids, pq_model).

    ``residual=True`` is the full FAISS-IVFADC encoding: codebooks are
    fit on (vector - coarse centroid) residuals and codes quantize the
    residual, which is smaller-normed and better resolved by the same
    256-entry codebooks. The inner-product score decomposes additively
    (q·v = q·c_b + q·r), so the probe stays one LUT pass plus a scalar
    per-candidate bucket constant — no per-bucket LUTs. Off by default:
    the raw encoding is the golden-pinned driver path."""
    import json
    import os

    import ray

    from shaclapi_ray.pipelines.knn import (
        _structural_reuse,
        _train_centroids,
        content_fingerprint,
    )

    structural = {
        "kind": "ivf_pq",
        "train_ver": 1,
        "n_centroids": int(n_centroids),
        "m": int(m),
        "k": int(k),
        "seed": int(seed),
        "sample_size": int(sample_size),
        "residual": bool(residual),
    }
    manifest = os.path.join(index_dir, "_IVF_PQ_MANIFEST.json")
    cent_path = os.path.join(index_dir, "_centroids.npy")
    books_path = os.path.join(index_dir, "_pq_codebooks.npy")
    if not verify:
        # probe-time fast path: no corpus scan (see knn.build_ivf_index)
        if _structural_reuse(manifest, [cent_path, books_path], structural):
            books = np.load(books_path)
            model = {
                "codebooks": books,
                "m": int(m),
                "dsub": books.shape[2],
                "residual": bool(residual),
            }
            return np.load(cent_path), model

    rows_total, fp_total = content_fingerprint(emb_ds)
    stamp = {
        **structural,
        "rows": int(rows_total),
        "content_fp": str(int(fp_total)),
    }
    if all(os.path.exists(p) for p in (manifest, cent_path, books_path)):
        with open(manifest) as f:
            if json.load(f) == stamp:
                books = np.load(books_path)
                model = {
                    "codebooks": books,
                    "m": int(m),
                    "dsub": books.shape[2],
                    "residual": bool(residual),
                }
                return np.load(cent_path), model
        import shutil

        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    cent = _train_centroids(emb_ds, n_centroids, sample_size, seed)
    c32 = np.ascontiguousarray(cent, dtype=np.float32)
    if residual:
        smat = _sample_matrix(emb_ds, sample_size, seed, vec_col, id_col)
        if len(smat) == 0:
            raise ValueError("build_ivf_pq_index: empty embedding dataset")
        near = np.argmax(smat @ c32.T, axis=1)
        model = _fit_codebooks(smat - c32[near], m, k, iters=20, seed=seed)
    else:
        model = pq_train(
            emb_ds,
            m=m,
            k=k,
            seed=seed,
            sample_size=sample_size,
            vec_col=vec_col,
            id_col=id_col,
        )
    model["residual"] = bool(residual)
    cent_ref = ray.put(c32)
    books_ref = ray.put(np.ascontiguousarray(model["codebooks"]))
    dsub = model["dsub"]

    def assigner(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        books = ray.get(books_ref)
        mat = _normalize32(_to_matrix(batch[vec_col]))
        n = mat.shape[0] if mat.size else batch.num_rows
        bucket = (
            np.argmax(mat @ c.T, axis=1).astype(np.int64)
            if mat.size
            else np.empty(0, np.int64)
        )
        if residual and mat.size:
            mat = mat - c[bucket]  # codes quantize the residual
        codes = np.zeros((n, m), dtype=np.uint8)
        for j in range(m):
            cb = books[j]
            sub = mat[:, j * dsub : (j + 1) * dsub] if mat.size else mat
            if sub.size:
                d = (cb * cb).sum(axis=1)[None, :] - 2.0 * (sub @ cb.T)
                codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
        offs = pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32))
        return pa.table(
            {
                id_col: batch[id_col],
                "code": pa.ListArray.from_arrays(offs, pa.array(codes.ravel())),
                "bucket": pa.array(bucket),
                "b": pa.array(bucket),
            }
        )

    emb_ds.map_batches(
        assigner, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(index_dir, partition_cols=["bucket"])
    np.save(cent_path, cent)
    np.save(books_path, model["codebooks"])
    with open(manifest, "w") as f:
        json.dump(stamp, f)
    return cent, model


def knn_ivf_pq(
    emb_ds,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 8,
    m: int = 8,
    index_dir: str | None = None,
    sample_size: int = 2048,
    seed: int = 3,
    merge: str = "auto",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    verify_index: bool = True,
    query_vectors=None,
    residual: bool = False,
):
    """(query_id, neighbor_id, rank): IVF-pruned ADC search over the PQ
    index — reads only the probed buckets' code files, scores each
    candidate with m table lookups, merges with the shared knn top-k
    contract. Recall loses to both the probe miss (as knn_ivf) and PQ
    quantization (rank by coarse neighborhoods; rerank the top window
    with exact vectors when fine order matters). ``residual=True``
    probes a residual-encoded index (see build_ivf_pq_index): the score
    adds the candidate's q·centroid constant to the residual LUT sum —
    same I/O, tighter quantization."""
    import ray
    import ray.data

    from shaclapi_ray.pipelines.knn import (
        _final_topk_driver,
        _final_topk_grouped,
        _probed_bucket_paths,
        fetch_query_matrix,
    )

    if index_dir is None:
        suffix = "_res" if residual else ""
        index_dir = f"/tmp/shaclapi_ray_ivfpq/c{n_centroids}_m{m}_s{seed}{suffix}"
    cent, model = build_ivf_pq_index(
        emb_ds,
        index_dir,
        n_centroids=n_centroids,
        m=m,
        sample_size=sample_size,
        seed=seed,
        vec_col=vec_col,
        id_col=id_col,
        verify=verify_index,
        residual=residual,
    )
    dsub = model["dsub"]
    books = model["codebooks"]

    q_ids, q_raw = fetch_query_matrix(
        emb_ds, query_ids, query_vectors, vec_col=vec_col, id_col=id_col
    )
    q_mat = _normalize32(q_raw)
    q_buckets = {
        int(qid): np.argsort(-(q_mat[i] @ cent.T.astype(np.float32)))[:nprobe].tolist()
        for i, qid in enumerate(q_ids)
    }
    probed: set[int] = set()
    for bs in q_buckets.values():
        probed.update(int(b) for b in bs)
    paths = _probed_bucket_paths(index_dir, probed)
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )
    if not paths or len(q_ids) == 0:
        return _final_topk_driver(ray.data.from_arrow(empty), k)
    Q = len(q_ids)
    lut = np.einsum("qjd,jkd->qjk", q_mat.reshape(Q, m, dsub), books)
    # residual decomposition: q·v = q·c_b + q·r — one (Q, n_centroids)
    # constant matrix, added per candidate by its bucket (no per-bucket LUTs)
    q_cent = (
        np.ascontiguousarray(q_mat @ cent.T.astype(np.float32), dtype=np.float32)
        if residual
        else None
    )
    probe_ref = ray.put(
        (q_ids, np.ascontiguousarray(lut, dtype=np.float32), q_buckets, q_cent)
    )

    def probe_topk(batch: pa.Table) -> pa.Table:
        p_ids, p_lut, p_buckets, p_qcent = ray.get(probe_ref)
        ids = _ids(batch[id_col])
        buckets = _ids(batch["b"])
        col = batch["code"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(ids)
        cmat = arr.flatten().to_numpy(zero_copy_only=False).reshape(n, m).astype(np.int64)
        scores = np.zeros((len(p_ids), n), dtype=np.float32)
        for j in range(m):
            scores += p_lut[:, j, cmat[:, j]]
        if p_qcent is not None:
            scores += p_qcent[:, buckets]
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi, qid in enumerate(p_ids):
            mask = np.isin(buckets, p_buckets[int(qid)]) & (ids != qid)
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            s = scores[qi].astype(np.float64)
            order = cand[np.lexsort((ids[cand], -s[cand]))][: min(k, cand.size)]
            out["query_id"].extend([int(qid)] * len(order))
            out["neighbor_id"].extend(ids[order].tolist())
            out["sim"].extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
            }
        )

    candidates = ray.data.read_parquet(
        paths, columns=[id_col, "code", "b"]
    ).map_batches(probe_topk, batch_format="pyarrow", zero_copy_batch=True)
    if merge == "grouped" or (merge == "auto" and len(q_ids) > GROUPED_MERGE_Q):
        return _final_topk_grouped(candidates, k)
    return _final_topk_driver(candidates, k)
