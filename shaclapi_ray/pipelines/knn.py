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


def _to_matrix(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


def knn_bruteforce(emb_ds, query_ids: list[int], k: int = 10, concurrency=(1, 4)):
    """(query_id, neighbor_id, rank): exact cosine top-k per query vector.

    Excludes self-matches. rank is 1-based by (similarity desc, neighbor_id
    asc) — the deterministic tie-break shared with the SQL oracle."""
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
    q_ids = np.asarray(qtbl["vec_id"].to_pylist(), dtype=np.int64)
    q_mat = _normalize(_to_matrix(qtbl["embedding"]))
    q_ref = ray.put((q_ids, q_mat))

    def batch_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(q_ref)  # plasma-cached, zero-copy per worker
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
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
    return _final_topk_driver(candidates, k)


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


def knn_ivf(
    emb_ds,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    seed: int = 3,
    concurrency=(1, 4),
):
    """IVF-bucketed approximate top-k: centroids from a driver-side sample
    (k-means, few iterations), vectors assigned to nearest centroid in a
    map_batches pass, search restricted to each query's nprobe buckets.

    Returns (query_id, neighbor_id, rank) like knn_bruteforce; approximate
    (recall < 1 when true neighbors fall outside probed buckets)."""
    import ray

    sample = emb_ds.random_sample(
        min(1.0, sample_size / max(1, emb_ds.count())), seed=seed
    ).to_pandas()
    smat = _normalize(np.asarray(sample["embedding"].tolist(), dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = smat[rng.choice(len(smat), size=min(n_centroids, len(smat)), replace=False)]
    for _ in range(5):  # lloyd iterations
        assign = np.argmax(smat @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = smat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    cent_ref = ray.put(cent)

    def assigner(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _normalize(_to_matrix(batch["embedding"]))
        bucket = np.argmax(mat @ c.T, axis=1)
        return batch.append_column("bucket", pa.array(bucket, type=pa.int64()))

    bucketed = emb_ds.map_batches(assigner, batch_format="pyarrow", zero_copy_batch=True)

    def pick_queries(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(
            batch["vec_id"],
            value_set=pa.array(sorted(int(q) for q in query_ids), type=pa.int64()),
        )
        return batch.filter(mask)

    qtbl = bucketed.map_batches(pick_queries, batch_format="pyarrow").to_pandas()
    q_ids = qtbl["vec_id"].to_numpy(dtype=np.int64)
    q_mat = _normalize(np.asarray(qtbl["embedding"].tolist(), dtype=np.float64))
    q_buckets = {
        int(qid): np.argsort(-(q_mat[i] @ cent.T))[:nprobe].tolist()
        for i, qid in enumerate(q_ids)
    }
    probe_ref = ray.put((q_ids, q_mat, q_buckets))

    def probe_topk(batch: pa.Table) -> pa.Table:
        p_ids, p_mat, p_buckets = ray.get(probe_ref)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        buckets = np.asarray(batch["bucket"].to_pylist(), dtype=np.int64)
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

    candidates = bucketed.map_batches(
        probe_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _final_topk_driver(candidates, k)
