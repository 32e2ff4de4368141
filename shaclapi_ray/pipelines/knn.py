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

    class BatchTopK:
        def __init__(self):
            self.q_ids, self.q_mat = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            mat = _normalize(_to_matrix(batch["embedding"]))
            sims = self.q_mat @ mat.T  # Q x B
            rows = {"query_id": [], "neighbor_id": [], "sim": []}
            kk = min(k, sims.shape[1])
            for qi, qid in enumerate(self.q_ids):
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
        BatchTopK,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )

    def final_topk(group):
        import pandas as pd

        g = group.sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        ).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "neighbor_id": g["neighbor_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
            }
        )

    return candidates.groupby("query_id").map_groups(final_topk, batch_format="pandas")


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

    class Assigner:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_to_matrix(batch["embedding"]))
            bucket = np.argmax(mat @ self.cent.T, axis=1)
            return batch.append_column("bucket", pa.array(bucket, type=pa.int64()))

    bucketed = emb_ds.map_batches(
        Assigner, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )

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

    class ProbeTopK:
        def __init__(self):
            self.q_ids, self.q_mat, self.q_buckets = ray.get(probe_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            buckets = np.asarray(batch["bucket"].to_pylist(), dtype=np.int64)
            mat = _normalize(_to_matrix(batch["embedding"]))
            rows = {"query_id": [], "neighbor_id": [], "sim": []}
            for qi, qid in enumerate(self.q_ids):
                probe = self.q_buckets[int(qid)]
                mask = np.isin(buckets, probe) & (ids != qid)
                cand = np.nonzero(mask)[0]
                if cand.size == 0:
                    continue
                s = mat[cand] @ self.q_mat[qi]
                order = cand[np.lexsort((ids[cand], -s))][: min(k, cand.size)]
                sims = mat[order] @ self.q_mat[qi]
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
        ProbeTopK, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )

    def final_topk(group):
        import pandas as pd

        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "neighbor_id": g["neighbor_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
            }
        )

    return candidates.groupby("query_id").map_groups(final_topk, batch_format="pandas")
