"""Distributed k-means + SemDeDup semantic dedup (pipelines/cluster.py).

Semantic correctness (planted blobs / planted near-dups / bruteforce
equivalence) plus the layout-independence that lets the goldens pin the
operator: exact int64 accumulation must make the fitted centroids
byte-identical regardless of how the input is partitioned."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from shaclapi_ray.pipelines.cluster import kmeans_assign, kmeans_fit, semantic_dedup


def _emb_table(vecs: np.ndarray, ids=None) -> pa.Table:
    n, dim = vecs.shape
    ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids, np.int64)
    offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    emb = pa.ListArray.from_arrays(offs, pa.array(vecs.astype(np.float32).ravel()))
    return pa.table({"vec_id": pa.array(ids), "embedding": emb})


def _blobs(seed=11, n_per=60, dim=16):
    """Two well-separated unit-sphere blobs around orthogonal axes."""
    rng = np.random.default_rng(seed)
    a = rng.normal(0, 0.05, (n_per, dim))
    a[:, 0] += 1.0
    b = rng.normal(0, 0.05, (n_per, dim))
    b[:, 1] += 1.0
    return np.vstack([a, b])


def test_kmeans_layout_independent():
    vecs = _blobs()
    tbl = _emb_table(vecs)
    c1 = kmeans_fit(rd.from_arrow(tbl).repartition(1), k=2, iters=6, seed=3)
    c8 = kmeans_fit(rd.from_arrow(tbl).repartition(8), k=2, iters=6, seed=3)
    assert np.array_equal(c1, c8)  # byte-identical, not just close


def test_kmeans_separates_blobs():
    vecs = _blobs()
    ds = rd.from_arrow(_emb_table(vecs))
    cent = kmeans_fit(ds, k=2, iters=8, seed=3)
    out = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    labels = out["cluster"].to_numpy()
    # each blob lands wholly in one cluster (label ids may swap)
    assert len(set(labels[:60])) == 1
    assert len(set(labels[60:])) == 1
    assert labels[0] != labels[60]


def test_semantic_dedup_drops_planted_neardups():
    vecs = _blobs()
    # plant: ids 0/1/2 near-identical in blob A; ids 60/61 in blob B
    vecs[1] = vecs[0] + 1e-4
    vecs[2] = vecs[0] - 1e-4
    vecs[61] = vecs[60] + 1e-4
    ds = rd.from_arrow(_emb_table(vecs))
    out = (
        semantic_dedup(ds, k=2, tau=0.9999, iters=8, seed=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(vecs)  # one row per vector
    assert out.loc[0, "keep"] and out.loc[0, "rep_id"] == 0
    assert not out.loc[1, "keep"] and out.loc[1, "rep_id"] == 0
    assert not out.loc[2, "keep"] and out.loc[2, "rep_id"] == 0
    assert out.loc[60, "keep"] and out.loc[60, "rep_id"] == 60
    assert not out.loc[61, "keep"] and out.loc[61, "rep_id"] == 60
    # everything else is its own rep at this extreme tau
    rest = out.drop(index=[1, 2, 61])
    assert rest["keep"].all()
    assert (rest["rep_id"] == rest["vec_id"]).all()


def test_semantic_dedup_k1_matches_bruteforce_components():
    """With k=1 (single cluster) semantic dedup must equal the union-find
    closure of the exact all-pairs cosine graph at the same tau."""
    from shaclapi_ray.pipelines.dedup import _union_find_labels, embedding_neardup_pairs

    tau = 0.95
    rng = np.random.default_rng(5)
    vecs = rng.normal(0, 1, (80, 12))
    vecs[10] = vecs[3] + 0.01 * rng.normal(size=12)
    vecs[40] = vecs[3] - 0.01 * rng.normal(size=12)
    vecs[55] = vecs[50] + 0.01 * rng.normal(size=12)
    ds = rd.from_arrow(_emb_table(vecs))

    sem = (
        semantic_dedup(ds, k=1, tau=tau, iters=2, seed=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pairs = embedding_neardup_pairs(ds, tau=tau, method="bruteforce").to_pandas()
    labels = _union_find_labels({"a": pairs["a"].to_numpy(), "b": pairs["b"].to_numpy()})
    expect = np.array([labels.get(i, i) for i in range(len(vecs))])
    assert np.array_equal(sem["rep_id"].to_numpy(), expect)
    assert np.array_equal(sem["keep"].to_numpy(), expect == np.arange(len(vecs)))


def test_semantic_dedup_layout_independent():
    vecs = _blobs(seed=9)
    vecs[5] = vecs[4] + 1e-4
    t = _emb_table(vecs)
    a = (
        semantic_dedup(rd.from_arrow(t).repartition(1), k=2, tau=0.999, iters=5, seed=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        semantic_dedup(rd.from_arrow(t).repartition(7), k=2, tau=0.999, iters=5, seed=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_dedup_corpus_semantic_drops_exact_dups():
    """Corpus-level composition: embed -> SemDeDup -> drop non-reps.
    Identical texts embed identically (cosine 1.0) so they must always
    collapse to the min doc_id regardless of clustering."""
    from shaclapi_ray.pipelines.dedup import dedup_corpus

    texts = [f"unique document number {i} with words {i * 7} and {i * 13}" for i in range(40)]
    texts[11] = texts[3]
    texts[25] = texts[3]
    t = pa.table(
        {"doc_id": pa.array(range(40), pa.int64()), "text": pa.array(texts)}
    )
    out = dedup_corpus(
        rd.from_arrow(t), strategy="semantic", semantic_k=2, semantic_tau=0.9999
    ).to_pandas()
    assert set(out["doc_id"]) == set(range(40)) - {11, 25}
    assert list(out.columns) == ["doc_id", "text"]


def test_kmeans_empty_raises():
    ds = rd.from_arrow(_emb_table(np.empty((0, 4)))).repartition(1)
    with pytest.raises(ValueError):
        kmeans_fit(ds, k=2)
