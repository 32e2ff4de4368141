"""Regression tests for the round-2 ADVICE findings:

1. A crash BETWEEN the atomic partition commit (os.replace) and the
   manifest write must not wedge the job: on resume the unrecorded
   part_dir is crash debris and the partition is reprocessed cleanly
   (previously os.replace onto the non-empty dir raised ENOTEMPTY).
   Covered for both ResumableMapJob and CheckpointedValidation.
2. build_ivf_index's reuse stamp must carry dataset identity: a
   different corpus with the SAME row count must not be served neighbors
   from a stale on-disk index.
3. tfidf_top_terms with an empty vocabulary (min_df filters every
   token) must return an empty result, not IndexError.
4. Above the driver limit, LSH candidate pairs stay a Dataset end-to-end
   (no driver pandas round-trip) and distributed labeling still matches
   the driver union-find.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


# -- 1a: resumable crash window ---------------------------------------------


def test_resumable_recovers_from_commit_manifest_crash(ray_session, tmp_path):
    from shaclapi_ray.pagegen import generate_pages
    from shaclapi_ray.resumable import ResumableMapJob

    pages = generate_pages(str(tmp_path / "pages"), 30_000)  # 2 part files

    def fn(ds):
        return ds.map_batches(
            lambda t: t.select(["url"]), batch_format="pyarrow"
        )

    out = str(tmp_path / "out")
    job = ResumableMapJob(fn, out, columns=["url"])
    assert not job.run(pages, stop_after=1)

    # simulate the crash: the part_dir committed but the manifest write
    # never landed
    m = job.manifest()
    assert len(m["completed"]) == 1
    pid = next(iter(m["completed"]))
    part_dir = os.path.join(out, "partitions", pid)
    assert os.path.isdir(part_dir)
    m["completed"] = {}
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump(m, f)

    # resume must reprocess the partition without ENOTEMPTY and finish
    assert ResumableMapJob(fn, out, columns=["url"]).run(pages)
    final = ResumableMapJob(fn, out, columns=["url"]).manifest()
    assert len(final["completed"]) == 2


# -- 1b: checkpointed validation crash window --------------------------------


def test_checkpoint_recovers_from_commit_manifest_crash(ray_session, tmp_path):
    from shaclapi_ray.checkpoint import CheckpointedValidation
    from shaclapi_ray.fixtures import url_shape
    from shaclapi_ray.pagegen import generate_pages

    pages = generate_pages(str(tmp_path / "pages"), 30_000)  # 2 part files
    out = str(tmp_path / "ckpt")
    job = CheckpointedValidation([url_shape()], out_dir=out)
    assert not job.run_phase1(pages, stop_after=1)

    m = job.manifest()
    assert len(m["completed"]) == 1
    pid = m["completed"][0]
    assert os.path.isdir(os.path.join(out, "partitions", pid))
    m["completed"] = []
    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump(m, f)

    job2 = CheckpointedValidation([url_shape()], out_dir=out)
    assert job2.run_phase1(pages)
    assert len(job2.manifest()["completed"]) == 2


# -- 2: IVF index stamp carries dataset identity ------------------------------


def _emb_ds(vec_ids, seed):
    import ray.data

    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(len(vec_ids), 8)).astype(np.float32)
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            }
        )
    )


def test_ivf_index_not_reused_for_different_corpus(ray_session, tmp_path):
    from shaclapi_ray.pipelines.knn import build_ivf_index, knn_ivf

    index_dir = str(tmp_path / "ivf")
    corpus_a = _emb_ds(list(range(100)), seed=1)
    build_ivf_index(corpus_a, index_dir, n_centroids=4, sample_size=64)

    # same row count, disjoint ids: the stale index must be rebuilt, so
    # every served neighbor comes from corpus B
    corpus_b = _emb_ds(list(range(1000, 1100)), seed=2)
    res = knn_ivf(
        corpus_b, [1000, 1001], k=5, n_centroids=4, nprobe=4,
        sample_size=64, index_dir=index_dir,
    )
    neighbors = res["neighbor_id"].to_numpy()
    assert len(neighbors) > 0
    assert (neighbors >= 1000).all(), "stale index served old corpus vectors"


def test_ivf_index_rebuilt_on_same_ids_different_vectors(ray_session, tmp_path):
    """The fixture corpora at sf0.001 and sf0.01 share vec_ids 0..499 with
    DIFFERENT vectors — an id-only stamp silently reused the stale index.
    The content fingerprint must differ when only the vectors change."""
    from shaclapi_ray.pipelines.knn import build_ivf_index

    index_dir = str(tmp_path / "ivf2")
    manifest = os.path.join(index_dir, "_IVF_MANIFEST.json")

    build_ivf_index(
        _emb_ds(list(range(100)), seed=1), index_dir, n_centroids=4, sample_size=64
    )
    with open(manifest) as f:
        stamp_a = json.load(f)

    build_ivf_index(
        _emb_ds(list(range(100)), seed=9), index_dir, n_centroids=4, sample_size=64
    )
    with open(manifest) as f:
        stamp_c = json.load(f)
    assert stamp_a["rows"] == stamp_c["rows"]
    assert stamp_a["content_fp"] != stamp_c["content_fp"]


# -- 3: tfidf empty vocabulary -------------------------------------------------


def test_tfidf_empty_vocab_returns_empty(ray_session):
    from shaclapi_ray.pipelines.textstats import tfidf_top_terms

    docs = _docs_ds(["alpha beta", "beta gamma", "gamma delta"])
    out = tfidf_top_terms(docs, k=3, min_df=99)
    # schema asserted on the Dataset (an empty to_pandas() loses it)
    assert set(out.schema().names) == {"doc_id", "token", "tf", "tfidf", "rank"}
    assert out.count() == 0


# -- 4: distributed candidate pairs never funnel through the driver -----------


def test_candidate_pairs_stay_dataset_above_limit(ray_session, monkeypatch):
    import ray.data

    from shaclapi_ray.pipelines import dedup as dd
    from shaclapi_ray.stages import aggregates

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog today",
        "a completely different document about ray data pipelines",
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
    ]
    docs = _docs_ds(texts)

    # small-corpus ground truth via the driver path
    driver_labels = (
        dd.minhash_lsh_clusters(docs, labeling="driver")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # force the shuffle path: every sig row count exceeds the 'driver' cap
    monkeypatch.setattr(aggregates, "DRIVER_MERGE_LIMIT", 0)
    sigs = docs.map_batches(
        dd.MinHasher(), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    pairs = dd._candidate_pairs(sigs)
    assert isinstance(pairs, ray.data.Dataset), "edges must stay distributed"

    dist_labels = (
        dd.minhash_lsh_clusters(docs, labeling="distributed")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert driver_labels.equals(dist_labels)
