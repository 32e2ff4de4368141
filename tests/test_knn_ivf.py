"""IVF index tests: bucket-partitioned storage, probe-path pruning
(I/O scales with nprobe, not corpus size), recall vs bruteforce, and
index-build idempotence."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    from shaclapi_ray.io import read_table_split

    return read_table_split("/root/testdata/sf0.001/embeddings.parquet")


def test_index_is_bucket_partitioned(ray_session, emb_ds, tmp_path_factory):
    from shaclapi_ray.pipelines.knn import build_ivf_index

    idx = str(tmp_path_factory.mktemp("ivf") / "index")
    cent = build_ivf_index(emb_ds, idx, n_centroids=8)
    assert cent.shape[0] == 8
    bucket_dirs = [d for d in os.listdir(idx) if d.startswith("bucket=")]
    assert len(bucket_dirs) > 1  # corpus actually spread over partitions
    # rebuild with same params reuses the index (manifest match)
    mtime = os.path.getmtime(os.path.join(idx, "_IVF_MANIFEST.json"))
    build_ivf_index(emb_ds, idx, n_centroids=8)
    assert os.path.getmtime(os.path.join(idx, "_IVF_MANIFEST.json")) == mtime


def test_probe_paths_scale_with_nprobe(ray_session, emb_ds, tmp_path_factory):
    """The pruning claim: fewer probed buckets -> fewer partition dirs
    read. knn_ivf reads ONLY those paths."""
    from shaclapi_ray.pipelines.knn import _probed_bucket_paths, build_ivf_index

    idx = str(tmp_path_factory.mktemp("ivf") / "index")
    cent = build_ivf_index(emb_ds, idx, n_centroids=8)
    n_buckets = len([d for d in os.listdir(idx) if d.startswith("bucket=")])
    def dirs(paths):
        return {os.path.basename(os.path.dirname(p)) for p in paths}

    few = dirs(_probed_bucket_paths(idx, {0}))
    all_ = dirs(_probed_bucket_paths(idx, set(range(8))))
    assert len(few) <= 1 < len(all_) == n_buckets
    assert few <= all_


def test_ivf_results_and_recall(ray_session, emb_ds, tmp_path_factory):
    from shaclapi_ray.pipelines.knn import (
        ivf_recall_vs_bruteforce,
        knn_bruteforce,
        knn_ivf,
    )

    idx = str(tmp_path_factory.mktemp("ivf") / "index")
    qids = list(range(8))
    iv = knn_ivf(emb_ds, qids, k=10, index_dir=idx)
    assert set(iv.columns) == {"query_id", "neighbor_id", "rank"}
    assert len(iv) == 80  # 8 queries x k=10 (buckets are big enough)
    # determinism: same call, same output
    iv2 = knn_ivf(emb_ds, qids, k=10, index_dir=idx)
    assert iv.equals(iv2)
    rec = ivf_recall_vs_bruteforce(emb_ds, qids, k=10, index_dir=idx)
    assert rec >= 0.3  # approximate by design; sanity floor
    # full probe == bruteforce
    full = knn_ivf(emb_ds, qids, k=10, nprobe=16, n_centroids=16, index_dir=idx + "2")
    bf = knn_bruteforce(emb_ds, qids, k=10)
    assert full.equals(bf)


def test_grouped_merge_matches_driver_merge(ray_session, emb_ds):
    """The distributed (groupby query_id) final merge is row-identical to
    the driver merge — the large-Q scale path changes topology, not
    results."""
    from shaclapi_ray.pipelines.knn import knn_bruteforce

    qids = list(range(12))
    drv = knn_bruteforce(emb_ds, qids, k=5, merge="driver")
    grp = (
        knn_bruteforce(emb_ds, qids, k=5, merge="grouped")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    drv = drv.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert grp.equals(drv)
