"""Generic resumable runner: kill-mid-run + resume produces exactly the
single-shot output; finished partitions are never recomputed."""

import os

import pytest

from shaclapi_ray.pagegen import generate_pages
from shaclapi_ray.resumable import ResumableMapJob


def _fn(ds):
    from shaclapi_ray.pipelines.textstats import normalize_text

    # pages table: rename url->doc_id contract via a projection
    import pyarrow as pa

    docs = ds.map_batches(
        lambda t: pa.table({"doc_id": t["url"], "text": t["text"]}),
        batch_format="pyarrow",
    )
    return normalize_text(docs)


@pytest.fixture(scope="module")
def pages_dir(ray_session, tmp_path_factory):
    # 130k rows => 6 part files (ROWS_PER_FILE=25k) = 6 resume partitions
    return generate_pages(
        str(tmp_path_factory.mktemp("resumable") / "pages"), 130_000
    )


def test_kill_and_resume_byte_identical(ray_session, pages_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("out")

    # uninterrupted reference run
    def canon(df):
        # pagegen injects duplicate urls (the unique-constraint corpus),
        # so sort on ALL columns for a deterministic comparison order
        return df.sort_values(["doc_id", "norm_text"]).reset_index(drop=True)

    ref = ResumableMapJob(_fn, str(base / "ref"))
    assert ref.run(pages_dir)
    want = canon(ref.result().to_pandas())

    # killed after 2 partitions, then resumed
    job = ResumableMapJob(_fn, str(base / "resumed"))
    done = job.run(pages_dir, stop_after=2)
    assert not done
    n_before = len(job.manifest()["completed"])
    assert n_before == 2
    # record commit mtimes of finished partitions
    part_dir = os.path.join(str(base / "resumed"), "partitions")
    mtimes = {p: os.path.getmtime(os.path.join(part_dir, p)) for p in os.listdir(part_dir)}
    job2 = ResumableMapJob(_fn, str(base / "resumed"))
    assert job2.run(pages_dir)
    got = canon(job2.result().to_pandas())
    assert got.equals(want)
    # finished partitions were skipped, not rewritten
    for p, t in mtimes.items():
        assert os.path.getmtime(os.path.join(part_dir, p)) == t
    assert len(job2.manifest()["completed"]) > n_before


def test_source_change_reprocesses_only_touched_partition(ray_session, tmp_path):
    """Rewriting one committed input file makes only that partition
    reprocess on the next run; outputs reflect the new content."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from shaclapi_ray.resumable import ResumableMapJob

    inp = tmp_path / "in"
    inp.mkdir()
    for i in range(3):
        pq.write_table(
            pa.table({"doc_id": [i * 10 + j for j in range(5)]}),
            str(inp / f"part-{i}.parquet"),
        )

    def double(ds):
        return ds.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"], "x2": pa.compute.multiply(t["doc_id"], 2)}),
            batch_format="pyarrow",
        )

    job = ResumableMapJob(double, str(tmp_path / "out"))
    assert job.run(str(inp))
    m1 = job.manifest()
    assert all("source" in rec for rec in m1["completed"].values())
    mtimes = {
        pid: os.stat(os.path.join(str(tmp_path / "out"), "partitions", pid)).st_mtime_ns
        for pid in m1["completed"]
    }

    pq.write_table(
        pa.table({"doc_id": [999, 998]}), str(inp / "part-1.parquet")
    )
    assert job.run(str(inp))
    out_dir = os.path.join(str(tmp_path / "out"), "partitions")
    assert os.stat(os.path.join(out_dir, "p00000")).st_mtime_ns == mtimes["p00000"]
    assert os.stat(os.path.join(out_dir, "p00002")).st_mtime_ns == mtimes["p00002"]
    df = job.result().to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert set(df[df.doc_id > 100].doc_id) == {998, 999}
    assert (df.x2 == df.doc_id * 2).all()
    assert len(df) == 12  # 5 + 2 + 5
