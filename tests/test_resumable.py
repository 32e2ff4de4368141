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
