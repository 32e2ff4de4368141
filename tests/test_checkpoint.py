"""Checkpoint/resume: kill mid-run at a partition boundary, resume, final
outputs identical to an uninterrupted run (north-rule resumability)."""

import glob

import pyarrow.parquet as pq
import pytest

from shaclapi_ray.checkpoint import CheckpointedValidation
from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.fixtures import referential_schema
from shaclapi_ray.pagegen import generate_pages


@pytest.fixture(scope="module")
def multi_part_pages(tmp_path_factory):
    """Pages table with several parquet part files (checkpoint unit)."""
    import shaclapi_ray.pagegen as pg

    out = str(tmp_path_factory.mktemp("ckpt") / "pages")
    old = pg.ROWS_PER_FILE
    pg.ROWS_PER_FILE = 200  # 600 rows -> 3 partitions
    try:
        generate_pages(out, 600)
    finally:
        pg.ROWS_PER_FILE = old
    return out


def _read_sorted(path_glob):
    files = sorted(glob.glob(path_glob))
    tbl = pq.read_table(files) if files else None
    assert tbl is not None
    df = tbl.to_pandas().sort_values(list(tbl.column_names)).reset_index(drop=True)
    return df


def test_kill_resume_identical(ray_session, multi_part_pages, tmp_path):
    cfg = JobConfig(target_shape="LinkedPageShape")

    # interrupted run: 1 partition per call, three calls to finish phase 1
    out_a = str(tmp_path / "run_a")
    ck = CheckpointedValidation(referential_schema(), cfg, out_dir=out_a)
    assert ck.run(multi_part_pages, stop_after=1) is None  # "killed"
    m = ck.manifest()
    assert len(m["completed"]) == 1
    # resume twice more
    assert ck.run(multi_part_pages, stop_after=1) is None
    res = ck.run(multi_part_pages)
    assert res is not None
    assert len(ck.manifest()["completed"]) == 3

    # uninterrupted run
    out_b = str(tmp_path / "run_b")
    ck_b = CheckpointedValidation(referential_schema(), cfg, out_dir=out_b)
    assert ck_b.run(multi_part_pages) is not None

    va = _read_sorted(f"{out_a}/verdicts/*.parquet")
    vb = _read_sorted(f"{out_b}/verdicts/*.parquet")
    assert va.equals(vb)
    wa = _read_sorted(f"{out_a}/violations/*.parquet")
    wb = _read_sorted(f"{out_b}/violations/*.parquet")
    assert wa.equals(wb)

    # checkpointed outputs match the direct (non-checkpointed) engine
    direct = ValidationEngine(referential_schema(), cfg).run(multi_part_pages)
    dv = (
        direct.verdicts()
        .to_pandas()
        .sort_values(["url", "shape_id", "valid", "reason"])
        .reset_index(drop=True)
    )
    va2 = va[["url", "shape_id", "valid", "reason"]].sort_values(
        ["url", "shape_id", "valid", "reason"]
    ).reset_index(drop=True)
    assert dv.equals(va2)


def test_lineage_and_sketches(ray_session, multi_part_pages, tmp_path):
    out = str(tmp_path / "run_l")
    ck = CheckpointedValidation(referential_schema(), JobConfig(), out_dir=out)
    ck.run(multi_part_pages)
    lin = ck.lineage().to_pandas()
    assert set(lin.columns) == {
        "partition_id",
        "stage",
        "rows_in",
        "rows_out",
        "wall_ms",
        "checkpoint_epoch",
    }
    assert (lin[lin.stage == "pass_a"].rows_in.sum()) == 600
    assert "__global__" in set(lin.partition_id)

    sk = ck.merged_sketches()
    est = sk["hll"].estimate()
    # ~594 distinct urls (600 minus duplicate ''/null collapses)
    assert abs(est - 594) / 594 < 0.1
    assert sk["tdigest"].quantile(0.5) > 100  # text length median sane
    # host-frequency CMS (skew monitor): every row added exactly once
    # per depth row, and per-host estimates are one-sided around 60
    # (600 pages over 10 round-robin hosts)
    import pyarrow as _pa

    assert sk["cms"].counts.sum() == 600 * sk["cms"].depth
    ests = sk["cms"].estimate_array(
        _pa.array([f"host{i}.example.org" for i in range(10)])
    )
    # 600 pages round-robin 10 hosts, minus the fixture's null/dup urls;
    # CMS is one-sided so each estimate >= its (roughly 54-60) true count
    assert (ests >= 50).all() and 540 <= ests.sum() <= 620


def test_resume_skips_completed_partitions(ray_session, multi_part_pages, tmp_path):
    out = str(tmp_path / "run_s")
    ck = CheckpointedValidation(referential_schema(), JobConfig(), out_dir=out)
    ck.run_phase1(multi_part_pages, stop_after=2)
    epoch_before = ck.manifest()["epoch"]
    ck.run_phase1(multi_part_pages)  # completes remaining 1
    assert ck.manifest()["epoch"] == epoch_before + 1  # only one new commit


def test_source_change_invalidates_only_touched_partition(
    ray_session, multi_part_pages, tmp_path
):
    """Incremental revalidation: after a full run, rewriting ONE input
    partition file makes only that partition reprocess (stale stamp
    detected); untouched partitions keep their committed outputs, and the
    re-run's verdicts reflect the new data."""
    import os
    import shutil

    import shaclapi_ray.pagegen as pg

    # private copy of the input — the fixture is module-scoped/shared
    pages = str(tmp_path / "pages")
    shutil.copytree(multi_part_pages, pages)

    cfg = JobConfig(target_shape="LinkedPageShape")
    out = str(tmp_path / "run")
    cv = CheckpointedValidation(referential_schema(), cfg, out_dir=out)
    res1 = cv.run(pages)
    v1 = res1.verdicts().to_pandas()
    m1 = cv.manifest()
    assert set(m1["sources"]) == set(m1["completed"]) == {"p00000", "p00001", "p00002"}

    # record committed-output mtimes, then rewrite partition file 1 with
    # MODIFIED content (blank half the pages' html — same urls, so the
    # corpus keeps its unique-url entity contract, but links/verdicts
    # change)
    import pyarrow as pa

    part_mtime = {
        pid: os.stat(os.path.join(out, "partitions", pid)).st_mtime_ns
        for pid in m1["completed"]
    }
    files = sorted(
        f for f in os.listdir(pages) if f.endswith(".parquet")
    )
    target = os.path.join(pages, files[1])
    tbl = pq.read_table(target)
    html = tbl["html"].to_pylist()
    html = [b"" if i % 2 == 0 else h for i, h in enumerate(html)]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("html"), "html", pa.array(html, pa.binary())
    )
    pq.write_table(tbl, target)

    res2 = cv.run(pages)
    m2 = cv.manifest()
    # only p00001 was reprocessed
    assert os.stat(os.path.join(out, "partitions", "p00000")).st_mtime_ns == part_mtime["p00000"]
    assert os.stat(os.path.join(out, "partitions", "p00002")).st_mtime_ns == part_mtime["p00002"]
    assert m2["sources"]["p00001"] != m1["sources"]["p00001"]

    # verdicts now reflect the rewritten partition, matching a fresh
    # non-checkpointed engine run over the same input
    v2 = res2.verdicts().to_pandas()
    assert not v1.equals(v2)
    ref = (
        ValidationEngine(referential_schema(), cfg)
        .run(pages)
        .verdicts()
        .to_pandas()
    )
    key = ["url", "shape_id", "valid", "reason"]
    a = v2[key].sort_values(key).reset_index(drop=True)
    b = ref[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_suggest_salt_k():
    import pyarrow as pa

    from shaclapi_ray.checkpoint import suggest_salt_k
    from shaclapi_ray.state.sketches import CountMinSketch

    # balanced: 1000 keys uniform over 10k rows -> no salting
    c = CountMinSketch(width=4096, depth=4)
    keys = [f"h{i}.org" for i in range(1000)] * 10
    c.add_array(pa.array(keys))
    assert suggest_salt_k(c, total_rows=10_000, num_partitions=32) == 0

    # one host owns 50% of 10k rows -> hot partition ~16x average
    hot = CountMinSketch(width=4096, depth=4)
    hot.add_array(pa.array(["hot.org"] * 5000 + [f"h{i}.org" for i in range(5000)]))
    k = suggest_salt_k(hot, total_rows=10_000, num_partitions=32)
    assert k == 16  # ceil(0.5 * 32) = 16, at the clamp

    # moderate skew: 10% share -> ceil(0.1 * 32) = 4
    mid = CountMinSketch(width=4096, depth=4)
    mid.add_array(pa.array(["warm.org"] * 1000 + [f"h{i}.org" for i in range(9000)]))
    assert 2 <= suggest_salt_k(mid, total_rows=10_000, num_partitions=32) <= 5

    assert suggest_salt_k(None, 100) == 0
    assert suggest_salt_k(hot, 0) == 0
