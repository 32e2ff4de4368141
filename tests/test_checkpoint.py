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


def test_resume_skips_completed_partitions(ray_session, multi_part_pages, tmp_path):
    out = str(tmp_path / "run_s")
    ck = CheckpointedValidation(referential_schema(), JobConfig(), out_dir=out)
    ck.run_phase1(multi_part_pages, stop_after=2)
    epoch_before = ck.manifest()["epoch"]
    ck.run_phase1(multi_part_pages)  # completes remaining 1
    assert ck.manifest()["epoch"] == epoch_before + 1  # only one new commit
