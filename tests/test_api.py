"""API-layer parity tests (≙ the reference's route-level behaviors,
/root/reference/run.py:21-62 + config invariants config.py:39-45)."""

import pytest

from shaclapi_ray import api

SCHEMAS = "/root/repo/fixtures/schemas/full"
SCHEMAS_REDUCED = "/root/repo/fixtures/schemas/reduced"


def test_config_aliases_normalize():
    cfg = api._norm_config(
        {"schemaDir": SCHEMAS, "targetShape": "UrlShape", "pruneShapeNetwork": False}
    )
    assert cfg["schema_dir"] == SCHEMAS
    assert cfg["target_shape"] == "UrlShape"
    assert cfg["prune_shape_network"] is False


def test_config_invariants():
    with pytest.raises(ValueError, match="remove_constraints requires"):
        api._norm_config(
            {
                "schema_dir": SCHEMAS,
                "remove_constraints": True,
                "prune_shape_network": False,
            }
        )
    with pytest.raises(ValueError, match="requested_columns"):
        api._norm_config({"schema_dir": SCHEMAS, "remove_constraints": True})
    with pytest.raises(ValueError, match="schema_dir"):
        api._norm_config({})


def test_reduce_route():
    order = api.only_reduce_shape_schema(
        {"schema_dir": SCHEMAS, "target_shape": "LinkedPageShape"}
    )
    assert order == ["TargetPageShape", "LinkedPageShape"]


def test_overlap_route():
    a = {"schema_dir": SCHEMAS, "target_shape": "LinkedPageShape"}
    b = {"schema_dir": SCHEMAS, "target_shape": "TargetPageShape"}
    assert api.overlap_reduced_schemas(a, b) == 1.0


def test_run_job_test_format(ray_session, small_pages_dir):
    out = api.run_job(
        {
            "schema_dir": SCHEMAS_REDUCED,
            "pages_dir": small_pages_dir,
            "target_shape": "UrlShape",
        }
    )
    assert set(out["result"]) == {
        "validTargets",
        "invalidTargets",
        "advancedValid",
        "advancedInvalid",
    }
    assert out["stats"]["total_execution_time"] > 0
    # reduced schema dropped text_min_len: only url-format failures remain
    n_invalid = len(out["result"]["invalidTargets"])
    assert n_invalid == 6 * 3  # 3 url violations per 100-row block, 600 rows


def test_run_job_simple_format(ray_session, small_pages_dir):
    out = api.run_job(
        {
            "schema_dir": SCHEMAS_REDUCED,
            "pages_dir": small_pages_dir,
            "target_shape": "LangShape",
            "output_format": "simple",
        }
    )
    assert "violations" in out["result"] and "counts" in out["result"]
    v = out["result"]["violations"]
    assert all(
        set(r) == {"url", "shape_id", "constraint", "offending_value"} for r in v
    )


def test_validation_and_statistics(ray_session, small_pages_dir):
    counts = api.validation_and_statistics(
        {"schema_dir": SCHEMAS_REDUCED, "pages_dir": small_pages_dir}
    )
    assert counts["LangShape"]["invalid"] == 6 * 3  # '', 'xx', null per block
    assert counts["LangShape"]["valid"] == 600 - 18


def test_stats_csv_written(ray_session, small_pages_dir, tmp_path):
    path = str(tmp_path / "stats.csv")
    api.run_job(
        {
            "schema_dir": SCHEMAS_REDUCED,
            "pages_dir": small_pages_dir,
            "target_shape": "LangShape",
            "write_stats": True,
            "stats_out_file": path,
        }
    )
    import csv

    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert "total_execution_time" in rows[0]


def test_schema_dir_full_loads(ray_session, small_pages_dir):
    """The full on-disk schema corpus round-trips through the engine."""
    out = api.run_job(
        {
            "schema_dir": SCHEMAS,
            "pages_dir": small_pages_dir,
            "target_shape": "LinkedPageShape",
        }
    )
    assert len(out["result"]["validTargets"]) + len(
        out["result"]["invalidTargets"]
    ) == 120  # 600 rows, lang=='en' targets
