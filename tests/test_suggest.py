"""Constraint suggestion (Deequ-style) from the column profile: integer-
exact rules over profile_columns output, SQL parity, and the closed loop —
a suggested shape must validate 100% clean on the data that produced it,
and catch violations planted afterwards."""

import duckdb
import pandas as pd
import pytest
import ray.data

from shaclapi_ray.pagegen import ensure_pages
from shaclapi_ray.pipelines.profile import (
    profile_columns,
    suggest_constraints,
    suggest_constraints_sql,
    suggestions_to_shape,
)

SF = "/root/testdata/sf0.001"


def test_rules_on_handmade_profile():
    prof = pd.DataFrame(
        {
            "column": ["a", "b", "c", "d"],
            "n_rows": [10, 10, 10, 0],
            "n_nulls": [0, 3, 0, 0],
            "n_distinct": [10, 7, 3, 0],
            "min_v": ["1", None, "x", None],
            "max_v": ["9", None, "z", None],
            "avg_len": [1.0, 1.0, 1.0, None],
        }
    )
    s = suggest_constraints(prof, low_card_max=5)
    got = {(r.column, r.rule): r.param for r in s.itertuples()}
    assert ("a", "not_null") in got and ("a", "unique") in got
    assert got[("a", "value_range")] == "1..9"
    # b has nulls -> no not_null; 7 distinct of 7 non-null -> unique
    assert ("b", "not_null") not in got and ("b", "unique") in got
    assert got[("c", "low_card")] == "3"
    assert ("c", "unique") not in got
    # empty column: no rules at all
    assert not any(col == "d" for col, _ in got)


def test_fixture_suggestions_and_sql_parity(ray_session):
    pages_dir = ensure_pages(SF)
    prof = profile_columns(ray.data.read_parquet(pages_dir))
    s = suggest_constraints(prof)
    exp = duckdb.sql(suggest_constraints_sql(pages_dir)).df()
    pd.testing.assert_frame_equal(s, exp, check_dtype=False)
    got = set(zip(s["column"], s["rule"]))
    # planted null urls/langs -> url and lang are NOT not_null; warc_ts is
    assert ("warc_ts", "not_null") in got and ("url", "not_null") not in got
    assert ("lang", "low_card") in got
    # planted duplicate short texts -> text not unique; timestamps unique
    assert ("warc_ts", "unique") in got and ("text", "unique") not in got
    assert 0 < len(s) < 4 * prof.shape[0], "suggestions degenerate"


def test_suggested_shape_validates_clean_then_catches_violations(ray_session):
    from shaclapi_ray.engine import JobConfig, ValidationEngine

    pages_dir = ensure_pages(SF)
    prof = profile_columns(ray.data.read_parquet(pages_dir))
    shape = suggestions_to_shape(suggest_constraints(prof))
    names = {c.name for c in shape.constraints}
    assert {"warc_ts_not_null", "warc_ts_unique", "warc_ts_range"} <= names

    # closed loop: constraints derived FROM the data hold ON the data
    res = ValidationEngine([shape], JobConfig(target_shape=shape.shape_id)).run(
        pages_dir
    )
    out = res.test_output()
    assert len(out["invalidTargets"]) == 0 and len(out["validTargets"]) > 0

    # perturb: null out some texts and duplicate a timestamp -> violations
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import glob, os, tempfile

    t = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(f"{pages_dir}/part-*.parquet"))
    )
    text = t["text"].to_pylist()
    text[5] = None
    ts = t["warc_ts"].to_pylist()
    ts[7] = ts[8]
    bad = t.set_column(
        t.schema.get_field_index("text"), "text", pa.array(text, pa.string())
    )
    bad = bad.set_column(
        bad.schema.get_field_index("warc_ts"),
        "warc_ts",
        pa.array(ts, pa.timestamp("us")),
    )
    with tempfile.TemporaryDirectory(prefix="suggest_bad_") as d:
        pq.write_table(bad, os.path.join(d, "part-00000.parquet"))
        res2 = ValidationEngine(
            [shape], JobConfig(target_shape=shape.shape_id)
        ).run(d)
        inv = res2.test_output()["invalidTargets"]
        assert len(inv) >= 3  # null text + both rows of the ts collision
