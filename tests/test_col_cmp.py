"""col_cmp — SHACL property-pair constraint components (sh:lessThan /
sh:lessThanOrEquals / sh:equals / sh:disjoint) as a two-column IR op:
eval semantics, null handling, the length variant, SQL parity, scan
pushdown exactness, and column tracking."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from shaclapi_ray.shapes.ir import (
    eval_pred,
    pred_columns,
    pred_to_scan_expr,
    pred_to_sql,
)


def _batch():
    return pa.table(
        {
            "a": pa.array([1, 5, 3, None, 7], pa.int64()),
            "b": pa.array([2, 5, 1, 4, None], pa.int64()),
            "s": pa.array(["ab", "abcd", None, "x", "yy"]),
            "t": pa.array(["ab", "ab", "zz", None, "y"]),
        }
    )


def test_all_six_comparators():
    b = _batch()
    exp = {
        "lt": [True, False, False, False, False],
        "le": [True, True, False, False, False],
        "gt": [False, False, True, False, False],
        "ge": [False, True, True, False, False],
        "eq": [False, True, False, False, False],
        "ne": [True, False, True, False, False],  # nulls fail even 'ne'
    }
    for cmp_, want in exp.items():
        got = eval_pred(
            {"op": "col_cmp", "column": "a", "other": "b", "cmp": cmp_}, b
        ).to_pylist()
        assert got == want, cmp_


def test_len_variant_string_columns():
    b = _batch()
    got = eval_pred(
        {"op": "col_cmp", "column": "s", "other": "t", "cmp": "ge", "len": True}, b
    ).to_pylist()
    # len(s) >= len(t): 2>=2 T, 4>=2 T, null F, null F, 2>=1 T
    assert got == [True, True, False, False, True]


def test_len_variant_binary_column():
    b = pa.table(
        {
            "h": pa.array([b"abc", b"a", None], pa.binary()),
            "s": pa.array(["ab", "ab", "x"]),
        }
    )
    got = eval_pred(
        {"op": "col_cmp", "column": "s", "other": "h", "cmp": "le", "len": True}, b
    ).to_pylist()
    assert got == [True, False, False]


def test_pred_columns_tracks_both():
    p = {"op": "col_cmp", "column": "a", "other": "b", "cmp": "lt"}
    assert pred_columns(p) == {"a", "b"}
    assert pred_columns({"op": "and", "args": [p, {"op": "not_null", "column": "s"}]}) == {
        "a",
        "b",
        "s",
    }


def test_sql_parity_duckdb():
    b = _batch()
    con = duckdb.connect()
    con.register("t0", b.to_pandas())
    for cmp_ in ("lt", "le", "gt", "ge", "eq", "ne"):
        p = {"op": "col_cmp", "column": "a", "other": "b", "cmp": cmp_}
        ray_mask = eval_pred(p, b).to_pylist()
        sql_mask = [
            r[0] for r in con.execute(f"SELECT {pred_to_sql(p)} FROM t0").fetchall()
        ]
        assert ray_mask == sql_mask, cmp_
    p = {"op": "col_cmp", "column": "s", "other": "t", "cmp": "ge", "len": True}
    ray_mask = eval_pred(p, b).to_pylist()
    sql_mask = [r[0] for r in con.execute(f"SELECT {pred_to_sql(p)} FROM t0").fetchall()]
    assert ray_mask == sql_mask


def test_scan_expr_exact_for_value_compare(tmp_path):
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    b = _batch()
    pq.write_table(b, tmp_path / "t.parquet")
    p = {"op": "col_cmp", "column": "a", "other": "b", "cmp": "lt"}
    expr = pred_to_scan_expr(p)
    assert expr is not None
    scanned = pads.dataset(tmp_path / "t.parquet").to_table(filter=expr)
    kept = b.filter(eval_pred(p, b))
    assert scanned.equals(kept)  # exact (not just superset) for col_cmp
    # the len variant is not expressible as a dataset expression
    assert (
        pred_to_scan_expr(
            {"op": "col_cmp", "column": "s", "other": "t", "cmp": "ge", "len": True}
        )
        is None
    )


def test_exclusive_range_bounds():
    # sh:minExclusive / sh:maxExclusive alongside the inclusive pair
    b = pa.table({"x": pa.array([1, 2, 3, 4, None], pa.int64())})
    p = {"op": "range", "column": "x", "min_exclusive": 1, "max_exclusive": 4}
    assert eval_pred(p, b).to_pylist() == [False, True, True, False, False]
    con = duckdb.connect()
    con.register("t1", b.to_pandas())
    sql_mask = [r[0] for r in con.execute(f"SELECT {pred_to_sql(p)} FROM t1").fetchall()]
    assert sql_mask == [False, True, True, False, False]
    # scan expression matches eval exactly here too
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(b, os.path.join(d, "t.parquet"))
        got = pads.dataset(os.path.join(d, "t.parquet")).to_table(
            filter=pred_to_scan_expr(p)
        )
        assert got.equals(b.filter(eval_pred(p, b)))
    # mixed inclusive/exclusive
    p2 = {"op": "range", "column": "x", "min": 2, "max_exclusive": 4}
    assert eval_pred(p2, b).to_pylist() == [False, True, True, False, False]


def test_engine_runs_pair_constraint_shape(ray_session):
    import ray.data

    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import consistent_page_shape

    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": ["https://a/x", "https://b/y", None, "https://c/z"],
                "warc_ts": pa.array([None] * 4, pa.timestamp("us")),
                "html": pa.array([b""] * 4, pa.binary()),
                "text": [
                    "long enough text here",
                    "s",  # shorter than its url -> violation
                    "some text",  # null url -> violation
                    "https://c/z",  # equals url -> disjoint violation
                ],
                "lang": ["en"] * 4,
            }
        )
    )
    res = ValidationEngine([consistent_page_shape()], JobConfig()).run(pages)
    v = res.verdicts().to_pandas().set_index("url")
    assert bool(v.loc["https://a/x", "valid"])
    assert not bool(v.loc["https://b/y", "valid"])
    assert not bool(v.loc["https://c/z", "valid"])
    viol = res.violations().to_pandas()
    assert set(viol["constraint"]) == {"text_len_ge_url", "url_text_disjoint"}
