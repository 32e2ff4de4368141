"""Scan-level predicate pushdown (shapes.ir.pred_to_scan_expr +
io.read_parquet(filter_expr=) + engine wiring): the weakening contract
(expression keeps a SUPERSET of eval_pred's rows), unbounded cases, and
engine-output equivalence with pushdown on vs off."""

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from shaclapi_ray.shapes.ir import eval_pred, pred_to_scan_expr


def _table(n=400, seed=0):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr", None], dtype=object)
    return pa.table(
        {
            "url": pa.array(
                [f"https://h{i % 7}.org/p{i}" if i % 11 else None for i in range(n)]
            ),
            "lang": pa.array(langs[rng.integers(0, 4, n)]),
            "warc_ts": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "text": pa.array(["x" * int(i % 50) for i in range(n)]),
        }
    )


def _rows(table, expr):
    return set(
        pads.dataset(table).to_table(filter=expr)["warc_ts"].to_pylist()
        if expr is not None
        else table["warc_ts"].to_pylist()
    )


PREDS_EXACT = [
    {"op": "==", "column": "lang", "value": "en"},
    {"op": "!=", "column": "lang", "value": "en"},
    {"op": "in", "column": "lang", "values": ["en", "fr"]},
    {"op": "range", "column": "warc_ts", "min": 100, "max": 700},
    {"op": "not_null", "column": "url"},
    {"op": "is_null", "column": "lang"},
    {
        "op": "and",
        "args": [
            {"op": "==", "column": "lang", "value": "en"},
            {"op": "range", "column": "warc_ts", "min": 300},
        ],
    },
    {
        "op": "or",
        "args": [
            {"op": "==", "column": "lang", "value": "de"},
            {"op": "range", "column": "warc_ts", "max": 50},
        ],
    },
]

PREDS_WEAKENED = [
    # AND drops the untranslatable regex conjunct -> superset
    {
        "op": "and",
        "args": [
            {"op": "regex", "column": "url", "pattern": "^https://h1"},
            {"op": "range", "column": "warc_ts", "min": 500},
        ],
    },
]

PREDS_UNBOUNDED = [
    None,
    {"op": "true"},
    {"op": "regex", "column": "url", "pattern": "^https"},
    {"op": "len_range", "column": "text", "min": 10},
    {"op": "not", "arg": {"op": "==", "column": "lang", "value": "en"}},
    # OR with an unbounded branch is unbounded
    {
        "op": "or",
        "args": [
            {"op": "==", "column": "lang", "value": "en"},
            {"op": "regex", "column": "url", "pattern": "x"},
        ],
    },
    # AND of only-untranslatable conjuncts
    {
        "op": "and",
        "args": [{"op": "regex", "column": "url", "pattern": "x"}],
    },
]


@pytest.mark.parametrize("pred", PREDS_EXACT)
def test_exact_translation_matches_eval_pred(pred):
    t = _table()
    expr = pred_to_scan_expr(pred, t.schema)
    assert expr is not None
    mask = eval_pred(pred, t).to_numpy(zero_copy_only=False).astype(bool)
    # warc_ts values are not unique; compare row-index sets via take
    kept = pads.dataset(t).to_table(filter=expr)
    want = t.filter(pa.array(mask))
    assert kept.num_rows == want.num_rows
    assert kept.sort_by("warc_ts").equals(want.sort_by("warc_ts"))


@pytest.mark.parametrize("pred", PREDS_WEAKENED)
def test_weakened_translation_is_superset(pred):
    t = _table()
    expr = pred_to_scan_expr(pred, t.schema)
    assert expr is not None
    mask = eval_pred(pred, t).to_numpy(zero_copy_only=False).astype(bool)
    kept_ids = set(
        pads.dataset(t.append_column("rid", pa.array(range(t.num_rows))))
        .to_table(filter=expr)["rid"]
        .to_pylist()
    )
    true_ids = set(np.flatnonzero(mask).tolist())
    assert true_ids <= kept_ids
    assert len(kept_ids) < t.num_rows  # it does restrict something


@pytest.mark.parametrize("pred", PREDS_UNBOUNDED)
def test_unbounded_predicates_return_none(pred):
    assert pred_to_scan_expr(pred, _table().schema) is None


def test_timestamp_string_coercion():
    from datetime import datetime

    t = pa.table(
        {
            "warc_ts": pa.array(
                [datetime(2023, 1, 1), datetime(2024, 6, 1)], pa.timestamp("us")
            ),
            "x": pa.array([1, 2]),
        }
    )
    expr = pred_to_scan_expr(
        {"op": "range", "column": "warc_ts", "min": "2024-01-01T00:00:00Z"},
        t.schema,
    )
    kept = pads.dataset(t).to_table(filter=expr)
    assert kept["x"].to_pylist() == [2]


def test_filter_expr_read_prunes(tmp_path, ray_session):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from shaclapi_ray.io import read_parquet

    path = str(tmp_path / "rg.parquet")
    t = pa.table(
        {"warc_ts": pa.array(np.arange(4000), pa.int64()), "v": np.arange(4000)}
    )
    pq.write_table(t, path, row_group_size=1000)
    ds = read_parquet(path, filter_expr=pc.field("warc_ts") >= 3500)
    assert ds.count() == 500
    assert set(ds.to_pandas()["warc_ts"]) == set(range(3500, 4000))


def test_engine_equivalent_with_and_without_pushdown(ray_session, tmp_path):
    """Pushdown must not change any verdict — column schema (pass-A OR
    union) and referential schema (fused per-shape read) both checked."""
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import fresh_page_shape, referential_schema
    from shaclapi_ray.pagegen import generate_pages

    pages = generate_pages(str(tmp_path / "pages"), 1500)

    def run(shapes, **cfg):
        res = ValidationEngine(shapes, JobConfig(**cfg)).run(pages)
        return (
            res.verdicts()
            .to_pandas()
            .sort_values(["url", "shape_id"])
            .reset_index(drop=True)
        )

    # fresh_page_shape has target lang=='en' -> the pass-A union is bounded
    a = run([fresh_page_shape()], scan_pushdown=True)
    b = run([fresh_page_shape()], scan_pushdown=False)
    assert len(a) > 0 and a.equals(b)

    c = run(referential_schema(), target_shape="LinkedPageShape", scan_pushdown=True)
    d = run(referential_schema(), target_shape="LinkedPageShape", scan_pushdown=False)
    assert len(c) > 0 and c.equals(d)
