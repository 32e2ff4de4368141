"""Regression tests for the round-1 ADVICE findings:

1. depth-2 referential chains: a url that passes the child's COLUMN
   constraints but fails its REF constraint must not count as child-valid
   (colpart rows leaked into child_valid_urls on the bucket/checkpoint
   paths) — the reference's tc4 valid/invalid propagation.
2. link extraction must not crash on pages that are not valid UTF-8.
3. UniqueConstraint on a column other than 'url' must count THAT column's
   values and join them back per row (was: all-invalid).
4. a shape mixing a drift constraint with anything else must raise.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.shapes.ir import (
    DriftConstraint,
    PredicateConstraint,
    RefConstraint,
    Shape,
    UniqueConstraint,
)

TS = 1_700_000_000_000_000  # any in-range timestamp (us)


def _page(url, lang="en", links=()):
    anchors = "".join(f'<a href="{t}">l</a>' for t in links)
    return {
        "url": url,
        "warc_ts": TS,
        "html": f"<html><body>body {url}{anchors}</body></html>".encode(),
        "text": f"text body of {url} long enough",
        "lang": lang,
    }


def _write_pages(rows, path):
    tbl = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    import os

    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, f"{path}/part-00000.parquet")
    return path


@pytest.fixture(scope="module")
def chain_pages(tmp_path_factory):
    rows = [
        _page("https://c1/", lang="en"),
        _page("https://c2/", lang="de"),
        _page("https://b1/", links=["https://c1/"]),
        _page("https://b2/", links=["https://c2/"]),
        _page("https://a1/", links=["https://b1/"]),
        _page("https://a2/", links=["https://b2/"]),
    ]
    return _write_pages(rows, str(tmp_path_factory.mktemp("chain") / "pages"))


def _chain_shapes():
    return [
        Shape(
            shape_id="ShapeC",
            target=None,
            constraints=[
                PredicateConstraint(
                    name="c_lang", pred={"op": "==", "column": "lang", "value": "en"}
                )
            ],
        ),
        Shape(
            shape_id="ShapeB",
            target={"op": "regex", "column": "url", "pattern": "^https://b"},
            constraints=[RefConstraint(name="b_ref", min=1, shape="ShapeC")],
        ),
        Shape(
            shape_id="ShapeA",
            target={"op": "regex", "column": "url", "pattern": "^https://a"},
            constraints=[RefConstraint(name="a_ref", min=1, shape="ShapeB")],
        ),
    ]


def _verdict_map(res, shape_id):
    v = res.verdicts().to_pandas()
    sub = v[v.shape_id == shape_id]
    return dict(zip(sub.url, sub.valid))


@pytest.mark.parametrize("strategy", ["broadcast", "bucket", "auto"])
def test_depth2_chain_propagates_child_ref_failure(ray_session, chain_pages, strategy):
    res = ValidationEngine(
        _chain_shapes(), JobConfig(ref_strategy=strategy)
    ).run(chain_pages)
    b = _verdict_map(res, "ShapeB")
    assert b == {"https://b1/": True, "https://b2/": False}
    a = _verdict_map(res, "ShapeA")
    # a2 links b2, which is column-valid but ref-INVALID under ShapeB:
    # a2 must be invalid (the colpart-leak bug made it valid on the
    # bucket path)
    assert a == {"https://a1/": True, "https://a2/": False}


def test_depth2_chain_checkpoint_resume_path(ray_session, chain_pages, tmp_path):
    from shaclapi_ray.checkpoint import CheckpointedValidation

    cv = CheckpointedValidation(
        _chain_shapes(), JobConfig(ref_strategy="bucket"), out_dir=str(tmp_path / "run")
    )
    res = cv.run(chain_pages)
    assert res is not None
    assert _verdict_map(res, "ShapeA") == {"https://a1/": True, "https://a2/": False}


# ---------------------------------------------------------------------------


def test_link_extraction_survives_invalid_utf8(ray_session):
    from shaclapi_ray.stages.links import extract_links_batch

    batch = pa.table(
        {
            "url": pa.array(["https://ok/", "https://bad/"], pa.string()),
            "html": pa.array(
                [
                    b'<a href="https://t1/">x</a>',
                    b'\xff\xfe\x80 garbage <a href="https://t2/">y</a> \xc3(',
                ],
                pa.binary(),
            ),
        }
    )
    out = extract_links_batch(batch)
    got = dict(zip(out["url"].to_pylist(), out["target_url"].to_pylist()))
    assert got["https://ok/"] == "https://t1/"
    # the malformed page degrades (replacement chars) but its intact href
    # is still extracted and the task does not abort
    assert got["https://bad/"] == "https://t2/"


def test_fused_ref_eval_survives_invalid_utf8(ray_session, tmp_path):
    rows = [_page("https://p1/", links=["https://p2/"]), _page("https://p2/")]
    rows[1]["html"] = b"\xff\xfe invalid \xc3( bytes"
    pages = _write_pages(rows, str(tmp_path / "pages"))
    shapes = [
        Shape(
            shape_id="Child",
            target=None,
            constraints=[
                PredicateConstraint(
                    name="lang_en", pred={"op": "==", "column": "lang", "value": "en"}
                )
            ],
        ),
        Shape(
            shape_id="Parent",
            target={"op": "==", "column": "url", "value": "https://p1/"},
            constraints=[RefConstraint(name="ref", min=1, shape="Child")],
        ),
    ]
    res = ValidationEngine(shapes, JobConfig(ref_strategy="broadcast")).run(pages)
    assert _verdict_map(res, "Parent") == {"https://p1/": True}


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("with_hint", [True, False])
def test_unique_constraint_on_non_url_column(ray_session, tmp_path, with_hint):
    rows = [
        _page("https://u1/"),
        _page("https://u2/"),
        _page("https://u3/"),
    ]
    rows[0]["text"] = "duplicate body"
    rows[1]["text"] = "duplicate body"
    rows[2]["text"] = "unique body"
    pages = _write_pages(rows, str(tmp_path / "pages"))
    shape = Shape(
        shape_id="UniqueText",
        target=None,
        constraints=[UniqueConstraint(name="text_unique", column="text")],
    )
    eng = ValidationEngine([shape], JobConfig())
    if with_hint:
        res = eng.run(pages)  # parquet path => rows_hint => broadcast map
    else:
        import ray.data

        res = eng.run(ray.data.read_parquet(pages))  # no hint => count path
    assert _verdict_map(res, "UniqueText") == {
        "https://u1/": False,
        "https://u2/": False,
        "https://u3/": True,
    }


def test_unique_url_still_correct(ray_session, tmp_path):
    rows = [_page("https://d/"), _page("https://d/"), _page("https://s/")]
    pages = _write_pages(rows, str(tmp_path / "pages"))
    shape = Shape(
        shape_id="UniqueUrl",
        target=None,
        constraints=[UniqueConstraint(name="url_unique", column="url")],
    )
    res = ValidationEngine([shape], JobConfig()).run(pages)
    v = res.verdicts().to_pandas()
    assert set(v[v.valid].url) == {"https://s/"}
    assert set(v[~v.valid].url) == {"https://d/"}


# ---------------------------------------------------------------------------


def test_drift_mixed_with_other_constraints_raises():
    shape = Shape(
        shape_id="Mixed",
        target=None,
        constraints=[
            DriftConstraint(name="drift", column="text"),
            PredicateConstraint(
                name="p", pred={"op": "not_null", "column": "url"}
            ),
        ],
    )
    with pytest.raises(ValueError, match="drift"):
        ValidationEngine([shape], JobConfig())


def test_two_drift_constraints_raise():
    shape = Shape(
        shape_id="TwoDrift",
        target=None,
        constraints=[
            DriftConstraint(name="d1", column="text"),
            DriftConstraint(name="d2", column="url", use_length=True),
        ],
    )
    with pytest.raises(ValueError, match="drift"):
        ValidationEngine([shape], JobConfig())
