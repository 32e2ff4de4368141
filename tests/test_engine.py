"""End-to-end engine goldens on the deterministic 600-row pages table —
the analog of the reference's parametrized e2e suite
(/root/reference/tests/test_main.py:148-163), compared per
compare_results semantics (sorted instances, exact counts)."""

import hashlib

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.fixtures import (
    column_schema,
    full_schema,
    or_shape,
    referential_schema,
    unique_url_shape,
)
from shaclapi_ray.pagegen import pages_parquet_paths

from .oracle import expected_links, expected_verdicts

N = 600


def _engine_verdicts(result, shape_id):
    tbl = result.verdicts().to_pandas()
    sub = tbl[tbl.shape_id == shape_id]
    return sorted(zip(sub.url.tolist(), sub.valid.tolist()))


@pytest.fixture(scope="module")
def column_result(ray_session, small_pages_dir):
    eng = ValidationEngine(column_schema(), JobConfig())
    return eng.run(small_pages_dir)


@pytest.mark.parametrize(
    "shape_id", ["UrlShape", "FreshPageShape", "LangShape", "TargetPageShape"]
)
def test_column_shape_verdicts_match_oracle(column_result, shape_id):
    assert _engine_verdicts(column_result, shape_id) == expected_verdicts(shape_id, N)


def test_violations_have_offending_values(column_result):
    v = column_result.violations().to_pandas()
    lang_v = v[(v.shape_id == "LangShape") & (v.constraint == "lang_member")]
    assert set(lang_v.offending_value) == {"", "xx", "null"}
    url_v = v[(v.shape_id == "UrlShape") & (v.constraint == "url_scheme")]
    assert all(
        (o == "" or o == "null" or not o.startswith("https://"))
        for o in url_v.offending_value
    )
    tl = v[(v.shape_id == "UrlShape") & (v.constraint == "text_min_len")]
    assert all(int(o) < 10 for o in tl.offending_value)


def test_referential_shape(ray_session, small_pages_dir):
    eng = ValidationEngine(referential_schema(), JobConfig())
    res = eng.run(small_pages_dir)
    assert _engine_verdicts(res, "LinkedPageShape") == expected_verdicts(
        "LinkedPageShape", N
    )
    # child shape verdicts also emitted (advanced targets)
    assert _engine_verdicts(res, "TargetPageShape") == expected_verdicts(
        "TargetPageShape", N
    )


def test_referential_bucket_join_matches_broadcast(ray_session, small_pages_dir):
    bc = ValidationEngine(
        referential_schema(), JobConfig(ref_strategy="broadcast")
    ).run(small_pages_dir)
    bk = ValidationEngine(
        referential_schema(),
        JobConfig(
            ref_strategy="bucket",
            combine_strategy="bucket",
            num_partitions=8,
            bloom_prefilter=True,
        ),
    ).run(small_pages_dir)
    assert _engine_verdicts(bc, "LinkedPageShape") == _engine_verdicts(
        bk, "LinkedPageShape"
    )


def test_referential_salted_join_same_verdicts(ray_session, small_pages_dir):
    salted = ValidationEngine(
        referential_schema(),
        JobConfig(ref_strategy="bucket", num_partitions=8, salt_k=4),
    ).run(small_pages_dir)
    assert _engine_verdicts(salted, "LinkedPageShape") == expected_verdicts(
        "LinkedPageShape", N
    )


def test_or_shape(ray_session, small_pages_dir):
    eng = ValidationEngine([or_shape()], JobConfig())
    res = eng.run(small_pages_dir)
    assert _engine_verdicts(res, "OrShape") == expected_verdicts("OrShape", N)


def test_unique_shape(ray_session, small_pages_dir):
    eng = ValidationEngine([unique_url_shape()], JobConfig())
    res = eng.run(small_pages_dir)
    assert _engine_verdicts(res, "UniqueUrlShape") == expected_verdicts(
        "UniqueUrlShape", N
    )


def test_links_extraction(ray_session, small_pages_dir):
    import ray.data

    from shaclapi_ray.stages.links import extract_links

    pages = ray.data.read_parquet(small_pages_dir, columns=["url", "html"])
    links = extract_links(pages).to_pandas()
    got = sorted(zip(links.url.tolist(), links.target_url.tolist()))
    assert got == expected_links(N)


def test_test_output_format(ray_session, small_pages_dir):
    cfg = JobConfig(target_shape="LinkedPageShape")
    eng = ValidationEngine(full_schema(), cfg)
    res = eng.run(small_pages_dir)
    out = res.test_output()
    assert set(out) == {
        "validTargets",
        "invalidTargets",
        "advancedValid",
        "advancedInvalid",
    }
    exp = expected_verdicts("LinkedPageShape", N)
    got_valid = sorted(u for u, _ in out["validTargets"])
    got_invalid = sorted(u for u, _ in out["invalidTargets"])
    assert got_valid == sorted(u for u, v in exp if v)
    assert got_invalid == sorted(u for u, v in exp if not v)
    # pruning: only TargetPageShape verdicts are advanced
    adv_shapes = {r for _, r in out["advancedValid"] + out["advancedInvalid"]}
    assert adv_shapes <= {"TargetPageShape", "LinkedPageShape"}


def test_row_filter_pushdown(ray_session, small_pages_dir):
    """Job-level row filter ANDed onto the target shape's target — the
    reference's target-query replacement (Reduction.replace_target_query)."""
    cfg = JobConfig(
        target_shape="UrlShape",
        row_filter={"op": "==", "column": "lang", "value": "de"},
    )
    eng = ValidationEngine(column_schema(), cfg)
    res = eng.run(small_pages_dir)
    got = _engine_verdicts(res, "UrlShape")
    from shaclapi_ray.pagegen import row_lang

    from .oracle import s1_valid, url_key

    exp = sorted((url_key(i), s1_valid(i)) for i in range(N) if row_lang(i) == "de")
    assert got == exp


def test_border_case_empty_target(ray_session, small_pages_dir):
    cfg = JobConfig(
        target_shape="UrlShape",
        row_filter={"op": "==", "column": "lang", "value": "zz-never"},
    )
    res = ValidationEngine(column_schema(), cfg).run(small_pages_dir)
    out = res.test_output()
    assert out["validTargets"] == [] and out["invalidTargets"] == []


def test_reduced_schema_changes_verdicts(ray_session, small_pages_dir):
    """tc3 analog: removing a constraint flips planted violations to valid."""
    full = ValidationEngine(column_schema(), JobConfig()).run(small_pages_dir)
    reduced_cfg = JobConfig(
        target_shape="UrlShape", requested_columns={"url", "warc_ts", "lang"}
    )
    red = ValidationEngine(column_schema(), reduced_cfg).run(small_pages_dir)
    full_v = dict(_engine_verdicts(full, "UrlShape"))
    red_v = dict(_engine_verdicts(red, "UrlShape"))
    # rows failing only text_min_len become valid under the reduced schema
    flipped = [u for u in full_v if not full_v[u] and red_v[u]]
    assert flipped, "constraint removal must change some verdicts"
    from .oracle import url_key

    # every short-text row with a well-formed url flips to valid
    for i in range(N):
        if i % 100 == 3 and url_key(i).startswith("https://"):
            assert red_v[url_key(i)]


def test_text_invariant_byte_identical(ray_session, small_pages_dir):
    """North-rule per-row invariant: validation must not rewrite `text`."""
    before = {}
    for p in pages_parquet_paths(small_pages_dir):
        t = pq.read_table(p, columns=["url", "text"])
        for u, x in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            if u:
                before[u] = hashlib.sha256(x.encode()).hexdigest()
    ValidationEngine(full_schema(), JobConfig()).run(small_pages_dir)
    after = {}
    for p in pages_parquet_paths(small_pages_dir):
        t = pq.read_table(p, columns=["url", "text"])
        for u, x in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            if u:
                after[u] = hashlib.sha256(x.encode()).hexdigest()
    assert before == after


def test_annotate_left_outer(ray_session, small_pages_dir):
    import ray.data

    res = ValidationEngine(
        column_schema(), JobConfig(target_shape="FreshPageShape")
    ).run(small_pages_dir)
    pages = ray.data.read_parquet(small_pages_dir, columns=["url", "lang"])
    ann = res.annotate(pages).to_pandas()
    assert len(ann) == N
    en = ann[ann.lang == "en"]
    non_en = ann[ann.lang != "en"]
    assert en.valid.notna().all()
    assert non_en.valid.isna().all()


def test_pass_a_actor_pool(ray_session, small_pages_dir):
    """Pass A as an actor pool (shape compilation once per actor in
    __init__) must match the stateless-task path."""
    task_res = ValidationEngine(column_schema(), JobConfig()).run(small_pages_dir)
    actor_res = ValidationEngine(
        column_schema(), JobConfig(concurrency=2, batch_size=128)
    ).run(small_pages_dir)
    assert _engine_verdicts(task_res, "UrlShape") == _engine_verdicts(
        actor_res, "UrlShape"
    )


def test_verdict_rollup_matches_counts_and_oracle(column_result, small_pages_dir):
    """verdict_rollup: per-(host, shape_id) valid/invalid counts must (a)
    re-sum to verdict_counts exactly, (b) bucket null/''/scheme-less urls
    into host '', and (c) match the DuckDB oracle row-for-row."""
    import duckdb

    from shaclapi_ray.oracles import all_column_shapes, verdict_rollup_sql

    roll = column_result.verdict_rollup().to_pandas()
    counts = column_result.verdict_counts().to_pandas()
    for shape_id, g in roll.groupby("shape_id"):
        c = counts[counts.shape_id == shape_id]
        want_valid = int(c[c.valid]["n"].sum())
        want_invalid = int(c[~c.valid]["n"].sum())
        assert int(g["n_valid"].sum()) == want_valid
        assert int(g["n_invalid"].sum()) == want_invalid
    # the planted ''/null/scheme-less urls all land in host ''
    assert (roll["host"] == "").any()
    assert roll[roll["host"] == ""]["n_valid"].sum() > 0
    exp = duckdb.sql(
        verdict_rollup_sql(all_column_shapes(), small_pages_dir)
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(
        roll.sort_values(["host", "shape_id"]).reset_index(drop=True),
        exp.sort_values(["host", "shape_id"]).reset_index(drop=True),
        check_dtype=False,
    )
