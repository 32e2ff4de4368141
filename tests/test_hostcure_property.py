"""Property test: host_curation vs its DuckDB oracle on randomized
corpora built to collide — shared texts across hosts (corpus-wide dup
counting), null/''/relative urls, null texts, whitespace-heavy token
counts — the inputs where the rollup could silently diverge."""

import os
import shutil
import tempfile
import uuid

import duckdb
import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import pytest
from hypothesis import given, settings

_TMP_ROOT = tempfile.mkdtemp(prefix="hostcure_prop_")


@pytest.fixture(scope="module", autouse=True)
def _clean_tmp_root():
    yield
    shutil.rmtree(_TMP_ROOT, ignore_errors=True)

_URLS = st.sampled_from(
    [
        None,
        "",
        "rel/x",
        "http://a.x/1",
        "http://a.x/2",
        "http://a.x/3",
        "http://b.y/1",
        "http://b.y/2",
        "http://c.z/1",
    ]
)
_TEXTS = st.sampled_from(
    [None, "", "shared text", "shared text", "solo words here",
     "a\tb\nc d", "日本 語", "one"]
)
_ROWS = st.lists(st.tuples(_URLS, _TEXTS), min_size=1, max_size=16)


def _write(rows) -> str:
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    d = os.path.join(_TMP_ROOT, uuid.uuid4().hex)
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/part-0.parquet")
    return d


@settings(max_examples=20, deadline=None)
@given(
    rows=_ROWS,
    max_dup_pct=st.sampled_from([0, 25, 50, 100]),
    min_mean_tokens=st.sampled_from([0, 1, 3]),
    min_docs=st.sampled_from([1, 2, 4]),
)
def test_host_curation_matches_duckdb(
    ray_session, rows, max_dup_pct, min_mean_tokens, min_docs
):
    from shaclapi_ray.oracles import host_curation_sql
    from shaclapi_ray.pipelines.hostcure import host_curation

    d = _write(rows)
    got = (
        host_curation(
            ray.data.read_parquet(d).repartition(2),
            max_dup_pct=max_dup_pct,
            min_mean_tokens=min_mean_tokens,
            min_docs=min_docs,
        )
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.connect()
        .execute(host_curation_sql(d, max_dup_pct, min_mean_tokens, min_docs))
        .df()
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()), exp)
