"""Property tests: latest_snapshot and cap_per_host vs their DuckDB
oracles on randomized page tables built to collide — duplicate urls,
NULL and '' urls, tied timestamps, byte-identical rows — the exact
inputs where the keep-all-ties / RANK semantics can silently diverge."""

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

_TMP_ROOT = tempfile.mkdtemp(prefix="freshness_prop_")


@pytest.fixture(scope="module", autouse=True)
def _clean_tmp_root():
    yield
    shutil.rmtree(_TMP_ROOT, ignore_errors=True)

_URLS = st.sampled_from(
    [
        None,
        "",
        "http://a.x/p0",
        "http://a.x/p1",
        "http://a.x/p2",
        "http://b.y/q",
        "rel/path",
        "http://a.x/p0",  # double weight: url collisions likely
    ]
)
_TS = st.integers(min_value=0, max_value=3)  # tiny range: tied ts likely
_TEXTS = st.sampled_from([None, "", "t", "tt", "日本", "t"])

_ROWS = st.lists(
    st.tuples(_URLS, _TS, _TEXTS), min_size=1, max_size=14
)

_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
    ]
)


def _write(rows) -> str:
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    d = os.path.join(_TMP_ROOT, uuid.uuid4().hex)
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/part-0.parquet")
    return d


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(list(df.columns), na_position="first", kind="mergesort")
        .reset_index(drop=True)
    )


@settings(max_examples=20, deadline=None)
@given(rows=_ROWS)
def test_latest_snapshot_matches_duckdb(ray_session, rows):
    from shaclapi_ray.oracles import latest_snapshot_sql
    from shaclapi_ray.pipelines.freshness import latest_snapshot

    d = _write(rows)
    exp = duckdb.connect().execute(latest_snapshot_sql(d)).df()
    for strategy in ("broadcast", "join"):  # join = the skew-aware path
        out = latest_snapshot(
            ray.data.read_parquet(d).repartition(2), strategy=strategy
        ).to_pandas()
        out["ts"] = out["warc_ts"].astype("int64")
        pd.testing.assert_frame_equal(
            _norm(out[["url", "ts"]]).astype({"ts": "int64"}),
            _norm(exp).astype({"ts": "int64"}),
        )


_ANCHOR_TXT = st.sampled_from(["", "x", "click here", "日本", "a<b", '"q"', "a&b"])
_TARGET = st.sampled_from(["http://t.x/A", "http://t.x/B", "rel/c", "x"])
_LINK = st.tuples(_TARGET, _ANCHOR_TXT)
_PAGE = st.tuples(
    st.one_of(st.none(), st.sampled_from(["http://s.x/1", "http://s.x/2"])),
    st.lists(_LINK, min_size=0, max_size=4),
)


@settings(max_examples=15, deadline=None)
@given(pages=st.lists(_PAGE, min_size=1, max_size=8))
def test_anchor_profile_matches_duckdb(ray_session, pages):
    """Regex parity guard: polars (Rust regex) and DuckDB (RE2) must
    explode and group the same anchor tags, including empty/unicode/
    markup-bearing anchor text and repeated (target, anchor) pairs."""
    import ray.data

    from shaclapi_ray.oracles import anchor_profile_sql
    from shaclapi_ray.pipelines.anchors import anchor_text_profile

    def html(links):
        return (
            "<html><body>pad "
            + "".join(f'<a href="{t}">{a}</a> mid' for t, a in links)
            + "</body></html>"
        ).encode()

    t = pa.table(
        {
            "url": pa.array([u for u, _ in pages], pa.string()),
            "warc_ts": pa.array([0] * len(pages), pa.timestamp("us")),
            "text": pa.array([""] * len(pages), pa.string()),
            "html": pa.array([html(ls) for _, ls in pages], pa.binary()),
        }
    )
    d = os.path.join(_TMP_ROOT, uuid.uuid4().hex)
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/part-0.parquet")
    cols = [
        "target_url",
        "n_inlinks",
        "n_unique_sources",
        "n_distinct_anchors",
        "top_anchor",
    ]
    got = anchor_text_profile(
        ray.data.read_parquet(d).repartition(2)
    ).to_pandas()
    exp = duckdb.connect().execute(anchor_profile_sql(d)).df()
    if exp.empty:
        # empty Dataset.to_pandas() loses the schema (see _sorted in
        # __ray_entry__.py) — just assert emptiness matches
        assert got.empty
        return
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()), exp)


@settings(max_examples=20, deadline=None)
@given(rows=_ROWS, k=st.integers(min_value=1, max_value=4))
def test_cap_per_host_matches_duckdb(ray_session, rows, k):
    from shaclapi_ray.oracles import cap_per_host_sql
    from shaclapi_ray.pipelines.freshness import cap_per_host

    d = _write(rows)
    exp = duckdb.connect().execute(cap_per_host_sql(d, k)).df()
    for strategy in ("broadcast", "join"):
        out = cap_per_host(
            ray.data.read_parquet(d).repartition(2), k, strategy=strategy
        ).to_pandas()
        out["ts"] = out["warc_ts"].astype("int64")
        pd.testing.assert_frame_equal(
            _norm(out[["url", "ts"]]).astype({"ts": "int64"}),
            _norm(exp[["url", "ts"]]).astype({"ts": "int64"}),
        )


_CHAIN_TEXTS = st.sampled_from(
    [None, "", "dup dup dup", "dup dup dup", "unique alpha beta gamma",
     "short", "one two three four five six"]
)
_CHAIN_ROWS = st.lists(
    st.tuples(_URLS, _TS, _CHAIN_TEXTS), min_size=1, max_size=16
)


@settings(max_examples=12, deadline=None)
@given(
    rows=_CHAIN_ROWS,
    cap_k=st.sampled_from([1, 2, 4]),
    max_dup_pct=st.sampled_from([25, 50]),
    min_docs=st.sampled_from([1, 3]),
)
def test_curate_chain_matches_composed_oracle(
    ray_session, rows, cap_k, max_dup_pct, min_docs
):
    """End-to-end randomized check of the WHOLE curate_pages chain
    against its CTE-composed DuckDB oracle — recrawls, cross-host
    duplicate texts, null/''/relative urls, and cap boundaries all in
    one pot."""
    from shaclapi_ray.oracles import curate_pages_sql
    from shaclapi_ray.pipelines.curate import curate_pages

    d = _write(rows)
    got = curate_pages(
        ray.data.read_parquet(d).repartition(2),
        cap_k=cap_k,
        max_dup_pct=max_dup_pct,
        min_mean_tokens=1,
        min_docs=min_docs,
    ).to_pandas()
    exp = duckdb.connect().execute(
        curate_pages_sql(
            d, cap_k, max_dup_pct=max_dup_pct,
            min_mean_tokens=1, min_docs=min_docs,
        )
    ).df()
    if exp.empty:
        assert len(got) == 0
        return
    got["ts"] = got["warc_ts"].astype("int64")
    pd.testing.assert_frame_equal(
        _norm(got[["url", "ts"]]).astype({"ts": "int64"}),
        _norm(exp).astype({"ts": "int64"}),
    )


@settings(max_examples=15, deadline=None)
@given(pages=st.lists(_PAGE, min_size=1, max_size=8))
def test_outlink_profile_matches_duckdb(ray_session, pages):
    """Outbound-profile parity on the same randomized link corpora as
    the anchor test — exercises the href-only regex, duplicate source
    urls, relative-href '' hosts, and zero-link pages."""
    import ray.data

    from shaclapi_ray.oracles import outlink_profile_sql
    from shaclapi_ray.pipelines.anchors import outlink_profile

    def html(links):
        return (
            "<html><body>pad "
            + "".join(f'<a href="{t}">{a}</a> mid' for t, a in links)
            + "</body></html>"
        ).encode()

    t = pa.table(
        {
            "url": pa.array([u for u, _ in pages], pa.string()),
            "html": pa.array([html(ls) for _, ls in pages], pa.binary()),
        }
    )
    d = os.path.join(_TMP_ROOT, uuid.uuid4().hex)
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/part-0.parquet")
    cols = ["url", "n_pages", "n_links", "n_unique_hosts", "n_internal"]
    got = outlink_profile(ray.data.read_parquet(d).repartition(2)).to_pandas()
    exp = duckdb.connect().execute(outlink_profile_sql(d)).df()
    if exp.empty:
        assert got.empty
        return
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()), exp)


_COMP_TS = st.one_of(
    st.none(),
    st.integers(min_value=-40_000_000_000_000, max_value=2_000_000_000_000_000),
)
_COMP_LANG = st.sampled_from([None, "", "en", "de", "xx"])
_COMP_URLS = st.sampled_from(
    [None, "", "http://a.x/1", "https://B.y:8/2", "rel/p", "http://a.x/1"]
)
_COMP_ROWS = st.lists(
    st.tuples(_COMP_URLS, _COMP_TS, _TEXTS, _COMP_LANG), min_size=1, max_size=16
)


@settings(max_examples=20, deadline=None)
@given(rows=_COMP_ROWS, period=st.sampled_from(["month", "day"]))
def test_corpus_composition_matches_duckdb(ray_session, rows, period):
    """Calendar-truncation parity guard: polars dt.truncate and DuckDB
    date_trunc must bucket the same — including pre-1970 negative
    epochs — with the same host/lang/null grouping and token sums."""
    from shaclapi_ray.oracles import corpus_composition_sql
    from shaclapi_ray.pipelines.profile import corpus_composition

    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [r[1] for r in rows], pa.int64()
            ).cast(pa.timestamp("us")),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    d = os.path.join(_TMP_ROOT, uuid.uuid4().hex)
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/part-0.parquet")
    exp = duckdb.connect().execute(corpus_composition_sql(d, period)).df()
    got = corpus_composition(
        ray.data.read_parquet(d).repartition(2), period=period
    ).to_pandas()
    key = ["host", "period_us", "lang", "n_docs", "n_tokens"]
    a = _norm(got[key])
    b = _norm(exp[key])
    assert len(a) == len(b), (len(a), len(b))
    for c in key:
        assert (
            a[c].fillna("__na__").tolist() == b[c].fillna("__na__").tolist()
        ), c
