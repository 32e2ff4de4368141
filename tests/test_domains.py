"""registrable_domain: PSL longest-match semantics, default rule, IP /
bare-suffix exclusion, DuckDB oracle parity (fixed + randomized)."""

import os
import shutil
import tempfile
import uuid

import duckdb
import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings

_TMP_ROOT = tempfile.mkdtemp(prefix="domains_prop_")


@pytest.fixture(scope="module", autouse=True)
def _clean_tmp_root():
    yield
    shutil.rmtree(_TMP_ROOT, ignore_errors=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(
        list(df.columns), na_position="first", kind="mergesort"
    ).reset_index(drop=True)


def _run(urls, **kw) -> pd.DataFrame:
    import ray.data

    from shaclapi_ray.pipelines.domains import registrable_domain

    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    return registrable_domain(ds.repartition(2), **kw).to_pandas()


def _write(urls) -> str:
    d = os.path.join(_TMP_ROOT, uuid.uuid4().hex)
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"url": pa.array(urls, pa.string())}), f"{d}/part-0.parquet"
    )
    return d


def test_semantics(ray_session):
    out = _run(
        [
            "https://news.bbc.co.uk/x",  # 2-label suffix, deep host
            "https://a.b.blogspot.co.uk/",  # registrable keeps ONE label
            "https://host3.example.org/p/1",  # default rule: last label
            "http://org",  # host IS the (default) suffix -> no domain
            "https://co.jp",  # host IS a listed suffix -> no domain
            "http://192.168.1.10/x",  # IPv4 literal -> no suffix/domain
            "https://H1.Example.ORG:443/q",  # lowercased, port stripped
            "rel/path",  # unparseable -> host ''
            "https://a.b./x",  # trailing-dot host: empty last label
            None,  # dropped
        ]
    )
    by = {r["url"]: (r["host"], r["suffix"], r["domain"]) for _, r in out.iterrows()}
    assert by["https://news.bbc.co.uk/x"] == ("news.bbc.co.uk", "co.uk", "bbc.co.uk")
    assert by["https://a.b.blogspot.co.uk/"][2] == "blogspot.co.uk"
    assert by["https://host3.example.org/p/1"] == (
        "host3.example.org", "org", "example.org"
    )
    assert by["http://org"] == ("org", "org", "")
    assert by["https://co.jp"] == ("co.jp", "co.jp", "")
    assert by["http://192.168.1.10/x"] == ("192.168.1.10", "", "")
    assert by["https://H1.Example.ORG:443/q"] == (
        "h1.example.org", "org", "example.org"
    )
    assert by["rel/path"] == ("", "", "")
    assert by["https://a.b./x"] == ("a.b.", "", "")
    assert len(out) == 9  # null url dropped


def test_custom_suffixes_and_depth(ray_session):
    """3-label suffix entries beat 2-label ones; list is pluggable."""
    out = _run(
        ["https://x.y.pvt.k12.ma.us/p", "https://a.k12.ma.us"],
        suffixes=("k12.ma.us", "pvt.k12.ma.us"),
    )
    by = {r["url"]: (r["suffix"], r["domain"]) for _, r in out.iterrows()}
    assert by["https://x.y.pvt.k12.ma.us/p"] == ("pvt.k12.ma.us", "y.pvt.k12.ma.us")
    assert by["https://a.k12.ma.us"] == ("k12.ma.us", "a.k12.ma.us")


def test_matches_duckdb_fixture(ray_session):
    """Full parity against the SQL oracle on the pages fixture."""
    from shaclapi_ray.oracles import registrable_domain_sql
    from shaclapi_ray.pagegen import ensure_pages

    import ray.data

    from shaclapi_ray.pipelines.domains import registrable_domain

    d = ensure_pages("/root/testdata/sf0.001")
    out = registrable_domain(
        ray.data.read_parquet(d, columns=["url"])
    ).to_pandas()
    exp = duckdb.connect().execute(registrable_domain_sql(d)).df()
    pd.testing.assert_frame_equal(_norm(out), _norm(exp))


_HOST_LABEL = st.sampled_from(["a", "b", "www", "co", "uk", "jp", "org",
                               "gov", "cn", "x9", "192", "168", "1", "10"])
_URLS = st.one_of(
    st.none(),
    st.just(""),
    st.just("rel/path"),
    st.builds(
        lambda labels, dot, port, path: (
            "https://" + ".".join(labels) + dot + port + path
        ),
        st.lists(_HOST_LABEL, min_size=1, max_size=5),
        st.sampled_from(["", "."]),  # trailing-dot hosts: empty last label
        st.sampled_from(["", ":443", ":8080"]),
        st.sampled_from(["", "/", "/p/1?q=2#f"]),
    ),
)


@settings(max_examples=20, deadline=None)
@given(urls=st.lists(_URLS, min_size=1, max_size=12))
def test_matches_duckdb_random(ray_session, urls):
    """Randomized parity: hosts assembled from labels that collide with
    suffix-list labels (co/uk/gov/cn), IP lookalikes, ports, bare
    suffixes, unparseable urls."""
    from shaclapi_ray.oracles import registrable_domain_sql

    d = _write(urls)
    out = _run([u for u in urls])
    exp = duckdb.connect().execute(registrable_domain_sql(d)).df()
    if len(exp) == 0:
        assert len(out) == 0
        return
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp).astype(out.dtypes.to_dict())
    )
