"""robots_filter: longest-match allow/disallow semantics, broadcast ==
join path equality, DuckDB oracle parity (randomized), and the
ROBOTS_RULES driver-profile degeneracy guard (CLAUDE.md invariant)."""

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
import ray
from hypothesis import given, settings

RULES = [
    ("host1.example.org", "disallow", "/p/1"),
    ("host1.example.org", "allow", "/p/11"),
    ("host4.example.org", "disallow", "/"),
    ("host7.example.org", "disallow", "/p/7"),
    ("host7.example.org", "allow", "/p/77"),
]

_TMP_ROOT = tempfile.mkdtemp(prefix="robots_prop_")


@pytest.fixture(scope="module", autouse=True)
def _clean_tmp_root():
    yield
    shutil.rmtree(_TMP_ROOT, ignore_errors=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(
        list(df.columns), na_position="first", kind="mergesort"
    ).reset_index(drop=True)


def _run(urls, rules, strategy="broadcast"):
    import ray.data

    from shaclapi_ray.pipelines.robots import robots_filter

    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    return robots_filter(ds.repartition(2), rules, strategy=strategy).to_pandas()


def test_semantics(ray_session):
    out = _run(
        [
            "https://Host1.example.org/p/1",  # disallow /p/1
            "https://host1.example.org/p/11",  # allow /p/11 overrides (longest)
            "https://host1.example.org/p/2",  # no rule matches -> allowed
            "http://host4.example.org:80/x",  # default port stripped, "/" blocks
            "https://host4.example.org",  # empty path -> "/" -> blocked
            "host7.example.org/p/7",  # non-absolute: host '' -> allowed
            "",  # empty url -> host '' -> allowed
            None,  # dropped
            "https://host7.example.org/p/77?q#f",  # query in path, frag stripped
        ],
        RULES,
    )
    got = dict(zip(out["url"], zip(out["allowed"], out["rule"])))
    assert len(out) == 8  # null url dropped, everything else reported
    assert got["https://Host1.example.org/p/1"] == (False, "disallow:/p/1")
    assert got["https://host1.example.org/p/11"] == (True, "allow:/p/11")
    assert got["https://host1.example.org/p/2"] == (True, "")
    assert got["http://host4.example.org:80/x"] == (False, "disallow:/")
    assert got["https://host4.example.org"] == (False, "disallow:/")
    assert got["host7.example.org/p/7"] == (True, "")
    assert got[""] == (True, "")
    assert got["https://host7.example.org/p/77?q#f"] == (True, "allow:/p/77")
    paths = dict(zip(out["url"], out["path"]))
    assert paths["https://host4.example.org"] == "/"
    assert paths["https://host7.example.org/p/77?q#f"] == "/p/77?q"


def test_allow_wins_length_tie(ray_session):
    out = _run(
        ["https://h.x/ab"],
        [("h.x", "disallow", "/a"), ("h.x", "allow", "/a")],
    )
    assert out["allowed"].tolist() == [True]
    assert out["rule"].tolist() == ["allow:/a"]


def test_broadcast_join_identical_on_fixture(ray_session):
    """The skew-aware join path must be output-identical to broadcast on
    the real fixture (duplicate urls, ''/null/scheme-less plants)."""
    import ray.data

    from shaclapi_ray.pagegen import ensure_pages

    d = ensure_pages("/root/testdata/sf0.001")
    ds = ray.data.read_parquet(d, columns=["url"])
    a = _norm(
        _run_ds(ds, RULES, "broadcast")
    )
    b = _norm(_run_ds(ds, RULES, "join"))
    pd.testing.assert_frame_equal(a, b)


def _run_ds(ds, rules, strategy):
    from shaclapi_ray.pipelines.robots import robots_filter

    return robots_filter(ds, rules, strategy=strategy).to_pandas()


def test_rules_as_dataset(ray_session):
    """Both strategies accept the rules as a Dataset (the 100-TB form)."""
    import ray.data

    rules_ds = ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array([r[0] for r in RULES], pa.string()),
                "directive": pa.array([r[1] for r in RULES], pa.string()),
                "prefix": pa.array([r[2] for r in RULES], pa.string()),
            }
        )
    )
    urls = ["https://host1.example.org/p/1", "https://host1.example.org/p/11"]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    from shaclapi_ray.pipelines.robots import robots_filter

    for strategy in ("broadcast", "join"):
        out = robots_filter(ds, rules_ds, strategy=strategy).to_pandas()
        got = dict(zip(out["url"], out["allowed"]))
        assert got == {urls[0]: False, urls[1]: True}


def test_empty_rules_all_allowed(ray_session):
    for rules in ([], ):
        out = _run(["https://h.x/a", "x"], rules)
        assert out["allowed"].all()
        assert (out["rule"] == "").all()
    out = _run(["https://h.x/a"], [], strategy="join")
    assert out["allowed"].tolist() == [True]


def test_bad_directive_raises(ray_session):
    with pytest.raises(ValueError, match="directive"):
        _run(["https://h.x/a"], [("h.x", "deny", "/")])


def test_profile_not_degenerate(ray_session):
    """ROBOTS_RULES must disallow some pages, allow others, and fire the
    longest-match allow override at BOTH driver scales (sf0.01 checked
    via the SQL side alone — no 20k-row Ray pass in the guard)."""
    import ray.data

    from __ray_entry__ import ROBOTS_RULES
    from shaclapi_ray.oracles import robots_sql
    from shaclapi_ray.pagegen import ensure_pages

    ds = ray.data.read_parquet(
        ensure_pages("/root/testdata/sf0.001"), columns=["url"]
    )
    out = _run_ds(ds, ROBOTS_RULES, "broadcast")
    n_allowed = int(out["allowed"].sum())
    assert 0 < n_allowed < len(out), (
        f"ROBOTS_RULES verdict is degenerate at sf0.001 "
        f"({n_allowed}/{len(out)} allowed)"
    )
    assert (out["rule"].str.startswith("allow:")).any(), (
        "the longest-match allow override never fires at sf0.001"
    )
    counts = duckdb.sql(
        "SELECT allowed, count(*) AS n FROM ("
        + robots_sql(ensure_pages("/root/testdata/sf0.01"), ROBOTS_RULES)
        + ") GROUP BY allowed"
    ).df()
    by = dict(zip(counts.allowed, counts.n))
    assert by.get(True, 0) > 0 and by.get(False, 0) > 0, (
        f"ROBOTS_RULES verdict is degenerate at sf0.01 ({by})"
    )


_HOSTS = ["a.x", "b.y"]
_URLS = st.sampled_from(
    [
        None,
        "",
        "http://a.x/p",
        "http://a.x/p/1",
        "http://a.x/p/12",
        "https://A.X:443/p/123",
        "http://b.y",
        "http://b.y/",
        "http://b.y/q?s=1",
        "rel/path",
        "http://a.x/p/1",  # double weight: duplicate urls likely
    ]
)
_PREFIXES = st.sampled_from(["/", "/p", "/p/1", "/p/12", "/q", ""])
_RULE = st.tuples(
    st.sampled_from(_HOSTS),
    st.sampled_from(["allow", "disallow"]),
    _PREFIXES,
)


def _write(urls) -> str:
    t = pa.table({"url": pa.array(urls, pa.string())})
    d = os.path.join(_TMP_ROOT, uuid.uuid4().hex)
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/part-0.parquet")
    return d


@settings(max_examples=20, deadline=None)
@given(
    urls=st.lists(_URLS, min_size=1, max_size=10),
    rules=st.lists(_RULE, min_size=0, max_size=6),
)
def test_matches_duckdb(ray_session, urls, rules):
    """Parity vs the SQL oracle on randomized collision-heavy inputs:
    duplicate urls, ''/null urls, empty prefixes (match everything),
    duplicate rules, allow/disallow ties at the same prefix."""
    import ray.data

    from shaclapi_ray.oracles import robots_sql
    from shaclapi_ray.pipelines.robots import robots_filter

    d = _write(urls)
    exp = duckdb.connect().execute(robots_sql(d, rules)).df()
    for strategy in ("broadcast", "join"):
        out = robots_filter(
            ray.data.read_parquet(d).repartition(2), rules, strategy=strategy
        ).to_pandas()
        if len(exp) == 0:
            # all urls null: Ray drops the schema of an all-empty
            # Dataset on to_pandas — compare row counts only
            assert len(out) == 0
            continue
        pd.testing.assert_frame_equal(
            _norm(out), _norm(exp).astype(out.dtypes.to_dict())
        )
