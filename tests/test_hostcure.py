"""Host-level curation (pipelines/hostcure.py): exact stats values,
driver-vs-shuffle rollup equality, broadcast-vs-join filter equality,
loud broadcast ceiling, and the driver-slot degeneracy guard."""

import pandas as pd
import pytest


def _corpus():
    """Hand-built corpus: host a = heavy exact duplication, host b =
    short docs, host c = clean, host d = one dup doc but below min_docs
    (never judged), '' = relative + null urls (one cross-host dup)."""
    return [
        {"url": "http://a.example/x1", "text": "same body here"},
        {"url": "http://a.example/x2", "text": "same body here"},
        {"url": "http://a.example/x3", "text": "unique alpha words four"},
        {"url": "http://b.example/y1", "text": "tiny"},
        {"url": "http://b.example/y2", "text": "also tiny"},
        {"url": "http://c.example/z1", "text": "a perfectly fine long document body"},
        {"url": "http://c.example/z2", "text": "another perfectly fine long document"},
        {"url": "http://d.example/solo", "text": "same body here"},
        {"url": "relative/path", "text": "same body here"},
        {"url": None, "text": "filler words here too"},
    ]


KW = dict(max_dup_pct=50, min_mean_tokens=2, min_docs=2)

# (host, n_docs, n_dup, sum_tokens, blocked) — dup counts are CORPUS-WIDE
# ("same body here" occurs 4x across hosts a/d/''), verdicts integer-exact
EXPECT = pd.DataFrame(
    {
        "host": ["", "a.example", "b.example", "c.example", "d.example"],
        "n_docs": [2, 3, 2, 2, 1],
        "n_dup": [1, 2, 0, 0, 1],
        "sum_tokens": [7, 10, 3, 11, 3],
        "blocked": [False, True, True, False, False],
    }
)


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows).repartition(3)


def _frame(ds):
    return (
        ds.to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
        .astype({"n_docs": "int64", "n_dup": "int64", "sum_tokens": "int64"})
    )


def test_host_curation_exact_values(ray_session):
    from shaclapi_ray.pipelines.hostcure import host_curation

    got = _frame(host_curation(_ds(_corpus()), **KW))
    pd.testing.assert_frame_equal(got, EXPECT)


def test_host_stats_shuffle_equals_driver(ray_session):
    """The distributed groupby(h1) rollup must be output-identical to the
    one-time driver-side merge (the beyond-DRIVER_MERGE_LIMIT form)."""
    from shaclapi_ray.pipelines.hostcure import host_stats

    a = _frame(host_stats(_ds(_corpus()), mode="driver"))
    b = _frame(host_stats(_ds(_corpus()), mode="shuffle"))
    pd.testing.assert_frame_equal(a, b)


def test_filter_join_equals_broadcast(ray_session):
    from shaclapi_ray.pipelines.hostcure import filter_by_host, host_curation

    pages = _ds(_corpus())
    verdicts = host_curation(pages, **KW).materialize()
    kept_b = (
        filter_by_host(_ds(_corpus()), verdicts, strategy="broadcast")
        .to_pandas()
        .sort_values("url", na_position="first")
        .reset_index(drop=True)
    )
    kept_j = (
        filter_by_host(_ds(_corpus()), verdicts, strategy="join")
        .to_pandas()
        .sort_values("url", na_position="first")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(kept_b[["url"]], kept_j[["url"]])
    # non-degenerate: hosts a/b dropped (5 pages), c/d/''/null kept (5)
    assert len(kept_b) == 5
    assert set(kept_b["url"].dropna()) == {
        "http://c.example/z1",
        "http://c.example/z2",
        "http://d.example/solo",
        "relative/path",
    }


def test_filter_nothing_blocked_passes_through(ray_session):
    """No blocked hosts: both strategies stream every page through."""
    from shaclapi_ray.pipelines.hostcure import filter_by_host, host_curation

    verdicts = host_curation(
        _ds(_corpus()), max_dup_pct=100, min_mean_tokens=0, min_docs=2
    ).materialize()
    for strategy in ("broadcast", "join"):
        kept = filter_by_host(_ds(_corpus()), verdicts, strategy=strategy)
        assert kept.count() == len(_corpus())


def test_broadcast_ceiling_is_loud(ray_session, monkeypatch):
    import shaclapi_ray.pipelines.hostcure as hc

    monkeypatch.setattr(hc, "HOST_BROADCAST_LIMIT", 0)
    pages = _ds(_corpus())
    verdicts = hc.host_curation(pages, **KW).materialize()
    with pytest.raises(ValueError, match="strategy='join'"):
        hc.filter_by_host(_ds(_corpus()), verdicts).materialize()


def test_driver_slot_profile_nondegenerate(ray_session):
    """HOSTCURE_KW is tuned to the synthetic fixture (CLAUDE.md): the
    learned blocklist must block SOMETHING and not EVERYTHING at the
    smoke scale, or the driver slot's 'kept' part degenerates."""
    import ray.data

    import __ray_entry__ as entry
    from shaclapi_ray.pipelines.hostcure import host_curation

    pages_dir = entry._pages("/root/testdata/sf0.001")
    pages = ray.data.read_parquet(pages_dir, columns=["url", "text"])
    v = host_curation(pages, **entry.HOSTCURE_KW).to_pandas()
    assert v["blocked"].any()
    assert not v["blocked"].all()
