"""Freshness operators (pipelines/freshness.py): latest_snapshot winner
semantics (newest ts, md5 tie-break, keep-all byte-identical ties, NULL
vs '' url groups) and cap_per_host RANK semantics, with every
mode/strategy pinned output-identical and the broadcast ceiling loud."""

import hashlib

import pandas as pd
import pyarrow as pa
import pytest


def _ts(us: int) -> int:
    return us


def _pages_table() -> pa.Table:
    # u2's two rows share ts=5 and differ in text: the winner is the max
    # (md5_lo, md5_hi) text; u3's two rows are byte-identical (keep-all)
    urls = ["u1", "u1", "u1", "u2", "u2", "u3", "u3", None, None, ""]
    ts = [10, 20, 30, 5, 5, 7, 7, 100, 200, 50]
    txt = ["a", "b", "c", "t-one", "t-two", "same", "same", "n1", "n2", "e1"]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "text": pa.array(txt, pa.string()),
        }
    )


def _ds():
    import ray.data

    return ray.data.from_arrow(_pages_table()).repartition(3)


def _md5_key(t: str):
    d = hashlib.md5(t.encode()).digest()
    return (int.from_bytes(d[8:], "little"), int.from_bytes(d[:8], "little"))


def _norm(ds):
    df = ds.to_pandas()
    df["ts"] = df["warc_ts"].astype("int64")
    return (
        df[["url", "ts", "text"]]
        .sort_values(["url", "ts", "text"], na_position="first", kind="mergesort")
        .reset_index(drop=True)
    )


def test_md5_pair_matches_duckdb_and_hashlib():
    """md5_pair's single-digest unhex path must stay bit-identical to
    DuckDB's md5_number_lower/md5_number_upper AND the hashlib fallback
    convention (lo = digest[8:] LE, hi = digest[:8] LE)."""
    import duckdb
    import numpy as np

    from shaclapi_ray.stages.md5kernel import md5_pair

    vals = ["", "abc", "日本語テキスト", "x" * 5000, "a\tb\nc"]
    lo, hi = md5_pair(pa.array(vals, pa.string()))
    con = duckdb.connect()
    _scan = pa.table({"t": pa.array(vals)})  # noqa: F841
    ref = con.execute(
        "SELECT md5_number_lower(t) l, md5_number_upper(t) u FROM _scan"
    ).fetch_arrow_table()
    assert (lo == ref["l"].to_numpy().astype(np.uint64)).all()
    assert (hi == ref["u"].to_numpy().astype(np.uint64)).all()
    for i, v in enumerate(vals):
        d = hashlib.md5(v.encode()).digest()
        assert lo[i] == int.from_bytes(d[8:], "little")
        assert hi[i] == int.from_bytes(d[:8], "little")


def test_latest_snapshot_semantics(ray_session):
    from shaclapi_ray.pipelines.freshness import latest_snapshot

    got = _norm(latest_snapshot(_ds()))
    u2_winner = max(["t-one", "t-two"], key=_md5_key)
    exp = pd.DataFrame(
        {
            "url": [None, "", "u1", "u2", "u3", "u3"],
            "ts": [200, 50, 30, 5, 7, 7],
            "text": ["n2", "e1", "c", u2_winner, "same", "same"],
        }
    )
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.parametrize("kw", [{"strategy": "join"}, {"mode": "shuffle"},
                                {"mode": "driver"}])
def test_latest_snapshot_paths_identical(ray_session, kw):
    from shaclapi_ray.pipelines.freshness import latest_snapshot

    base = _norm(latest_snapshot(_ds()))
    pd.testing.assert_frame_equal(_norm(latest_snapshot(_ds(), **kw)), base)


def test_latest_join_full_fallback_identical(ray_session, monkeypatch):
    """Force the beyond-ceiling FULL keyed join (multi-key set 'too big'
    to broadcast) and pin it output-identical to the broadcast path."""
    import shaclapi_ray.pipelines.freshness as f

    base = _norm(f.latest_snapshot(_ds()))
    monkeypatch.setattr(f, "WINNER_BROADCAST_LIMIT", 0)
    forced = _norm(f.latest_snapshot(_ds(), strategy="join"))
    pd.testing.assert_frame_equal(forced, base)


def test_latest_join_no_recrawls_passthrough(ray_session):
    """Unique-url corpus: the skew-aware join finds an empty multi set
    and streams every row through untouched."""
    import ray.data

    from shaclapi_ray.pipelines.freshness import latest_snapshot

    t = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(6)], pa.string()),
            "warc_ts": pa.array(list(range(6)), pa.timestamp("us")),
            "text": pa.array(["x"] * 6, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    assert latest_snapshot(ds, strategy="join").count() == 6


def test_latest_broadcast_ceiling_is_loud(ray_session, monkeypatch):
    import shaclapi_ray.pipelines.freshness as f

    monkeypatch.setattr(f, "WINNER_BROADCAST_LIMIT", 0)
    with pytest.raises(ValueError, match="strategy='join'"):
        f.latest_snapshot(_ds()).materialize()


def _cap_pages() -> pa.Table:
    # host a: 5 urls (cap bites); host b: 2 urls (under cap); the two
    # a/p4 rows are byte-identical and straddle nothing — with k=4 the
    # boundary rank-4 tuple is duplicated, so RANK keeps BOTH (6 rows
    # survive for host a when k=4... no: rank of the duplicate pair is 4
    # for both -> both kept, total 5 kept for host a)
    urls = [f"http://a.x/p{i}" for i in range(5)] + [
        "http://a.x/p4",  # byte-identical twin of the last a url
        "http://b.x/q0",
        "http://b.x/q1",
    ]
    ts = [1, 2, 3, 4, 5, 5, 9, 9]
    txt = ["t0", "t1", "t2", "t3", "t4", "t4", "u0", "u1"]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "text": pa.array(txt, pa.string()),
        }
    )


def test_cap_per_host_rank_semantics(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.freshness import cap_per_host

    ds = ray.data.from_arrow(_cap_pages()).repartition(3)
    got = cap_per_host(ds, 3).to_pandas()
    # host a ordered by url: p0,p1,p2 kept (rank 1..3); p3,p4,p4-twin
    # dropped; host b fully under cap
    assert sorted(got["url"]) == [
        "http://a.x/p0",
        "http://a.x/p1",
        "http://a.x/p2",
        "http://b.x/q0",
        "http://b.x/q1",
    ]


def test_cap_per_host_rank_ties_keep_together(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.freshness import cap_per_host

    ds = ray.data.from_arrow(_cap_pages()).repartition(3)
    # k=5: the rank-5 tuple (p4) is byte-identical twice -> RANK keeps
    # both copies (keep-all ties), host a yields 6 rows
    got = cap_per_host(ds, 5).to_pandas()
    assert len(got) == 8
    assert (got["url"] == "http://a.x/p4").sum() == 2


def test_cap_paths_identical(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.freshness import cap_per_host

    ds = ray.data.from_arrow(_cap_pages()).repartition(3)
    a = cap_per_host(ds, 3).to_pandas().sort_values("url").reset_index(drop=True)
    ds2 = ray.data.from_arrow(_cap_pages()).repartition(3)
    b = (
        cap_per_host(ds2, 3, strategy="join")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_cap_rejects_k_below_one(ray_session):
    """k=0 would make the skew shortcut and the rank semantics diverge
    (empty kept table != keep nothing) — rejected loudly instead."""
    import ray.data

    from shaclapi_ray.pipelines.freshness import cap_per_host

    ds = ray.data.from_arrow(_cap_pages())
    with pytest.raises(ValueError, match="k >= 1"):
        cap_per_host(ds, 0)


def test_unknown_mode_is_loud(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.freshness import latest_snapshot

    ds = ray.data.from_arrow(_pages_table())
    with pytest.raises(ValueError, match="unknown mode"):
        latest_snapshot(ds, mode="shufle")


def test_cap_under_cap_everywhere_passes_through(ray_session):
    """No host over the cap: the skew-aware broadcast finds an empty
    over-cap set and streams every row through untouched."""
    import ray.data

    from shaclapi_ray.pipelines.freshness import cap_per_host

    ds = ray.data.from_arrow(_cap_pages()).repartition(3)
    assert cap_per_host(ds, 50).count() == 8


def test_cap_broadcast_ceiling_is_loud(ray_session, monkeypatch):
    import shaclapi_ray.pipelines.freshness as f

    monkeypatch.setattr(f, "WINNER_BROADCAST_LIMIT", 0)
    import ray.data

    ds = ray.data.from_arrow(_cap_pages()).repartition(3)
    with pytest.raises(ValueError, match="strategy='join'"):
        f.cap_per_host(ds, 3).materialize()


def test_cap_null_and_empty_urls_share_blank_host(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.freshness import cap_per_host

    t = pa.table(
        {
            "url": pa.array([None, None, "", "rel/x"], pa.string()),
            "warc_ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
            "text": pa.array(["a", "b", "c", "d"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    # all four rows share host '' -> order (NULLS FIRST, then '', then
    # 'rel/x'); k=2 keeps the two null-url rows
    got = cap_per_host(ds, 2).to_pandas()
    assert len(got) == 2
    assert got["url"].isna().all()


# --- snapshot_delta ----------------------------------------------------


def _delta_tables():
    def t(rows):
        return pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [r[1] for r in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )

    old = t(
        [
            ("https://a/1", 100, "alpha"),
            ("https://a/1", 200, "alpha2"),  # recrawl: winner ts=200
            ("https://b/2", 50, "beta"),  # removed
            ("", 10, "empty-url"),  # '' group, unchanged
            (None, 5, "null-url-old"),  # null group, changed
            ("https://c/3", 70, "gamma"),  # unchanged
        ]
    )
    new = t(
        [
            ("https://a/1", 300, "alpha3"),  # changed
            ("https://c/3", 70, "gamma"),
            ("https://d/4", 400, "delta"),  # added
            ("", 10, "empty-url"),
            (None, 5, "null-url-new"),
            (None, 5, "null-url-new"),  # exact dup row: cnt 2
        ]
    )
    return old, new


def test_snapshot_delta_semantics(ray_session):
    """Status classification incl. recrawl winners, ''/null url groups,
    exact-duplicate rows counted, absent-side fills."""
    import ray.data

    from shaclapi_ray.pipelines.freshness import snapshot_delta

    old, new = _delta_tables()
    out = (
        snapshot_delta(
            ray.data.from_arrow(old).repartition(3),
            ray.data.from_arrow(new).repartition(2),
        )
        .to_pandas()
        .sort_values("url", na_position="first")
        .reset_index(drop=True)
    )
    assert len(out) == 6
    by = {("__null__" if pd.isna(u) else u): r for u, r in zip(out.url, out.itertuples())}
    assert by["https://a/1"].status == "changed"
    assert by["https://a/1"].old_ts == 200 and by["https://a/1"].new_ts == 300
    assert by["https://a/1"].old_cnt == 2 and by["https://a/1"].new_cnt == 1
    assert by["https://b/2"].status == "removed"
    assert by["https://b/2"].new_ts == -1 and by["https://b/2"].new_cnt == 0
    assert by["https://d/4"].status == "added"
    assert by["https://d/4"].old_ts == -1 and by["https://d/4"].old_cnt == 0
    assert by["https://c/3"].status == "unchanged"
    assert by[""].status == "unchanged"
    assert by["__null__"].status == "changed"
    assert by["__null__"].new_cnt == 2


def test_snapshot_delta_modes_identical(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.freshness import snapshot_delta

    old, new = _delta_tables()
    outs = []
    for mode in ("driver", "shuffle", "auto"):
        outs.append(
            snapshot_delta(
                ray.data.from_arrow(old).repartition(4),
                ray.data.from_arrow(new),
                mode=mode,
            )
            .to_pandas()
            .sort_values(["url", "status"], na_position="first")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_snapshot_delta_oracle_parity_randomized(ray_session):
    """Randomized recrawl corpora vs the DuckDB oracle: urls drawn from
    a small pool (forced recrawls/overlaps), random ts ties, a few
    null/'' urls, texts from a tiny alphabet (forced hash ties)."""
    import duckdb
    import numpy as np
    import ray.data

    from shaclapi_ray.oracles import snapshot_delta_sql
    from shaclapi_ray.pipelines.freshness import snapshot_delta

    rng = np.random.default_rng(7)
    pool = [f"https://h{i % 4}/p/{i}" for i in range(12)] + ["", None]

    def snap(n):
        urls = [pool[rng.integers(0, len(pool))] for _ in range(n)]
        ts = rng.integers(0, 5, n)  # small range: forced ties
        texts = ["txt" + str(rng.integers(0, 3)) for _ in range(n)]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "text": pa.array(texts, pa.string()),
            }
        )

    for trial in range(3):
        old, new = snap(40), snap(35)
        got = (
            snapshot_delta(
                ray.data.from_arrow(old).repartition(3),
                ray.data.from_arrow(new).repartition(2),
            )
            .to_pandas()
            .sort_values(["url"], na_position="first")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("oldt", old)
        con.register("newt", new)
        want = (
            con.sql(snapshot_delta_sql("oldt", "newt"))
            .df()
            .sort_values(["url"], na_position="first")
            .reset_index(drop=True)
        )
        for c in ("url", "status", "old_ts", "new_ts", "old_cnt", "new_cnt"):
            assert (
                got[c].fillna("__na__").tolist()
                == want[c].fillna("__na__").tolist()
            ), f"trial {trial} col {c}"


def test_snapshot_delta_empty_sides(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.freshness import snapshot_delta

    old, new = _delta_tables()
    empty = ray.data.from_arrow(old.slice(0, 0))
    added = snapshot_delta(empty, ray.data.from_arrow(new)).to_pandas()
    assert (added.status == "added").all() and len(added) == 5
    removed = snapshot_delta(ray.data.from_arrow(old), empty).to_pandas()
    assert (removed.status == "removed").all() and len(removed) == 5
    both = snapshot_delta(empty, empty).to_pandas()
    assert len(both) == 0


def test_snapshot_delta_cli_runner(ray_session, tmp_path):
    """run_pipeline seam: second snapshot arrives as a path in args."""
    import pyarrow.parquet as pq

    from shaclapi_ray.api import run_pipeline

    old, new = _delta_tables()
    pq.write_table(old, tmp_path / "old.parquet")
    pq.write_table(new, tmp_path / "new.parquet")
    res = run_pipeline(
        {
            "pipeline": "snapshot_delta",
            "input": str(tmp_path / "old.parquet"),
            "args": {"new_input": str(tmp_path / "new.parquet")},
            "output": str(tmp_path / "out"),
        }
    )
    assert res["rows"] == 6
