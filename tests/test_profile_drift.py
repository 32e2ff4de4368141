"""profile_drift — Deequ-style anomaly detection between two snapshots'
column profiles: integer cross-multiplied tolerances (exact Python-int
driver math vs HUGEINT SQL), per-kind range semantics, and layout
invariance."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from shaclapi_ray.pipelines.profile import profile_drift, profile_drift_sql


def _pages(n, null_every=0, ts_base=1_600_000_000_000_000, dup=False):
    urls = [
        None if (null_every and i % null_every == 0) else f"https://h{i % 3}.x/p/{i}"
        for i in range(n)
    ]
    ts = pa.array([ts_base + i * 1_000_000 for i in range(n)], pa.int64()).cast(
        pa.timestamp("us")
    )
    txt = ["hello world " + ("x" if dup else str(i)) for i in range(n)]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "html": pa.array([b"<html>"] * n, pa.binary()),
            "text": pa.array(txt, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )


def test_drift_checks_and_sql_parity(ray_session):
    old = _pages(100)
    # rows x2, urls gain nulls, ts range shifts earlier, text distinct collapses
    new = _pages(200, null_every=5, ts_base=1_500_000_000_000_000, dup=True)
    out = profile_drift(
        ray.data.from_arrow(old).repartition(3),
        ray.data.from_arrow(new).repartition(4),
    )
    con = duckdb.connect()
    con.register("oldp", old)
    con.register("newp", new)
    exp = con.execute(profile_drift_sql("oldp", "newp")).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    d = {(r.column, r.check): bool(r.drifted) for r in out.itertuples()}
    assert d[("url", "row_count")] and d[("url", "null_rate")]
    assert d[("warc_ts", "range_expansion")]  # new min precedes old min
    assert d[("text", "distinct_ratio")]  # 100/100 -> 1/200
    assert not d[("lang", "distinct_ratio")]  # 1/n on both sides
    assert not d[("html", "range_expansion")]  # binary columns skip
    assert not d[("warc_ts", "null_rate")]


def test_identical_snapshots_never_drift(ray_session):
    t = _pages(60, null_every=7)
    out = profile_drift(
        ray.data.from_arrow(t).repartition(2), ray.data.from_arrow(t).repartition(5)
    )
    assert not out["drifted"].any()
    # layout invariance: block count must not affect a single value
    out2 = profile_drift(
        ray.data.from_arrow(t).repartition(9), ray.data.from_arrow(t)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_tolerance_boundary_is_exact(ray_session):
    # 100 -> exactly 150 rows with row_delta 1/2: |150-100|*2 = 100*1,
    # NOT > — no drift; 151 rows crosses it
    old = ray.data.from_arrow(_pages(100))

    def row_drift(n):
        out = profile_drift(old, ray.data.from_arrow(_pages(n)))
        return bool(
            out.set_index(["column", "check"]).loc[("url", "row_count"), "drifted"]
        )

    assert not row_drift(150)
    assert row_drift(151)
