"""Column-profiling and exact-PSI drift tests: planted-violation counts
from the deterministic page generator, drift detection on a synthetic
shifted distribution, and invariants (PSI >= 0, symmetric zero)."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def pages_dir(ray_session):
    from shaclapi_ray.pagegen import ensure_pages

    return ensure_pages("/root/testdata/sf0.001")


def test_profile_columns_planted_nulls_and_types(ray_session, pages_dir):
    import ray.data

    from shaclapi_ray.pipelines.profile import profile_columns

    df = profile_columns(ray.data.read_parquet(pages_dir)).set_index("column")
    n = int(df.loc["url", "n_rows"])
    assert n == 2000
    # pagegen plants: url null at i%100==41, lang null at i%100==67
    assert int(df.loc["url", "n_nulls"]) == len([i for i in range(n) if i % 100 == 41])
    assert int(df.loc["lang", "n_nulls"]) == len([i for i in range(n) if i % 100 == 67])
    assert int(df.loc["warc_ts", "n_nulls"]) == 0
    # html is binary: no min/max, but byte-length stats exist
    assert df.loc["html", "min_v"] is None or df.loc["html", "min_v"] != df.loc["html", "min_v"]
    assert df.loc["html", "avg_len"] > 0
    # timestamp min/max are stringified epoch-micros ints
    assert int(df.loc["warc_ts", "min_v"]) < int(df.loc["warc_ts", "max_v"])
    # distinct: urls unique among non-null/non-planted; lang has few values
    assert int(df.loc["lang", "n_distinct"]) < 10
    assert int(df.loc["url", "n_distinct"]) > 1900


def test_profile_columns_distinct_excludes_nulls(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.profile import profile_columns

    t = pa.table(
        {
            "url": pa.array(["a", "a", None, "b"], pa.string()),
            "warc_ts": pa.array([1, 2, 2, None], pa.timestamp("us")),
            "html": pa.array([b"x", b"x", b"y", None], pa.binary()),
            "text": pa.array(["t", None, None, "t"], pa.string()),
            "lang": pa.array(["en", "en", "en", "en"], pa.string()),
        }
    )
    df = profile_columns(ray.data.from_arrow(t)).set_index("column")
    assert int(df.loc["url", "n_distinct"]) == 2
    assert int(df.loc["url", "n_nulls"]) == 1
    assert int(df.loc["warc_ts", "n_distinct"]) == 2
    assert int(df.loc["html", "n_distinct"]) == 2
    assert int(df.loc["text", "n_distinct"]) == 1
    assert df.loc["url", "min_v"] == "a" and df.loc["url", "max_v"] == "b"


def test_psi_drift_zero_on_identical_halves(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.profile import psi_drift

    # same length distribution before and after the split -> psi ~ 0
    # (420 = lcm(2, 3, 7) rows: each (host, side) sees every length
    # residue equally often, so ref/cur distributions match exactly)
    texts = ["x" * (100 + 37 * (i % 7)) for i in range(420)]
    ts = [(2010 if i % 2 == 0 else 2020) for i in range(420)]

    t = pa.table(
        {
            "url": pa.array([f"https://h{i % 3}.org/{i}" for i in range(420)]),
            "warc_ts": pa.array(
                [np.datetime64(f"{y}-06-01", "us") for y in ts],
                pa.timestamp("us"),
            ),
            "text": pa.array(texts),
        }
    )
    df = psi_drift(ray.data.from_arrow(t))
    assert (df["psi"].abs() < 1e-9).all()
    assert not df["drifted"].any()


def test_psi_drift_detects_planted_shift(ray_session):
    import pandas as pd
    import ray.data

    from shaclapi_ray.pipelines.profile import psi_drift

    # host h0: lengths jump from ~100 (ref) to ~2600 (cur) -> high PSI;
    # host h1: stable lengths -> low PSI
    rows = []
    for i in range(400):
        ref = i % 2 == 0
        host = "h0" if i % 4 < 2 else "h1"
        if host == "h0":
            ln = 100 if ref else 2600
        else:
            ln = 700
        rows.append(
            (
                f"https://{host}.org/{i}",
                np.datetime64("2010-01-01" if ref else "2020-01-01", "us"),
                "y" * ln,
            )
        )
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "text": pa.array([r[2] for r in rows]),
        }
    )
    df = psi_drift(ray.data.from_arrow(t)).set_index("host")
    assert bool(df.loc["h0.org", "drifted"])
    assert not bool(df.loc["h1.org", "drifted"])
    assert df.loc["h0.org", "psi"] > 10 * df.loc["h1.org", "psi"]
    assert (df["psi"] >= 0).all()


# --- corpus_composition -------------------------------------------------


def _comp_pages():
    import pyarrow as pa

    rows = [
        # url, ts(us), text, lang
        ("https://a.x/1", 1735689600000000, "one two three", "en"),  # 2025-01
        ("https://a.x/2", 1735689600000001, "four five", "en"),  # same month
        ("https://a.x/3", 1738368000000000, "six", "en"),  # 2025-02
        ("https://b.y/1", 1735689600000000, "sept huit", "fr"),
        ("https://b.y/2", 1735689600000000, None, "fr"),  # null text: 0 tok
        ("https://b.y/3", 1735689600000000, "neuf", None),  # null lang group
        ("https://b.y/4", 1735689600000000, "dix", ""),  # '' lang distinct
        ("rel/no-host", 1735689600000000, "x y", "en"),  # host ''
        (None, None, "null everything", None),  # null ts -> -1 bucket
        ("https://c.z/old", -10000000000000, "before epoch", "en"),  # 1969
    ]
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def test_corpus_composition_semantics_and_oracle(ray_session, tmp_path):
    """Exact rollup on a handcrafted table: month buckets, null ts ->
    -1, null text -> 0 tokens, null lang vs '' lang distinct groups,
    host '' for non-absolute urls, PRE-1970 negative-epoch truncation —
    all row-for-row equal to the DuckDB oracle."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data

    from shaclapi_ray.oracles import corpus_composition_sql
    from shaclapi_ray.pipelines.profile import corpus_composition

    t = _comp_pages()
    pq.write_table(t, tmp_path / "part-0.parquet")
    for period in ("month", "day"):
        got = (
            corpus_composition(
                ray.data.from_arrow(t).repartition(3), period=period
            )
            .to_pandas()
            .sort_values(
                ["host", "period_us", "lang"], na_position="first"
            )
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(corpus_composition_sql(str(tmp_path), period))
            .df()
            .sort_values(
                ["host", "period_us", "lang"], na_position="first"
            )
            .reset_index(drop=True)
        )
        assert len(got) == len(want), period
        for c in ("host", "period_us", "lang", "n_docs", "n_tokens"):
            assert (
                got[c].fillna("__na__").tolist()
                == want[c].fillna("__na__").tolist()
            ), (period, c)
    # spot semantics (month): host a.x en splits into two months
    got_m = (
        corpus_composition(ray.data.from_arrow(t), period="month")
        .to_pandas()
    )
    ax = got_m[got_m.host == "a.x"].sort_values("period_us")
    assert ax.n_docs.tolist() == [2, 1] and ax.n_tokens.tolist() == [5, 1]
    by = got_m[got_m.host == "b.y"]
    assert len(by) == 3  # fr / '' / null-lang groups, all 2025-01
    assert int(by[by.lang == "fr"].n_tokens.iloc[0]) == 2  # null text = 0
    assert (got_m[got_m.host == ""].period_us < 0).any()  # null-ts bucket


def test_corpus_composition_unknown_period_raises(ray_session):
    import pytest as _pytest

    from shaclapi_ray.pipelines.profile import corpus_composition

    with _pytest.raises(ValueError):
        corpus_composition(None, period="week")
