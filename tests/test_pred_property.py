"""Property test: eval_pred (Arrow) and pred_to_sql (DuckDB) agree on
random predicate trees over random tables — the drift guard for the
shared predicate IR that both the engine and the oracles compile from."""

import duckdb
import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings

from shaclapi_ray.shapes.ir import eval_pred, pred_to_sql

WORDS = ["alpha", "beta", "gamma", "", "Alpha", "x y", "héllo"]
PATTERNS = ["^alpha", "a", "ph", "^$", "o$", "[abg]a"]


@st.composite
def tables(draw):
    n = draw(st.integers(min_value=0, max_value=30))
    s = draw(
        st.lists(
            st.one_of(st.none(), st.sampled_from(WORDS)), min_size=n, max_size=n
        )
    )
    x = draw(
        st.lists(
            st.one_of(st.none(), st.integers(-5, 50)), min_size=n, max_size=n
        )
    )
    return pa.table(
        {
            "s": pa.array(s, type=pa.string()),
            "x": pa.array(x, type=pa.int64()),
        }
    )


def leaf_preds():
    return st.one_of(
        st.just({"op": "not_null", "column": "s"}),
        st.just({"op": "is_null", "column": "x"}),
        st.sampled_from(PATTERNS).map(
            lambda p: {"op": "regex", "column": "s", "pattern": p}
        ),
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=3).map(
            lambda vs: {"op": "in", "column": "s", "values": vs}
        ),
        st.sampled_from(WORDS).map(
            lambda v: {"op": "==", "column": "s", "value": v}
        ),
        st.integers(-5, 50).map(lambda v: {"op": "!=", "column": "x", "value": v}),
        st.tuples(st.integers(-5, 20), st.integers(0, 40)).map(
            lambda t: {"op": "range", "column": "x", "min": min(t), "max": max(t)}
        ),
        st.tuples(st.integers(0, 3), st.integers(3, 10)).map(
            lambda t: {"op": "len_range", "column": "s", "min": t[0], "max": t[1]}
        ),
    )


def preds(depth=2):
    if depth == 0:
        return leaf_preds()
    sub = preds(depth - 1)
    return st.one_of(
        leaf_preds(),
        st.lists(sub, min_size=2, max_size=3).map(
            lambda args: {"op": "and", "args": args}
        ),
        st.lists(sub, min_size=2, max_size=3).map(
            lambda args: {"op": "or", "args": args}
        ),
        sub.map(lambda a: {"op": "not", "arg": a}),
    )


@settings(max_examples=150, deadline=None)
@given(tbl=tables(), pred=preds())
def test_eval_pred_matches_duckdb(tbl, pred):
    arrow_mask = eval_pred(pred, tbl).to_pylist()
    sql = pred_to_sql(pred)
    con = duckdb.connect()
    con.register("t", tbl)
    duck_mask = [
        bool(r[0]) if r[0] is not None else False
        for r in con.execute(f"SELECT COALESCE({sql}, FALSE) FROM t").fetchall()
    ]
    assert [bool(v) for v in arrow_mask] == duck_mask, (pred, tbl.to_pydict())


def test_not_null_semantics():
    tbl = pa.table({"s": pa.array([None, "a"]), "x": pa.array([1, None])})
    assert eval_pred({"op": "not_null", "column": "s"}, tbl).to_pylist() == [
        False,
        True,
    ]
    # NOT over null comparison: null == 'a' -> False (not null), so NOT -> True
    out = eval_pred(
        {"op": "not", "arg": {"op": "==", "column": "s", "value": "a"}}, tbl
    ).to_pylist()
    assert out == [True, False]


URL_FRAGMENTS = [
    "https://", "http://", "HTTPS://", "host", "9", "42", "/", "//",
    ":", "#", "?", "é", "漢", ".", "a/b", "CASINO", "poker.net", " ",
]


@settings(max_examples=120, deadline=None)
@given(
    urls=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.sampled_from(URL_FRAGMENTS), min_size=0, max_size=8
            ).map("".join),
        ),
        min_size=0,
        max_size=25,
    ),
    max_digit_pct=st.integers(0, 100),
    max_slashes=st.integers(0, 6),
)
def test_url_quality_frame_matches_duckdb(urls, max_digit_pct, max_slashes):
    """Random fragment-composed urls (unicode, schemes in both cases,
    digit runs, slash runs, blocklist words) through the polars kernel
    vs the SQL oracle, across random thresholds."""
    import pyarrow.parquet as pq
    import tempfile, os

    from shaclapi_ray.oracles import url_quality_sql
    from shaclapi_ray.pipelines.extract import url_quality_frame

    kw = dict(
        max_len=24,
        max_digit_pct=max_digit_pct,
        max_slashes=max_slashes,
        blocked_words=("casino", "poker.net"),
    )
    tbl = pa.table({"url": pa.array(urls, pa.string())})
    got = url_quality_frame(tbl, **kw).to_pandas()
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))
        want = duckdb.sql(url_quality_sql(d, **kw)).df()
    key = ["url", "n_chars", "n_digits", "n_slashes", "kept"]
    a = got[key].sort_values(key, na_position="first").reset_index(drop=True)
    b = want[key].sort_values(key, na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(
                ["a", "b9", "日本", " ", "\t", "\n", "\f", "\r", "\v",
                 " ", " ", "　", ""]
            ),
            min_size=0,
            max_size=10,
        ).map("".join),
        min_size=1,
        max_size=12,
    )
)
def test_token_re_agrees_across_engines(texts):
    """TOKEN_RE must tokenize identically in polars (Rust regex),
    pyarrow (RE2) and DuckDB (RE2) — including \\v and the Unicode
    spaces (NBSP, thin space, ideographic space) where Rust's \\S and
    RE2's \\S genuinely differ. TOKEN_RE is the explicit RE2-\\S class,
    and the SQL mirrors' '\\S+' must equal it too."""
    import polars as pl
    import pyarrow.compute as pc

    from shaclapi_ray.pipelines.textstats import TOKEN_RE

    arr = pa.array(texts, pa.string())
    pl_counts = pl.Series(texts).str.count_matches(TOKEN_RE).to_list()
    pa_counts = pc.count_substring_regex(arr, TOKEN_RE).to_pylist()
    con = duckdb.connect()
    con.register("t", pa.table({"text": arr}))
    duck_tok = [
        r[0]
        for r in con.execute(
            f"SELECT length(regexp_extract_all(text, '{TOKEN_RE}')) FROM t"
        ).fetchall()
    ]
    duck_s = [
        r[0]
        for r in con.execute(
            "SELECT length(regexp_extract_all(text, '\\S+')) FROM t"
        ).fetchall()
    ]
    assert pl_counts == pa_counts == duck_tok == duck_s, texts
