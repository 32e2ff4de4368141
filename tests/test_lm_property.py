"""Property tests: bigram_logprob and dsir_scores vs DuckDB on
randomized small corpora (unicode tokens, repeated tokens, weird
whitespace, empty/null docs) — the edge cases the fixture corpus
doesn't exercise. Few examples (each runs a Ray pipeline), wide input
space."""

import duckdb
import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
import ray
from hypothesis import given, settings

# tokens drawn to collide often (tiny alphabet) plus unicode/punct shapes
_TOKENS = st.sampled_from(
    ["a", "b", "ab", "ß", "日本", "x1", "-", "...", "a,b", "'", '"q"']
)
_TEXTS = st.one_of(
    st.none(),
    st.just(""),
    st.lists(_TOKENS, min_size=0, max_size=8).map(" ".join),
    # tab/newline separators also split on \S+
    st.lists(_TOKENS, min_size=2, max_size=6).map("\t".join),
    st.lists(_TOKENS, min_size=2, max_size=6).map("\n".join),
)
_CORPORA = st.lists(_TEXTS, min_size=1, max_size=12)


_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
)
# explicit schema: from_pylist on an all-null corpus would otherwise
# infer a null-typed text column, which no real parquet table has


def _table(rows) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=_SCHEMA)


@settings(max_examples=25, deadline=None)
@given(texts=_CORPORA, langs=st.lists(st.sampled_from(["en", "de", None]), min_size=12, max_size=12))
def test_bigram_matches_duckdb(ray_session, texts, langs):
    from shaclapi_ray.oracles import bigram_logprob_sql
    from shaclapi_ray.pipelines.textstats import bigram_logprob

    rows = [
        {"doc_id": i, "text": t, "lang": langs[i]} for i, t in enumerate(texts)
    ]
    out = (
        bigram_logprob(ray.data.from_arrow(_table(rows)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", _table(rows))
    exp = con.sql(bigram_logprob_sql()).df()
    assert out.n_tokens.tolist() == exp.n_tokens.tolist()
    np.testing.assert_allclose(
        out.bigram_logprob.values, exp.bigram_logprob.values, rtol=1e-9, atol=1e-12
    )


@settings(max_examples=25, deadline=None)
@given(texts=_CORPORA, langs=st.lists(st.sampled_from(["en", "de", None]), min_size=12, max_size=12))
def test_dsir_matches_duckdb(ray_session, texts, langs):
    from shaclapi_ray.pipelines.dsir import dsir_scores, dsir_scores_sql

    rows = [
        {"doc_id": i, "text": t, "lang": langs[i]} for i, t in enumerate(texts)
    ]
    out = (
        dsir_scores(ray.data.from_arrow(_table(rows)), n_buckets=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", _table(rows))
    exp = con.sql(dsir_scores_sql(n_buckets=64)).df()
    assert out.n_grams.tolist() == exp.n_grams.tolist()
    np.testing.assert_allclose(
        out.dsir_logratio.values, exp.dsir_logratio.values, rtol=1e-9, atol=1e-12
    )
