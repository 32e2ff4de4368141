"""Property tests for the span/packing/LM operators: each Ray result is
re-derived with an independent plain-Python implementation on
hypothesis-generated corpora (including empty / whitespace-only texts).
Few examples per test — every example pays a Ray Dataset execution."""

import math

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

WORDS = ["a", "bb", "ccc", "dd", "e"]

corpus_strategy = st.lists(
    st.one_of(
        st.just(""),
        st.just("   "),
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    ),
    min_size=1,
    max_size=12,
)


def _ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


@settings(max_examples=5, deadline=None)
@given(corpus_strategy)
def test_pack_sequences_matches_reference_scan(ray_session, texts):
    from shaclapi_ray.pipelines.spans import KNUTH, pack_sequences

    budget, n_shards = 7, 3
    df = (
        pack_sequences(_ds(texts), n_shards=n_shards, budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # independent reference: per-shard doc_id-ordered exclusive prefix sum
    toks = [len(t.split()) for t in texts]
    shard = [((i * KNUTH) % (1 << 32)) % n_shards for i in range(len(texts))]
    running = {}
    expect = {}
    for i in sorted(range(len(texts))):
        s = shard[i]
        start = running.get(s, 0)
        running[s] = start + toks[i]
        end = start if toks[i] == 0 else start + toks[i] - 1
        expect[i] = (s, toks[i], start // budget, start % budget, end // budget)
    assert len(df) == len(texts)
    for row in df.itertuples():
        assert expect[row.doc_id] == (
            row.shard,
            row.n_tokens,
            row.start_seq,
            row.start_off,
            row.end_seq,
        )


@settings(max_examples=5, deadline=None)
@given(corpus_strategy)
def test_dup_span_coverage_bounds_and_twins(ray_session, texts):
    from shaclapi_ray.pipelines.spans import dup_span_coverage

    n = 3
    df = (
        dup_span_coverage(_ds(texts), n=n, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    toks = [len(t.split()) for t in texts]
    assert df.n_tokens.tolist() == toks
    assert (df.n_dup_tokens <= df.n_tokens).all()
    assert (df.n_dup_tokens >= 0).all()
    # a doc with an identical twin of >= n tokens is fully covered
    from collections import Counter

    twins = Counter(texts)
    for row in df.itertuples():
        if twins[texts[row.doc_id]] >= 2 and toks[row.doc_id] >= n:
            assert row.n_dup_tokens == row.n_tokens
            assert row.dup_frac == 1.0


@settings(max_examples=5, deadline=None)
@given(corpus_strategy)
def test_unigram_logprob_is_nonpositive_mean_of_corpus_probs(ray_session, texts):
    from collections import Counter

    from shaclapi_ray.pipelines.textstats import unigram_logprob

    df = (
        unigram_logprob(_ds(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tf = Counter(w for t in texts for w in t.split())
    total = sum(tf.values())
    for row in df.itertuples():
        words = texts[row.doc_id].split()
        if not words:
            assert row.logprob == 0.0
            continue
        want = sum(math.log(tf[w] / total) for w in words) / len(words)
        assert abs(row.logprob - want) < 1e-9
