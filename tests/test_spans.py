"""Cross-document duplicated-span coverage and sequence-packing tests:
hand-computed goldens, window-union semantics, block-layout invariance,
and zero-token edge cases. (The SQL-parity check runs separately in
test_oracle_parity via the queries()/oracle_sql() entries.)"""

import pyarrow as pa


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_dup_span_coverage_golden(ray_session):
    from shaclapi_ray.pipelines.spans import dup_span_coverage

    texts = [
        "a b c d e f",  # shares "a b c d e" with doc 1
        "x a b c d e y",  # ... at start position 1
        "q w e r t z",  # no duplicated 5-gram
    ]
    df = (
        dup_span_coverage(_docs_ds(texts), n=5, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df.n_tokens.tolist() == [6, 7, 6]
    assert df.n_dup_tokens.tolist() == [5, 5, 0]
    assert abs(df.dup_frac[0] - 5 / 6) < 1e-9
    assert df.dup_frac[2] == 0.0


def test_dup_span_coverage_union_of_overlapping_windows(ray_session):
    """Two identical 7-token docs: all three 5-gram windows are dups and
    their UNION is 7 tokens, not 3*5."""
    from shaclapi_ray.pipelines.spans import dup_span_coverage

    texts = ["a b c d e f g", "a b c d e f g"]
    df = dup_span_coverage(_docs_ds(texts), n=5, min_docs=2).to_pandas()
    assert df.n_dup_tokens.tolist() == [7, 7]
    assert df.dup_frac.tolist() == [1.0, 1.0]


def test_dup_span_coverage_min_docs_threshold(ray_session):
    from shaclapi_ray.pipelines.spans import dup_span_coverage

    texts = ["a b c d e", "a b c d e", "a b c d e"]
    df = dup_span_coverage(_docs_ds(texts), n=5, min_docs=4).to_pandas()
    assert df.n_dup_tokens.tolist() == [0, 0, 0]  # only 3 docs share it


def test_pack_sequences_golden(ray_session):
    from shaclapi_ray.pipelines.spans import pack_sequences

    texts = ["t " * 4, "t " * 8, "t " * 3, "t " * 12]
    df = (
        pack_sequences(_docs_ds(texts), n_shards=1, budget=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # cumulative starts: 0, 4, 12, 15
    assert df.n_tokens.tolist() == [4, 8, 3, 12]
    assert df.start_seq.tolist() == [0, 0, 1, 1]
    assert df.start_off.tolist() == [0, 4, 2, 5]
    assert df.end_seq.tolist() == [0, 1, 1, 2]  # doc 3 spans seqs 1..2


def test_pack_sequences_zero_token_doc(ray_session):
    from shaclapi_ray.pipelines.spans import pack_sequences

    df = (
        pack_sequences(_docs_ds(["t " * 10, "", "t t t"]), n_shards=1, budget=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df.n_tokens.tolist() == [10, 0, 3]
    assert df.start_seq[1] == df.end_seq[1] == 1  # empty doc sits at seq 1
    assert df.start_off[1] == 0


def test_pack_sequences_block_layout_invariant(ray_session):
    """Placement must be reproducible across block layouts — the shard
    hash and doc_id order define it, not Ray's partitioning."""
    from shaclapi_ray.pipelines.spans import pack_sequences

    texts = [f"tok{i} " * (3 + i % 7) for i in range(40)]
    a = (
        pack_sequences(_docs_ds(texts), n_shards=4, budget=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        pack_sequences(_docs_ds(texts).repartition(7), n_shards=4, budget=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_inverted_index_postings_and_df_band(ray_session):
    from shaclapi_ray.pipelines.textstats import inverted_index

    texts = [
        "alpha beta gamma",
        "beta gamma",
        "gamma beta zeta",
        "alpha",
    ]
    df = (
        inverted_index(_docs_ds(texts), min_df=2, max_df=2)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    # beta/gamma (df=3) pruned by max_df; zeta (df=1) pruned by min_df
    assert df.token.tolist() == ["alpha"]
    assert df.df.tolist() == [2]
    assert df.postings.tolist() == ["0,3"]


def test_unigram_logprob_golden(ray_session):
    import math

    from shaclapi_ray.pipelines.textstats import unigram_logprob

    texts = ["a a b", "b", ""]
    # corpus tf: a=2, b=2, total=4 -> p(a)=p(b)=0.5
    df = (
        unigram_logprob(_docs_ds(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df.n_tokens.tolist() == [3, 1, 0]
    assert abs(df.logprob[0] - math.log(0.5)) < 1e-12
    assert abs(df.logprob[1] - math.log(0.5)) < 1e-12
    assert df.logprob[2] == 0.0  # empty doc sentinel


def test_embed_corpus_hash_embedding_semantics(ray_session):
    import numpy as np
    import pytest

    from shaclapi_ray.pipelines.knn import embed_corpus

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "the quick brown fox jumps over a sleepy dog",  # near-dup of 0
        "completely unrelated text about ray data pipelines",
        "",
    ]
    df = (
        embed_corpus(_docs_ds(texts), dim=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    m = np.asarray(df.embedding.tolist(), dtype=np.float64)
    assert m.shape == (5, 32)
    norms = np.linalg.norm(m, axis=1)
    assert np.allclose(norms[:4], 1.0) and norms[4] == 0.0
    assert np.allclose(m[0], m[1])  # identical text -> identical vector
    near = m[0] @ m[2]
    far = m[0] @ m[3]
    assert near > far  # token overlap orders cosine
    assert near > 0.8

    with pytest.raises(Exception, match="encoder stub"):
        embed_corpus(_docs_ds(["x"]), model="error").to_pandas()


def test_write_inverted_index_partitioned_lookup(ray_session, tmp_path):
    """Index persists as token-hash-partitioned parquet; a lookup reads
    ONLY its tokens' partitions — proven by deleting every other
    partition dir and still answering correctly."""
    import os
    import shutil

    from shaclapi_ray.pipelines.textstats import (
        INDEX_COARSE_GROUPS,
        inverted_index,
        lookup_tokens,
        write_inverted_index,
    )
    from shaclapi_ray.stages.hashset import hash_strings

    texts = [f"tok{i % 7} common" for i in range(20)]
    idx_dir = str(tmp_path / "idx")
    write_inverted_index(_docs_ds(texts), idx_dir, min_df=1)

    want = ["tok0", "tok3", "common"]
    expected = (
        inverted_index(_docs_ds(texts), min_df=1)
        .to_pandas()
        .set_index("token")
        .loc[want]
        .sort_index()
    )
    got = lookup_tokens(idx_dir, want).to_pandas().set_index("token").sort_index()
    assert got.df.tolist() == expected.df.tolist()
    assert got.postings.tolist() == expected.postings.tolist()

    # destroy every partition the lookup does NOT need; it must still work
    need = {int(h) % INDEX_COARSE_GROUPS for h in hash_strings(want)}
    for name in os.listdir(idx_dir):
        if name.startswith("ck=") and int(name.split("=")[1]) not in need:
            shutil.rmtree(os.path.join(idx_dir, name))
    again = lookup_tokens(idx_dir, want).to_pandas().set_index("token").sort_index()
    assert again.equals(got)

    # unknown token resolves to empty, not an error
    assert len(lookup_tokens(idx_dir, ["nope"])) == 0


def test_write_training_shards_layout_matches_pack_assignment(
    ray_session, tmp_path
):
    """Physical shard dirs contain exactly the docs pack_sequences
    assigns to that shard, and a single-shard read round-trips."""
    import os

    import pyarrow.parquet as pq

    from shaclapi_ray.pipelines.spans import pack_sequences, write_training_shards

    texts = [f"w{i} " * (2 + i % 5) for i in range(30)]
    out = str(tmp_path / "shards")
    write_training_shards(_docs_ds(texts), out, n_shards=4)

    placement = pack_sequences(_docs_ds(texts), n_shards=4).to_pandas()
    by_shard = placement.groupby("shard")["doc_id"].apply(set).to_dict()
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(dirs) == len(by_shard)
    for d in dirs:
        sid = int(d.split("=")[1])
        t = pq.read_table(os.path.join(out, d), columns=["doc_id", "text"])
        assert set(t["doc_id"].to_pylist()) == by_shard[sid]
        # text survives the round trip byte-identically
        for r in t.to_pylist():
            assert r["text"] == texts[r["doc_id"]]


def test_remove_dup_spans_golden(ray_session):
    """Two docs share one 5-gram ('a b c d e'); its 5-token window is
    removed from both, the rest survives in order."""
    from shaclapi_ray.pipelines.spans import remove_dup_spans

    texts = [
        "a b c d e x y z",
        "p q a b c d e r",
        "totally unrelated words here now",
    ]
    df = (
        remove_dup_spans(_docs_ds(texts), n=5, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(df.clean_text) == [
        "x y z",
        "p q r",
        "totally unrelated words here now",
    ]
    assert list(df.n_removed) == [5, 5, 0]
    assert list(df.n_tokens) == [8, 8, 5]


def test_remove_dup_spans_matches_coverage_counts(ray_session):
    """n_removed must equal dup_span_coverage's n_dup_tokens for EVERY
    document — the two operators share one window-union semantics."""
    from shaclapi_ray.pipelines.spans import dup_span_coverage, remove_dup_spans

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "said the quick brown fox jumps over anything at all",
        "over the lazy dog again and again we go",
        "",
        "one two three",
        "the quick brown fox jumps over the lazy dog again and again",  # exact dup
    ]
    ds = _docs_ds(texts)
    cov = dup_span_coverage(ds, n=5, min_docs=2).to_pandas().set_index("doc_id")
    rem = remove_dup_spans(ds, n=5, min_docs=2).to_pandas().set_index("doc_id")
    assert len(cov) == len(rem) == len(texts)
    for d in cov.index:
        assert rem.loc[d, "n_removed"] == cov.loc[d, "n_dup_tokens"], d
        assert rem.loc[d, "n_tokens"] == cov.loc[d, "n_tokens"], d


def test_remove_dup_spans_overlapping_windows(ray_session):
    """Overlapping duplicated windows remove the UNION, not the sum."""
    from shaclapi_ray.pipelines.spans import remove_dup_spans

    # 'a b c d e f' shared: two overlapping 5-grams -> union = 6 tokens
    texts = ["z a b c d e f y", "w a b c d e f v"]
    df = (
        remove_dup_spans(_docs_ds(texts), n=5, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(df.clean_text) == ["z y", "w v"]
    assert list(df.n_removed) == [6, 6]


def test_remove_dup_spans_block_layout_invariant(ray_session):
    from shaclapi_ray.pipelines.spans import remove_dup_spans

    texts = [f"shared prefix tokens one two three unique tail {i}" for i in range(12)]
    a = (
        remove_dup_spans(_docs_ds(texts), n=5, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        remove_dup_spans(_docs_ds(texts).repartition(5), n=5, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_coverage_join_strategy_equals_broadcast(ray_session):
    """The partition-join coverage path must be output-identical to the
    broadcast path (the beyond-50M-gram scale form)."""
    import pyarrow as pa
    import ray.data as rd

    from shaclapi_ray.pipelines.spans import dup_span_coverage

    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "a different document with the quick brown fox jumps over words",
        "totally unrelated content here nothing shared at all really",
        "",
        "the quick brown fox jumps over the lazy dog today exactly",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    a = (
        dup_span_coverage(rd.from_arrow(tbl).repartition(3), strategy="broadcast")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dup_span_coverage(rd.from_arrow(tbl).repartition(3), strategy="join")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["n_dup_tokens"].sum() > 0  # the fixture does share grams


def test_intra_dup_ngram_planted(ray_session):
    """Within-doc duplicated 3-grams: a doc with a twice-repeated phrase
    gets exactly the union of the duplicated windows; a no-repeat doc
    gets 0; repeats appearing in DIFFERENT docs do not count."""
    import pyarrow as pa
    import ray.data

    from shaclapi_ray.pipelines.spans import intra_dup_ngram

    phrase = "alpha beta gamma"
    d0 = f"{phrase} one two three four {phrase}"   # 3-gram repeated twice
    d1 = "all tokens here are fully distinct now"  # no repeats
    d2 = phrase + " tail only once here"           # phrase once -> no intra dup
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array([d0, d1, d2]),
            }
        )
    ).repartition(2)
    out = intra_dup_ngram(ds, n=3).to_pandas().set_index("doc_id").sort_index()
    # d0: both occurrences' windows cover 3 + 3 = 6 tokens (disjoint)
    assert out.loc[0, "dup_ngram_tokens"] == 6
    assert abs(out.loc[0, "dup_ngram_frac"] - 6 / 10) < 1e-12
    assert out.loc[1, "dup_ngram_tokens"] == 0
    assert out.loc[2, "dup_ngram_tokens"] == 0

    # overlapping repeats union (not double count): "a a a a a" has
    # 3-gram "a a a" at s=0,1,2 -> union covers all 5 tokens
    ds2 = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a a a a a"])}
        )
    )
    o2 = intra_dup_ngram(ds2, n=3).to_pandas().iloc[0]
    assert o2["dup_ngram_tokens"] == 5 and o2["dup_ngram_frac"] == 1.0


def test_remove_dup_spans_join_equals_broadcast(ray_session):
    """The partition-join removal path must be output-identical to the
    broadcast path (the beyond-50M-gram scale form): same clean_text,
    token counts and removal counts for every doc, including empty docs
    and docs with no duplicated spans."""
    import pyarrow as pa
    import ray.data as rd

    from shaclapi_ray.pipelines.spans import remove_dup_spans

    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "a different document with the quick brown fox jumps over words",
        "totally unrelated content here nothing shared at all really",
        "",
        "the quick brown fox jumps over the lazy dog today exactly",
        "short doc",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    a = (
        remove_dup_spans(rd.from_arrow(tbl).repartition(3), strategy="broadcast")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        remove_dup_spans(rd.from_arrow(tbl).repartition(3), strategy="join")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["n_removed"].sum() > 0  # the fixture does share spans


def test_remove_dup_spans_join_no_duplicates(ray_session):
    """Join path with an entirely dup-free corpus: nothing removed, every
    doc's tokens re-joined unchanged (identical to broadcast)."""
    import pyarrow as pa
    import ray.data as rd

    from shaclapi_ray.pipelines.spans import remove_dup_spans

    texts = ["alpha beta gamma delta epsilon zeta", "one two three four five six", ""]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    a = (
        remove_dup_spans(rd.from_arrow(tbl).repartition(2), strategy="broadcast")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        remove_dup_spans(rd.from_arrow(tbl).repartition(2), strategy="join")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert (b["n_removed"] == 0).all()


def test_dup_gram_broadcast_ceiling_is_loud(ray_session, monkeypatch):
    """Above BROADCAST_LIMIT the broadcast build must fail with a message
    pointing at strategy='join', never OOM silently."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    import shaclapi_ray.pipelines.spans as sp

    monkeypatch.setattr(sp, "BROADCAST_LIMIT", 0)
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c d e f", "a b c d e f"]),
        }
    )
    with pytest.raises(ValueError, match="strategy='join'"):
        sp.remove_dup_spans(rd.from_arrow(tbl)).materialize()
