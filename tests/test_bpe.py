"""BPE training/apply (pipelines/bpe.py): hand-checked merges on a tiny
corpus, greedy apply, distributed counts, layout independence."""

import numpy as np
import pytest
import pyarrow as pa
import ray.data as rd

from shaclapi_ray.pipelines.bpe import END, apply_bpe, bpe_token_count, train_bpe


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )


def test_train_merges_by_hand():
    # classic fixture: low/lower/newest/widest weighted by repetition
    texts = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    merges = train_bpe(_docs(texts), n_merges=4)
    # 'es' then 'est' then 'est</w>' dominate (9 occurrences each); 'lo' has 7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")


def test_apply_bpe_greedy():
    merges = [("e", "s"), ("es", "t"), ("est", END), ("l", "o")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert apply_bpe("newest", ranks) == ["n", "e", "w", "est"]
    assert apply_bpe("lowest", ranks) == ["lo", "w", "est"]
    assert apply_bpe("zzz", ranks) == ["z", "z", "z"]


def test_token_count_distributed():
    texts = ["low lower newest", "newest newest widest", ""]
    ds = _docs(texts)
    merges = train_bpe(ds, n_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    expect = [
        sum(len(apply_bpe(w, ranks)) for w in t.split()) for t in texts
    ]
    out = (
        bpe_token_count(_docs(texts), merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["bpe_tokens"].tolist() == expect
    assert out.loc[2, "bpe_tokens"] == 0  # empty doc


def test_layout_independent():
    rng = np.random.default_rng(3)
    words = ["alpha", "alphabet", "beta", "betray", "gamma", "gam"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 15))) for _ in range(50)
    ]
    m1 = train_bpe(_docs(texts).repartition(1), n_merges=30)
    m7 = train_bpe(_docs(texts).repartition(7), n_merges=30)
    assert m1 == m7
    a = (
        bpe_token_count(_docs(texts).repartition(1), m1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        bpe_token_count(_docs(texts).repartition(7), m7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # more merges never increase the piece count of any document
    m_short = train_bpe(_docs(texts), n_merges=5)
    c = (
        bpe_token_count(_docs(texts), m_short)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (a["bpe_tokens"] <= c["bpe_tokens"]).all()


def test_sample_fraction_training():
    """Sample-trained merges are deterministic across layouts and still
    learn the dominant merges of a heavily-repeated corpus."""
    texts = ["newest " * 8 + "lowest " * 4] * 30 + ["rare words here"] * 2
    m1 = train_bpe(_docs(texts).repartition(1), n_merges=3, sample_fraction=0.5)
    m7 = train_bpe(_docs(texts).repartition(7), n_merges=3, sample_fraction=0.5)
    assert m1 == m7
    assert m1[0] == ("e", "s")


def _tok_docs():
    import pyarrow as pa
    import ray.data

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "cats and dogs and mats",
        "",
        "unseen zebra",
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(2)


def test_tokenize_corpus_ids_match_pieces(ray_session):
    """The emitted id sequence per doc decodes (via the vocab) to exactly
    the concatenation of apply_bpe over the doc's words in order, and
    n_bpe_tokens agrees with bpe_token_count."""
    from shaclapi_ray.pipelines.bpe import (
        apply_bpe,
        bpe_token_count,
        bpe_vocab,
        tokenize_corpus,
        train_bpe,
    )

    docs = _tok_docs()
    merges = train_bpe(docs, n_merges=30)
    vocab = bpe_vocab(docs, merges)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    out = tokenize_corpus(docs, merges).to_pandas().set_index("doc_id").sort_index()
    counts = (
        bpe_token_count(docs, merges).to_pandas().set_index("doc_id").sort_index()
    )
    texts = {
        0: "the cat sat on the mat",
        1: "the dog sat on the log",
        2: "cats and dogs and mats",
        3: "",
        4: "unseen zebra",
    }
    for did, text in texts.items():
        ids = list(out.loc[did, "token_ids"])
        expected = [p for w in text.split() for p in apply_bpe(w, ranks)]
        assert [vocab[i] for i in ids] == expected
        assert out.loc[did, "n_bpe_tokens"] == len(expected)
        assert counts.loc[did, "bpe_tokens"] == len(expected)


def test_tokenize_corpus_layout_invariant(ray_session):
    from shaclapi_ray.pipelines.bpe import tokenize_corpus, train_bpe

    docs = _tok_docs()
    merges = train_bpe(docs, n_merges=30)
    a = tokenize_corpus(docs, merges).to_pandas().sort_values("doc_id")
    b = (
        tokenize_corpus(_tok_docs().repartition(5), merges)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert [list(x) for x in a["token_ids"]] == [list(x) for x in b["token_ids"]]


def test_pack_token_sequences_end_to_end(ray_session):
    """tokenize_corpus -> pack_token_sequences: per shard the packed
    stream is exactly the doc_id-ordered concatenation of that shard's
    id sequences, chopped every `budget` ids with a ragged tail; shard
    assignment matches spans.pack_sequences' Knuth hash."""
    import numpy as np

    from shaclapi_ray.pipelines.bpe import pack_token_sequences, tokenize_corpus, train_bpe
    from shaclapi_ray.pipelines.spans import KNUTH

    docs = _tok_docs()
    merges = train_bpe(docs, n_merges=30)
    toks = tokenize_corpus(docs, merges).materialize()
    budget, n_shards, seed = 7, 3, 0
    packed = (
        pack_token_sequences(toks, budget=budget, n_shards=n_shards, seed=seed)
        .to_pandas()
        .sort_values(["shard", "seq"])
    )
    tdf = toks.to_pandas().sort_values("doc_id")
    tdf["shard"] = ((tdf["doc_id"] + seed) * KNUTH) % (1 << 32) % n_shards
    for shard, grp in tdf.groupby("shard"):
        expect = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in grp["token_ids"]]
        ) if len(grp) else np.empty(0, np.int64)
        got_rows = packed[packed["shard"] == shard]
        got = (
            np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in got_rows["token_ids"]]
            )
            if len(got_rows)
            else np.empty(0, np.int64)
        )
        assert np.array_equal(got, expect)
        if len(got_rows):
            sizes = [len(x) for x in got_rows["token_ids"]]
            assert all(s == budget for s in sizes[:-1])
            assert 0 < sizes[-1] <= budget
            assert (got_rows["n_tokens"] == sizes).all()


def test_sharded_training_equals_driver(ray_session):
    """VERDICT r4 #6: strategy='sharded' (word state split across
    actors, driver holds only the pair aggregate) must learn the EXACT
    same merge table as the driver path — integer pair counts sum over
    disjoint word partitions. Checked across shard counts, including
    more shards than blocks, on a corpus with count ties (the
    lexicographic tie-break must survive sharding)."""
    texts = [
        "the cat sat on the mat",
        "the bat and the rat",
        "banana bandana ananas",
        "aa aa ab ab ba",  # tie-heavy pairs
        "zz zz zz",
    ] * 3
    ds = _docs(texts).repartition(4)
    want = train_bpe(ds, n_merges=40)
    assert want, "driver path learned nothing — fixture broken"
    for n_shards in (1, 3, 16):
        got = train_bpe(ds, n_merges=40, strategy="sharded", n_shards=n_shards)
        assert got == want, f"n_shards={n_shards}"
    # downstream counts agree too (same merges -> same apply)
    a = bpe_token_count(_docs(texts), want).to_pandas()
    b = bpe_token_count(_docs(texts), train_bpe(ds, n_merges=40, strategy="sharded")).to_pandas()
    assert a.equals(b)
    with pytest.raises(ValueError, match="strategy"):
        train_bpe(ds, n_merges=5, strategy="bogus")


def test_driver_ceiling_names_sharded_path(ray_session, monkeypatch):
    """The loud VOCAB_BROADCAST_LIMIT refusal must point at the
    implemented sharded fallback, and the sharded path must actually
    work on the same over-ceiling input."""
    import shaclapi_ray.pipelines.textstats as ts

    monkeypatch.setattr(ts, "VOCAB_BROADCAST_LIMIT", 3)
    ds = _docs(["alpha beta gamma delta epsilon zeta"])
    with pytest.raises(ValueError, match="strategy='sharded'"):
        train_bpe(ds, n_merges=5)
    monkeypatch.undo()
    got = train_bpe(ds, n_merges=5, strategy="sharded")
    assert got == train_bpe(ds, n_merges=5)
