"""BPE training/apply (pipelines/bpe.py): hand-checked merges on a tiny
corpus, greedy apply, distributed counts, layout independence."""

import numpy as np
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
