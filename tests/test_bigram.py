"""Interpolated-bigram LM scorer (textstats.bigram_logprob):
hand-checked math, sequence sensitivity, layout independence. SQL
parity for the driver slot is covered by test_oracle_parity."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _ds(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _doc(doc_id, text):
    return {"doc_id": doc_id, "text": text}


def test_hand_computation(ray_session):
    from shaclapi_ray.pipelines.textstats import BIGRAM_LAMBDA, bigram_logprob

    rows = [_doc(1, "a b a"), _doc(2, "b a")]
    out = (
        bigram_logprob(_ds(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # corpus: tokens a,b,a,b,a -> c1[a]=3, c1[b]=2, T=5
    # bigrams: (a,b),(b,a),(b,a) -> c2[a b]=1, c2[b a]=2
    lam = BIGRAM_LAMBDA
    T = 5.0

    def interp(c2, c1_prev, c1_cur):
        return math.log(lam * c2 / c1_prev + (1 - lam) * c1_cur / T)

    d1 = (math.log(3 / T) + interp(1, 3, 2) + interp(2, 2, 3)) / 3
    d2 = (math.log(2 / T) + interp(2, 2, 3)) / 2
    assert out.n_tokens.tolist() == [3, 2]
    assert math.isclose(out.bigram_logprob[0], d1, rel_tol=1e-12)
    assert math.isclose(out.bigram_logprob[1], d2, rel_tol=1e-12)


def test_sequence_sensitivity(ray_session):
    """A document whose adjacent pairs are common in the corpus must
    outscore a shuffled document with the same unigram content — the
    signal unigram_logprob cannot see."""
    from shaclapi_ray.pipelines.textstats import bigram_logprob, unigram_logprob

    ordered = "the quick fox jumps high"
    shuffled = "jumps the high fox quick"
    rows = [_doc(i, ordered) for i in range(20)]
    rows.append(_doc(100, ordered))
    rows.append(_doc(101, shuffled))
    bg = bigram_logprob(_ds(rows)).to_pandas().set_index("doc_id")
    assert bg.loc[100, "bigram_logprob"] > bg.loc[101, "bigram_logprob"]
    ug = unigram_logprob(_ds(rows)).to_pandas().set_index("doc_id")
    assert math.isclose(
        ug.loc[100, "logprob"], ug.loc[101, "logprob"], rel_tol=1e-12
    )


def test_empty_and_single_token(ray_session):
    from shaclapi_ray.pipelines.textstats import bigram_logprob

    rows = [_doc(1, "solo"), _doc(2, ""), _doc(3, None), _doc(4, "solo solo")]
    out = bigram_logprob(_ds(rows)).to_pandas().set_index("doc_id")
    assert out.loc[2, "bigram_logprob"] == 0.0 and out.loc[2, "n_tokens"] == 0
    assert out.loc[3, "bigram_logprob"] == 0.0
    # single-token doc = pure unigram term: ln(c1/T) with c1=3, T=3
    assert math.isclose(out.loc[1, "bigram_logprob"], math.log(3 / 3.0), abs_tol=1e-12)


def test_layout_independence(ray_session):
    from shaclapi_ray.pipelines.textstats import bigram_logprob

    rows = [_doc(i, f"w{i % 5} w{(i + 1) % 5} w{i % 3}") for i in range(60)]
    a = (
        bigram_logprob(_ds(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        bigram_logprob(_ds(rows).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
