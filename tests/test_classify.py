"""Naive Bayes classifier (pipelines/classify.py): hand-computed model
values, separable-corpus accuracy, OOV scoring, and the
layout-independence that lets the SQL oracle pin it."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from shaclapi_ray.pipelines.classify import nb_classify, train_nb


def _docs(rows):
    ids = list(range(len(rows)))
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([r[0] for r in rows]),
                "lang": pa.array([r[1] for r in rows]),
            }
        )
    )


def test_model_values_by_hand():
    # class a: tokens {x:2, y:1}; class b: tokens {y:1, z:2}; V=3
    ds = _docs([("x x y", "a"), ("y z z", "b")])
    m = train_nb(ds, alpha=1.0)
    assert m["labels"] == ["a", "b"]
    assert m["vocab_size"] == 3
    np.testing.assert_allclose(m["log_prior"], np.log([0.5, 0.5]))
    # rows sorted lexicographically: x, y, z ; denom = 3 + 1*3 = 6
    expect = np.log(
        np.array([[3, 1], [2, 2], [1, 3]]) / 6.0
    )
    np.testing.assert_allclose(m["log_cond"], expect)
    np.testing.assert_allclose(m["log_oov"], np.log([1 / 6, 1 / 6]))


def test_classify_separable_and_oov():
    rows = [("apple banana apple", "fruit")] * 3 + [("carrot pea pea", "veg")] * 2
    m = train_nb(_docs(rows))
    out = (
        nb_classify(_docs(rows), m)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["pred"]) == ["fruit"] * 3 + ["veg"] * 2
    # a doc of only unseen tokens scores prior + n*log_oov per class;
    # here veg wins: its smaller token total (6 vs 9) makes the smoothed
    # OOV likelihood 1/10 vs 1/13, which beats fruit's larger prior
    unseen = rd.from_arrow(
        pa.table({"doc_id": pa.array([9], pa.int64()), "text": pa.array(["zz qq"])})
    )
    o = nb_classify(unseen, m).to_pandas()
    scores = m["log_prior"] + 2 * m["log_oov"]  # (fruit, veg)
    assert o.loc[0, "pred"] == m["labels"][int(np.argmax(scores))] == "veg"
    np.testing.assert_allclose(o.loc[0, "score"], scores.max())


def test_layout_independent():
    rng = np.random.default_rng(4)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = [
        (
            " ".join(rng.choice(words, size=rng.integers(3, 12))),
            ["en", "de", "fr"][i % 3],
        )
        for i in range(60)
    ]
    m1 = train_nb(_docs(rows).repartition(1))
    m7 = train_nb(_docs(rows).repartition(7))
    assert m1["labels"] == m7["labels"]
    np.testing.assert_array_equal(m1["log_cond"], m7["log_cond"])
    np.testing.assert_array_equal(m1["log_prior"], m7["log_prior"])
    a = (
        nb_classify(_docs(rows).repartition(1), m1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        nb_classify(_docs(rows).repartition(7), m7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_empty_corpus_raises():
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
            }
        )
    ).repartition(1)
    with pytest.raises(ValueError):
        train_nb(ds)


def test_sharded_equals_broadcast():
    """The token-hash-partitioned model path must reproduce the
    broadcast scorer: same predictions, scores equal to float-sum
    reassociation error."""
    from shaclapi_ray.pipelines.classify import (
        nb_classify_sharded,
        train_nb_sharded,
    )

    rng = np.random.default_rng(8)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = [
        (
            " ".join(rng.choice(words, size=rng.integers(3, 12))),
            ["en", "de", "fr"][i % 3],
        )
        for i in range(80)
    ]
    ds = _docs(rows).repartition(5)
    m = train_nb(_docs(rows))
    bc = (
        nb_classify(_docs(rows), m)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    model_ds, meta = train_nb_sharded(ds)
    assert meta["labels"] == m["labels"]
    np.testing.assert_allclose(meta["log_prior"], m["log_prior"])
    np.testing.assert_allclose(meta["log_oov"], m["log_oov"])
    assert meta["vocab_size"] == m["vocab_size"]
    sh = (
        nb_classify_sharded(_docs(rows).repartition(5), model_ds, meta)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(sh.columns) == ["doc_id", "pred", "score"]
    assert (sh["pred"] == bc["pred"]).all()
    np.testing.assert_allclose(sh["score"], bc["score"], rtol=0, atol=1e-9)


def test_sharded_oov_scoring():
    """Cross-corpus scoring with the sharded model: unseen tokens get
    the exact log_oov mass (reconstructed from n_tokens - matched)."""
    from shaclapi_ray.pipelines.classify import (
        nb_classify_sharded,
        train_nb_sharded,
    )

    train_rows = [("apple banana apple", "fruit")] * 3 + [("carrot pea pea", "veg")] * 2
    model_ds, meta = train_nb_sharded(_docs(train_rows))
    m = train_nb(_docs(train_rows))
    score_docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["zz qq", "apple zz"]),
            }
        )
    )
    sh = (
        nb_classify_sharded(score_docs, model_ds, meta)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bc = (
        nb_classify(score_docs, m)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (sh["pred"] == bc["pred"]).all()
    np.testing.assert_allclose(sh["score"], bc["score"], atol=1e-9)
