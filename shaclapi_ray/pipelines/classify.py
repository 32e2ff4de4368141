"""Distributed multinomial Naive Bayes text classifier (train + score).

The model-based quality/language filter of CCNet-class corpus pipelines
(Wenzek et al. 2020; RefinedWeb/LLaMA use a fastText supervised model
the same way): train a linear bag-of-words classifier on a labeled
subset, score every document, filter/route on the prediction. Naive
Bayes is the exactly-aggregatable member of that family — training is
ONE pre-aggregated (label, token) count combine, so the fitted model is
a deterministic, layout-independent function of the corpus and the
whole operator stays SQL-oracle-checkable (see oracles.nb_classify_sql)
while exercising the identical Ray shapes a fastText/logistic scorer
would need (broadcast weight matrix + vectorized per-batch scoring).

Scale shapes:
- ``train_nb``: per-batch polars group_by partials -> ONE
  combine_partials_multi exchange proportional to |vocab x classes|
  (never the corpus); the driver assembles a dense (V, C) log-prob
  matrix and broadcasts it once via ray.put. Vocabulary is bounded by
  the same VOCAB_BROADCAST_LIMIT ceiling as unigram_logprob — beyond
  it, shard the model by token-hash and score with a partitioned join
  (loud ValueError, not an OOM).
- ``nb_classify``: pure streaming map_batches — tokenize (shared
  _explode_tokens kernel), sorted-hash token lookup (stages/hashset,
  zero per-task build), per-doc segment sums via np.add.reduceat (no
  Python loop over tokens), argmax with label-ascending tie-break.

No counterpart in the reference (SDM-TIB/shaclAPI validates shapes,
not content); this extends the engine's text-analysis surface
(pipelines/textstats.py) with the learned-filter member.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def train_nb(
    docs_ds,
    label_col: str = "lang",
    alpha: float = 1.0,
):
    """Fit multinomial NB with Laplace smoothing ``alpha``.

    Returns a plain-dict model: sorted ``labels``, float64 ``log_prior``
    (C,), ``token_map`` (sorted-hash token -> row), ``log_cond`` (V, C)
    = ln((cnt + alpha) / (N_c + alpha * V)), ``log_oov`` (C,) for
    unseen tokens. Deterministic and layout-independent: counts are
    exact integers, token rows are sorted lexicographically, and every
    float derives elementwise from those integers."""
    import polars as pl

    from shaclapi_ray.pipelines.textstats import (
        VOCAB_BROADCAST_LIMIT,
        _explode_tokens,
    )
    from shaclapi_ray.stages.aggregates import combine_partials_multi
    from shaclapi_ray.stages.hashset import build_hash_map

    def tc_partial(batch: pa.Table) -> pa.Table:
        ex = _explode_tokens(batch, [label_col])
        return (
            ex.group_by([label_col, "t"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .rename({label_col: "label", "t": "token"})
            .to_arrow()
        )

    tc = combine_partials_multi(
        docs_ds.map_batches(tc_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["label", "token"],
        {"cnt": "sum"},
    )

    def cls_partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([label_col]))
        return (
            df.group_by(label_col)
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .rename({label_col: "label"})
            .to_arrow()
        )

    cls = combine_partials_multi(
        docs_ds.map_batches(cls_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["label"],
        {"n": "sum"},
    )

    import ray

    cls_t = pa.concat_tables(
        [t for r in cls.to_arrow_refs() if (t := ray.get(r)).num_rows]
        or [pa.table({"label": pa.array([], pa.string()), "n": pa.array([], pa.int64())})]
    )
    if cls_t.num_rows == 0:
        raise ValueError("train_nb: empty corpus")
    labels = sorted(cls_t["label"].to_pylist())
    lab_idx = {l: i for i, l in enumerate(labels)}
    n_docs_c = np.zeros(len(labels), dtype=np.int64)
    for l, n in zip(cls_t["label"].to_pylist(), cls_t["n"].to_numpy(zero_copy_only=False)):
        n_docs_c[lab_idx[l]] = n
    log_prior = np.log(n_docs_c / n_docs_c.sum())

    tc_t = pa.concat_tables(
        [t for r in tc.to_arrow_refs() if (t := ray.get(r)).num_rows]
        or [
            pa.table(
                {
                    "label": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        ]
    ).combine_chunks()
    # distinct tokens, sorted lexicographically -> deterministic row ids
    tok_col = tc_t["token"]
    tok_arr = tok_col.combine_chunks() if isinstance(tok_col, pa.ChunkedArray) else tok_col
    import pyarrow.compute as pc

    vocab = pc.unique(tok_arr)
    vocab = vocab.take(pc.sort_indices(vocab))
    V = len(vocab)
    if V > VOCAB_BROADCAST_LIMIT:
        raise ValueError(
            f"vocabulary has {V} tokens (> {VOCAB_BROADCAST_LIMIT}); shard the "
            "model by token hash and score with a partitioned join at this scale"
        )
    tok_map = build_hash_map(vocab, np.arange(V, dtype=np.int64))
    from shaclapi_ray.stages.hashset import lookup

    rows = lookup(tok_map, tok_arr, default=-1)
    cols = np.array(
        [lab_idx[l] for l in tc_t["label"].to_pylist()], dtype=np.int64
    )
    counts = np.zeros((V, len(labels)), dtype=np.int64)
    counts[rows, cols] = tc_t["cnt"].to_numpy(zero_copy_only=False)
    n_tok_c = counts.sum(axis=0)
    denom = n_tok_c + alpha * V
    log_cond = np.log((counts + alpha) / denom)
    log_oov = np.log(alpha / denom)
    return {
        "labels": labels,
        "log_prior": log_prior,
        "token_map": tok_map,
        "log_cond": log_cond,
        "log_oov": log_oov,
        "alpha": alpha,
        "vocab_size": V,
    }


def nb_classify(docs_ds, model):
    """(doc_id, pred, score): argmax-class NB prediction per document
    (``score`` = the winner's total log-probability; ties break to the
    lexicographically smallest label on both this and the SQL-oracle
    side). Model broadcast once via ray.put; streaming map_batches."""
    import ray

    from shaclapi_ray.pipelines.textstats import _explode_tokens
    from shaclapi_ray.stages.hashset import lookup

    ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        labels = np.asarray(m["labels"], dtype=object)
        n = batch.num_rows
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        acc = np.tile(m["log_prior"], (n, 1))
        ex = _explode_tokens(batch, ["doc_id"])
        if len(ex):
            order = np.argsort(ids, kind="stable")
            exid = ex["doc_id"].to_numpy()
            pos = order[np.searchsorted(ids[order], exid)]
            tok_idx = lookup(m["token_map"], ex["t"].to_arrow(), default=-1)
            hit = tok_idx >= 0
            contrib = np.where(
                hit[:, None],
                m["log_cond"][np.clip(tok_idx, 0, m["vocab_size"] - 1)],
                m["log_oov"][None, :],
            )
            # explode preserves row order, so each doc's tokens are one
            # contiguous run: segment-sum with reduceat, no token loop
            starts = np.r_[0, np.flatnonzero(np.diff(pos)) + 1]
            acc[pos[starts]] += np.add.reduceat(contrib, starts, axis=0)
        best = np.argmax(acc, axis=1)  # first index on ties = label asc
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred": pa.array(labels[best].tolist(), pa.string()),
                "score": pa.array(acc[np.arange(n), best]),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def nb_self_classify(docs_ds, label_col: str = "lang", alpha: float = 1.0):
    """train_nb + nb_classify over the same corpus — the single-input
    composition the config-driven runner / HTTP surface can invoke
    (models aren't JSON-able; self-training is, and is exactly what the
    doc_signals driver slot exercises)."""
    return nb_classify(docs_ds, train_nb(docs_ds, label_col=label_col, alpha=alpha))
