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
            f"vocabulary has {V} tokens (> {VOCAB_BROADCAST_LIMIT}); use "
            "train_nb_sharded + nb_classify_sharded (token-hash-sharded model, "
            "partitioned-join scoring) at this scale"
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


def train_nb_sharded(docs_ds, label_col: str = "lang", alpha: float = 1.0):
    """The beyond-VOCAB_BROADCAST_LIMIT training path train_nb's loud
    ValueError points at: the (token -> per-class log-prob) table is
    NEVER collected to the driver — it stays a token-hash-partitioned
    Dataset. Only class-level scalars (labels, priors, token totals —
    C rows) and the distinct-token count V reach the driver.

    Returns (model_ds, meta): model_ds has columns (token, l0..l{C-1})
    float64; meta = {'labels', 'log_prior', 'log_oov', 'alpha',
    'vocab_size'} exactly mirroring the broadcast model's values."""
    import polars as pl
    import ray

    from shaclapi_ray.pipelines.textstats import _explode_tokens
    from shaclapi_ray.stages.aggregates import combine_partials_multi

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
    ).materialize()

    def cls_partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([label_col]))
        return (
            df.group_by(label_col)
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .rename({label_col: "label"})
            .to_arrow()
        )

    cls_t = pa.concat_tables(
        [
            t
            for r in combine_partials_multi(
                docs_ds.map_batches(
                    cls_partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["label"],
                {"n": "sum"},
            ).to_arrow_refs()
            if (t := ray.get(r)).num_rows
        ]
        or [pa.table({"label": pa.array([], pa.string()), "n": pa.array([], pa.int64())})]
    )
    if cls_t.num_rows == 0:
        raise ValueError("train_nb_sharded: empty corpus")
    labels = sorted(cls_t["label"].to_pylist())
    lab_idx = {l: i for i, l in enumerate(labels)}
    n_docs_c = np.zeros(len(labels), dtype=np.int64)
    for l, n in zip(cls_t["label"].to_pylist(), cls_t["n"].to_numpy(zero_copy_only=False)):
        n_docs_c[lab_idx[l]] = n
    log_prior = np.log(n_docs_c / n_docs_c.sum())

    # class token totals (C rows) and distinct-token count V — tiny
    # driver-side scalars derived from the distributed tc table
    from shaclapi_ray.stages.aggregates import combine_partials

    nc_t = pa.concat_tables(
        [
            t
            for r in combine_partials(tc, "label", "cnt", "n_tok").to_arrow_refs()
            if (t := ray.get(r)).num_rows
        ]
    )
    n_tok_c = np.zeros(len(labels), dtype=np.int64)
    for l, n in zip(nc_t["label"].to_pylist(), nc_t["n_tok"].to_numpy(zero_copy_only=False)):
        n_tok_c[lab_idx[l]] = n

    def tok_partial(batch: pa.Table) -> pa.Table:
        import polars as _pl

        d = _pl.from_arrow(batch.select(["token"])).unique()
        return d.to_arrow()

    from shaclapi_ray.stages.aggregates import grouped_count

    V = grouped_count(
        tc.map_batches(tok_partial, batch_format="pyarrow"), "token"
    ).count()
    denom = n_tok_c + alpha * V
    log_oov = np.log(alpha / denom)
    meta = {
        "labels": labels,
        "log_prior": log_prior,
        "log_oov": log_oov,
        "alpha": alpha,
        "vocab_size": int(V),
    }

    lab_ref = ray.put((labels, n_tok_c.copy(), float(alpha), int(V)))

    def build_rows(g: pa.Table) -> pa.Table:
        import polars as _pl

        labels_, n_tok_c_, a_, V_ = ray.get(lab_ref)
        df = _pl.from_arrow(g)
        # one output row per token: dense per-class log-probs with the
        # same smoothing as the broadcast model
        piv = df.pivot(values="cnt", index="token", on="label")
        out = {"token": piv["token"].to_arrow()}
        for ci, lab in enumerate(labels_):
            cnt = (
                piv[lab].fill_null(0).to_numpy().astype(np.float64)
                if lab in piv.columns
                else np.zeros(piv.height)
            )
            out[f"l{ci}"] = pa.array(
                np.log((cnt + a_) / (n_tok_c_[ci] + a_ * V_))
            )
        return pa.table(out)

    model_ds = tc.groupby("token").map_groups(build_rows, batch_format="pyarrow")
    return model_ds.materialize(), meta


def nb_classify_sharded(docs_ds, model_ds, meta):
    """(doc_id, pred, score) via a token-hash-partitioned JOIN against
    the sharded model instead of a driver broadcast: explode to
    per-batch (doc_id, token, tcnt) partials, join on token (OOV rows
    fall out of the inner join; their log_oov mass is reconstructed
    exactly from n_tokens - matched count), pre-aggregate per-class
    sums per batch, ONE keyed combine on doc_id, then a bounded join
    back onto the documents' ids for prior + argmax. Same predictions
    as the broadcast scorer (float sums reassociate; scores agree to
    ~1e-9)."""
    import polars as pl
    import ray

    from shaclapi_ray.pipelines.textstats import _explode_tokens
    from shaclapi_ray.stages.aggregates import combine_partials_multi
    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

    labels = meta["labels"]
    C = len(labels)

    def tok_partial(batch: pa.Table) -> pa.Table:
        ex = _explode_tokens(batch, ["doc_id"])
        return (
            ex.group_by(["doc_id", "t"])
            .agg(pl.len().cast(pl.Int64).alias("tcnt"))
            .rename({"t": "token"})
            .to_arrow()
        )

    toks = docs_ds.map_batches(
        tok_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    toks_nb = drop_empty_blocks(toks)
    model_nb = drop_empty_blocks(model_ds)
    if toks_nb is not None and model_nb is not None:
        joined = toks_nb.join(
            model_nb,
            join_type="inner",
            num_partitions=clamp_partitions(None),
            on=("token",),
        )

        def sum_partial(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            w = batch["tcnt"].to_numpy(zero_copy_only=False).astype(np.float64)
            uniq, inv = np.unique(ids, return_inverse=True)
            out = {"doc_id": pa.array(uniq)}
            for ci in range(C):
                v = batch[f"l{ci}"].to_numpy(zero_copy_only=False) * w
                acc = np.zeros(len(uniq))
                np.add.at(acc, inv, v)
                out[f"s{ci}"] = pa.array(acc)
            cnt = np.zeros(len(uniq))
            np.add.at(cnt, inv, w)
            out["matched"] = pa.array(cnt.astype(np.int64))
            return pa.table(out)

        sums = combine_partials_multi(
            joined.map_batches(sum_partial, batch_format="pyarrow"),
            ["doc_id"],
            {**{f"s{ci}": "sum" for ci in range(C)}, "matched": "sum"},
        )
    else:
        sums = None

    meta_ref = ray.put(
        (
            np.asarray(meta["log_prior"]),
            np.asarray(meta["log_oov"]),
            list(labels),
        )
    )

    # join the per-doc sums back onto every document (token-less and
    # all-OOV docs included) and finish with prior + oov mass + argmax
    from shaclapi_ray.pipelines.textstats import token_count

    base = token_count(docs_ds)  # (doc_id, n_tokens) — streaming
    if sums is not None:
        sums_nb = drop_empty_blocks(
            sums.map_batches(
                lambda t: t.rename_columns(
                    ["j_doc_id", *[f"s{ci}" for ci in range(C)], "matched"]
                ),
                batch_format="pyarrow",
            )
        )
    else:
        sums_nb = None
    if sums_nb is not None:
        base = drop_empty_blocks(base).join(
            sums_nb,
            join_type="left_outer",
            num_partitions=clamp_partitions(None),
            on=("doc_id",),
            right_on=("j_doc_id",),
        )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        log_prior, log_oov, labels_ = ray.get(meta_ref)
        n = batch.num_rows
        ntok = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        acc = np.tile(log_prior, (n, 1))
        if "matched" in batch.column_names:
            matched = (
                pc.fill_null(batch["matched"], 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            for ci in range(len(labels_)):
                s = (
                    pc.fill_null(batch[f"s{ci}"], 0.0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                )
                acc[:, ci] += s
        else:
            matched = np.zeros(n)
        oov = ntok - matched  # tokens absent from the model's vocabulary
        acc += oov[:, None] * log_oov[None, :]
        best = np.argmax(acc, axis=1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred": pa.array(
                    np.asarray(labels_, dtype=object)[best].tolist(), pa.string()
                ),
                "score": pa.array(acc[np.arange(n), best]),
            }
        )

    return base.map_batches(finish, batch_format="pyarrow")
