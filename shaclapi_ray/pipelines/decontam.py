"""Benchmark / test-set decontamination over the documents corpus.

A training corpus must not contain the evaluation set's text: any document
sharing a word n-gram with an eval document is flagged (the standard
n-gram-overlap decontamination of LLM data pipelines, e.g. GPT-3 appendix
C / PaLM §C.2). The reference has no analog (it validates RDF bindings);
this is a first-class training-data operator per the brief.

Scale design:
- The eval/blocklist side is SMALL and bounded (an eval suite, not the
  corpus): its distinct-gram hash set is collected once, sorted, and
  broadcast via ray.put — every scan task reads it zero-copy from the
  object store and probes with np.searchsorted (no per-task hash-build;
  stages/hashset.py rationale). At ~8 bytes/gram a 10M-gram blocklist is
  80 MB — fine to broadcast; above ~1e9 grams switch to a
  hash-partitioned join on gram hash instead.
- The corpus side streams: one map_batches pass, grams built vectorized
  (polars explode + shift-over-doc windows, no per-doc Python loops),
  distinct per doc, membership counted per doc inside the batch. No
  shuffle at all on the corpus.
- Membership is by 64-bit process-stable hash (collision odds n^2/2^65 —
  see stages/hashset.py); the DuckDB oracle compares exact gram STRINGS,
  so a parity pass also certifies the hash path collision-free on the
  fixture.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from shaclapi_ray.stages.hashset import hash_strings

from shaclapi_ray.pipelines.textstats import TOKEN_RE

N_GRAM = 3
EVAL_MOD = 37  # default eval set: doc_id % EVAL_MOD == 0 (deterministic)


def _doc_grams(batch: pa.Table, n: int):
    """Distinct (doc_id, gram) word n-grams per document — vectorized:
    token explode, n-1 shift-over-doc_id windows, concat, unique."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    ex = (
        df.with_columns(pl.col("text").str.extract_all(TOKEN_RE).alias("t"))
        .drop("text")
        .explode("t")
    )
    cols = [pl.col("t")] + [
        pl.col("t").shift(-i).over("doc_id").alias(f"t{i}") for i in range(1, n)
    ]
    ex = ex.with_columns(cols[1:])
    named = [pl.col("t")] + [pl.col(f"t{i}") for i in range(1, n)]
    ex = ex.filter(pl.all_horizontal([c.is_not_null() for c in named]))
    return ex.select(
        "doc_id", pl.concat_str(named, separator=" ").alias("gram")
    ).unique()


def eval_gram_hashes(eval_ds, n: int = N_GRAM) -> np.ndarray:
    """Sorted uint64 hash set of every distinct word n-gram in the eval
    corpus. Driver-side collect of HASHES ONLY (8 bytes/gram) — bounded by
    the eval suite's size, never the training corpus."""

    def partial(batch: pa.Table) -> pa.Table:
        g = _doc_grams(batch, n)
        h = np.unique(hash_strings(g["gram"].to_arrow()))
        return pa.table({"h": pa.array(h, type=pa.uint64())})

    parts = eval_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    chunks = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in parts.iter_batches(batch_format="pyarrow")
    ]
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(chunks))


def decontaminate(
    corpus_ds,
    eval_ds=None,
    n: int = N_GRAM,
    eval_mod: int = EVAL_MOD,
    drop: bool = False,
):
    """(doc_id, n_hits, contaminated): per document, the number of distinct
    word n-grams it shares with the eval set, and whether that is > 0.

    eval_ds defaults to the deterministic pseudo-eval-subset
    doc_id % eval_mod == 0 of the corpus itself (so the operator is
    self-contained on the fixture tables); pass a real eval Dataset with
    (doc_id, text) columns in production.

    ``drop=True`` returns the surviving FULL rows (every input column,
    contaminated documents removed) instead of the annotation table —
    same broadcast blocklist probe, the filter happens inside the one
    streaming pass so the wide table is never annotated-then-rejoined."""
    import ray

    if eval_ds is None:

        def pick(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % eval_mod == 0))

        eval_ds = corpus_ds.map_batches(
            pick, batch_format="pyarrow", zero_copy_batch=True
        )

    blocklist = eval_gram_hashes(eval_ds, n)
    block_ref = ray.put(blocklist)

    def scan(batch: pa.Table) -> pa.Table:
        import polars as pl

        sorted_h = ray.get(block_ref)
        g = _doc_grams(batch, n)
        if sorted_h.size and len(g):
            h = hash_strings(g["gram"].to_arrow())
            pos = np.minimum(np.searchsorted(sorted_h, h), sorted_h.size - 1)
            hit = sorted_h[pos] == h
        else:
            hit = np.zeros(len(g), dtype=bool)
        counts = (
            g.with_columns(pl.Series("hit", hit))
            .group_by("doc_id")
            .agg(pl.col("hit").sum().alias("n_hits"))
        )
        out = (
            pl.from_arrow(batch.select(["doc_id"]))
            .join(counts, on="doc_id", how="left")
            .with_columns(pl.col("n_hits").fill_null(0).cast(pl.Int64))
            .with_columns((pl.col("n_hits") > 0).alias("contaminated"))
        )
        if drop:
            clean = out.filter(~pl.col("contaminated"))["doc_id"].to_numpy()
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(np.isin(ids, clean)))
        return out.to_arrow()

    return corpus_ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
