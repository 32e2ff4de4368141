"""Weighted multi-corpus mixing — the source-weighting stage of a
training-data pipeline (Pile / Dolma / LLaMA style: each named corpus
contributes `epochs[name]` passes over its rows, fractional epochs as a
deterministic subsample).

The reference has no analog (it validates RDF bindings); this is a
first-class training-data operator per the brief, sibling to
textstats.sample_corpus and spans.pack_sequences.

Scale design:
- Pure streaming: each epoch copy is a map_batches tag pass (constant
  string column + optional Knuth-hash row filter) over the source
  Dataset, and the mix is a Dataset.union — NO shuffle anywhere; the
  streaming executor interleaves blocks from all copies.
- Reproducible by construction: the fractional subsample reuses
  sample_corpus's multiplicative-hash arithmetic with a salt derived
  from (sorted-source index, epoch index, seed) — identical output
  across runs, cluster sizes and block layouts, and identical
  arithmetic in the DuckDB oracle (oracles.mix_corpora_sql).
- The kept set at epochs e is a SUPERSET of the set at any e' < e for
  the same source (full copies accumulate; the fractional filter's
  kept set grows monotonically with the fraction only within one
  epoch index — raising e past the next integer adds a full copy and
  restarts the fraction, so tuning weights up never drops a full
  pass already taken).
"""

from __future__ import annotations

import math

import pyarrow as pa

from shaclapi_ray.pipelines.textstats import SAMPLE_KNUTH

# Salt strides for the per-(source, epoch) fractional-sample hash; both
# prime, mirrored exactly in oracles.mix_corpora_sql.
SRC_SALT = 1_000_003
EPOCH_SALT = 7_919
MIX_COL = "mix_key"  # "{source}:{epoch}" tag on every output row


def compute_epochs(
    row_counts: dict[str, int],
    weights: dict[str, float],
    target_rows: int,
) -> dict[str, float]:
    """Epochs per source so that source s contributes a
    weights[s]/sum(weights) share of a target_rows mix in expectation:
    epochs[s] = target_rows * w_s / (sum_w * rows_s). Pure arithmetic —
    unit-tested, no Ray."""
    if target_rows < 0:
        raise ValueError("target_rows must be >= 0")
    if set(row_counts) != set(weights):
        raise ValueError("row_counts and weights must name the same sources")
    total_w = float(sum(weights.values()))
    if total_w <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative with a positive sum")
    out = {}
    for s, n in row_counts.items():
        if n <= 0:
            raise ValueError(f"source {s!r} has no rows")
        out[s] = target_rows * (weights[s] / total_w) / n
    return out


def _frac_threshold(fraction: float) -> int:
    return int(fraction * (1 << 32))


def mix_salt(seed: int, src_index: int, epoch: int) -> int:
    """Deterministic salt for the fractional copy of (source, epoch);
    src_index is the source name's position in sorted order."""
    return seed + src_index * SRC_SALT + epoch * EPOCH_SALT


def mix_corpora(sources: dict, epochs: dict[str, float], seed: int = 0):
    """Mix named corpora into one Dataset with a `mix_key` column
    ("{source}:{epoch}") tagging which pass each row belongs to.

    Each source contributes floor(epochs[s]) full copies plus one
    deterministic Knuth-subsampled copy of the fractional remainder
    (rows where ((doc_id + salt) * 2654435761) mod 2^32 < frac * 2^32).
    Sources absent from `epochs` contribute nothing. All sources must
    share the schema of the first; doc_id must be an integer column."""
    import numpy as np

    names = sorted(sources)
    parts = []
    for si, name in enumerate(names):
        e = float(epochs.get(name, 0.0))
        if e < 0 or not math.isfinite(e):
            raise ValueError(f"epochs for source {name!r} must be finite and >= 0")
        full = int(e)
        frac = e - full
        ds = sources[name]

        def make_tag(tag: str, threshold: int | None, salt: int):
            def fn(batch: pa.Table) -> pa.Table:
                if threshold is not None:
                    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                    h = ((ids + salt) * SAMPLE_KNUTH) % (1 << 32)
                    batch = batch.filter(pa.array(h < threshold))
                return batch.append_column(
                    MIX_COL, pa.array([tag] * batch.num_rows, pa.string())
                )

            return fn

        for k in range(full):
            parts.append(
                ds.map_batches(
                    make_tag(f"{name}:{k}", None, 0),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
        if frac > 1e-12:
            parts.append(
                ds.map_batches(
                    make_tag(
                        f"{name}:{full}",
                        _frac_threshold(frac),
                        mix_salt(seed, si, full),
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
    if not parts:
        raise ValueError("empty mix: no source has epochs > 0")
    if len(parts) == 1:
        return parts[0]
    return parts[0].union(*parts[1:])


def split_corpus(docs_ds, fractions: dict[str, float], seed: int = 0):
    """Deterministic train/val/test split: adds a `split` column assigning
    each row to one band of the Knuth hash range — bands laid out in the
    dict's iteration order, fractions summing to 1 (±1e-9).

    Same reproducibility contract as sample_corpus: pure per-row
    arithmetic, identical across runs / cluster sizes / block layouts,
    and identical arithmetic in SQL (oracles.split_corpus_sql). A row's
    assignment depends only on (doc_id, seed) — growing the corpus never
    reassigns existing rows (the leakage-safety property a train/test
    split needs). Streams: one map_batches pass, no shuffle."""
    import numpy as np

    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    names = list(fractions)
    # cumulative band edges; the last band is clamped to 2^32 so float
    # rounding can never leave a row unassigned
    edges = np.cumsum([int(fractions[n] * (1 << 32)) for n in names])
    edges[-1] = 1 << 32

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as _np

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(_np.int64)
        h = ((ids + seed) * SAMPLE_KNUTH) % (1 << 32)
        band = _np.searchsorted(edges, h, side="right")
        labels = _np.array(names, dtype=object)[band]
        return batch.append_column("split", pa.array(labels, pa.string()))

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_corpus(docs_ds, seed: int = 0):
    """Deterministic global shuffle for training output: adds a
    `shuffle_key` column (Knuth hash of doc_id) and range-sorts by it —
    the reproducible analog of Dataset.random_shuffle (which is
    RNG-state-dependent and changes across runs). One all-to-all
    range-partition exchange, same cost shape as any sort; downstream
    shard writers consume the stream in shuffled order."""
    import numpy as np

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids + seed) * SAMPLE_KNUTH) % (1 << 32)
        return batch.append_column("shuffle_key", pa.array(h, pa.int64()))

    keyed = docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    # doc_id tie-break: the 32-bit hash collides at ~n^2/2^33 (a handful
    # per million rows) and tie order inside a range-partition sort is
    # layout-dependent — the secondary key keeps the order reproducible
    return keyed.sort(["shuffle_key", "doc_id"])
