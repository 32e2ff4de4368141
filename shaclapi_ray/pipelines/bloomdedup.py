"""Bloom-filter paragraph dedup — the constant-memory dedup mechanism.

The Dolma toolkit's paragraph deduper (Soldaini et al. 2024, "Dolma",
the BFF/"bloom filter deduper" component) marks duplicate paragraphs
with a FIXED-SIZE bloom filter instead of an exact winner table: at
100 TB the distinct-paragraph set is billions of rows, while a bitmap
sized for the expected cardinality is a few GiB REGARDLESS of corpus
size. This engine's exact operators (`dedup.dedup_paragraphs`,
`dedup.host_boilerplate`) carry winner/drop state proportional to the
duplicate set; this module is the complementary trade — O(1) state, a
bounded false-positive rate, zero false negatives.

Two departures from BFF, both for determinism (the engine-wide rule
that results must not depend on scan order or block layout):

- BFF streams documents through ONE filter and keeps the first copy it
  happens to see — order-dependent. Here the semantics are DROP ALL
  COPIES of any paragraph whose global occurrence count is >= 2 (the
  host_boilerplate-style rule, corpus-wide): symmetric, so no order
  enters the definition.
- the filter is a saturating 2-bit COUNTING bloom built from per-block
  partials merged with min(a+b, 2) — commutative and associative, so
  the merged counts (and therefore the false-positive SET, not just its
  rate) are identical under any block layout or merge tree. A plain
  once/dup bitmap pair is NOT mergeable this way: whether two distinct
  paragraphs' shared bit looks "duplicated" would depend on whether
  they landed in the same block.

A paragraph occurrence maps to k distinct bit positions via double
hashing, pos_i = (h1 + i*(h2|1)) mod m (Kirsch & Mitzenmacher 2006;
forcing the stride odd with m a power of two makes the k positions
distinct, so a single occurrence can never mark itself duplicated).
h1/h2 are the SAME seed-17/seed-23 64-bit polars text hashes the exact
paragraph operators use (dedup._para_explode).

Exactness: a paragraph is flagged iff all k of its bits saturate at 2,
so every truly-duplicated paragraph is flagged (no false negatives);
a unique paragraph is flagged only if all k of its bits collide with
other content (~(kn/m)^k per paragraph). With m sized generously over
the distinct-paragraph count the output EQUALS the exact drop-all rule
— the driver slot pins that equality on the fixtures, which makes the
plain-SQL oracle (`bloom_dup_paragraphs_sql`) valid there.

Scale shape: pass 1 ships one packed m/4-byte partial per block (size
the blocks UP at scale — the traffic is blocks x m/4, independent of
row width); `combine='tree'` inserts a groupby merge layer so the
driver folds at most `tree_groups` partials; the final dup bitmap
(m/8 bytes) broadcasts once via ray.put and pass 2 streams with zero
per-task state. No shuffle touches paragraph text in either pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from shaclapi_ray.pipelines.dedup import _para_explode, _para_reassemble

# above this, a driver fold over per-block partials is the wrong shape —
# the tree combine caps driver traffic at tree_groups partials
TREE_COMBINE_THRESHOLD = 64


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n,) uint64 hash pair -> (k*n,) int64 bit positions, the k
    positions of each occurrence guaranteed distinct (odd stride)."""
    mask = np.uint64(m_bits - 1)
    step = h2 | np.uint64(1)
    out = np.empty(k * h1.size, dtype=np.int64)
    for i in range(k):
        out[i * h1.size : (i + 1) * h1.size] = (
            (h1 + np.uint64(i) * step) & mask
        ).astype(np.int64)
    return out


def _pack2(counts: np.ndarray) -> bytes:
    """uint8 counts (values 0..2) -> 2-bit-packed bytes (m/4)."""
    c = counts.reshape(-1, 4)
    return (c[:, 0] | (c[:, 1] << 2) | (c[:, 2] << 4) | (c[:, 3] << 6)).astype(
        np.uint8
    ).tobytes()


def _unpack2(blob: bytes, m_bits: int) -> np.ndarray:
    b = np.frombuffer(blob, dtype=np.uint8)
    out = np.empty(m_bits, dtype=np.uint8)
    out[0::4] = b & 3
    out[1::4] = (b >> 2) & 3
    out[2::4] = (b >> 4) & 3
    out[3::4] = (b >> 6) & 3
    return out


def _sat_add(acc: np.ndarray, other: np.ndarray) -> np.ndarray:
    # values are <= 2 each, so the uint8 sum cannot wrap
    return np.minimum(acc + other, 2).astype(np.uint8)


def bloom_counts(
    docs_ds,
    m_bits: int = 1 << 24,
    k: int = 4,
    sep: str = "\n\n",
    text_col: str = "text",
    combine: str = "auto",
    tree_groups: int = 32,
) -> np.ndarray:
    """Pass 1: the merged saturating counting bloom as the raw per-bit
    counts (uint8 values 0..2, length m_bits). This is the MERGEABLE
    form — min(a+b, 2) over two corpora's counts equals the counts of
    their union exactly, which is what makes the persisted-state
    incremental path (save/update/load) identical to a from-scratch
    build over the combined corpus. Layout-independent by construction
    (commutative merges)."""
    if m_bits & (m_bits - 1) or m_bits < 64:
        raise ValueError("m_bits must be a power of two >= 64")
    if not 1 <= k <= 16:
        raise ValueError("k must be in 1..16")

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        col = batch[text_col]
        s = pl.from_arrow(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        p = (
            pl.DataFrame({"t": s.fill_null("")})
            .with_columns(pl.col("t").str.split(sep).alias("p"))
            .explode("p")["p"]
        )
        pos = _positions(
            p.hash(seed=17).to_numpy(), p.hash(seed=23).to_numpy(), k, m_bits
        )
        # NOT np.bincount(minlength=m_bits): that materializes an int64
        # temp 8x the filter in EVERY task — at the multi-GiB m this
        # module exists for, that OOMs workers. unique+counts costs
        # memory ∝ the batch's positions; the uint8 m-array is the one
        # unavoidable allocation (it IS the partial).
        uniq, cnt = np.unique(pos, return_counts=True)
        counts = np.zeros(m_bits, dtype=np.uint8)
        counts[uniq] = np.minimum(cnt, 2).astype(np.uint8)
        return pa.table({"part": pa.array([_pack2(counts)], pa.binary())})

    parts = docs_ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    if combine == "auto":
        # materialize BEFORE counting: parts is one m/4-byte row per
        # block (tiny next to the corpus), and count() on the lazy
        # pipeline would burn a full extra corpus pass before the fold
        parts = parts.materialize()
        combine = "tree" if parts.count() > TREE_COMBINE_THRESHOLD else "driver"
    if combine == "tree":
        import zlib

        def tag(batch: pa.Table) -> pa.Table:
            # ANY group assignment is correct (saturating add is
            # commutative/associative); content crc keeps it stateless
            g = [zlib.crc32(b) % tree_groups for b in batch["part"].to_pylist()]
            return batch.append_column("g", pa.array(g, pa.int64()))

        def merge_group(t: pa.Table) -> pa.Table:
            acc = np.zeros(m_bits, dtype=np.uint8)
            for blob in t["part"].to_pylist():
                acc = _sat_add(acc, _unpack2(blob, m_bits))
            return pa.table({"part": pa.array([_pack2(acc)], pa.binary())})

        parts = (
            parts.map_batches(tag, batch_format="pyarrow")
            .groupby("g")
            .map_groups(merge_group, batch_format="pyarrow")
        )
    elif combine != "driver":
        raise ValueError(f"unknown combine strategy {combine!r}")

    acc = np.zeros(m_bits, dtype=np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b["part"].to_pylist():
            acc = _sat_add(acc, _unpack2(blob, m_bits))
    return acc


def bloom_dup_bitmap(
    docs_ds,
    m_bits: int = 1 << 24,
    k: int = 4,
    sep: str = "\n\n",
    text_col: str = "text",
    combine: str = "auto",
    tree_groups: int = 32,
) -> np.ndarray:
    """The packed DUP BITMAP (count==2 positions, np.uint8 bit-packed,
    m/8 bytes) — the broadcastable probe form of `bloom_counts`."""
    return np.packbits(
        bloom_counts(
            docs_ds,
            m_bits=m_bits,
            k=k,
            sep=sep,
            text_col=text_col,
            combine=combine,
            tree_groups=tree_groups,
        )
        == 2
    )


def persist_bloom_state(
    docs_ds,
    path: str,
    m_bits: int = 1 << 24,
    k: int = 4,
    sep: str = "\n\n",
    text_col: str = "text",
    combine: str = "auto",
    tree_groups: int = 32,
) -> None:
    """Build and persist the saturating counts for ``docs_ds`` — the
    O(m) cross-snapshot dedup state. One parquet file (packed 2-bit
    counts + parameters), written atomically."""
    counts = bloom_counts(
        docs_ds,
        m_bits=m_bits,
        k=k,
        sep=sep,
        text_col=text_col,
        combine=combine,
        tree_groups=tree_groups,
    )
    _write_bloom_state(path, counts, m_bits, k, sep)


def _write_bloom_state(
    path: str, counts: np.ndarray, m_bits: int, k: int, sep: str
) -> None:
    import os

    import pyarrow.parquet as pq

    t = pa.table(
        {
            "counts": pa.array([_pack2(counts)], pa.binary()),
            "m_bits": pa.array([m_bits], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "sep": pa.array([sep], pa.string()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def load_bloom_state(path: str) -> tuple[np.ndarray, int, int, str]:
    """(counts uint8[m], m_bits, k, sep) from a persisted state file."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    m_bits = int(t["m_bits"][0].as_py())
    return (
        _unpack2(t["counts"][0].as_py(), m_bits),
        m_bits,
        int(t["k"][0].as_py()),
        t["sep"][0].as_py(),
    )


def update_bloom_state(
    docs_ds,
    path: str,
    text_col: str = "text",
    combine: str = "auto",
    tree_groups: int = 32,
) -> None:
    """Saturating-add a new snapshot's counts into the persisted state.
    Exactly equivalent to rebuilding over the union of every snapshot
    ever added (min(a+b,2) is associative/commutative), so incremental
    maintenance costs one pass over the NEW data only."""
    old, m_bits, k, sep = load_bloom_state(path)
    fresh = bloom_counts(
        docs_ds,
        m_bits=m_bits,
        k=k,
        sep=sep,
        text_col=text_col,
        combine=combine,
        tree_groups=tree_groups,
    )
    _write_bloom_state(path, _sat_add(old, fresh), m_bits, k, sep)


def bloom_dup_paragraphs(
    docs_ds,
    m_bits: int = 1 << 24,
    k: int = 4,
    sep: str = "\n\n",
    text_col: str = "text",
    id_col: str = "doc_id",
    combine: str = "auto",
    tree_groups: int = 32,
    state_path: str | None = None,
):
    """(doc_id, clean_text, n_kept, n_dropped): every copy of every
    globally-duplicated paragraph removed, via the constant-memory
    counting-bloom filter. Schema-compatible with dedup_paragraphs /
    host_boilerplate so the three removal flavors compose.

    False positives (unique paragraphs dropped) occur at ~(k*n/m)^k per
    paragraph and are DETERMINISTIC for fixed (corpus, m_bits, k); false
    negatives cannot occur. Size m_bits >= ~8x expected distinct
    paragraphs for a negligible rate, or use dedup.host_boilerplate /
    dedup.dedup_paragraphs when exactness is required and the duplicate
    set fits their (broadcast or join) state.

    ``state_path``: a persisted prior-snapshot state
    (persist_bloom_state); its counts merge into this corpus's counts
    before thresholding, so paragraphs duplicated ACROSS snapshots drop
    too — identical to running over the union (the saturating merge is
    exact). The state's parameters must match the call's."""
    counts = bloom_counts(
        docs_ds,
        m_bits=m_bits,
        k=k,
        sep=sep,
        text_col=text_col,
        combine=combine,
        tree_groups=tree_groups,
    )
    if state_path is not None:
        prior, s_m, s_k, s_sep = load_bloom_state(state_path)
        if (s_m, s_k, s_sep) != (m_bits, k, sep):
            raise ValueError(
                f"bloom state {state_path} was built with (m_bits={s_m}, "
                f"k={s_k}, sep={s_sep!r}) — call parameters must match"
            )
        counts = _sat_add(counts, prior)
    dup_bits = np.packbits(counts == 2)
    # broadcast the UNPACKED bit array (m bytes of uint8): ray.get is
    # zero-copy from plasma, so probes index it with no per-task setup
    ref = ray.put(np.unpackbits(dup_bits))

    def strip(batch: pa.Table) -> pa.Table:
        if id_col != "doc_id":
            batch = batch.rename_columns(
                ["doc_id" if c == id_col else c for c in batch.column_names]
            )
        df = _para_explode(batch, sep, text_col)
        bits = ray.get(ref)
        pos = _positions(df["h1"].to_numpy(), df["h2"].to_numpy(), k, m_bits)
        hit = bits[pos].reshape(k, df.height).all(axis=0)
        out = _para_reassemble(df, ~hit, sep)
        if id_col != "doc_id":
            out = out.rename_columns(
                [id_col if c == "doc_id" else c for c in out.column_names]
            )
        return out

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        strip, batch_format="pyarrow", zero_copy_batch=True
    )


def bloom_dup_paragraphs_sql(
    sep: str = "\n\n",
    src: str = "documents",
    cols: tuple[str, str, str] = ("clean_text", "n_kept", "n_dropped"),
) -> str:
    """The EXACT drop-all-duplicates rule this operator computes when no
    bloom false positive fires: split on sep, drop every paragraph whose
    global occurrence count >= 2, rejoin survivors in document order.
    Valid as the oracle wherever the configured m_bits is collision-free
    for the corpus — the driver slot pins that on the fixtures
    (test_bloomdedup guard + the sf0.01 parity suite). ``cols`` renames
    the outputs so the part composes into multi-operator joins without
    colliding with dedup_paragraphs' identical schema."""
    sep_sql = "||".join(f"chr({ord(c)})" for c in sep)
    c0, c1, c2 = cols
    return f"""
WITH bfparts AS (
  SELECT doc_id, string_split(COALESCE(text, ''), {sep_sql}) AS ps
  FROM {src}
), bfp AS (
  SELECT doc_id, unnest(ps) AS para,
         unnest(generate_series(0, len(ps) - 1)) AS idx
  FROM bfparts
), bfc AS (
  SELECT para, COUNT(*) AS cnt FROM bfp GROUP BY para
), bfk AS (
  SELECT doc_id, idx, para, cnt FROM bfp JOIN bfc USING (para)
)
SELECT doc_id,
       COALESCE(string_agg(para, {sep_sql} ORDER BY idx) FILTER (WHERE cnt < 2), '') AS {c0},
       COUNT(*) FILTER (WHERE cnt < 2) AS {c1},
       COUNT(*) FILTER (WHERE cnt >= 2) AS {c2}
FROM bfk GROUP BY doc_id
"""
