"""Deduplication operators over a documents table (doc_id, text).

- exact_dedup:      content-hash groupby (128-bit key), native Min/Count
                    aggregate — keep min doc_id per group
- minhash_lsh:      byte-shingle -> minhash -> banded LSH buckets ->
                    candidate pairs -> connected components (driver
                    union-find at small scale, distributed min-label
                    propagation at large scale)
- simhash:          64-bit simhash signatures (+ hamming-band buckets),
                    fully vectorized (polars token explode + one hash)
- ngram_jaccard:    exact character-n-gram Jaccard on LSH candidates,
                    texts joined in via keyed shuffle (never a driver
                    text dict)
- embedding near-dup: cosine >= tau pairs — block-pair tasks for the
                    exact baseline (no full-matrix driver collect),
                    bucketed multi-table hyperplane LSH as the scale path
                    (narrow (tbl, bucket, vec_id) exchange; vectors rejoin
                    deduplicated candidate pairs via keyed joins)

Scale design: every per-doc signature is computed batch-parallel in
map_batches with numpy/polars kernels (no per-doc Python loops in hot
stages); the only shuffles are groupbys on narrow (hash, id) tables and
candidate-pair joins; no stage materializes row data on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Min

from shaclapi_ray.pipelines.textstats import TOKEN_RE

MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs_ds, text_col: str = "text"):
    """(doc_id, n_dups): one surviving row (min doc_id) per distinct text.

    Content key = TWO independent 64-bit vectorized polars hashes
    (128-bit combined — collision expectation ~n^2/2^129, negligible at
    10^12 rows), shuffled as a narrow (h1, h2, doc_id) table; the combine
    is Ray's native groupby().aggregate(Min, Count) — no per-group pandas
    frames, no per-row hashing loops."""
    import polars as pl

    def add_hash(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(
            batch[text_col].combine_chunks()
            if isinstance(batch[text_col], pa.ChunkedArray)
            else batch[text_col]
        ).fill_null("")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h1": pa.array(s.hash(seed=17).to_numpy().view(np.int64)),
                "h2": pa.array(s.hash(seed=23).to_numpy().view(np.int64)),
            }
        )

    def add_hash_partial(batch: pa.Table) -> pa.Table:
        # pre-aggregate per batch: one (h1, h2, min doc_id, count) row per
        # distinct in-batch text, so the combine sees per-batch partials
        t = add_hash(batch)
        g = t.group_by(["h1", "h2"]).aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        )
        return pa.table(
            {
                "h1": g["h1"],
                "h2": g["h2"],
                "doc_id": pc.cast(g["doc_id_min"], pa.int64()),
                "n_dups": pc.cast(g["doc_id_count"], pa.int64()),
            }
        )

    from shaclapi_ray.stages.aggregates import combine_partials_multi

    partials = docs_ds.map_batches(
        add_hash_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = combine_partials_multi(
        partials, ["h1", "h2"], {"doc_id": "min", "n_dups": "sum"}
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_dups": pc.cast(t["n_dups"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


PARA_IDX_BITS = 20  # max 2^20 paragraphs per doc in the packed (doc, idx) key
# winner lookup entries are 24 B (void16 hash + int64 key); above this the
# broadcast object stops being "small side" — strategy='join' instead.
PARA_BROADCAST_LIMIT = 50_000_000


def _split_paras(batch: pa.Table, sep: str, text_col: str):
    """polars frame (doc_id, p, idx): every paragraph occurrence of the
    batch, vectorized split + explode (null text -> one '' paragraph,
    matching the SQL oracle's COALESCE(text, ''))."""
    import polars as pl

    col = batch[text_col]
    s = pl.from_arrow(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    ids = pl.from_arrow(
        batch["doc_id"].combine_chunks()
        if isinstance(batch["doc_id"], pa.ChunkedArray)
        else batch["doc_id"]
    )
    df = pl.DataFrame({"doc_id": ids, "t": s.fill_null("")})
    df = df.with_columns(pl.col("t").str.split(sep).alias("p")).drop("t")
    return df.with_columns(
        pl.int_ranges(0, pl.col("p").list.len()).alias("idx")
    ).explode(["p", "idx"])


def _para_explode(batch: pa.Table, sep: str, text_col: str):
    """_split_paras plus the 128-bit paragraph hash and the packed
    first-occurrence key = doc_id * 2^PARA_IDX_BITS + idx."""
    import polars as pl

    return _split_paras(batch, sep, text_col).with_columns(
        pl.col("p").hash(seed=17).alias("h1"),
        pl.col("p").hash(seed=23).alias("h2"),
        (
            pl.col("doc_id").cast(pl.Int64) * (1 << PARA_IDX_BITS)
            + pl.col("idx").cast(pl.Int64)
        ).alias("key"),
    )


def _para_reassemble(df, keep, sep: str) -> pa.Table:
    """Rebuild (doc_id, clean_text, n_kept, n_dropped) from an exploded
    paragraph frame plus a boolean keep mask — shared by the broadcast
    and partition-join paths so the reassembly is kernel-identical."""
    import polars as pl

    out = (
        df.with_columns(pl.Series("keep", keep))
        .sort(["doc_id", "idx"])
        .group_by("doc_id", maintain_order=True)
        .agg(
            pl.col("p").filter(pl.col("keep")).str.join(sep).alias("clean_text"),
            pl.col("keep").sum().cast(pl.Int64).alias("n_kept"),
            (pl.col("keep").not_().sum()).cast(pl.Int64).alias("n_dropped"),
        )
        .with_columns(pl.col("clean_text").fill_null(""))
    )
    return out.to_arrow()


def _paragraph_winners_ds(docs_ds, sep: str, text_col: str):
    """Distributed winner table (h1, h2, win): the minimum packed
    (doc_id, idx) key per distinct paragraph, pre-aggregated per batch
    then combined (auto driver-merge / Ray shuffle)."""
    import polars as pl

    from shaclapi_ray.stages.aggregates import combine_partials_multi

    def pass1(batch: pa.Table) -> pa.Table:
        # pre-aggregate per batch: one (h1, h2, min key) row per distinct
        # in-batch paragraph, so the combine sees per-batch partials
        df = (
            _para_explode(batch, sep, text_col)
            .group_by(["h1", "h2"])
            .agg(pl.col("key").min().alias("win"))
        )
        return pa.table(
            {
                "h1": pa.array(df["h1"].to_numpy().view(np.int64)),
                "h2": pa.array(df["h2"].to_numpy().view(np.int64)),
                "win": pa.array(df["win"].to_numpy(), type=pa.int64()),
            }
        )

    return combine_partials_multi(
        docs_ds.select_columns(["doc_id", text_col]).map_batches(
            pass1, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["h1", "h2"],
        {"win": "min"},
    )


def paragraph_winner_lookup(docs_ds, sep: str = "\n\n", text_col: str = "text"):
    """Broadcast form of the winner table: (sorted void16 hash array,
    aligned winner keys). Loud ValueError above PARA_BROADCAST_LIMIT —
    strategy='join' is the at-scale path. Exposed so preprocess_corpus
    can build this and the exact-dedup drop set from ONE shared boundary
    materialization."""
    import ray as _ray

    winners = _paragraph_winners_ds(docs_ds, sep, text_col)
    tables = [t for t in (_ray.get(r) for r in winners.to_arrow_refs()) if t.num_rows]
    if tables:
        wt = pa.concat_tables(tables)
        if wt.num_rows > PARA_BROADCAST_LIMIT:
            raise ValueError(
                f"distinct-paragraph winner set has {wt.num_rows} entries "
                f"(> {PARA_BROADCAST_LIMIT}); pass dedup_paragraphs(..., "
                "strategy='join') (or preprocess_corpus dedup_strategy="
                "'join') to resolve winners with a hash-partitioned join "
                "at this scale"
            )
        hv = np.empty((wt.num_rows, 2), dtype=np.int64)
        hv[:, 0] = wt["h1"].combine_chunks().to_numpy()
        hv[:, 1] = wt["h2"].combine_chunks().to_numpy()
        voids = np.ascontiguousarray(hv).view(np.dtype((np.void, 16))).ravel()
        order = np.argsort(voids, kind="stable")
        return (voids[order], wt["win"].combine_chunks().to_numpy()[order])
    return (np.empty(0, dtype=np.dtype((np.void, 16))), np.empty(0, np.int64))


def _paragraph_keep_mask(df, lookup) -> np.ndarray:
    """keep[i] = occurrence i is the corpus-wide first occurrence of its
    paragraph, by probing the broadcast winner lookup (np.searchsorted on
    the void16 array — zero per-task hash builds)."""
    sorted_h, win_keys = lookup
    hv = np.empty((df.height, 2), dtype=np.int64)
    hv[:, 0] = df["h1"].to_numpy().view(np.int64)
    hv[:, 1] = df["h2"].to_numpy().view(np.int64)
    voids = np.ascontiguousarray(hv).view(np.dtype((np.void, 16))).ravel()
    keys = df["key"].to_numpy()
    if sorted_h.size:
        pos = np.searchsorted(sorted_h, voids)
        pos = np.minimum(pos, sorted_h.size - 1)
        return win_keys[pos] == keys  # first occurrence corpus-wide
    return np.ones(df.height, dtype=bool)


def _paragraphs_join(docs_ds, sep: str, text_col: str):
    """Partition-join paragraph-dedup path (beyond PARA_BROADCAST_LIMIT):
    the winner table stays a distributed Dataset; every paragraph
    occurrence's narrow (h1, h2, key) row joins it hash-partitioned, the
    LOSERS (key != win — proportional to duplicate occurrences, not the
    corpus) collapse to one (doc_id, drop-idx-list) row per affected doc,
    and the (doc_id, text) corpus rejoins those lists through exactly one
    keyed exchange (``_rebuild_from_drop_keys``). Output-identical to the
    broadcast path (tested)."""
    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

    def keep_all(batch: pa.Table) -> pa.Table:
        df = _split_paras(batch, sep, text_col)
        return _para_reassemble(df, np.ones(df.height, dtype=bool), sep)

    winners_nb = drop_empty_blocks(_paragraph_winners_ds(docs_ds, sep, text_col))
    if winners_nb is None:
        return docs_ds.select_columns(["doc_id", text_col]).map_batches(
            keep_all, batch_format="pyarrow", zero_copy_batch=True
        )

    def occurrences(batch: pa.Table) -> pa.Table:
        df = _para_explode(batch, sep, text_col)
        return pa.table(
            {
                "h1": pa.array(df["h1"].to_numpy().view(np.int64)),
                "h2": pa.array(df["h2"].to_numpy().view(np.int64)),
                "key": pa.array(df["key"].to_numpy(), type=pa.int64()),
            }
        )

    occ = drop_empty_blocks(
        docs_ds.select_columns(["doc_id", text_col]).map_batches(
            occurrences, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    losers = (
        occ.join(
            winners_nb,
            join_type="inner",
            num_partitions=clamp_partitions(None),
            on=("h1", "h2"),
        ).filter(expr="key != win")
        if occ is not None
        else None
    )
    return _rebuild_from_drop_keys(docs_ds, losers, sep, text_col)


def _rebuild_from_drop_keys(docs_ds, drop_keys, sep: str, text_col: str):
    """Shared tail of every partition-join paragraph-removal path: given a
    distributed set of packed occurrence keys to REMOVE (a Dataset with an
    int64 ``key`` column, key = doc_id * 2^PARA_IDX_BITS + idx; None means
    nothing drops), collapse the keys to one (doc_id, sorted drop-idx list)
    row per affected doc and rejoin the (doc_id, text) corpus through
    exactly one keyed exchange, rebuilding via ``_para_reassemble`` so the
    output is kernel-identical to the broadcast paths."""
    import polars as pl

    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

    def keep_all(batch: pa.Table) -> pa.Table:
        df = _split_paras(batch, sep, text_col)
        return _para_reassemble(df, np.ones(df.height, dtype=bool), sep)

    def decode(batch: pa.Table) -> pa.Table:
        keys = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(keys >> PARA_IDX_BITS, type=pa.int64()),
                "idx": pa.array(keys & ((1 << PARA_IDX_BITS) - 1), type=pa.int64()),
            }
        )

    def idx_list(t: pa.Table) -> pa.Table:
        # packed int64 bytes, not list<int64>: Ray's hash-shuffle join
        # rejects nested types in non-key fields
        idxs = np.sort(t["idx"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table(
            {
                "j_doc_id": pa.array([int(t["doc_id"][0].as_py())], pa.int64()),
                "drop_idxs": pa.array([idxs.tobytes()], pa.binary()),
            }
        )

    per_doc = (
        drop_empty_blocks(
            drop_keys.map_batches(decode, batch_format="pyarrow")
            .groupby("doc_id")
            .map_groups(idx_list, batch_format="pyarrow")
        )
        if drop_keys is not None
        else None
    )
    if per_doc is None:
        return docs_ds.select_columns(["doc_id", text_col]).map_batches(
            keep_all, batch_format="pyarrow", zero_copy_batch=True
        )

    joined = docs_ds.select_columns(["doc_id", text_col]).join(
        per_doc,
        join_type="left_outer",
        num_partitions=clamp_partitions(None),
        on=("doc_id",),
        right_on=("j_doc_id",),
    )

    def rebuild_joined(batch: pa.Table) -> pa.Table:
        df = _split_paras(batch, sep, text_col)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = batch["drop_idxs"].to_pylist()
        doc_col, idx_col = [], []
        for i, raw in zip(ids, blobs):
            if raw is not None:
                arr = np.frombuffer(raw, dtype=np.int64)
                doc_col.append(np.full(arr.size, i, dtype=np.int64))
                idx_col.append(arr)
        if doc_col:
            dr = pl.DataFrame(
                {
                    "doc_id": np.concatenate(doc_col),
                    "idx": np.concatenate(idx_col),
                }
            ).with_columns(pl.lit(True).alias("__drop"))
            df = df.join(dr, on=["doc_id", "idx"], how="left")
            keep = df["__drop"].is_null().to_numpy()
            df = df.drop("__drop")
        else:
            keep = np.ones(df.height, dtype=bool)
        return _para_reassemble(df, keep, sep)

    return joined.map_batches(rebuild_joined, batch_format="pyarrow")


def dedup_paragraphs(
    docs_ds,
    sep: str = "\n\n",
    text_col: str = "text",
    strategy: str = "broadcast",
    _winner_lookup=None,
):
    """(doc_id, clean_text, n_kept, n_dropped): corpus-wide exact
    PARAGRAPH dedup — a paragraph occurrence survives iff it is the first
    occurrence of its exact text corpus-wide, ordered by (doc_id,
    paragraph index). The CCNet-style boilerplate-removal operator
    (repeated headers/footers/navigation vanish from every copy but the
    first). One output row per input document (clean_text may be '').

    Scale shape: pass 1 explodes only (h1, h2, key) — 128-bit paragraph
    hash + key = doc_id * 2^20 + idx — so paragraph TEXT never enters the
    exchange; the winner per distinct paragraph is one native
    groupby().aggregate(Min); winners broadcast as a sorted 128-bit hash
    array with aligned winner keys (loud ValueError above
    PARA_BROADCAST_LIMIT ~50M distinct paragraphs); pass 2 re-splits each
    batch locally (docs never straddle batches) and reassembles kept
    paragraphs per doc with one polars group_by.

    ``strategy='join'`` is the beyond-ceiling path: winners stay a
    distributed Dataset and resolve through hash-partitioned joins
    (output-identical, tested — see ``_paragraphs_join``).
    ``_winner_lookup`` lets preprocess_corpus inject a lookup built from
    a shared boundary materialization (same tuple shape as
    ``paragraph_winner_lookup``)."""
    import ray as _ray

    if strategy == "join":
        return _paragraphs_join(docs_ds, sep, text_col)
    if strategy != "broadcast":
        raise ValueError(f"unknown dedup_paragraphs strategy {strategy!r}")

    lookup = (
        _winner_lookup
        if _winner_lookup is not None
        else paragraph_winner_lookup(docs_ds, sep, text_col)
    )
    lookup_ref = _ray.put(lookup)

    def rebuild(batch: pa.Table) -> pa.Table:
        df = _para_explode(batch, sep, text_col)
        keep = _paragraph_keep_mask(df, _ray.get(lookup_ref))
        return _para_reassemble(df, keep, sep)

    return docs_ds.select_columns(["doc_id", text_col]).map_batches(
        rebuild, batch_format="pyarrow", zero_copy_batch=True
    )


def dedup_paragraphs_sql(sep: str = "\n\n", src: str = "documents") -> str:
    """DuckDB oracle for dedup_paragraphs (same first-occurrence rule)."""
    sep_sql = "||".join(f"chr({ord(c)})" for c in sep)
    return f"""
WITH parts AS (
  SELECT doc_id, string_split(COALESCE(text, ''), {sep_sql}) AS ps
  FROM {src}
), p AS (
  SELECT doc_id, unnest(ps) AS para,
         unnest(generate_series(0, len(ps) - 1)) AS idx
  FROM parts
), k AS (
  SELECT doc_id, idx, para,
         ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
  FROM p
)
SELECT doc_id,
       COALESCE(string_agg(para, {sep_sql} ORDER BY idx) FILTER (WHERE rn = 1), '') AS clean_text,
       COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
       COUNT(*) FILTER (WHERE rn > 1) AS n_dropped
FROM k GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# host/source-scoped boilerplate removal
# ---------------------------------------------------------------------------

# drop-set entries are 24 B (group hash + void16 paragraph hash); the set is
# proportional to boilerplate templates (paragraphs repeated across >= frac of
# a group's docs), not the corpus — but with 10^7 hosts it can still outgrow
# the object store; strategy='join' keeps it a Dataset.
BOILER_BROADCAST_LIMIT = 50_000_000
# group sizes broadcast as sorted (hash, count) int64 pairs, one per group
BOILER_GROUPS_LIMIT = 50_000_000


def _split_paras_grouped(batch: pa.Table, sep: str, text_col: str, group_col: str):
    """_split_paras plus the group hash and the packed occurrence key:
    polars frame (doc_id, g, p, idx, h1, h2, key) with g = 64-bit hash of
    COALESCE(group_col, '') — null groups collapse to the '' group on both
    the Ray and SQL sides."""
    import polars as pl

    def _s(name):
        col = batch[name]
        return pl.from_arrow(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )

    df = pl.DataFrame(
        {"doc_id": _s("doc_id"), "grp": _s(group_col), "t": _s(text_col).fill_null("")}
    ).with_columns(
        pl.col("grp").fill_null("").hash(seed=29).alias("g"),
        pl.col("t").str.split(sep).alias("p"),
    )
    df = (
        df.drop("t", "grp")
        .with_columns(pl.int_ranges(0, pl.col("p").list.len()).alias("idx"))
        .explode(["p", "idx"])
    )
    return df.with_columns(
        pl.col("p").hash(seed=17).alias("h1"),
        pl.col("p").hash(seed=23).alias("h2"),
        (
            pl.col("doc_id").cast(pl.Int64) * (1 << PARA_IDX_BITS)
            + pl.col("idx").cast(pl.Int64)
        ).alias("key"),
    )


def _boiler_drops_ds(docs_ds, sep, text_col, group_col, min_docs, frac_num, frac_den):
    """Distributed drop table (g, h1, h2): paragraphs contained in >=
    min_docs documents of their group AND in >= frac_num/frac_den of the
    group's documents (integer cross-multiplication — no float ratio).

    Two narrow combines: per-batch DISTINCT (doc, paragraph) partial counts
    (a document never straddles batches, so within-batch uniqueness per
    (doc_id, h1, h2) is exact) summed per (g, h1, h2), plus a tiny docs-per-
    group combine broadcast as a sorted (hash, n) pair for the threshold."""
    import polars as pl
    import ray as _ray

    from shaclapi_ray.stages.aggregates import combine_partials_multi

    narrow = docs_ds.select_columns(["doc_id", text_col, group_col])

    def count_partial(batch: pa.Table) -> pa.Table:
        df = (
            _split_paras_grouped(batch, sep, text_col, group_col)
            .unique(subset=["doc_id", "h1", "h2"])
            .group_by(["g", "h1", "h2"])
            .len(name="c")
        )
        return pa.table(
            {
                "g": pa.array(df["g"].to_numpy().view(np.int64)),
                "h1": pa.array(df["h1"].to_numpy().view(np.int64)),
                "h2": pa.array(df["h2"].to_numpy().view(np.int64)),
                "c": pa.array(df["c"].to_numpy(), type=pa.int64()),
            }
        )

    counts = combine_partials_multi(
        narrow.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "h1", "h2"],
        {"c": "sum"},
    )

    def size_partial(batch: pa.Table) -> pa.Table:
        col = batch[group_col]
        s = pl.from_arrow(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        df = (
            pl.DataFrame({"grp": s})
            .with_columns(pl.col("grp").fill_null("").hash(seed=29).alias("g"))
            .group_by("g")
            .len(name="n")
        )
        return pa.table(
            {
                "g": pa.array(df["g"].to_numpy().view(np.int64)),
                "n": pa.array(df["n"].to_numpy(), type=pa.int64()),
            }
        )

    sizes = combine_partials_multi(
        docs_ds.select_columns([group_col]).map_batches(
            size_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["g"],
        {"n": "sum"},
    )
    st = [t for t in (_ray.get(r) for r in sizes.to_arrow_refs()) if t.num_rows]
    if st:
        sz = pa.concat_tables(st)
        if sz.num_rows > BOILER_GROUPS_LIMIT:
            raise ValueError(
                f"host_boilerplate has {sz.num_rows} distinct groups "
                f"(> {BOILER_GROUPS_LIMIT}); shard the corpus by group "
                "hash and run per shard at this scale"
            )
        gh = sz["g"].combine_chunks().to_numpy()
        gn = sz["n"].combine_chunks().to_numpy()
        order = np.argsort(gh)
        sizes_ref = _ray.put((gh[order], gn[order]))
    else:
        sizes_ref = _ray.put(
            (np.empty(0, np.int64), np.empty(0, np.int64))
        )

    def over_threshold(batch: pa.Table) -> pa.Table:
        gh_s, gn_s = _ray.get(sizes_ref)
        g = batch["g"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        n = gn_s[np.searchsorted(gh_s, g)] if gh_s.size else np.zeros_like(c)
        m = (c >= min_docs) & (c * frac_den >= frac_num * n)
        return batch.select(["g", "h1", "h2"]).filter(pa.array(m))

    return counts.map_batches(over_threshold, batch_format="pyarrow")


def _boiler_void24(g, h1, h2) -> np.ndarray:
    """Pack aligned (g, h1, h2) int64 arrays as contiguous 24-byte voids
    for sorted-array membership probes (stages/hashset.py doctrine: zero
    per-task hash builds, np.searchsorted only)."""
    hv = np.empty((len(g), 3), dtype=np.int64)
    hv[:, 0] = g
    hv[:, 1] = h1
    hv[:, 2] = h2
    return np.ascontiguousarray(hv).view(np.dtype((np.void, 24))).ravel()


def host_boilerplate(
    docs_ds,
    sep: str = "\n\n",
    text_col: str = "text",
    group_col: str = "source",
    min_docs: int = 2,
    frac_num: int = 1,
    frac_den: int = 2,
    strategy: str = "broadcast",
):
    """(doc_id, clean_text, n_kept, n_dropped): GROUP-scoped boilerplate
    removal — a paragraph is dropped from EVERY document of a group (host /
    source / domain) when it appears in >= ``min_docs`` documents of that
    group and in >= ``frac_num/frac_den`` of the group's documents. The
    per-domain frequency filter of CCNet/RefinedWeb-class pipelines
    (site-wide headers, footers, cookie banners, navigation repeated on
    most pages of a host vanish from ALL copies — unlike
    ``dedup_paragraphs``, which keeps the corpus-wide first occurrence).

    Scale shape: paragraph TEXT never enters an exchange — per-batch
    partials count DISTINCT (doc, paragraph) pairs per (group-hash, 128-bit
    paragraph hash), one narrow combine sums them, and a tiny docs-per-group
    combine provides the threshold denominator. The drop set (proportional
    to boilerplate templates, not the corpus) broadcasts as a sorted
    24-byte-void array (loud BOILER_BROADCAST_LIMIT); ``strategy='join'``
    keeps it a Dataset and resolves drops through the shared
    ``_rebuild_from_drop_keys`` keyed-join tail instead — output-identical
    (tested). Thresholding uses integer cross-multiplication
    (c * frac_den >= frac_num * n), exact on both the Ray and SQL sides.

    Reference analog: the engine's own scale contract (no reference file) —
    the operator family is /root/reference-independent training-data
    curation; see dedup_paragraphs for the corpus-wide variant."""
    import ray as _ray

    drops = _boiler_drops_ds(
        docs_ds, sep, text_col, group_col, min_docs, frac_num, frac_den
    )
    narrow = docs_ds.select_columns(["doc_id", text_col, group_col])

    if strategy == "join":
        from shaclapi_ray.stages.joins import drop_empty_blocks
        from shaclapi_ray.stages.referential import clamp_partitions

        drops_nb = drop_empty_blocks(drops)

        def keep_all(batch: pa.Table) -> pa.Table:
            df = _split_paras(batch, sep, text_col)
            return _para_reassemble(df, np.ones(df.height, dtype=bool), sep)

        if drops_nb is None:
            return narrow.map_batches(
                keep_all, batch_format="pyarrow", zero_copy_batch=True
            )

        def occurrences(batch: pa.Table) -> pa.Table:
            df = _split_paras_grouped(batch, sep, text_col, group_col)
            return pa.table(
                {
                    "g": pa.array(df["g"].to_numpy().view(np.int64)),
                    "h1": pa.array(df["h1"].to_numpy().view(np.int64)),
                    "h2": pa.array(df["h2"].to_numpy().view(np.int64)),
                    "key": pa.array(df["key"].to_numpy(), type=pa.int64()),
                }
            )

        occ = drop_empty_blocks(
            narrow.map_batches(
                occurrences, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        hits = (
            occ.join(
                drops_nb,
                join_type="inner",
                num_partitions=clamp_partitions(None),
                on=("g", "h1", "h2"),
            )
            if occ is not None
            else None
        )
        return _rebuild_from_drop_keys(docs_ds, hits, sep, text_col)
    if strategy != "broadcast":
        raise ValueError(f"unknown host_boilerplate strategy {strategy!r}")

    tables = [t for t in (_ray.get(r) for r in drops.to_arrow_refs()) if t.num_rows]
    if tables:
        dt = pa.concat_tables(tables)
        if dt.num_rows > BOILER_BROADCAST_LIMIT:
            raise ValueError(
                f"host_boilerplate drop set has {dt.num_rows} entries "
                f"(> {BOILER_BROADCAST_LIMIT}); pass strategy='join' to "
                "resolve drops with a hash-partitioned join at this scale"
            )
        voids = _boiler_void24(
            dt["g"].combine_chunks().to_numpy(),
            dt["h1"].combine_chunks().to_numpy(),
            dt["h2"].combine_chunks().to_numpy(),
        )
        lookup = np.sort(voids)
    else:
        lookup = np.empty(0, dtype=np.dtype((np.void, 24)))
    lookup_ref = _ray.put(lookup)

    def rebuild(batch: pa.Table) -> pa.Table:
        sorted_d = _ray.get(lookup_ref)
        df = _split_paras_grouped(batch, sep, text_col, group_col)
        if sorted_d.size:
            voids = _boiler_void24(
                df["g"].to_numpy().view(np.int64),
                df["h1"].to_numpy().view(np.int64),
                df["h2"].to_numpy().view(np.int64),
            )
            pos = np.minimum(np.searchsorted(sorted_d, voids), sorted_d.size - 1)
            keep = sorted_d[pos] != voids
        else:
            keep = np.ones(df.height, dtype=bool)
        return _para_reassemble(df, keep, sep)

    return narrow.map_batches(rebuild, batch_format="pyarrow", zero_copy_batch=True)


def host_boilerplate_sql(
    sep: str = "\n\n",
    min_docs: int = 2,
    frac_num: int = 1,
    frac_den: int = 2,
    src: str = "documents",
    group_col: str = "source",
    cols: tuple[str, str, str] = ("clean_text", "n_kept", "n_dropped"),
) -> str:
    """DuckDB oracle for host_boilerplate (same integer threshold rule;
    ``cols`` renames the output columns so the slot union can carry this
    next to dedup_paragraphs' identically-named outputs)."""
    sep_sql = "||".join(f"chr({ord(c)})" for c in sep)
    c_text, c_kept, c_drop = cols
    return f"""
WITH parts AS (
  SELECT doc_id, COALESCE({group_col}, '') AS g,
         string_split(COALESCE(text, ''), {sep_sql}) AS ps
  FROM {src}
), p AS (
  SELECT doc_id, g, unnest(ps) AS para,
         unnest(generate_series(0, len(ps) - 1)) AS idx
  FROM parts
), gsz AS (
  SELECT g, COUNT(*) AS n FROM parts GROUP BY g
), cnt AS (
  SELECT g, para, COUNT(DISTINCT doc_id) AS c FROM p GROUP BY g, para
), dr AS (
  SELECT cnt.g, cnt.para FROM cnt JOIN gsz USING (g)
  WHERE c >= {min_docs} AND c * {frac_den} >= {frac_num} * n
), k AS (
  SELECT p.doc_id, p.idx, p.para, (dr.para IS NULL) AS keep
  FROM p LEFT JOIN dr ON p.g = dr.g AND p.para = dr.para
)
SELECT doc_id,
       COALESCE(string_agg(para, {sep_sql} ORDER BY idx) FILTER (WHERE keep), '') AS {c_text},
       COUNT(*) FILTER (WHERE keep) AS {c_kept},
       COUNT(*) FILTER (WHERE NOT keep) AS {c_drop}
FROM k GROUP BY doc_id ORDER BY doc_id
"""


DROPSET_BROADCAST_LIMIT = 50_000_000  # sorted int64 ids, 8 B each => <=400 MB


def exact_drop_ds(docs_ds, text_col: str = "text"):
    """The exact-dedup DROP set as a Dataset[(doc_id)] — ids of every
    non-canonical row (same 128-bit content key and min-doc_id-wins rule
    as exact_dedup), or None when the corpus has no duplicates at all.
    Proportional to the number of DUPLICATES, not the corpus. Exposed so
    preprocess_corpus can build this and the paragraph winner set from
    ONE shared boundary materialization."""
    import polars as pl

    def add_hash(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(
            batch[text_col].combine_chunks()
            if isinstance(batch[text_col], pa.ChunkedArray)
            else batch[text_col]
        ).fill_null("")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h1": pa.array(s.hash(seed=17).to_numpy().view(np.int64)),
                "h2": pa.array(s.hash(seed=23).to_numpy().view(np.int64)),
            }
        )

    hashed = docs_ds.map_batches(
        add_hash, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def group_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["h1", "h2"]).aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        )
        return pa.table(
            {
                "h1": g["h1"],
                "h2": g["h2"],
                "keep_id": pc.cast(g["doc_id_min"], pa.int64()),
                "n_dups": pc.cast(g["doc_id_count"], pa.int64()),
            }
        )

    from shaclapi_ray.stages.aggregates import combine_partials_multi

    agg = combine_partials_multi(
        hashed.map_batches(
            group_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["h1", "h2"],
        {"keep_id": "min", "n_dups": "sum"},
    )
    dup_groups = agg.filter(
        expr="n_dups > 1"
    )  # small: only groups that actually have duplicates
    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

    dup_nb = drop_empty_blocks(dup_groups)
    if dup_nb is None:
        return None  # no duplicates at all
    hashed_nb = drop_empty_blocks(hashed)
    members = hashed_nb.join(
        dup_nb,
        join_type="inner",
        num_partitions=clamp_partitions(None),
        on=("h1", "h2"),
    )
    return members.filter(expr="doc_id != keep_id").select_columns(["doc_id"])


def collect_sorted_drop_ids(drops) -> np.ndarray:
    """Materialize a drops Dataset to the sorted int64 id array the
    broadcast filter probes (np.searchsorted). Loud ValueError above
    DROPSET_BROADCAST_LIMIT — the anti-join path is the at-scale form."""
    import ray

    drops = drops.materialize()
    n_drops = drops.count()
    if n_drops > DROPSET_BROADCAST_LIMIT:
        raise ValueError(
            f"drop set has {n_drops} ids (> {DROPSET_BROADCAST_LIMIT}); use "
            "the hash-partitioned anti-join path (dedup_corpus handles this "
            "automatically; preprocess_corpus: pass dedup_strategy='join')"
        )
    if n_drops == 0:
        return np.empty(0, dtype=np.int64)
    return np.sort(
        np.concatenate(
            [
                t["doc_id"].to_numpy(zero_copy_only=False)
                for r in drops.to_arrow_refs()
                if (t := ray.get(r)).num_rows
            ]
        )
    )


def dedup_corpus(
    docs_ds,
    strategy: str = "exact",
    text_col: str = "text",
    emb_ds=None,
    semantic_k: int = 8,
    semantic_tau: float = 0.9,
):
    """The deduplicated documents table itself: every input column, one
    surviving row (min doc_id) per duplicate group.

    ``strategy``: 'exact' (byte-identical ``text_col``), 'minhash'
    (near-duplicate clusters via minhash_lsh_clusters), or 'semantic'
    (SemDeDup: embedding k-means + per-cluster cosine components;
    ``semantic_k``/``semantic_tau`` size it, ``emb_ds`` supplies
    precomputed (doc_id, embedding) rows).

    Scale shape: the DROP set (ids of non-canonical rows) is proportional
    to the number of DUPLICATES, not the corpus — for exact dedup it is
    derived by joining the narrow (h1, h2, doc_id) table against only the
    groups with n_dups > 1; the final filter broadcasts the drop ids as
    ONE sorted int64 array (ray.put once, np.searchsorted per batch, zero
    per-task build) below DROPSET_BROADCAST_LIMIT and falls back to a
    hash-partitioned anti-join above it. The wide documents table is
    never shuffled on the broadcast path."""
    import ray
    import ray.data

    if strategy == "exact":
        drops = exact_drop_ds(docs_ds, text_col)
        if drops is None:
            return docs_ds  # no duplicates at all
    elif strategy == "minhash":
        clusters = minhash_lsh_clusters(docs_ds)
        drops = clusters.filter(expr="doc_id != cluster_id").select_columns(
            ["doc_id"]
        )
    elif strategy == "semantic":
        # SemDeDup (pipelines/cluster.py): embed -> k-means partition ->
        # per-cluster cosine components; drop every member whose
        # component has a smaller-id representative. Embeddings are
        # materialized once (dim*4 bytes/doc — 2-3 orders narrower than
        # the text column) so the k-means iterations don't re-run the
        # embedder; at persistent-corpus scale pass precomputed
        # embeddings via ``emb_ds`` instead.
        from shaclapi_ray.pipelines.cluster import semantic_dedup
        from shaclapi_ray.pipelines.knn import embed_corpus

        emb = emb_ds if emb_ds is not None else embed_corpus(docs_ds).materialize()
        sem = semantic_dedup(
            emb, k=semantic_k, tau=semantic_tau, id_col="doc_id"
        )
        drops = sem.filter(expr="doc_id != rep_id").select_columns(["doc_id"])
    else:
        raise ValueError(f"unknown dedup_corpus strategy {strategy!r}")

    drops = drops.materialize()
    n_drops = drops.count()
    if n_drops == 0:
        return docs_ds
    if n_drops <= DROPSET_BROADCAST_LIMIT:
        drop_ids = np.sort(
            np.concatenate(
                [
                    t["doc_id"].to_numpy(zero_copy_only=False)
                    for r in drops.to_arrow_refs()
                    if (t := ray.get(r)).num_rows
                ]
            )
        )
        drop_ref = ray.put(drop_ids)

        def keep(batch: pa.Table) -> pa.Table:
            d = ray.get(drop_ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(d, ids)
            hit = (pos < d.size) & (d[np.clip(pos, 0, max(0, d.size - 1))] == ids)
            return batch.filter(pa.array(~hit))

        return docs_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

    # drop set too large to broadcast: exact hash-partitioned anti-join
    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

    marked = drops.map_batches(
        lambda t: pa.table(
            {
                "j_doc_id": t["doc_id"],
                "__drop": pa.array(np.ones(t.num_rows, dtype=np.int8())),
            }
        ),
        batch_format="pyarrow",
    )
    joined = drop_empty_blocks(docs_ds).join(
        drop_empty_blocks(marked),
        join_type="left_outer",
        num_partitions=clamp_partitions(None),
        on=("doc_id",),
        right_on=("j_doc_id",),
    )
    cols = [c for c in docs_ds.schema().names]
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t["__drop"])).select(cols),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

SHINGLE_BASE = np.uint64(1000003)


class MinHasher:
    """Actor-pool stage: byte-k-shingle minhash signatures, banded.

    Emits (band_id, band_hash, doc_id) rows — the LSH explode step.
    Fully vectorized AND zero-copy: the Arrow string column's value
    buffer is used directly as the concatenated byte stream (its offsets
    buffer gives the doc boundaries; boundary-crossing windows are masked
    arithmetically), k-byte sliding windows are hashed with a
    single polynomial-matmul pass, universal-hash permutations are
    applied per-perm with np.minimum.reduceat over doc boundaries, and
    band mixing is one reshape-multiply-sum. No per-doc or per-shingle
    Python loops. Permutation parameters derive deterministically from a
    seed in __init__ (once per actor).

    Note minhash over the shingle MULTISET equals minhash over the set
    (duplicates cannot change a minimum), so no per-doc dedup is needed.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        self.powers = SHINGLE_BASE ** np.arange(k, dtype=np.uint64)
        # band mixing weights (deterministic)
        self.band_w = rng.integers(1, MERSENNE, size=self.rows_per_band, dtype=np.uint64)

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                "band_id": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        doc_ids_in = (
            batch["doc_id"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        n = len(doc_ids_in)
        if n == 0:
            return self._empty()
        # ZERO-COPY: the Arrow string column's value buffer IS the
        # concatenated utf-8 bytes and its offsets buffer IS the per-doc
        # boundaries — no per-doc encode()/join() Python loop. Windows
        # that would cross a doc boundary are masked out arithmetically
        # (start s crosses interior boundary b iff b-k < s < b), which
        # yields exactly the same valid-window set (hence identical
        # signatures) as the old 0xFF-separator construction.
        txt = pc.fill_null(batch["text"].combine_chunks(), "")
        odt = np.int64 if pa.types.is_large_string(txt.type) else np.int32
        vbuf = txt.buffers()[2]
        if vbuf is None:
            return self._empty()
        off = np.frombuffer(txt.buffers()[1], dtype=odt)[
            txt.offset : txt.offset + n + 1
        ].astype(np.int64, copy=False)
        data = np.frombuffer(vbuf, dtype=np.uint8)[off[0] : off[-1]]
        starts = off[:-1] - off[0]  # doc start offsets inside `data`
        if data.size < k:
            return self._empty()
        win = np.lib.stride_tricks.sliding_window_view(data, k)
        nwin = data.size - k + 1
        delta = np.zeros(nwin + 1, dtype=np.int64)
        interior = starts[1:]  # doc boundaries after the first doc
        lo = np.maximum(interior - (k - 1), 0)
        hi = np.minimum(interior, nwin)
        np.add.at(delta, lo, 1)
        np.add.at(delta, hi, -1)
        valid = np.cumsum(delta[:-1]) == 0
        if not valid.any():
            return self._empty()
        base = (win[valid].astype(np.uint64) * self.powers[None, :]).sum(axis=1)
        win_start = np.flatnonzero(valid)
        rows = np.searchsorted(starts, win_start, side="right") - 1
        # per-doc contiguous runs -> reduceat offsets
        run_starts = np.flatnonzero(np.diff(rows, prepend=-1))
        kept_rows = rows[run_starts]
        kept_docs = doc_ids_in[kept_rows]
        n_docs = kept_docs.size
        sig = np.empty((n_docs, self.num_perm), dtype=np.uint64)
        for p in range(self.num_perm):
            vals = (self.a[p] * base + self.b[p]) % MERSENNE
            sig[:, p] = np.minimum.reduceat(vals, run_starts)
        mixed = (
            sig.reshape(n_docs, self.bands, self.rows_per_band)
            * self.band_w[None, None, :]
        ).sum(axis=2, dtype=np.uint64)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n_docs)
        band_hashes = mixed.reshape(-1).view(np.int64)
        out_docs = np.repeat(kept_docs, self.bands)
        return pa.table(
            {
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.int64()),
                "doc_id": pa.array(out_docs, type=pa.int64()),
            }
        )


DRIVER_PAIR_LIMIT = 2_000_000  # candidate edges; above this, distributed labels


COARSE_GROUP_MASK = 0x3F  # 64 coarse hash groups per band on the shuffle path


def _bucket_pairs_table(t: pa.Table) -> pa.Table:
    """Vectorized (a, b) star edges from (band_id, band_hash, doc_id)
    rows: within every (band_id, band_hash) bucket, a = min doc_id, b =
    each other member. One polars sort + numpy run detection — no
    per-bucket Python, so a 65k-tiny-bucket input costs one kernel pass,
    not 65k lambda calls."""
    import polars as pl

    df = (
        pl.from_arrow(t)
        .unique(subset=["band_id", "band_hash", "doc_id"])
        .sort(["band_id", "band_hash", "doc_id"])
    )
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if df.height < 2:
        return empty
    bid = df["band_id"].to_numpy().astype(np.int64, copy=False)
    h = df["band_hash"].to_numpy().astype(np.int64, copy=False)
    d = df["doc_id"].to_numpy().astype(np.int64, copy=False)
    new_run = np.r_[True, (h[1:] != h[:-1]) | (bid[1:] != bid[:-1])]
    run_id = np.cumsum(new_run) - 1
    roots = d[np.flatnonzero(new_run)][run_id]
    mask = d != roots
    if not mask.any():
        return empty
    return pa.table(
        {
            "a": pa.array(roots[mask], type=pa.int64()),
            "b": pa.array(d[mask], type=pa.int64()),
        }
    )


def _candidate_pairs(sigs_m):
    """(a, b) candidate edges from LSH buckets (a = bucket min id).

    Below DRIVER_MERGE_LIMIT band rows the pairing runs on the driver as
    ONE vectorized _bucket_pairs_table call over pre-merged blocks and
    returns a pandas DataFrame. Above it, a keyed Ray shuffle groupby on
    a coarse (band_id, band_hash & MASK) key — buckets stay intact inside
    each coarse group, vectorized within — and the edges are returned AS
    A DATASET so the driver never holds the full edge set exactly when it
    outgrew the driver limit."""
    import pandas as pd
    import ray as _ray

    from shaclapi_ray.stages.aggregates import DRIVER_MERGE_LIMIT

    if sigs_m.count() <= DRIVER_MERGE_LIMIT:
        sig_tables = [t for t in (_ray.get(r) for r in sigs_m.to_arrow_refs()) if t.num_rows]
        if not sig_tables:
            return pd.DataFrame({"a": [], "b": []}, dtype="int64")
        return _bucket_pairs_table(pa.concat_tables(sig_tables)).to_pandas()

    def add_grp(t: pa.Table) -> pa.Table:
        g = (
            t["band_hash"].combine_chunks().to_numpy(zero_copy_only=False)
            & COARSE_GROUP_MASK
        )
        return t.append_column("grp", pa.array(g, type=pa.int64()))

    return (
        sigs_m.map_batches(add_grp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band_id", "grp"])
        .map_groups(_bucket_pairs_table, batch_format="pyarrow")
    )


def _union_find_labels(pair_rows) -> dict[int, int]:
    """Driver union-find over candidate edges -> {node: min-id label}."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pair_rows["a"].tolist(), pair_rows["b"].tolist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {d: find(d) for d in list(parent)}


def label_propagation(edges_ds, num_partitions: int = 16, max_rounds: int = 50):
    """Distributed connected components by iterative min-label
    propagation: label(v) <- min(label(v), min of neighbors' labels),
    repeated to fixed point. Labels only decrease, so convergence is
    detected when sum(labels) stops changing; rounds ~= cluster diameter
    (LSH dup clusters are shallow). Each round = one hash join + one
    groupby over narrow (node, label) tables — never a driver-side
    structure proportional to the corpus.

    edges_ds: Dataset[(a: int64, b: int64)]. Returns Dataset[(node,
    label)] for every node appearing in an edge."""
    import ray.data as _rd

    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

    num_partitions = clamp_partitions(num_partitions)

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        )

    edges = edges_ds.map_batches(both_dirs, batch_format="pyarrow")
    edges = drop_empty_blocks(edges)
    if edges is None:
        return _rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        )

    labels = (
        edges.map_batches(
            lambda t: pa.table({"node": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    prev_sum = None
    for _ in range(max_rounds):
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        lbl = labels.map_batches(
            lambda t: pa.table({"j_node": t["node"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        lbl = drop_empty_blocks(lbl)
        msgs = edges.join(
            lbl,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("j_node",),
        ).map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
    return labels


def minhash_lsh_clusters(
    docs_ds,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    concurrency=None,
    labeling: str = "auto",
):
    """(doc_id, cluster_id): near-duplicate clusters via banded MinHash-LSH.

    cluster_id = min doc_id of the connected component over candidate
    pairs. ``labeling``: 'driver' = union-find on collected pairs (right
    while candidate edges << corpus); 'distributed' = min-label
    propagation over edge Datasets (the 100-TB path — nothing
    corpus-proportional ever lives on the driver); 'auto' picks by edge
    count (DRIVER_PAIR_LIMIT). Final assignment broadcasts a
    (sorted_ids, labels) numpy pair via ray.put — zero per-task setup,
    16 B per clustered doc."""
    import ray as _ray

    # MinHasher's state is a few KB of seed-derived numpy arrays, so the
    # default path ships ONE serialized instance to stateless tasks (no
    # actor-pool ramp-up — measured as seconds of dead time per run);
    # pass ``concurrency`` to force an actor pool
    if concurrency:
        sigs = docs_ds.map_batches(
            MinHasher,
            fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    else:
        sigs = docs_ds.map_batches(
            MinHasher(num_perm=num_perm, bands=bands, k=k),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    sigs_m = sigs.materialize()
    import pandas as _pd

    pair_rows = _candidate_pairs(sigs_m)  # pandas (small) or Dataset (large)
    pairs_is_ds = not isinstance(pair_rows, _pd.DataFrame)

    if labeling == "auto":
        n_pairs = pair_rows.count() if pairs_is_ds else len(pair_rows)
        labeling = "driver" if n_pairs <= DRIVER_PAIR_LIMIT else "distributed"

    if labeling == "driver":
        if pairs_is_ds:
            pair_rows = pair_rows.to_pandas()  # explicit driver opt-in only
        cluster_of = _union_find_labels(pair_rows)
        ids = np.fromiter(cluster_of.keys(), dtype=np.int64, count=len(cluster_of))
        lbls = np.fromiter(cluster_of.values(), dtype=np.int64, count=len(cluster_of))
        order = np.argsort(ids)
        sorted_ids, labels_arr = ids[order], lbls[order]
    elif labeling == "distributed":
        import ray.data as _rd

        if pairs_is_ds:
            edges = pair_rows  # already a Dataset: no pandas round-trip
        else:
            edges = _rd.from_pandas(pair_rows) if len(pair_rows) else None
        if edges is None:
            sorted_ids = np.zeros(0, dtype=np.int64)
            labels_arr = np.zeros(0, dtype=np.int64)
        else:
            labels_ds = label_propagation(edges)
            parts = [
                t
                for t in (_ray.get(r) for r in labels_ds.to_arrow_refs())
                if t.num_rows
            ]
            # labels table is O(#clustered docs), NOT O(corpus); collected
            # only to build the broadcast lookup pair
            if parts:
                tbl = pa.concat_tables(parts)
                ids = tbl["node"].combine_chunks().to_numpy()
                lbls = tbl["label"].combine_chunks().to_numpy()
                order = np.argsort(ids)
                sorted_ids, labels_arr = (
                    ids[order].astype(np.int64),
                    lbls[order].astype(np.int64),
                )
            else:
                sorted_ids = np.zeros(0, dtype=np.int64)
                labels_arr = np.zeros(0, dtype=np.int64)
    else:
        raise ValueError(f"unknown labeling {labeling!r}")

    lookup_ref = _ray.put((sorted_ids, labels_arr))

    def assign(batch: pa.Table) -> pa.Table:
        s_ids, s_lbls = _ray.get(lookup_ref)  # plasma-cached, zero-copy
        ids = (
            batch["doc_id"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        out = ids.copy()
        if s_ids.size:
            pos = np.searchsorted(s_ids, ids)
            pos = np.minimum(pos, s_ids.size - 1)
            hit = s_ids[pos] == ids
            out[hit] = s_lbls[pos[hit]]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "cluster_id": pa.array(out, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _md5_low64(tokens: pa.Array) -> np.ndarray:
    """uint64 md5-based token hash: upper 8 digest bytes, little-endian —
    exactly DuckDB's md5_number_lower(token), which is what makes the
    simhash SQL-oracle-able (and version-stable, unlike polars' hash).
    md5 is inherently per-value, so hash only the DISTINCT tokens of the
    batch (vocabulary-bounded, not token-count-bounded): Arrow
    dictionary_encode yields distinct values + inverse indices ~30×
    cheaper than np.unique over object strings, and the distinct values
    hash through DuckDB's C++ md5 (~9× over a hashlib loop at 1 thread;
    see stages/md5kernel.py)."""
    from shaclapi_ray.stages.md5kernel import md5_low64

    d = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    d = d.dictionary_encode()
    hu = md5_low64(d.dictionary)
    return hu[d.indices.to_numpy().astype(np.int64)]


class SimHasher:
    """64-bit simhash over whitespace tokens; bucket = top-``bucket_bits``
    prefix (default 16).

    Vectorized end-to-end: polars extract_all + explode produces the
    (row, token) table, tokens are hashed via _md5_low64 (distinct-only,
    = DuckDB md5_number_lower), and the per-doc ±1 bit accumulation is a
    numpy reduceat over doc runs.

    Scale note: pick ``bucket_bits`` so the EXPECTED bucket population
    stays small — the near-dup verify is O(size²) numpy work per bucket,
    and a 16-bit prefix caps the bucket count at 65k (fine to ~10M docs,
    catastrophic at billions). Wider prefixes trade recall (pairs whose
    differing bits fall inside the prefix are missed) for bucket size;
    rotate the prefix across multiple tables to buy the recall back."""

    def __init__(self, bucket_bits: int = 16):
        if not 1 <= bucket_bits <= 63:
            raise ValueError("bucket_bits must be in [1, 63]")
        self.bucket_bits = bucket_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        n = batch.num_rows
        doc_ids = batch["doc_id"]
        s = pl.from_arrow(
            batch["text"].combine_chunks()
            if isinstance(batch["text"], pa.ChunkedArray)
            else batch["text"]
        ).fill_null("")
        toks = (
            pl.DataFrame({"row": pl.int_range(len(s), eager=True), "t": s.str.extract_all(TOKEN_RE)})
            .explode("t")
            .drop_nulls()
        )
        sims = np.zeros(n, dtype=np.uint64)
        if len(toks):
            h = _md5_low64(toks["t"].to_arrow())
            rows = toks["row"].to_numpy()
            shifts = np.arange(64, dtype=np.uint64)
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
            signed = 2 * bits - 1  # (n_tokens, 64) of ±1
            run_starts = np.flatnonzero(np.diff(rows, prepend=-1))
            acc = np.add.reduceat(signed, run_starts, axis=0)  # (n_docs_with_tokens, 64)
            vals = (
                (acc > 0).astype(np.uint64) * (np.uint64(1) << shifts[None, :])
            ).sum(axis=1, dtype=np.uint64)
            sims[rows[run_starts]] = vals
        arr = pa.array(sims.view(np.int64), type=pa.int64())
        bb = self.bucket_bits
        bucket = pc.bit_wise_and(pc.shift_right(arr, 64 - bb), (1 << bb) - 1)
        return pa.table(
            {
                "doc_id": doc_ids,
                "simhash": arr,
                # int32 preserved at the default width (existing outputs);
                # wider prefixes need int64
                "bucket": pc.cast(bucket, pa.int32() if bb <= 31 else pa.int64()),
            }
        )


def simhash_signatures(docs_ds, concurrency=None, bucket_bits: int = 16):
    """SimHasher holds no real state (bucket_bits only), so the default
    path is STATELESS TASKS — elastic, no actor-pool ramp-up (measured:
    the (1,4) actor pool spent seconds starting actors for sub-second
    batch work). Pass ``concurrency`` to force an actor pool anyway."""
    if concurrency:
        return docs_ds.map_batches(
            SimHasher,
            fn_constructor_kwargs={"bucket_bits": bucket_bits},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    return docs_ds.map_batches(
        SimHasher(bucket_bits),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def simhash_neardup_pairs(
    docs_ds,
    max_hamming: int = 3,
    concurrency=None,
    bucket_bits: int = 16,
    coarse_bits: int = 8,
):
    """(a, b, hamming): near-duplicate candidate pairs by simhash —
    docs sharing a ``bucket_bits``-bit prefix whose full 64-bit
    signatures are within ``max_hamming`` bits. Size ``bucket_bits`` to
    the corpus (see SimHasher scale note): per-bucket verify is
    O(size²), so expected bucket population must stay small.

    Scale shape: signatures stream from simhash_signatures; the ONE
    shuffle groups the narrow (bucket, doc_id, simhash) rows by the
    top-``coarse_bits`` COARSE prefix (2^coarse_bits groups, not one
    group per bucket — thousands of near-empty per-group pandas frames
    are exactly the map_groups overhead the engine avoids elsewhere);
    inside a coarse group the full buckets are contiguous runs of a
    lexsort and each run verifies with one numpy XOR+popcount matrix.
    (Single-band prefix bucketing misses pairs whose differing bits fall
    in the prefix — the standard simhash recall/eff tradeoff; raise
    coverage by rotating the prefix like multi-table LSH if needed.)"""
    if not 1 <= coarse_bits <= min(bucket_bits, 31):
        raise ValueError("coarse_bits must be in [1, min(bucket_bits, 31)]")
    sub_shift = bucket_bits - coarse_bits

    def verify(group):
        import pandas as pd

        ids = group["doc_id"].to_numpy(dtype=np.int64)
        out = {"a": [], "b": [], "hamming": []}
        if len(ids) >= 2:
            sigs = group["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
            buckets = group["bucket"].to_numpy(dtype=np.int64)
            order = np.lexsort((ids, buckets))
            b_sorted = buckets[order]
            starts = np.flatnonzero(np.diff(b_sorted, prepend=-1))
            ends = np.append(starts[1:], len(b_sorted))
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                idx = order[s:e]
                g_ids, g_sigs = ids[idx], sigs[idx]
                x = g_sigs[:, None] ^ g_sigs[None, :]
                ham = np.zeros(x.shape, dtype=np.int64)
                for _ in range(8):  # byte-wise table popcount
                    ham += _POPCOUNT_TABLE[(x & np.uint64(0xFF)).astype(np.int64)]
                    x = x >> np.uint64(8)
                ai, bj = np.nonzero(ham <= max_hamming)
                keep = g_ids[ai] < g_ids[bj]
                out["a"].append(g_ids[ai][keep])
                out["b"].append(g_ids[bj][keep])
                out["hamming"].append(ham[ai, bj][keep])
        if not out["a"]:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}, dtype="int64")
        return pd.DataFrame(
            {k: np.concatenate(v) for k, v in out.items()}
        ).astype("int64")

    sigs = simhash_signatures(
        docs_ds, concurrency=concurrency, bucket_bits=bucket_bits
    )
    coarse = sigs.map_batches(
        lambda t: t.append_column(
            "ck", pc.cast(pc.shift_right(t["bucket"], sub_shift), pa.int32())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = coarse.groupby("ck").map_groups(verify, batch_format="pandas")
    out = pairs.map_batches(
        lambda t: pa.table(
            {
                "a": pc.cast(t["a"], pa.int64()),
                "b": pc.cast(t["b"], pa.int64()),
                "hamming": pc.cast(t["hamming"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    from shaclapi_ray.stages.joins import drop_empty_blocks

    out_nb = drop_empty_blocks(out)
    if out_nb is None:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )
    return out_nb


_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def _shingle_set(text: str, k: int) -> set:
    return {text[i : i + k] for i in range(max(0, len(text) - k + 1))}


def _kgram_void_set(text: str, k: int) -> np.ndarray:
    """Sorted unique char-k-grams of one text as a void array of k uint32
    codepoints — EXACT set semantics (no hashing, so no collision risk
    against the SQL oracle), one vectorized window pass per text."""
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    vt = np.dtype((np.void, 4 * k))
    if cp.size < k:
        return np.empty(0, dtype=vt)
    win = np.lib.stride_tricks.sliding_window_view(cp, k)
    return np.unique(np.ascontiguousarray(win).view(vt).ravel())


def _kgram_sets_batch(
    ids: np.ndarray, txts_obj: np.ndarray, k: int
) -> dict[int, np.ndarray]:
    """One sorted exact k-gram void set per unique doc, built for the
    WHOLE batch in one vectorized pass: every text lands in a single
    numpy UTF-32 matrix (one C conversion), windows + boundary masking +
    the per-doc dedupe all run as global array ops (one np.unique + one
    lexsort) — no per-doc encode/window/unique calls. Same exact
    codepoint-set semantics as _kgram_void_set (property-tested equal)."""
    vt = np.dtype((np.void, 4 * k))
    n = len(ids)
    if n == 0:
        return {}
    lens = np.fromiter(
        (len(t) if t is not None else 0 for t in txts_obj), dtype=np.int64, count=n
    )
    u = np.array(
        ["" if t is None else t for t in txts_obj], dtype=np.str_
    )
    width = u.dtype.itemsize // 4
    empty = np.empty(0, dtype=vt)
    if width < k:
        return {int(i): empty for i in ids}
    cp = u.view(np.uint32).reshape(n, width)
    win = np.lib.stride_tricks.sliding_window_view(cp, k, axis=1)
    voids = np.ascontiguousarray(win).view(vt).reshape(n, width - k + 1)
    valid = np.arange(width - k + 1)[None, :] < np.maximum(lens - k + 1, 0)[:, None]
    rows, cols = np.nonzero(valid)
    if rows.size == 0:
        return {int(i): empty for i in ids}
    flat = voids[rows, cols]
    uniq_vals, inv = np.unique(flat, return_inverse=True)
    order = np.lexsort((inv, rows))
    r, v = rows[order], inv[order]
    keep = np.ones(r.size, dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
    r, v = r[keep], v[keep]
    starts = np.searchsorted(r, np.arange(n))
    ends = np.searchsorted(r, np.arange(n) + 1)
    # inv ascending within a row => uniq_vals[v] ascending (np.unique
    # returns sorted values), so each slice is intersect1d-ready
    return {int(ids[i]): uniq_vals[v[starts[i] : ends[i]]] for i in range(n)}


def ngram_jaccard_pairs(docs_ds, k: int = 5, threshold: float = 0.5, **lsh_kwargs):
    """(a, b, inter_size, union_size): exact char-k-gram Jaccard for every
    LSH candidate pair with Jaccard >= threshold. Integer set sizes keep
    the output engine-exact (the DuckDB oracle computes the same sets).

    Returns a Dataset (lazily chainable, like every sibling operator).

    Scale path: candidate pairs come from LSH clusters (pairs << corpus);
    the texts of CANDIDATE docs only are pulled through two keyed
    Dataset.joins (a-side, b-side) — the full corpus is never collected
    and no driver-side text dict exists. The verify builds ONE exact
    k-gram set per unique doc in a batch (numpy codepoint windows) and
    intersects sorted arrays per pair at C speed."""
    import ray as _ray
    import ray.data as _rd

    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

    empty = pa.table(
        {
            c: pa.array([], type=pa.int64())
            for c in ("a", "b", "inter_size", "union_size")
        }
    )

    clusters = minhash_lsh_clusters(docs_ds, k=k, **lsh_kwargs)

    def cluster_pairs(group):
        import pandas as pd

        ids = sorted(int(v) for v in group["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}, dtype="int64")
        rows_a, rows_b = [], []
        for i, x in enumerate(ids):
            rows_a.extend([x] * (len(ids) - 1 - i))
            rows_b.extend(ids[i + 1 :])
        return pd.DataFrame({"a": rows_a, "b": rows_b}, dtype="int64")

    pairs = clusters.groupby("cluster_id").map_groups(
        cluster_pairs, batch_format="pandas"
    )
    pairs = drop_empty_blocks(pairs)
    if pairs is None:
        return _rd.from_arrow(empty)

    # semi-filter texts to candidate doc ids (broadcast sorted id array —
    # candidates << corpus) before the joins
    id_tables = [t for t in (_ray.get(r) for r in pairs.to_arrow_refs()) if t.num_rows]
    cand_ids = np.unique(
        np.concatenate(
            [t["a"].combine_chunks().to_numpy() for t in id_tables]
            + [t["b"].combine_chunks().to_numpy() for t in id_tables]
        )
    )
    ids_ref = _ray.put(cand_ids)

    def pick_texts(batch: pa.Table) -> pa.Table:
        cids = _ray.get(ids_ref)
        ids = (
            batch["doc_id"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        pos = np.searchsorted(cids, ids)
        pos = np.minimum(pos, max(cids.size - 1, 0))
        hit = cids[pos] == ids if cids.size else np.zeros(len(ids), dtype=bool)
        return pa.table(
            {
                "doc_id": pa.array(ids[hit], type=pa.int64()),
                "text": pc.take(batch["text"], pa.array(np.flatnonzero(hit))),
            }
        )

    texts = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        pick_texts, batch_format="pyarrow", zero_copy_batch=True
    )
    texts = drop_empty_blocks(texts)
    if texts is None:
        return _rd.from_arrow(empty)
    np_ = clamp_partitions(16)
    ta = texts.map_batches(
        lambda t: pa.table({"a_id": t["doc_id"], "text_a": t["text"]}),
        batch_format="pyarrow",
    )
    tb = texts.map_batches(
        lambda t: pa.table({"b_id": t["doc_id"], "text_b": t["text"]}),
        batch_format="pyarrow",
    )
    joined = pairs.join(
        drop_empty_blocks(ta), join_type="inner", num_partitions=np_, on=("a",), right_on=("a_id",)
    )
    joined = joined.join(
        drop_empty_blocks(tb), join_type="inner", num_partitions=np_, on=("b",), right_on=("b_id",)
    )

    def verify(batch: pa.Table) -> pa.Table:
        # one exact k-gram set per UNIQUE doc in the batch (texts repeat
        # across pairs), then a C-speed sorted intersection per pair —
        # no Python set building in the pair loop
        a_ids = batch["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b_ids = batch["b"].combine_chunks().to_numpy(zero_copy_only=False)
        ids_all = np.concatenate([a_ids, b_ids])
        texts_all = pa.concat_arrays(
            [
                batch["text_a"].combine_chunks(),
                batch["text_b"].combine_chunks(),
            ]
        )
        uniq_ids, first_idx = np.unique(ids_all, return_index=True)
        txts_obj = texts_all.take(pa.array(first_idx)).to_numpy(
            zero_copy_only=False
        )
        sets = _kgram_sets_batch(uniq_ids, txts_obj, k)
        n = len(a_ids)
        av = np.empty(n, dtype=np.int64)
        bv = np.empty(n, dtype=np.int64)
        iv = np.empty(n, dtype=np.int64)
        uv = np.empty(n, dtype=np.int64)
        m = 0
        for i in range(n):
            sa, sb = sets[int(a_ids[i])], sets[int(b_ids[i])]
            if not sa.size or not sb.size:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            if inter >= threshold * union:
                av[m], bv[m], iv[m], uv[m] = a_ids[i], b_ids[i], inter, union
                m += 1
        return pa.table(
            {
                "a": pa.array(av[:m], type=pa.int64()),
                "b": pa.array(bv[:m], type=pa.int64()),
                "inter_size": pa.array(iv[:m], type=pa.int64()),
                "union_size": pa.array(uv[:m], type=pa.int64()),
            }
        )

    out = joined.map_batches(verify, batch_format="pyarrow")
    out_nb = drop_empty_blocks(out)
    if out_nb is None:
        return _rd.from_arrow(empty)
    return out_nb


# ---------------------------------------------------------------------------
# Embedding near-dup / cosine
# ---------------------------------------------------------------------------


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


def embedding_neardup_pairs(
    emb_ds, tau: float = 0.95, method: str = "bruteforce", concurrency=(1, 4),
    n_planes: int = 12, n_tables: int = 6, seed: int = 11,
):
    """(a, b): pairs with cosine similarity >= tau.

    method='bruteforce': EXACT all-pairs baseline as a cartesian product
    of block pairs — each Ray task loads two blocks (zero-copy refs) and
    emits the qualifying pairs; the driver only fans out refs and never
    holds the matrix. O(N^2) compute by nature: the documented
    small/medium-N oracle, not the 100-TB path.

    method='lsh': the scale path — multi-table random-hyperplane LSH.
    Only NARROW (tbl, bucket, vec_id) rows enter the bucket exchange;
    candidate pairs are deduplicated across tables FIRST, and vectors
    rejoin the surviving candidates via two keyed joins, so vector bytes
    through any all-to-all are proportional to candidate pairs, never
    n_tables x corpus. Recall controlled by (n_planes, n_tables); misses
    across buckets possible.
    """
    import ray as _ray

    from shaclapi_ray.pipelines.knn import _ids as _idvec
    from shaclapi_ray.pipelines.knn import _to_matrix as _emb_matrix

    if method == "bruteforce":
        refs = [
            r
            for r in emb_ds.map_batches(
                lambda t: pa.table({"vec_id": t["vec_id"], "embedding": t["embedding"]}),
                batch_format="pyarrow",
            ).to_arrow_refs()
        ]

        @_ray.remote
        def block_pair(left_ref, right_ref, same: bool):
            lt, rt = left_ref, right_ref
            lids = _idvec(lt["vec_id"])
            rids = _idvec(rt["vec_id"])
            if not len(lids) or not len(rids):
                return pa.table(
                    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
                )
            lm = _norm_rows(_emb_matrix(lt["embedding"]))
            rm = _norm_rows(_emb_matrix(rt["embedding"]))
            sims = lm @ rm.T
            ai, bj = np.nonzero(sims >= tau)
            a, b = lids[ai], rids[bj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            keep = lo < hi  # drop self-pairs; order canonically
            if same:
                keep &= a < b  # avoid double emit within the same block pair
            return pa.table(
                {
                    "a": pa.array(lo[keep], type=pa.int64()),
                    "b": pa.array(hi[keep], type=pa.int64()),
                }
            )

        tasks = []
        for i in range(len(refs)):
            for j in range(i, len(refs)):
                tasks.append(block_pair.remote(refs[i], refs[j], i == j))
        import ray.data as _rd

        if not tasks:
            return _rd.from_arrow(
                pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
            )
        return _rd.from_arrow_refs(tasks)

    if method == "lsh":
        import ray.data as _rd

        from shaclapi_ray.stages.joins import drop_empty_blocks
        from shaclapi_ray.stages.referential import clamp_partitions

        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        rng = np.random.default_rng(seed)
        # plane tensors are broadcast once via ray.put — nothing big is
        # closure-captured
        dim_probe = emb_ds.take(1)
        dim = len(dim_probe[0]["embedding"]) if dim_probe else 0
        planes = rng.standard_normal((n_tables, dim, n_planes)) if dim else None
        planes_ref = _ray.put(planes)
        weights = 1 << np.arange(n_planes, dtype=np.int64)

        # Stage 1 — NARROW bucket assignment: the exchange carries only
        # (tbl, bucket, vec_id) int rows. All tables hash in ONE matmul.
        def bucketize(batch: pa.Table) -> pa.Table:
            pl_ = _ray.get(planes_ref)
            ids = _idvec(batch["vec_id"])
            n = len(ids)
            if pl_ is None or n == 0:
                return pa.table(
                    {
                        "tbl": pa.array([], pa.int32()),
                        "bucket": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                    }
                )
            embn = _norm_rows(_emb_matrix(batch["embedding"]))
            signs = (embn @ pl_.transpose(1, 0, 2).reshape(pl_.shape[1], -1)) > 0
            buckets = signs.reshape(n, n_tables, n_planes) @ weights  # (n, n_tables)
            return pa.table(
                {
                    "tbl": pa.array(np.tile(np.arange(n_tables, dtype=np.int32), n)),
                    "bucket": pa.array(buckets.reshape(-1), type=pa.int64()),
                    "vec_id": pa.array(np.repeat(ids, n_tables), type=pa.int64()),
                }
            )

        bucketed = emb_ds.map_batches(
            bucketize, batch_format="pyarrow", zero_copy_batch=True
        )

        def add_grp(t: pa.Table) -> pa.Table:
            g = (
                t["bucket"].combine_chunks().to_numpy(zero_copy_only=False)
                & COARSE_GROUP_MASK
            )
            return t.append_column("grp", pa.array(g, type=pa.int64()))

        # Stage 2 — all (a < b) pairs within each exact (tbl, bucket)
        # run, vectorized across a COARSE group (64 hash groups per
        # table) so 2^n_planes tiny buckets cost kernel passes, not
        # per-bucket Python calls.
        def bucket_all_pairs(t: pa.Table) -> pa.Table:
            import polars as pl

            df = (
                pl.from_arrow(t.select(["tbl", "bucket", "vec_id"]))
                .unique()
                .sort(["tbl", "bucket", "vec_id"])
            )
            if df.height < 2:
                return empty
            tb = df["tbl"].to_numpy().astype(np.int64, copy=False)
            bk = df["bucket"].to_numpy().astype(np.int64, copy=False)
            d = df["vec_id"].to_numpy().astype(np.int64, copy=False)
            new_run = np.r_[True, (bk[1:] != bk[:-1]) | (tb[1:] != tb[:-1])]
            run_start = np.flatnonzero(new_run)
            run_id = np.cumsum(new_run) - 1
            within = np.arange(d.size) - run_start[run_id]
            total = int(within.sum())
            if total == 0:
                return empty
            cum = np.cumsum(within)
            local = np.arange(total) - np.repeat(cum - within, within)
            a_idx = np.repeat(run_start[run_id], within) + local
            return pa.table(
                {
                    "a": pa.array(d[a_idx], type=pa.int64()),
                    "b": pa.array(np.repeat(d, within), type=pa.int64()),
                }
            )

        pairs = (
            bucketed.map_batches(add_grp, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["tbl", "grp"])
            .map_groups(bucket_all_pairs, batch_format="pyarrow")
        )
        # Stage 3 — dedup across tables BEFORE any vector moves (the old
        # path also re-verified a pair once per co-bucketed table).
        uniq = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
        cand = uniq.map_batches(
            lambda t: pa.table(
                {"a": pc.cast(t["a"], pa.int64()), "b": pc.cast(t["b"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        cand = drop_empty_blocks(cand)
        if cand is None:
            return _rd.from_arrow(empty)

        # Stage 4 — vectors rejoin the surviving candidates only (two
        # keyed joins, one vector copy per pair side), then an exact
        # row-wise cosine verify. Vectors ride the join as flat binary
        # rows (_pack_matrix) because Arrow's hash join rejects
        # list-typed payload columns.
        from shaclapi_ray.pipelines.knn import _pack_matrix, _unpack_matrix

        np_ = clamp_partitions(16)

        def _emb_side(id_name: str, emb_name: str):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        id_name: pc.cast(t["vec_id"], pa.int64()),
                        emb_name: _pack_matrix(_emb_matrix(t["embedding"])),
                    }
                )

            return fn

        ea = emb_ds.map_batches(_emb_side("a_id", "emb_a"), batch_format="pyarrow")
        eb = emb_ds.map_batches(_emb_side("b_id", "emb_b"), batch_format="pyarrow")
        joined = cand.join(
            drop_empty_blocks(ea),
            join_type="inner",
            num_partitions=np_,
            on=("a",),
            right_on=("a_id",),
        )
        joined = joined.join(
            drop_empty_blocks(eb),
            join_type="inner",
            num_partitions=np_,
            on=("b",),
            right_on=("b_id",),
        )

        def verify(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return empty
            ma = _norm_rows(_unpack_matrix(batch["emb_a"]))
            mb = _norm_rows(_unpack_matrix(batch["emb_b"]))
            keep = np.einsum("ij,ij->i", ma, mb) >= tau
            return pa.table(
                {
                    "a": pa.array(_idvec(batch["a"])[keep], type=pa.int64()),
                    "b": pa.array(_idvec(batch["b"])[keep], type=pa.int64()),
                }
            )

        out = joined.map_batches(verify, batch_format="pyarrow")
        out_nb = drop_empty_blocks(out)
        if out_nb is None:
            return _rd.from_arrow(empty)
        return out_nb

    raise ValueError(f"unknown method {method!r}")


def dedup_counts(survivors_ds):
    """Summary: total surviving docs + duplicate-group count."""
    return survivors_ds.groupby("n_dups").aggregate(Count(alias_name="groups"))


# ---------------------------------------------------------------------------
# incremental (cross-snapshot) dedup
# ---------------------------------------------------------------------------
#
# A recurring crawl pipeline dedups each NEW snapshot against everything
# already accepted into the corpus, without re-reading the old corpus's
# text: persist_dedup_state writes the accepted corpus's content-hash set
# once (bucket-partitioned parquet, 16 bytes/doc), dedup_incremental
# streams a new snapshot against it. State grows with the corpus but is
# hashes only — 100 TB of text at ~4 KB/doc is ~25G hashes = 400 GB of
# state vs the corpus's 100 TB.

STATE_BROADCAST_LIMIT = 50_000_000  # hashes; ~800 MB as one sorted array
STATE_MANIFEST = "_DEDUP_STATE_MANIFEST.json"
_MIX64 = np.uint64(0x9E3779B97F4A7C15)


def _content_hash_arrays(batch: pa.Table, text_col: str):
    """(h1, h2) int64 arrays — the same two polars 64-bit content hashes
    (128-bit combined) exact_dedup/dedup_corpus key on."""
    import polars as pl

    col = batch[text_col]
    s = pl.from_arrow(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    ).fill_null("")
    return (
        s.hash(seed=17).to_numpy().view(np.int64),
        s.hash(seed=23).to_numpy().view(np.int64),
    )


def persist_dedup_state(
    docs_ds, state_dir: str, text_col: str = "text", num_buckets: int = 256
) -> dict:
    """Write the corpus's content-hash set under state_dir as parquet
    partitioned by a bucket of h1's top bits (``num_buckets`` directories
    — the pruned-read / resume unit; 256 is right for a large corpus,
    drop to 8-16 for small ones where per-directory overhead dominates),
    plus a row-count manifest. Hashes are uniqued per batch; cross-batch
    duplicates may remain (membership semantics are unaffected;
    dedup_incremental's join path re-distincts exactly).
    Returns the manifest dict."""
    import json
    import os

    import polars as pl

    if num_buckets < 1 or num_buckets > 256:
        raise ValueError("num_buckets must be in [1, 256]")

    def to_hashes(batch: pa.Table) -> pa.Table:
        h1, h2 = _content_hash_arrays(batch, text_col)
        df = pl.DataFrame({"h1": h1, "h2": h2}).unique()
        u1 = df["h1"].to_numpy()
        bucket = (
            (u1.view(np.uint64) >> np.uint64(56)) % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "h1": pa.array(u1),
                "h2": pa.array(df["h2"].to_numpy()),
                "bucket": pa.array(bucket),
            }
        )

    hashes = docs_ds.map_batches(
        to_hashes, batch_format="pyarrow", zero_copy_batch=True
    )
    # A non-empty state_dir is either a previous corpus's state or crash
    # debris from an interrupted persist (manifest written LAST, so its
    # absence marks debris) — never mix old files into the new state.
    if os.path.isdir(state_dir) and os.listdir(state_dir):
        import shutil

        shutil.rmtree(state_dir)
    os.makedirs(state_dir, exist_ok=True)
    hashes.write_parquet(state_dir, partition_cols=["bucket"])
    # row count from the written footers (no second pipeline execution)
    import pyarrow.dataset as pads

    frag_rows = sum(
        f.count_rows() for f in pads.dataset(state_dir, format="parquet").get_fragments()
    )
    manifest = {
        "rows": int(frag_rows),
        "version": 1,
        "text_col": text_col,
        "num_buckets": int(num_buckets),
    }
    with open(os.path.join(state_dir, STATE_MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def extend_dedup_state(docs_ds, state_dir: str, text_col: str | None = None) -> dict:
    """Append a newly-ACCEPTED snapshot's content hashes to an existing
    state (the step after dedup_incremental admits its survivors): new
    parquet files land in the same bucket partitions (uniquely named —
    nothing is rewritten), and the manifest row count grows. The
    recurring-crawl loop is persist → filter new snapshot → admit
    survivors → extend.

    Cross-snapshot duplicate hashes may now appear across files; both
    dedup_incremental paths tolerate that (np.unique / groupby distinct).
    Returns the updated manifest."""
    import json
    import os

    import polars as pl

    manifest_path = os.path.join(state_dir, STATE_MANIFEST)
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"no dedup state at {state_dir} (run persist_dedup_state first)"
        )
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    col = text_col or manifest.get("text_col", "text")

    def to_hashes(batch: pa.Table) -> pa.Table:
        h1, h2 = _content_hash_arrays(batch, col)
        df = pl.DataFrame({"h1": h1, "h2": h2}).unique()
        u1 = df["h1"].to_numpy()
        nb = np.uint64(manifest.get("num_buckets", 256))
        bucket = ((u1.view(np.uint64) >> np.uint64(56)) % nb).astype(np.int32)
        return pa.table(
            {
                "h1": pa.array(u1),
                "h2": pa.array(df["h2"].to_numpy()),
                "bucket": pa.array(bucket),
            }
        )

    docs_ds.map_batches(
        to_hashes, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(state_dir, partition_cols=["bucket"])
    import pyarrow.dataset as pads

    frag_rows = sum(
        f.count_rows()
        for f in pads.dataset(
            state_dir, format="parquet", ignore_prefixes=[".", "_"]
        ).get_fragments()
    )
    manifest["rows"] = int(frag_rows)
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh)
    return manifest


def _state_hash_ds(state_dir: str):
    import ray.data

    return ray.data.read_parquet(state_dir, columns=["h1", "h2"])


def dedup_incremental(
    new_ds,
    state_dir: str,
    text_col: str = "text",
    strategy: str = "auto",
):
    """Rows of ``new_ds`` whose ``text_col`` content was NOT in the
    corpus persisted by persist_dedup_state (within-snapshot duplicates
    are kept — compose with dedup_corpus for those). Original columns
    pass through unchanged.

    strategy='broadcast': collect the state's hashes once (mixed to one
    sorted uint64 — collision odds n^2/2^65 per stages/hashset.py's
    contract), ray.put, np.searchsorted per batch; the snapshot streams
    with NO shuffle. Ceiling STATE_BROADCAST_LIMIT hashes.
    strategy='join': exact 128-bit anti-join — state keys distinct'd,
    snapshot left-outer-joined on (h1, h2), misses kept; both sides
    shuffle once. 'auto' picks by the manifest row count."""
    import json
    import os

    import ray

    manifest_path = os.path.join(state_dir, STATE_MANIFEST)
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"no dedup state at {state_dir} (run persist_dedup_state first)"
        )
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    if strategy == "auto":
        strategy = (
            "broadcast" if manifest["rows"] <= STATE_BROADCAST_LIMIT else "join"
        )

    if strategy == "broadcast":
        chunks = [
            (
                t["h1"].to_numpy(zero_copy_only=False).view(np.uint64)
                ^ (t["h2"].to_numpy(zero_copy_only=False).view(np.uint64) * _MIX64)
            )
            for t in _state_hash_ds(state_dir).iter_batches(batch_format="pyarrow")
            if t.num_rows
        ]
        seen = (
            np.unique(np.concatenate(chunks))
            if chunks
            else np.empty(0, dtype=np.uint64)
        )
        seen_ref = ray.put(seen)

        def keep(batch: pa.Table) -> pa.Table:
            s = ray.get(seen_ref)
            if not s.size or not batch.num_rows:
                return batch
            h1, h2 = _content_hash_arrays(batch, text_col)
            c = h1.view(np.uint64) ^ (h2.view(np.uint64) * _MIX64)
            pos = np.minimum(np.searchsorted(s, c), s.size - 1)
            return batch.filter(pa.array(s[pos] != c))

        return new_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

    if strategy != "join":
        raise ValueError(f"unknown dedup_incremental strategy {strategy!r}")

    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

    # distinct state keys (the persisted state is only per-batch unique)
    state_keys = (
        _state_hash_ds(state_dir)
        .groupby(["h1", "h2"])
        .aggregate(Count(alias_name="__n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "j1": t["h1"],
                    "j2": t["h2"],
                    "__seen": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def add_hash(batch: pa.Table) -> pa.Table:
        h1, h2 = _content_hash_arrays(batch, text_col)
        return batch.append_column("h1", pa.array(h1)).append_column(
            "h2", pa.array(h2)
        )

    cols = list(new_ds.schema().names)
    hashed = new_ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    lhs = drop_empty_blocks(hashed)
    rhs = drop_empty_blocks(state_keys)
    if lhs is None:
        return new_ds
    if rhs is None:
        return new_ds
    joined = lhs.join(
        rhs,
        join_type="left_outer",
        num_partitions=clamp_partitions(None),
        on=("h1", "h2"),
        right_on=("j1", "j2"),
    )
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t["__seen"])).select(cols),
        batch_format="pyarrow",
    )
