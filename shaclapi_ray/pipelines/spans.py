"""Cross-document duplicated-span coverage and training-sequence packing.

Two training-data operators over the documents corpus. The reference has
no analog (it validates RDF bindings; cf. `shaclapi/api.py:1` scope) —
these are first-class LLM-corpus operators per the brief.

- ``dup_span_coverage``: per document, how many token positions are
  covered by a word n-gram that also occurs in >= ``min_docs`` distinct
  documents. This is the per-document signal behind exact-substring
  deduplication of training corpora (Lee et al. 2021, "Deduplicating
  Training Data Makes Language Models Better": spans above a minimum
  match length that repeat across the corpus are removed); the coverage
  fraction is what a removal pass would delete.

- ``pack_sequences``: deterministic concat-and-chop packing of tokenized
  documents into fixed token-budget training sequences (the standard
  GPT-style pretraining layout): documents are hash-assigned to shards,
  ordered by doc_id within a shard, concatenated, and chopped every
  ``budget`` tokens. Output is a placement table (which sequence a doc
  starts/ends in, at what offset).

Scale design (dup_span_coverage):
- Pass 1 (dup-gram discovery): per batch, DISTINCT (doc_id, gram) pairs
  are built fully vectorized (polars token explode + shift-over-doc
  windows — the decontam kernel, plus start positions) and reduced to
  8-byte gram HASHES; occurrence counts combine via
  stages.aggregates.grouped_count ('auto': driver merge while partials
  are small, Ray hash shuffle at scale). Documents are whole rows, so a
  doc never spans batches and per-batch distinct == per-doc distinct.
- The duplicated-gram set is collected (hashes only) sorted and
  broadcast once via ray.put; probes are np.searchsorted with zero
  per-task setup (stages/hashset.py rationale). Ceiling ~50M hashes
  (400 MB object); beyond that flip pass 2 to a hash-partitioned join
  of (doc_id, s, gram_hash) against the dup set, the same exchange
  shape as JobConfig.ref_strategy='bucket'.
- Pass 2 (coverage): one streaming map_batches; the interval union of
  n-token windows is computed per doc with clipped successive-start
  differences — all vectorized, no per-row Python.

Scale design (pack_sequences):
- Token counts + shard assignment are one streaming pass that projects
  the corpus down to (doc_id, shard, n_tokens) — 24 B/row; the text
  never moves.
- The per-shard exclusive prefix sum is groupby(shard).map_groups with
  a numpy cumsum: at 10^12 rows and 10^5 shards a group is ~10^7 rows
  = 240 MB of narrow columns. Shard count is the parallelism knob; the
  assignment hash (Knuth multiplicative, sample_corpus arithmetic) is
  reproducible across runs, cluster sizes and block layouts.
- Parity caveat shared with sample_corpus: the shard hash is exact up
  to doc_id ~3.4e9 (beyond that int64 wraps differ from SQL's exact
  arithmetic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.stages.hashset import hash_strings

N_SPAN = 5
MIN_DUP_DOCS = 2
# above this many duplicated grams, the broadcast object (8 B/hash) stops
# being "small side" — callers should partition-join instead (see module
# docstring); enforced so the failure is loud, not an OOM.
BROADCAST_LIMIT = 50_000_000

TOKEN_RE = r"\S+"  # shared with textstats.token_count / the SQL oracles
KNUTH = 2654435761  # sample_corpus multiplicative-hash constant


def _gram_starts(batch: pa.Table, n: int):
    """polars frame (doc_id, s, gram): every word n-gram start position.

    Vectorized: token explode, per-doc position index, n-1 shift-over-doc
    windows, string concat. Order within a doc is ascending s.
    """
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    ex = (
        df.with_columns(pl.col("text").str.extract_all(TOKEN_RE).alias("t"))
        .drop("text")
        .explode("t")
        .filter(pl.col("t").is_not_null())  # explode([]) emits a null row
    )
    ex = ex.with_columns(pl.int_range(pl.len()).over("doc_id").alias("s"))
    shifted = [
        pl.col("t").shift(-i).over("doc_id").alias(f"t{i}") for i in range(1, n)
    ]
    ex = ex.with_columns(shifted)
    named = [pl.col("t")] + [pl.col(f"t{i}") for i in range(1, n)]
    ex = ex.filter(pl.all_horizontal([c.is_not_null() for c in named]))
    return ex.select(
        "doc_id", "s", pl.concat_str(named, separator=" ").alias("gram")
    )


def dup_gram_hashes(docs_ds, n: int = N_SPAN, min_docs: int = MIN_DUP_DOCS):
    """Sorted uint64 hashes of every word n-gram present in >= min_docs
    distinct documents. Only hashes leave the scan tasks; the count
    combine is the pre-aggregate-then-combine path."""
    from shaclapi_ray.stages.aggregates import grouped_count

    def partial(batch: pa.Table) -> pa.Table:
        g = _gram_starts(batch, n)
        if len(g) == 0:
            return pa.table({"h": pa.array([], type=pa.uint64())})
        dg = g.select("doc_id", "gram").unique()
        return pa.table(
            {"h": pa.array(hash_strings(dg["gram"].to_arrow()), type=pa.uint64())}
        )

    pairs = docs_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = grouped_count(pairs, "h", out_name="n_docs")

    chunks = []
    for b in counts.iter_batches(batch_format="pyarrow"):
        keep = b.filter(pc.greater_equal(b["n_docs"], min_docs))
        chunks.append(keep["h"].to_numpy(zero_copy_only=False))
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    out = np.sort(np.concatenate(chunks).astype(np.uint64))
    if out.size > BROADCAST_LIMIT:
        raise ValueError(
            f"duplicated-gram set has {out.size} hashes (> {BROADCAST_LIMIT}); "
            "pass strategy='join' (dup_span_coverage / remove_dup_spans / "
            "preprocess_corpus dedup_strategy) to resolve grams against the "
            "dup set with a hash-partitioned join at this scale"
        )
    return out


def dup_gram_hash_ds(docs_ds, n: int = N_SPAN, min_docs: int = MIN_DUP_DOCS):
    """The duplicated-gram set as a DISTRIBUTED Dataset[(h int64)] — the
    beyond-BROADCAST_LIMIT form dup_gram_hashes' loud error points at
    (hashes viewed as int64 for join-key compatibility)."""
    from shaclapi_ray.stages.aggregates import grouped_count

    def partial(batch: pa.Table) -> pa.Table:
        g = _gram_starts(batch, n)
        if len(g) == 0:
            return pa.table({"h": pa.array([], type=pa.int64())})
        dg = g.select("doc_id", "gram").unique()
        return pa.table(
            {
                "h": pa.array(
                    hash_strings(dg["gram"].to_arrow()).view(np.int64),
                    type=pa.int64(),
                )
            }
        )

    pairs = docs_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = grouped_count(pairs, "h", out_name="n_docs")
    return counts.filter(expr=f"n_docs >= {min_docs}").select_columns(["h"])


def _coverage_join(docs_ds, n: int, min_docs: int):
    """Partition-join coverage path: the dup-gram set never leaves the
    cluster. Grams (doc_id, s, h) join the distributed dup set on h;
    per-doc window unions resolve in a groupby(doc_id); a final bounded
    join attaches token counts (docs without hits covered by left-outer
    + fill 0). Output-identical to the broadcast path (tested)."""
    import polars as pl

    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

    dup_nb = drop_empty_blocks(
        dup_gram_hash_ds(docs_ds, n, min_docs).map_batches(
            lambda t: t.rename_columns(["j_h"]), batch_format="pyarrow"
        )
    )

    def grams(batch: pa.Table) -> pa.Table:
        g = _gram_starts(batch, n)
        if len(g) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": g["doc_id"].to_arrow(),
                "s": pa.array(g["s"].to_numpy(), pa.int64()),
                "h": pa.array(
                    hash_strings(g["gram"].to_arrow()).view(np.int64), pa.int64()
                ),
            }
        )

    def window_union(t: pa.Table) -> pa.Table:
        s = np.sort(t["s"].to_numpy(zero_copy_only=False))
        contrib = int(np.minimum(np.diff(s), n).sum()) + n if s.size else 0
        return pa.table(
            {
                "j_doc_id": pa.array([int(t["doc_id"][0].as_py())], pa.int64()),
                "n_dup_tokens": pa.array([contrib], pa.int64()),
            }
        )

    def base(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pc.cast(
                    pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64()
                ),
            }
        )

    base_ds = drop_empty_blocks(
        docs_ds.map_batches(base, batch_format="pyarrow", zero_copy_batch=True)
    )
    if dup_nb is None or base_ds is None:
        cov_nb = None
    else:
        hits = drop_empty_blocks(
            docs_ds.map_batches(grams, batch_format="pyarrow", zero_copy_batch=True)
        )
        hits = (
            hits.join(
                dup_nb,
                join_type="inner",
                num_partitions=clamp_partitions(None),
                on=("h",),
                right_on=("j_h",),
            )
            if hits is not None
            else None
        )
        cov_nb = (
            drop_empty_blocks(
                hits.groupby("doc_id").map_groups(
                    window_union, batch_format="pyarrow"
                )
            )
            if hits is not None
            else None
        )
    if cov_nb is None:
        out = base_ds if base_ds is not None else docs_ds.map_batches(
            base, batch_format="pyarrow"
        )

        def zero(batch: pa.Table) -> pa.Table:
            nd = np.zeros(batch.num_rows, dtype=np.int64)
            nt = batch["n_tokens"].to_numpy(zero_copy_only=False)
            frac = np.zeros(batch.num_rows)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_tokens": batch["n_tokens"],
                    "n_dup_tokens": pa.array(nd),
                    "dup_frac": pa.array(frac),
                }
            )

        return out.map_batches(zero, batch_format="pyarrow")

    joined = base_ds.join(
        cov_nb,
        join_type="left_outer",
        num_partitions=clamp_partitions(None),
        on=("doc_id",),
        right_on=("j_doc_id",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        nd = (
            pc.fill_null(batch["n_dup_tokens"], 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False)
        frac = np.where(nt > 0, nd / np.maximum(nt, 1), 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "n_dup_tokens": pa.array(nd),
                "dup_frac": pa.array(frac),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def dup_span_coverage(
    docs_ds, n: int = N_SPAN, min_docs: int = MIN_DUP_DOCS, strategy: str = "broadcast"
):
    """(doc_id, n_tokens, n_dup_tokens, dup_frac): per document, tokens
    covered by at least one cross-document duplicated n-gram.

    n_dup_tokens is the size of the UNION of all duplicated n-token
    windows — computed per doc as sum(min(n, next_start - start)) over
    ascending duplicated-window starts (last window contributes n).

    ``strategy='join'`` is the beyond-BROADCAST_LIMIT path: the dup-gram
    set stays a distributed Dataset and coverage resolves through a
    hash-partitioned join + groupby (output-identical, tested)."""
    import ray

    if strategy == "join":
        return _coverage_join(docs_ds, n, min_docs)

    dup_ref = ray.put(dup_gram_hashes(docs_ds, n, min_docs))

    def cover(batch: pa.Table) -> pa.Table:
        import polars as pl

        sorted_h = ray.get(dup_ref)
        n_tokens = pc.cast(
            pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64()
        )
        g = _gram_starts(batch, n)
        if sorted_h.size and len(g):
            h = hash_strings(g["gram"].to_arrow())
            pos = np.minimum(np.searchsorted(sorted_h, h), sorted_h.size - 1)
            hit = sorted_h[pos] == h
        else:
            hit = np.zeros(len(g), dtype=bool)
        cov = (
            g.filter(pl.Series("hit", hit))
            .with_columns(
                pl.min_horizontal(
                    pl.col("s").shift(-1).over("doc_id") - pl.col("s"),
                    pl.lit(n, dtype=pl.Int64),
                )
                .fill_null(n)
                .alias("c")
            )
            .group_by("doc_id")
            .agg(pl.col("c").sum().alias("n_dup_tokens"))
        )
        out = (
            pl.from_arrow(pa.table({"doc_id": batch["doc_id"], "n_tokens": n_tokens}))
            .join(cov, on="doc_id", how="left")
            .with_columns(pl.col("n_dup_tokens").fill_null(0).cast(pl.Int64))
            .with_columns(
                pl.when(pl.col("n_tokens") == 0)
                .then(pl.lit(0.0))
                .otherwise(pl.col("n_dup_tokens") / pl.col("n_tokens"))
                .alias("dup_frac")
            )
        )
        return out.to_arrow()

    return docs_ds.map_batches(cover, batch_format="pyarrow", zero_copy_batch=True)


def intra_dup_ngram(docs_ds, n: int = 3):
    """(doc_id, n_tokens, dup_ngram_tokens, dup_ngram_frac): Gopher's
    WITHIN-document duplicated-n-gram filter signal (Rae et al. 2021
    §A1.1 "fraction of tokens in duplicated n-grams") — the intra-doc
    counterpart of dup_span_coverage: an n-gram is duplicated iff it
    occurs at least twice in the SAME document; the fraction is the
    window-union of all duplicated-gram occurrences over the doc's
    tokens (same union kernel, so overlapping windows never double
    count).

    Unlike the cross-document operator there is no global state at all:
    duplicates are decided per doc, so this is ONE row-local streaming
    map_batches pass — no broadcast, no shuffle, trivially scale-free."""
    import polars as pl

    def cover(batch: pa.Table) -> pa.Table:
        n_tokens = pc.cast(
            pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64()
        )
        g = _gram_starts(batch, n)
        cov = (
            g.filter(pl.len().over(["doc_id", "gram"]) >= 2)
            .with_columns(
                pl.min_horizontal(
                    pl.col("s").shift(-1).over("doc_id") - pl.col("s"),
                    pl.lit(n, dtype=pl.Int64),
                )
                .fill_null(n)
                .alias("c")
            )
            .group_by("doc_id")
            .agg(pl.col("c").sum().alias("dup_ngram_tokens"))
        )
        out = (
            pl.from_arrow(
                pa.table({"doc_id": batch["doc_id"], "n_tokens": n_tokens})
            )
            .join(cov, on="doc_id", how="left")
            .with_columns(
                pl.col("dup_ngram_tokens").fill_null(0).cast(pl.Int64)
            )
            .with_columns(
                pl.when(pl.col("n_tokens") == 0)
                .then(pl.lit(0.0))
                .otherwise(pl.col("dup_ngram_tokens") / pl.col("n_tokens"))
                .alias("dup_ngram_frac")
            )
        )
        return out.to_arrow()

    return docs_ds.map_batches(cover, batch_format="pyarrow", zero_copy_batch=True)


def intra_dup_ngram_sql(n: int = 3) -> str:
    """Mirror of intra_dup_ngram (duplicate = same gram >= 2 times in the
    SAME document; window-union coverage like dup_span_coverage_sql)."""
    return f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS l FROM documents),
toks AS (SELECT doc_id, unnest(l) AS t, unnest(range(len(l))) AS s FROM lists),
grams AS (
  SELECT doc_id, s,
         string_agg(t, ' ') OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS gram,
         count(*) OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS w
  FROM toks),
fg AS (SELECT doc_id, s, gram FROM grams WHERE w = {n}),
dup AS (SELECT doc_id, gram FROM fg GROUP BY doc_id, gram HAVING count(*) >= 2),
hits AS (SELECT f.doc_id, f.s FROM fg f JOIN dup USING (doc_id, gram)),
cov AS (
  SELECT doc_id, least({n}, coalesce(nxt - s, {n})) AS c FROM (
    SELECT doc_id, s, lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt FROM hits)),
cov2 AS (SELECT doc_id, sum(c)::BIGINT AS dup_ngram_tokens FROM cov GROUP BY doc_id),
nt AS (SELECT doc_id, len(l)::BIGINT AS n_tokens FROM lists)
SELECT nt.doc_id, nt.n_tokens, coalesce(cov2.dup_ngram_tokens, 0)::BIGINT AS dup_ngram_tokens,
       CASE WHEN nt.n_tokens = 0 THEN 0.0
            ELSE coalesce(cov2.dup_ngram_tokens, 0) / nt.n_tokens END AS dup_ngram_frac
FROM nt LEFT JOIN cov2 USING (doc_id) ORDER BY doc_id
"""


def _strip_with_hits(df, hits, n: int) -> pa.Table:
    """Shared removal kernel: given the batch's (doc_id, text) polars
    frame and a polars frame of duplicated-window starts (doc_id, s),
    drop every token covered by a window [s, s+n) and rebuild clean_text.
    Coverage resolves to one +1/-1 delta prefix-sum over the batch's
    exploded token frame — no per-doc or per-span Python loops. Used by
    both the broadcast and the partition-join paths of
    ``remove_dup_spans`` so the two are kernel-identical by construction."""
    import polars as pl

    toks = (
        df.with_columns(pl.col("text").str.extract_all(TOKEN_RE).alias("t"))
        .drop("text")
        .explode("t")
        .filter(pl.col("t").is_not_null())
        .with_columns(pl.int_range(pl.len()).over("doc_id").alias("s"))
    )
    total = len(toks)
    # per-doc token counts and global offsets (toks is doc-grouped in
    # input order; doc_ids are unique per batch row)
    sizes = toks.group_by("doc_id", maintain_order=True).agg(
        pl.len().alias("n_tokens")
    )
    covered = np.zeros(total, dtype=np.int64)
    if len(hits):
        offs = sizes.with_columns(
            (pl.col("n_tokens").cum_sum() - pl.col("n_tokens")).alias("off")
        )
        hits = hits.join(offs, on="doc_id", how="left")
        base = hits["off"].to_numpy()
        hs = hits["s"].to_numpy()
        tlen = hits["n_tokens"].to_numpy()
        start = base + hs
        stop = base + np.minimum(hs + n, tlen)
        delta = np.zeros(total + 1, dtype=np.int64)
        np.add.at(delta, start, 1)
        np.add.at(delta, stop, -1)
        covered = np.cumsum(delta[:-1])
    kept = (
        toks.with_columns(pl.Series("cov", covered > 0))
        .filter(~pl.col("cov"))
        .group_by("doc_id", maintain_order=True)
        .agg(pl.col("t").str.join(" ").alias("clean_text"))
    )
    out = (
        df.select("doc_id")
        .join(sizes, on="doc_id", how="left")
        .join(kept, on="doc_id", how="left")
        .with_columns(
            pl.col("n_tokens").fill_null(0).cast(pl.Int64),
            pl.col("clean_text").fill_null(""),
        )
        .with_columns(
            (
                pl.col("n_tokens")
                - pl.col("clean_text")
                .str.extract_all(TOKEN_RE)
                .list.len()
                .cast(pl.Int64)
            ).alias("n_removed")
        )
    )
    return out.select("doc_id", "clean_text", "n_tokens", "n_removed").to_arrow()


def _removal_join(docs_ds, n: int, min_docs: int):
    """Partition-join removal path (the beyond-BROADCAST_LIMIT shape):
    the dup-gram set stays a distributed Dataset; duplicated-window
    starts resolve through a hash-partitioned join of the narrow
    (doc_id, s, h) gram table, collapse to ONE (doc_id, starts-list) row
    per hit document, and rejoin the (doc_id, text) corpus — text moves
    through exactly one keyed exchange (the unavoidable co-location of
    hit positions with text), everything else is 8-24 B/row narrow.
    Output-identical to the broadcast path (tested)."""
    import polars as pl

    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

    def no_hits(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        return _strip_with_hits(df, pl.DataFrame({"doc_id": [], "s": []}), n)

    dup_nb = drop_empty_blocks(
        dup_gram_hash_ds(docs_ds, n, min_docs).map_batches(
            lambda t: t.rename_columns(["j_h"]), batch_format="pyarrow"
        )
    )
    if dup_nb is None:
        return docs_ds.map_batches(
            no_hits, batch_format="pyarrow", zero_copy_batch=True
        )

    def grams(batch: pa.Table) -> pa.Table:
        g = _gram_starts(batch, n)
        if len(g) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": g["doc_id"].to_arrow(),
                "s": pa.array(g["s"].to_numpy(), pa.int64()),
                "h": pa.array(
                    hash_strings(g["gram"].to_arrow()).view(np.int64), pa.int64()
                ),
            }
        )

    def starts_list(t: pa.Table) -> pa.Table:
        # packed int64 bytes, not list<int64>: Ray's hash-shuffle join
        # rejects nested types in non-key fields
        s = np.sort(t["s"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table(
            {
                "j_doc_id": pa.array([int(t["doc_id"][0].as_py())], pa.int64()),
                "starts": pa.array([s.tobytes()], pa.binary()),
            }
        )

    hits = drop_empty_blocks(
        docs_ds.map_batches(grams, batch_format="pyarrow", zero_copy_batch=True)
    )
    hits = (
        hits.join(
            dup_nb,
            join_type="inner",
            num_partitions=clamp_partitions(None),
            on=("h",),
            right_on=("j_h",),
        )
        if hits is not None
        else None
    )
    per_doc = (
        drop_empty_blocks(
            hits.groupby("doc_id").map_groups(starts_list, batch_format="pyarrow")
        )
        if hits is not None
        else None
    )
    if per_doc is None:
        return docs_ds.map_batches(
            no_hits, batch_format="pyarrow", zero_copy_batch=True
        )

    joined = docs_ds.select_columns(["doc_id", "text"]).join(
        per_doc,
        join_type="left_outer",
        num_partitions=clamp_partitions(None),
        on=("doc_id",),
        right_on=("j_doc_id",),
    )

    def strip_joined(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = batch["starts"].to_pylist()
        doc_col, s_col = [], []
        for i, raw in zip(ids, blobs):
            if raw is not None:
                arr = np.frombuffer(raw, dtype=np.int64)
                doc_col.append(np.full(arr.size, i, dtype=np.int64))
                s_col.append(arr)
        st = (
            pl.DataFrame(
                {
                    "doc_id": np.concatenate(doc_col),
                    "s": np.concatenate(s_col),
                }
            )
            if doc_col
            else pl.DataFrame({"doc_id": [], "s": []})
        )
        return _strip_with_hits(df, st, n)

    return joined.map_batches(strip_joined, batch_format="pyarrow")


def remove_dup_spans(
    docs_ds, n: int = N_SPAN, min_docs: int = MIN_DUP_DOCS, strategy: str = "broadcast"
):
    """(doc_id, clean_text, n_tokens, n_removed): the Lee et al. 2021
    exact-substring-dedup REMOVAL — every token covered by at least one
    cross-document duplicated n-gram window is dropped; the surviving
    token subsequence is re-joined with single spaces.

    Removal semantics exactly match dup_span_coverage's window union:
    n_removed == n_dup_tokens for every document (asserted in tests), so
    coverage can be used to pre-estimate the cost of a removal pass.

    Scale shape: same as dup_span_coverage — the duplicated-gram hash set
    is broadcast once (sorted uint64, 50M ceiling with a loud error), the
    corpus streams through one map_batches pass, coverage intervals
    resolve to a vectorized +1/-1 delta prefix-sum over the batch's
    exploded token frame (no per-doc or per-span Python loops).

    ``strategy='join'`` is the beyond-BROADCAST_LIMIT path: the dup-gram
    set stays a distributed Dataset, hit windows resolve through
    hash-partitioned joins, and text moves through exactly one keyed
    exchange (output-identical, tested — see ``_removal_join``)."""
    import polars as pl
    import ray

    if strategy == "join":
        return _removal_join(docs_ds, n, min_docs)

    dup_ref = ray.put(dup_gram_hashes(docs_ds, n, min_docs))

    def strip(batch: pa.Table) -> pa.Table:
        sorted_h = ray.get(dup_ref)
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        g = _gram_starts(batch, n)
        if sorted_h.size and len(g):
            h = hash_strings(g["gram"].to_arrow())
            pos = np.minimum(np.searchsorted(sorted_h, h), sorted_h.size - 1)
            hits = g.filter(pl.Series("hit", sorted_h[pos] == h)).select(
                "doc_id", "s"
            )
        else:
            hits = pl.DataFrame({"doc_id": [], "s": []})
        return _strip_with_hits(df, hits, n)

    return docs_ds.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


def pack_sequences(docs_ds, n_shards: int = 8, budget: int = 512, seed: int = 0):
    """(doc_id, shard, n_tokens, start_seq, start_off, end_seq):
    concat-and-chop placement of each document into fixed ``budget``-token
    training sequences, per shard, docs ordered by doc_id within a shard.

    start_seq/end_seq are shard-local sequence indices containing the
    doc's first/last token; start_off is the offset of the first token in
    start_seq. A doc may span sequences (standard pretraining packing).
    Zero-token docs get end_seq = start_seq."""
    if n_shards < 1 or budget < 1:
        raise ValueError("n_shards and budget must be >= 1")

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = ((ids + seed) * KNUTH) % (1 << 32) % n_shards
        n_tokens = pc.cast(
            pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64()
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "shard": pa.array(shard.astype(np.int64)),
                "n_tokens": n_tokens,
            }
        )

    narrow = docs_ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def pack(group):
        g = group.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        ntok = g["n_tokens"].to_numpy()
        start = np.concatenate(([0], np.cumsum(ntok)[:-1])) if len(g) else ntok
        g["start_seq"] = start // budget
        g["start_off"] = start % budget
        g["end_seq"] = np.where(ntok == 0, start, start + ntok - 1) // budget
        return g[["doc_id", "shard", "n_tokens", "start_seq", "start_off", "end_seq"]]

    return narrow.groupby("shard").map_groups(pack, batch_format="pandas")


# ---------------------------------------------------------------------------
# DuckDB oracles (exact gram STRINGS — a parity pass also certifies the
# 64-bit hash path collision-free on the fixture, like decontaminate)
# ---------------------------------------------------------------------------


def dup_span_coverage_sql(n: int = N_SPAN, min_docs: int = MIN_DUP_DOCS) -> str:
    return f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS l FROM documents),
toks AS (SELECT doc_id, unnest(l) AS t, unnest(range(len(l))) AS s FROM lists),
grams AS (
  SELECT doc_id, s,
         string_agg(t, ' ') OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS gram,
         count(*) OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS w
  FROM toks),
fg AS (SELECT doc_id, s, gram FROM grams WHERE w = {n}),
dup AS (SELECT gram FROM fg GROUP BY gram HAVING count(DISTINCT doc_id) >= {min_docs}),
hits AS (SELECT f.doc_id, f.s FROM fg f JOIN dup USING (gram)),
cov AS (
  SELECT doc_id, least({n}, coalesce(nxt - s, {n})) AS c FROM (
    SELECT doc_id, s, lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt FROM hits)),
cov2 AS (SELECT doc_id, sum(c)::BIGINT AS n_dup_tokens FROM cov GROUP BY doc_id),
nt AS (SELECT doc_id, len(l)::BIGINT AS n_tokens FROM lists)
SELECT nt.doc_id, nt.n_tokens, coalesce(cov2.n_dup_tokens, 0)::BIGINT AS n_dup_tokens,
       CASE WHEN nt.n_tokens = 0 THEN 0.0
            ELSE coalesce(cov2.n_dup_tokens, 0) / nt.n_tokens END AS dup_frac
FROM nt LEFT JOIN cov2 USING (doc_id) ORDER BY doc_id
"""


def remove_dup_spans_sql(
    n: int = N_SPAN, min_docs: int = MIN_DUP_DOCS, src: str = "documents"
) -> str:
    """(doc_id, clean_text, n_removed): the removal pass as SQL — a token
    is removed iff some duplicated-gram window [h.s, h.s+n) covers its
    position (exact gram strings, like dup_span_coverage_sql)."""
    return f"""
WITH lists AS (SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS l FROM {src}),
toks AS (SELECT doc_id, unnest(l) AS t, unnest(range(len(l))) AS s FROM lists),
grams AS (
  SELECT doc_id, s,
         string_agg(t, ' ') OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS gram,
         count(*) OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN CURRENT ROW AND {n - 1} FOLLOWING) AS w
  FROM toks),
fg AS (SELECT doc_id, s, gram FROM grams WHERE w = {n}),
dup AS (SELECT gram FROM fg GROUP BY gram HAVING count(DISTINCT doc_id) >= {min_docs}),
hits AS (SELECT f.doc_id, f.s FROM fg f JOIN dup USING (gram)),
kept AS (
  SELECT tk.doc_id, tk.s, tk.t FROM toks tk
  WHERE NOT EXISTS (
    SELECT 1 FROM hits h
    WHERE h.doc_id = tk.doc_id AND tk.s >= h.s AND tk.s < h.s + {n})),
agg AS (
  SELECT doc_id, string_agg(t, ' ' ORDER BY s) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id),
nt AS (SELECT doc_id, len(l)::BIGINT AS n_tokens FROM lists)
SELECT nt.doc_id, coalesce(a.clean_text, '') AS clean_text,
       (nt.n_tokens - coalesce(a.n_kept, 0))::BIGINT AS n_removed
FROM nt LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
"""


def pack_sequences_sql(
    n_shards: int = 8, budget: int = 512, seed: int = 0
) -> str:
    return f"""
WITH base AS (
  SELECT doc_id,
         (((doc_id + {seed}) * {KNUTH}) % 4294967296) % {n_shards} AS shard,
         length(regexp_extract_all(text, '{TOKEN_RE}'))::BIGINT AS n_tokens
  FROM documents),
scan AS (
  SELECT doc_id, shard, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
  FROM base)
SELECT doc_id, shard::BIGINT AS shard, n_tokens,
       (st // {budget})::BIGINT AS start_seq,
       (st % {budget})::BIGINT AS start_off,
       (CASE WHEN n_tokens = 0 THEN st ELSE st + n_tokens - 1 END // {budget})::BIGINT AS end_seq
FROM scan ORDER BY doc_id
"""


def write_training_shards(docs_ds, out_dir: str, n_shards: int = 8, seed: int = 0):
    """Materialize the corpus as shard-partitioned parquet
    (``shard=<id>/`` hive dirs, same Knuth assignment as pack_sequences):
    the physical layout a trainer consumes next to the placement table.
    One directory per shard is also the resume/retry unit — a failed run
    rewrites only the shards it hadn't finished, and shard count is the
    read-parallelism knob for the training job."""
    import pyarrow.compute as _pc  # noqa: F401  (parity with siblings)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = ((ids + seed) * KNUTH) % (1 << 32) % n_shards
        return batch.append_column(
            "shard", pa.array(shard.astype(np.int64), type=pa.int64())
        )

    docs_ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(out_dir, partition_cols=["shard"])
    return out_dir
