"""Byte-pair-encoding tokenizer training + application (Sennrich,
Haddow & Birch 2016) over the documents table.

The real version of what most corpus pipelines approximate with a
"BPE-ish regex" token count: learn the merge table from the corpus
itself, then tokenize with it. The classic algorithm is already
distributed-friendly — it trains on the WORD-FREQUENCY table, not the
corpus stream:

- ``train_bpe``: ONE distributed word-count pass (pre-aggregated
  per-batch partials -> combine_partials, exchange proportional to the
  distinct-word vocabulary, same VOCAB_BROADCAST_LIMIT ceiling as
  unigram_logprob), then the merge loop runs driver-side over that
  (vocabulary-sized, corpus-independent) table with a pair->words
  inverted index so each merge touches only the words that contain it.
- ``bpe_token_count``: streaming map_batches; the merge table is
  broadcast once via ray.put and compiled to a rank dict per actor
  call; each batch dictionary-encodes its tokens so the (inherently
  sequential) merge application runs once per DISTINCT in-batch word,
  then piece counts propagate back over the indices vectorized.

Determinism: word counts are exact integers; merge selection breaks
count ties lexicographically on the pair, so the learned merges — and
every downstream count — are layout-independent and golden-pinnable.

No counterpart in the reference (shaclAPI validates shapes); extends
the text-analysis surface next to token_count / unigram_logprob.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

END = "▁"  # end-of-word sentinel symbol (never a corpus char at train time)


def _word_counts(docs_ds) -> tuple[list[str], np.ndarray]:
    """Distinct whitespace tokens + exact corpus counts (driver-held;
    vocabulary-proportional, ceiling-checked)."""
    import polars as pl
    import ray

    from shaclapi_ray.pipelines.textstats import (
        VOCAB_BROADCAST_LIMIT,
        _explode_tokens,
    )
    from shaclapi_ray.stages.aggregates import combine_partials

    def tf_partial(batch: pa.Table) -> pa.Table:
        counts = (
            _explode_tokens(batch, [])
            .group_by("t")
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
        )
        return counts.rename({"t": "token"}).to_arrow()

    tf = combine_partials(
        docs_ds.map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True),
        "token",
        "cnt",
        "cnt",
        "auto",
    )
    words, counts = [], []
    for b in tf.iter_batches(batch_format="pyarrow"):
        words.extend(b["token"].to_pylist())
        counts.append(b["cnt"].to_numpy(zero_copy_only=False))
    if len(words) > VOCAB_BROADCAST_LIMIT:
        raise ValueError(
            f"vocabulary has {len(words)} words (> {VOCAB_BROADCAST_LIMIT}); "
            "pass train_bpe(..., sample_fraction=...) to train on a "
            "deterministic subsample at this scale"
        )
    cnt = np.concatenate(counts) if counts else np.empty(0, np.int64)
    order = np.argsort(np.asarray(words, dtype=object), kind="stable")
    return [words[i] for i in order], cnt[order]


def train_bpe(
    docs_ds,
    n_merges: int = 200,
    sample_fraction: float | None = None,
    seed: int = 0,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ranked
    merge list [(left, right), ...]. Ties in pair frequency break
    lexicographically (deterministic across layouts).

    ``sample_fraction`` is the documented escape hatch for corpora whose
    distinct-word vocabulary exceeds VOCAB_BROADCAST_LIMIT: train on a
    DETERMINISTIC doc-id-hash subsample (``textstats.sample_corpus`` —
    reproducible across runs, block layouts and cluster sizes, unlike
    ``Dataset.random_sample``), so the learned merge table is still
    golden-pinnable."""
    import collections

    if sample_fraction is not None and sample_fraction < 1.0:
        from shaclapi_ray.pipelines.textstats import sample_corpus

        docs_ds = sample_corpus(docs_ds, sample_fraction, seed=seed)

    words, counts = _word_counts(docs_ds)
    # symbol sequences per distinct word (word-end marker on the last
    # symbol keeps merges from crossing word boundaries)
    seqs = [tuple(w) + (END,) for w in words]
    pair_freq: collections.Counter = collections.Counter()
    pair_words: dict[tuple[str, str], set[int]] = collections.defaultdict(set)
    for wi, seq in enumerate(seqs):
        c = int(counts[wi])
        for a, b in zip(seq, seq[1:]):
            pair_freq[(a, b)] += c
            pair_words[(a, b)].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] <= 0:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words.pop(best, ())):
            seq = seqs[wi]
            c = int(counts[wi])
            # remove old pair contributions for this word
            for a, b in zip(seq, seq[1:]):
                pair_freq[(a, b)] -= c
                if pair_freq[(a, b)] <= 0:
                    del pair_freq[(a, b)]
                pair_words[(a, b)].discard(wi)
            # apply the merge left-to-right
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[wi] = tuple(out)
            for a, b in zip(seqs[wi], seqs[wi][1:]):
                pair_freq[(a, b)] += c
                pair_words[(a, b)].add(wi)
    return merges


def apply_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word with a trained merge-rank table (greedy
    lowest-rank-first, the standard BPE apply)."""
    seq = list(word) + [END]
    while len(seq) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(seq, seq[1:]))]
        cand = [(r, i) for r, i in pairs if r is not None]
        if not cand:
            break
        _, i = min(cand)
        seq[i : i + 2] = [seq[i] + seq[i + 1]]
    if seq and seq[-1] == END:
        seq = seq[:-1]
    elif seq and seq[-1].endswith(END):
        seq[-1] = seq[-1][: -len(END)]
    return seq


def bpe_token_count(docs_ds, merges: list[tuple[str, str]]):
    """(doc_id, bpe_tokens): number of BPE pieces per document under the
    trained merges. Merge table broadcast once; per batch the merge
    apply runs once per DISTINCT word (dictionary-encode), counts
    propagate back over indices vectorized."""
    import ray

    from shaclapi_ray.pipelines.textstats import _explode_tokens

    ref = ray.put([tuple(m) for m in merges])

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ranks = {p: i for i, p in enumerate(ray.get(ref))}
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        totals = np.zeros(n, dtype=np.int64)
        ex = _explode_tokens(batch, ["doc_id"])
        if len(ex):
            order = np.argsort(ids, kind="stable")
            exid = ex["doc_id"].to_numpy()
            pos = order[np.searchsorted(ids[order], exid)]
            toks = ex["t"].to_arrow()
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            enc = pc.dictionary_encode(toks)
            dict_vals = enc.dictionary.to_pylist()
            piece_per_distinct = np.array(
                [len(apply_bpe(w, ranks)) for w in dict_vals], dtype=np.int64
            )
            pieces = piece_per_distinct[enc.indices.to_numpy(zero_copy_only=False)]
            np.add.at(totals, pos, pieces)
        return pa.table(
            {"doc_id": batch["doc_id"], "bpe_tokens": pa.array(totals)}
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _id_list_array(offsets: np.ndarray, values: np.ndarray) -> pa.Array:
    """list<int64> Arrow array from numpy offsets+values (LargeList when
    the value count overflows int32 offsets)."""
    if offsets[-1] < 2**31:
        return pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(values, pa.int64())
        )
    return pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(values, pa.int64())
    )


def _flatten_id_lists(col) -> tuple[np.ndarray, np.ndarray]:
    """(lens, flat_values) of a list<int64> column, null lists as 0-len."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    return lens, flat


def bpe_vocab(docs_ds, merges: list[tuple[str, str]]) -> list[str]:
    """Deterministic piece-id vocabulary for a trained merge table: apply
    the merges to every DISTINCT corpus word and sort the distinct
    pieces. id = index in this list. Derived from the same
    vocabulary-proportional word table train_bpe used (same
    VOCAB_BROADCAST_LIMIT ceiling), so no extra corpus pass shape."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    words, _ = _word_counts(docs_ds)
    pieces: set[str] = set()
    for w in words:
        pieces.update(apply_bpe(w, ranks))
    return sorted(pieces)


def tokenize_corpus(
    docs_ds,
    merges: list[tuple[str, str]],
    vocab: list[str] | None = None,
    unk_id: int = -1,
):
    """(doc_id, token_ids list<int64>, n_bpe_tokens): the actual
    token-ID SEQUENCE per document under the trained merges — what a
    training pipeline feeds to sequence packing, not just a count.

    ``vocab`` maps pieces to ids (index in the list); derived from the
    corpus via ``bpe_vocab`` when omitted. Pieces outside the vocab
    (only possible when reusing a vocab on a different corpus) map to
    ``unk_id``.

    Scale shape: one streaming map_batches; merges+vocab broadcast once
    via ray.put; per batch the merge apply runs once per DISTINCT word
    (dictionary-encode) and the per-token piece-id expansion is a fully
    vectorized flat-buffer gather (np.repeat offsets arithmetic — no
    per-token Python), with per-doc list assembly via Arrow offsets."""
    import ray

    from shaclapi_ray.pipelines.textstats import _explode_tokens

    if vocab is None:
        vocab = bpe_vocab(docs_ds, merges)
    ref = ray.put(([tuple(m) for m in merges], list(vocab), int(unk_id)))

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        merges_l, vocab_l, unk = ray.get(ref)
        ranks = {p: i for i, p in enumerate(merges_l)}
        piece_id = {p: i for i, p in enumerate(vocab_l)}
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        per_doc_pieces = np.zeros(n, dtype=np.int64)
        values = np.empty(0, dtype=np.int64)
        ex = _explode_tokens(batch, ["doc_id"])
        if len(ex):
            order = np.argsort(ids, kind="stable")
            exid = ex["doc_id"].to_numpy()
            pos = order[np.searchsorted(ids[order], exid)]
            toks = ex["t"].to_arrow()
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            enc = pc.dictionary_encode(toks)
            dict_vals = enc.dictionary.to_pylist()
            # flat piece-id buffer + (offset, length) per distinct word
            id_lists = [
                np.array(
                    [piece_id.get(p, unk) for p in apply_bpe(w, ranks)],
                    dtype=np.int64,
                )
                for w in dict_vals
            ]
            lens = np.array([a.size for a in id_lists], dtype=np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            flat = (
                np.concatenate(id_lists) if id_lists else np.empty(0, np.int64)
            )
            idx = enc.indices.to_numpy(zero_copy_only=False)
            tok_lens = lens[idx]
            total = int(tok_lens.sum())
            # vectorized ragged gather: flat[start_i + within-token offset]
            starts = np.repeat(offs[idx], tok_lens)
            csum = np.concatenate(([0], np.cumsum(tok_lens)[:-1]))
            within = np.arange(total, dtype=np.int64) - np.repeat(csum, tok_lens)
            gathered = flat[starts + within]
            np.add.at(per_doc_pieces, pos, tok_lens)
            # tokens are doc-grouped in batch row order (polars explode
            # preserves order), so the gathered stream is too
            values = gathered
        doc_offsets = np.concatenate(
            ([0], np.cumsum(per_doc_pieces))
        ).astype(np.int64)
        token_ids = _id_list_array(doc_offsets, values)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "token_ids": token_ids,
                "n_bpe_tokens": pa.array(per_doc_pieces),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pack_token_sequences(
    tokens_ds, budget: int = 512, n_shards: int = 8, seed: int = 0
):
    """(shard, seq, token_ids list<int64>, n_tokens): ACTUAL packed
    training sequences — per shard, documents ordered by doc_id are
    concatenated and chopped every ``budget`` token ids (the GPT-style
    concat-and-chop layout spans.pack_sequences computes placements
    for); the final sequence of a shard may be ragged (< budget).

    Input is tokenize_corpus output (doc_id, token_ids). Shard
    assignment is the same Knuth multiplicative hash as
    spans.pack_sequences, so placements and packed contents agree.

    Scale shape: the narrow (doc_id, shard, token_ids) table shuffles
    once on shard; per-shard concat+chop is one numpy pass inside
    groupby(shard).map_groups — shard count is the parallelism knob."""
    from shaclapi_ray.pipelines.spans import KNUTH

    if n_shards < 1 or budget < 1:
        raise ValueError("n_shards and budget must be >= 1")

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = ((ids + seed) * KNUTH) % (1 << 32) % n_shards
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "shard": pa.array(shard.astype(np.int64)),
                "token_ids": batch["token_ids"],
            }
        )

    def pack(t: pa.Table) -> pa.Table:
        order = np.argsort(t["doc_id"].to_numpy(zero_copy_only=False), kind="stable")
        lens, flat = _flatten_id_lists(t["token_ids"])
        row_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sel_lens = lens[order]
        total = int(sel_lens.sum())
        if total == 0:
            return pa.table(
                {
                    "shard": pa.array([], pa.int64()),
                    "seq": pa.array([], pa.int64()),
                    "token_ids": pa.array([], pa.list_(pa.int64())),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        # ragged gather of each doc's id range, in doc_id order
        starts = np.repeat(row_starts[order], sel_lens)
        csum = np.concatenate(([0], np.cumsum(sel_lens)[:-1]))
        within = np.arange(total, dtype=np.int64) - np.repeat(csum, sel_lens)
        stream = flat[starts + within]
        n_seqs = -(-stream.size // budget)
        offsets = np.minimum(
            np.arange(n_seqs + 1, dtype=np.int64) * budget, stream.size
        )
        return pa.table(
            {
                "shard": pa.array(
                    np.full(n_seqs, int(t["shard"][0].as_py()), dtype=np.int64)
                ),
                "seq": pa.array(np.arange(n_seqs, dtype=np.int64)),
                "token_ids": _id_list_array(offsets, stream),
                "n_tokens": pa.array(np.diff(offsets)),
            }
        )

    return tokens_ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("shard").map_groups(pack, batch_format="pyarrow")


def bpe_self_tokenize(docs_ds, n_merges: int = 200):
    """train_bpe + bpe_token_count over the same corpus — the
    single-input composition for the config-driven runner / HTTP
    surface (a pre-trained merge table is list-of-pairs JSON; pass it
    to bpe_token_count directly when reusing one)."""
    return bpe_token_count(docs_ds, train_bpe(docs_ds, n_merges=n_merges))
