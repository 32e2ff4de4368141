"""Unigram-LM subword tokenizer — the SentencePiece algorithm family.

Kudo 2018 ("Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates") trains a unigram language
model over a seed vocabulary of candidate substrings by EM and prunes it
to the target size; tokenization is then the Viterbi-best segmentation
under the learned piece log-probabilities. Together with `bpe.train_bpe`
this completes the two dominant subword-tokenizer families used for LLM
training data.

Scale shape — identical to BPE's (pipelines/bpe.py), by design:
- ONE distributed corpus pass produces the exact (distinct word, count)
  table (`bpe._word_counts`, vocabulary-proportional, ceiling-checked
  with the same deterministic `sample_fraction` escape hatch);
- training runs driver-side over DISTINCT words weighted by counts —
  cost ∝ vocab x word_len^2 x EM iters, independent of corpus rows;
- apply (`unigram_token_count` / `tokenize_corpus_unigram`) streams
  with per-batch word dictionary-encoding, so the Viterbi DP runs once
  per DISTINCT word per batch and expands by ragged gather.

Determinism (golden-pinnable): words iterate in sorted order, the seed
vocabulary ranks by (count desc, piece asc), EM expected counts are
accumulated in sorted-word order with float64, pruning ranks by
(expected count desc, piece asc) and never drops single characters
(full coverage of seen text), and Viterbi breaks score ties toward the
LONGEST first piece (smaller split index wins at equal score). Unknown
characters at apply time map to UNK_ID with UNK_LOGP each.

Differences from the reference implementation, both documented
simplifications with the same interface: pruning ranks pieces by EM
expected count instead of the exact loss delta (SentencePiece's own
docs describe the delta as an approximation target; expected count is
the standard cheap proxy), and the seed vocabulary enumerates all
substrings of distinct words up to `max_piece_len` instead of running
the Enhanced Suffix Array step (equivalent up to the length cap, which
the cap makes explicit).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

UNK = "<unk>"
UNK_ID = 0
UNK_LOGP = -20.0


def _seed_vocab(
    words: list[str], counts: np.ndarray, seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Candidate pieces: every single char (coverage) + the seed_size
    most frequent substrings up to max_piece_len, probs ∝ frequency."""
    freq: dict[str, int] = {}
    for w, c in zip(words, counts):
        c = int(c)
        n = len(w)
        for i in range(n):
            top = min(n, i + max_piece_len)
            for j in range(i + 1, top + 1):
                s = w[i:j]
                freq[s] = freq.get(s, 0) + c
    chars = {s for s in freq if len(s) == 1}
    multi = sorted(
        ((s, f) for s, f in freq.items() if len(s) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, seed_size - len(chars))]
    vocab = {s: float(freq[s]) for s in chars}
    vocab.update({s: float(f) for s, f in multi})
    total = sum(vocab.values())
    if total <= 0.0:
        return {}
    return {s: v / total for s, v in sorted(vocab.items())}


def _expected_counts(
    words: list[str], counts, probs: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Raw forward-backward expected piece counts over a word set — the
    E-step accumulation WITHOUT normalization. Partition-decomposable:
    per-word contributions are independent, so shard partials sum to the
    full-table result (up to float add order — the sharded trainer's
    documented ~1e-12 tolerance, the nb_classify_sharded precedent)."""
    expected: dict[str, float] = {s: 0.0 for s in probs}
    for w, c in zip(words, counts):
        c = float(c)
        n = len(w)
        # forward: alpha[i] = total prob of all segmentations of w[:i]
        alpha = np.zeros(n + 1)
        alpha[0] = 1.0
        for j in range(1, n + 1):
            lo = max(0, j - max_piece_len)
            a = 0.0
            for i in range(lo, j):
                if alpha[i] > 0.0:
                    p = probs.get(w[i:j])
                    if p:
                        a += alpha[i] * p
            alpha[j] = a
        if alpha[n] <= 0.0:
            continue  # word not coverable (chars pruned elsewhere) — skip
        beta = np.zeros(n + 1)
        beta[n] = 1.0
        for i in range(n - 1, -1, -1):
            hi = min(n, i + max_piece_len)
            b = 0.0
            for j in range(i + 1, hi + 1):
                if beta[j] > 0.0:
                    p = probs.get(w[i:j])
                    if p:
                        b += p * beta[j]
            beta[i] = b
        z = alpha[n]
        for i in range(n):
            if alpha[i] <= 0.0:
                continue
            hi = min(n, i + max_piece_len)
            for j in range(i + 1, hi + 1):
                p = probs.get(w[i:j])
                if p and beta[j] > 0.0:
                    expected[w[i:j]] += c * alpha[i] * p * beta[j] / z
    return expected


def _normalize_expected(expected: dict[str, float]) -> dict[str, float]:
    total = sum(expected.values())
    if total <= 0.0 or not math.isfinite(total):
        # Degenerate mass (all expected counts zero, or a non-finite
        # accumulation): fall back to uniform over the surviving pieces
        # so renormalization can never mint NaN logprobs downstream.
        u = 1.0 / max(1, len(expected))
        return {s: u for s in sorted(expected)}
    return {s: e / total for s, e in expected.items()}


def _em_step(
    words: list[str], counts: np.ndarray, probs: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """One forward-backward E-step + M-step over the distinct-word table.
    Returns the re-normalized expected counts (the new probs)."""
    return _normalize_expected(_expected_counts(words, counts, probs, max_piece_len))


def _train_loop(
    probs: dict[str, float],
    vocab_size: int,
    em_iters: int,
    prune_keep: float,
    em_fn,
) -> list[tuple[str, float]]:
    """The EM + prune loop, shared verbatim by the driver and sharded
    trainers (kernel-sharing rule — only the E-step executor differs)."""
    while True:
        for _ in range(em_iters):
            probs = em_fn(probs)
        n_multi_target = max(0, vocab_size - sum(1 for s in probs if len(s) == 1))
        multi = [(s, p) for s, p in probs.items() if len(s) > 1]
        if len(multi) <= n_multi_target:
            break
        keep_n = max(n_multi_target, int(len(multi) * prune_keep))
        kept = sorted(multi, key=lambda kv: (-kv[1], kv[0]))[:keep_n]
        probs = {s: p for s, p in probs.items() if len(s) == 1}
        probs.update(dict(kept))
        total = sum(probs.values())
        if total <= 0.0 or not math.isfinite(total):
            # All survivors underflowed to 0.0 (tiny vocab_size on a tiny
            # corpus): 0/0 would make every piece NaN and turn Viterbi into
            # an all-<unk> segmenter. Uniform over survivors is exact here —
            # any all-zero vector renormalizes to uniform in the limit.
            u = 1.0 / max(1, len(probs))
            probs = {s: u for s in sorted(probs)}
        else:
            probs = {s: p / total for s, p in sorted(probs.items())}
    pieces = sorted(probs)
    return [(UNK, UNK_LOGP)] + [
        (s, math.log(max(probs[s], 1e-300))) for s in pieces
    ]


def train_unigram(
    docs_ds,
    vocab_size: int = 400,
    seed_size: int = 2000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    prune_keep: float = 0.75,
    sample_fraction: float | None = None,
    seed: int = 0,
    strategy: str = "driver",
    n_shards: int = 8,
) -> list[tuple[str, float]]:
    """Learn the unigram-LM vocabulary. Returns [(piece, logprob), ...]
    with UNK prepended at index 0 — the id space `tokenize_corpus_unigram`
    emits. Single characters are never pruned, so every seen word stays
    coverable.

    ``strategy='sharded'`` (r5, VERDICT r4 #6) is the beyond-ceiling
    path: the word table never reaches the driver — seeding runs as a
    distributed substring-count combine + sort/limit top-k (EXACTLY the
    driver selection: integer counts, (count desc, piece asc) ties),
    and each E-step shards the forward-backward over word-partition
    actors whose float partials the driver sums (identical math per
    word; sums reassociate — the nb_classify_sharded ~1e-12 precedent).
    The driver holds only vocab-bounded state (<= seed_size pieces)."""
    if strategy not in ("driver", "sharded"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if sample_fraction is not None and sample_fraction < 1.0:
        from shaclapi_ray.pipelines.textstats import sample_corpus

        docs_ds = sample_corpus(docs_ds, sample_fraction, seed=seed)

    if strategy == "sharded":
        return _train_unigram_sharded(
            docs_ds, vocab_size, seed_size, max_piece_len, em_iters,
            prune_keep, n_shards,
        )

    from shaclapi_ray.pipelines.bpe import _word_counts

    words, counts = _word_counts(docs_ds)
    probs = _seed_vocab(words, counts, seed_size, max_piece_len)
    return _train_loop(
        probs,
        vocab_size,
        em_iters,
        prune_keep,
        lambda p: _em_step(words, counts, p, max_piece_len),
    )


def _seed_vocab_distributed(tf_ds, seed_size: int, max_piece_len: int):
    """_seed_vocab over a distributed (token, cnt) Dataset: substring
    counts explode per batch into a keyed combine; single chars collect
    (alphabet-bounded); multi pieces select by a distributed
    sort + limit. Selection and normalization are EXACTLY the driver
    path's (integer counts sum exactly in any order below 2^53; the
    (count desc, piece asc) tie-break is total)."""
    from shaclapi_ray.stages.aggregates import combine_partials

    def sub_partial(batch: pa.Table) -> pa.Table:
        freq: dict[str, int] = {}
        for w, c in zip(batch["token"].to_pylist(), batch["cnt"].to_pylist()):
            n = len(w)
            for i in range(n):
                top = min(n, i + max_piece_len)
                for j in range(i + 1, top + 1):
                    s = w[i:j]
                    freq[s] = freq.get(s, 0) + c
        return pa.table(
            {
                "piece": pa.array(list(freq), pa.string()),
                "cnt": pa.array(list(freq.values()), pa.int64()),
            }
        )

    pf = combine_partials(
        tf_ds.map_batches(sub_partial, batch_format="pyarrow", zero_copy_batch=True),
        "piece",
        "cnt",
        "cnt",
        "auto",
    ).materialize()
    import pyarrow.compute as pc

    def only_chars(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(pc.utf8_length(t["piece"]), 1))

    def only_multi(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(pc.utf8_length(t["piece"]), 1))

    chars: dict[str, int] = {}
    for b in pf.map_batches(
        only_chars, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        chars.update(zip(b["piece"].to_pylist(), b["cnt"].to_pylist()))
    k = max(0, seed_size - len(chars))
    multi: dict[str, int] = {}
    if k:
        top = (
            pf.map_batches(only_multi, batch_format="pyarrow", zero_copy_batch=True)
            .sort(["cnt", "piece"], descending=[True, False])
            .limit(k)
        )
        for b in top.iter_batches(batch_format="pyarrow"):
            multi.update(zip(b["piece"].to_pylist(), b["cnt"].to_pylist()))
    vocab = {s: float(c) for s, c in chars.items()}
    vocab.update({s: float(c) for s, c in multi.items()})
    total = sum(vocab.values())
    if total <= 0.0:
        return {}
    return {s: v / total for s, v in sorted(vocab.items())}


def _train_unigram_sharded(
    docs_ds,
    vocab_size: int,
    seed_size: int,
    max_piece_len: int,
    em_iters: int,
    prune_keep: float,
    n_shards: int,
) -> list[tuple[str, float]]:
    import ray

    from shaclapi_ray.pipelines.bpe import _word_count_ds

    tf = _word_count_ds(docs_ds).materialize()
    probs = _seed_vocab_distributed(tf, seed_size, max_piece_len)

    @ray.remote
    class _UgShard:
        def load(self, *tables) -> None:
            self.words: list[str] = []
            self.counts: list[int] = []
            for t in tables:
                self.words.extend(t["token"].to_pylist())
                self.counts.extend(t["cnt"].to_pylist())

        def expected(self, probs: dict, mpl: int) -> dict:
            return _expected_counts(self.words, self.counts, probs, mpl)

    # LAYOUT-INDEPENDENT shard assignment: sorted word ranges split by
    # row count. Upstream block layout varies with context (combine
    # mode, block-size settings); float partials reassociate at shard
    # boundaries, so shard CONTENTS must be a pure function of
    # (word set, n_shards) or near-tie prune rankings flip run-to-run.
    # With n_shards=1 the single shard IS the driver's sorted word
    # order — exact equality, not just tolerance.
    sharded = tf.sort("token").repartition(max(1, n_shards)).materialize()
    refs = sharded.to_arrow_refs()
    actors = [_UgShard.remote() for _ in range(max(1, n_shards))]
    ray.get([a.load.remote(*refs[i :: len(actors)]) for i, a in enumerate(actors)])

    def em_fn(p: dict[str, float]) -> dict[str, float]:
        agg = {s: 0.0 for s in p}
        for part in ray.get([a.expected.remote(p, max_piece_len) for a in actors]):
            for s, v in part.items():
                agg[s] += v
        return _normalize_expected(agg)

    try:
        return _train_loop(probs, vocab_size, em_iters, prune_keep, em_fn)
    finally:
        for a in actors:
            ray.kill(a)


def unigram_self_tokenize(docs_ds, vocab_size: int = 400, seed_size: int = 2000):
    """train_unigram + tokenize_corpus_unigram over the same corpus —
    the single-input composition for the config-driven runner / HTTP
    surface (pass a pre-trained [(piece, logprob)] vocab to
    tokenize_corpus_unigram directly when reusing one)."""
    vocab = train_unigram(docs_ds, vocab_size=vocab_size, seed_size=seed_size)
    return tokenize_corpus_unigram(docs_ds, vocab)


def viterbi_segment(word: str, logp: dict[str, float], max_piece_len: int = 8):
    """Best segmentation under the piece log-probs; unknown characters
    become UNK (one per char). Score ties keep the SMALLEST predecessor
    index at each DP cell (= the longest piece ending there),
    deterministically — the i loop ascends and only strict improvement
    overwrites."""
    n = len(word)
    best = np.full(n + 1, -np.inf)
    best[0] = 0.0
    back = np.zeros(n + 1, dtype=np.int64)
    for j in range(1, n + 1):
        lo = max(0, j - max_piece_len)
        for i in range(lo, j):
            if best[i] == -np.inf:
                continue
            lp = logp.get(word[i:j])
            if lp is None and j - i == 1:
                lp = UNK_LOGP  # unseen char -> UNK
            if lp is None:
                continue
            s = best[i] + lp
            if s > best[j]:
                best[j] = s
                back[j] = i
    out = []
    j = n
    while j > 0:
        i = int(back[j])
        out.append(word[i:j] if word[i:j] in logp else UNK)
        j = i
    return out[::-1]


def _apply_stage(vocab: list[tuple[str, float]], max_piece_len: int):
    """Shared per-batch kernel: dictionary-encode words, Viterbi once per
    DISTINCT word, return (ids per word, counts per word) expanders."""
    logp = {s: lp for s, lp in vocab[1:]}
    piece_id = {s: i for i, (s, _) in enumerate(vocab)}

    def segment_word(w: str) -> list[int]:
        return [piece_id.get(p, UNK_ID) for p in viterbi_segment(w, logp, max_piece_len)]

    return segment_word


def unigram_token_count(
    docs_ds,
    vocab: list[tuple[str, float]],
    max_piece_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, n_ug_tokens): unigram-LM piece count per document."""
    import polars as pl

    from shaclapi_ray.pipelines.textstats import TOKEN_RE

    segment_word = _apply_stage(vocab, max_piece_len)

    def fn(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "doc_id": pl.from_arrow(batch[id_col].combine_chunks()),
                "t": pl.from_arrow(batch[text_col].combine_chunks()).fill_null(""),
            }
        ).with_columns(pl.col("t").str.extract_all(TOKEN_RE).alias("w"))
        exploded = df.select("doc_id", "w").explode("w").drop_nulls("w")
        uw = exploded["w"].unique().sort()
        n_pieces = {w: len(segment_word(w)) for w in uw}
        per_doc = (
            exploded.with_columns(
                pl.col("w").replace_strict(n_pieces, return_dtype=pl.Int64).alias("np")
            )
            .group_by("doc_id")
            .agg(pl.col("np").sum().alias("n_ug_tokens"))
        )
        out = (
            df.select("doc_id")
            .join(per_doc, on="doc_id", how="left")
            .with_columns(pl.col("n_ug_tokens").fill_null(0))
        )
        if id_col != "doc_id":
            out = out.rename({"doc_id": id_col})
        return out.to_arrow()

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def tokenize_corpus_unigram(
    docs_ds,
    vocab: list[tuple[str, float]],
    max_piece_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, token_ids list<int64>, n_ug_tokens): the trainable-layout
    sibling of bpe.tokenize_corpus — ids index into ``vocab`` (UNK=0).
    Per-batch cost is Viterbi once per DISTINCT word + a ragged gather."""
    import polars as pl

    from shaclapi_ray.pipelines.bpe import _id_list_array
    from shaclapi_ray.pipelines.textstats import TOKEN_RE

    segment_word = _apply_stage(vocab, max_piece_len)

    def fn(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "doc_id": pl.from_arrow(batch[id_col].combine_chunks()),
                "t": pl.from_arrow(batch[text_col].combine_chunks()).fill_null(""),
            }
        ).with_columns(pl.col("t").str.extract_all(TOKEN_RE).alias("w"))
        ids_per_doc: list[np.ndarray] = []
        cache: dict[str, np.ndarray] = {}  # Viterbi once per DISTINCT word/batch
        for ws in df["w"].to_list():
            if not ws:
                ids_per_doc.append(np.empty(0, np.int64))
                continue
            parts = []
            for w in ws:
                got = cache.get(w)
                if got is None:
                    got = cache[w] = np.asarray(segment_word(w), np.int64)
                parts.append(got)
            ids_per_doc.append(np.concatenate(parts))
        lens = np.array([a.size for a in ids_per_doc], np.int64)
        flat = (
            np.concatenate(ids_per_doc) if ids_per_doc else np.empty(0, np.int64)
        )
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "token_ids": _id_list_array(offsets, flat),
                "n_ug_tokens": pa.array(lens, pa.int64()),
            }
        )

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
