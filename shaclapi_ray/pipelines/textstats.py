"""Text-analysis operators over a documents table (doc_id, text, ...).

Large-scale training-data pipeline stages: token counting, quality
signals, language-ID heuristic, document fingerprinting. All vectorized
(pyarrow.compute regex kernels; fingerprinting uses DuckDB's C++ md5 over
the Arrow batch — see stages/md5kernel.py).

Every count-producing operator returns INTEGER columns so results are
bit-exact across engines (the DuckDB oracles share the same regexes).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Whitespace-token runs, written as an EXPLICIT class instead of \S+:
# RE2 (pyarrow kernels, every DuckDB oracle) treats \s as exactly
# [\t\n\f\r ] while polars' Rust regex \s is Unicode-aware (adds \v,
# NBSP, U+2000.., U+3000 — all common in real web text), so a literal
# \S+ silently tokenizes differently per engine. This class IS RE2's
# \S (verified empirically), so polars/pyarrow/DuckDB agree on every
# input; SQL mirrors may keep '\S+' — identical by construction.
TOKEN_RE = r"[^ \t\n\f\r]+"
# GPT-2-style pretokenizer, restricted to RE2 (no lookahead): contraction
# tails, space-prefixed letter/digit runs, space-prefixed punctuation runs
BPE_TOKEN_RE = r"'[a-z]+| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
PUNCT_RE = r"[.!?,;:]"
DIGIT_RE = r"[0-9]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em"],
}


def _word_alt_pattern(words: list[str]) -> str:
    # \b word-boundary alternation — identical semantics in RE2 (Arrow) and
    # DuckDB's RE2-based regexp_extract_all
    return r"\b(" + "|".join(words) + r")\b"


def token_count(docs_ds):
    """(doc_id, n_tokens, n_bpe_tokens): whitespace-delimited token count
    plus a BPE-ish pretokenizer count (BPE_TOKEN_RE — the subword-model
    input unit; both RE2 kernels, shared verbatim with the oracle)."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pc.cast(
                    pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64()
                ),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(batch["text"], BPE_TOKEN_RE),
                    pa.int64(),
                ),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SAMPLE_KNUTH = 2654435761  # Knuth multiplicative hash constant


def sample_corpus(docs_ds, fraction: float, seed: int = 0):
    """Deterministic corpus subsample: keep rows where
    ((doc_id + seed) * 2654435761) mod 2^32 < fraction * 2^32.

    Unlike ``Dataset.random_sample`` this is REPRODUCIBLE across runs,
    cluster sizes and block layouts (pure per-row arithmetic — no RNG
    state), so a sampled training corpus can be re-derived exactly;
    change ``seed`` for independent samples. Vectorized int64 kernels;
    identical arithmetic in the DuckDB oracle."""
    import numpy as np

    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(fraction * (1 << 32))

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids + seed) * SAMPLE_KNUTH) % (1 << 32)
        return batch.filter(pa.array(h < threshold))

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sample_stratified(
    docs_ds,
    fractions: dict[str, float],
    group_col: str = "lang",
    default: float = 0.0,
    seed: int = 0,
):
    """Deterministic PER-GROUP subsample: keep a row iff
    ((doc_id + seed) * KNUTH) mod 2^32 < fractions[group] * 2^32 —
    the language-rebalancing sampler of a multilingual corpus pipeline
    (e.g. keep 10% of English, 100% of low-resource languages). Same
    reproducibility contract as sample_corpus (pure per-row arithmetic,
    identical across runs/cluster sizes/block layouts; the kept set for
    a group at fraction f is a SUBSET of the set at any f' > f, so
    ratios can be tuned without churning the sample). Groups absent
    from ``fractions`` use ``default``. Vectorized via dictionary
    encoding — one hash pass + one threshold lookup per batch."""
    import numpy as np

    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for group {g!r} must be in [0, 1]")
    if not 0.0 <= default <= 1.0:
        raise ValueError("default fraction must be in [0, 1]")
    thresholds = {g: int(f * (1 << 32)) for g, f in fractions.items()}
    default_t = int(default * (1 << 32))

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids + seed) * SAMPLE_KNUTH) % (1 << 32)
        g = pc.fill_null(batch[group_col].combine_chunks(), "").dictionary_encode()
        uniq = g.dictionary.to_pylist()
        t_by_code = np.array(
            [thresholds.get(u, default_t) for u in uniq], dtype=np.int64
        )
        codes = g.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        thr = (
            t_by_code[codes]
            if len(uniq)
            else np.full(len(ids), default_t, dtype=np.int64)
        )
        return batch.filter(pa.array(h < thr))

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}[ \-][0-9]{2,4}[ \-][0-9]{3,4}[ \-]?[0-9]{0,4}"


def pii_scan(docs_ds):
    """(doc_id, email_count, ipv4_count, phone_count, red_text): PII
    pattern counts plus the redacted text (matches replaced with typed
    placeholders) — the scrub stage of a web-corpus training pipeline.
    All RE2 kernels (count_substring_regex / replace_substring_regex),
    patterns shared verbatim with the DuckDB oracle."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        red = pc.replace_substring_regex(t, EMAIL_RE, "<EMAIL>")
        red = pc.replace_substring_regex(red, IPV4_RE, "<IP>")
        red = pc.replace_substring_regex(red, PHONE_RE, "<PHONE>")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "email_count": pc.cast(
                    pc.count_substring_regex(t, EMAIL_RE), pa.int64()
                ),
                "ipv4_count": pc.cast(
                    pc.count_substring_regex(t, IPV4_RE), pa.int64()
                ),
                "phone_count": pc.cast(
                    pc.count_substring_regex(t, PHONE_RE), pa.int64()
                ),
                "red_text": red,
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(docs_ds):
    """(doc_id, norm_text): canonical text for downstream dedup/analysis —
    Unicode NFC, lowercase, whitespace runs collapsed to single spaces,
    trimmed. Entirely Arrow kernels (utf8_normalize / utf8_lower /
    replace_substring_regex), zero-copy in, one new string column out;
    semantics chosen to be bit-identical to DuckDB's
    nfc_normalize/lower/regexp_replace for the shared oracle."""

    def fn(batch: pa.Table) -> pa.Table:
        t = pc.utf8_normalize(batch["text"], form="NFC")
        t = pc.utf8_lower(t)
        t = pc.replace_substring_regex(t, r"\s+", " ")
        # trim plain spaces only (\s+ already collapsed RE2-\s runs; both
        # engines' RE2 \s is ASCII-only, and DuckDB trim() is space-only)
        t = pc.utf8_trim(t, characters=" ")
        return pa.table({"doc_id": batch["doc_id"], "norm_text": t})

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_signals(docs_ds):
    """(doc_id, n_chars, n_tokens, punct_count, digit_count, stop_count_en):
    integer quality signals for filtering (length/punct/stopword ratios are
    computed downstream from these exact counts)."""
    en_pat = _word_alt_pattern(STOPWORDS["en"])

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(text, TOKEN_RE), pa.int64()
                ),
                "punct_count": pc.cast(
                    pc.count_substring_regex(text, PUNCT_RE), pa.int64()
                ),
                "digit_count": pc.cast(
                    pc.count_substring_regex(text, DIGIT_RE), pa.int64()
                ),
                "stop_count_en": pc.cast(
                    pc.count_substring_regex(text, en_pat), pa.int64()
                ),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lang_id(docs_ds):
    """(doc_id, lang_pred, lang_score): stopword-hit language heuristic.

    argmax over per-language stopword-occurrence counts; ties broken by
    language-code sort order (deterministic). lang_score = the winning
    count (integer)."""
    pats = {lang: _word_alt_pattern(ws) for lang, ws in sorted(STOPWORDS.items())}

    def fn(batch: pa.Table) -> pa.Table:
        counts = {
            lang: pc.cast(
                pc.count_substring_regex(batch["text"], pat), pa.int64()
            )
            for lang, pat in pats.items()
        }
        langs = sorted(counts)
        best_lang = pa.array(["und"] * batch.num_rows, type=pa.string())
        best_score = pa.array([0] * batch.num_rows, type=pa.int64())
        # first language in sort order wins ties: iterate in REVERSE order
        # and use >= so earlier langs overwrite on equality
        for lang in reversed(langs):
            better = pc.greater_equal(counts[lang], best_score)
            nonzero = pc.greater(counts[lang], 0)
            take = pc.and_(better, nonzero)
            best_lang = pc.if_else(take, lang, best_lang)
            best_score = pc.if_else(take, counts[lang], best_score)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": best_lang,
                "lang_score": best_score,
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class Fingerprinter:
    """Actor-pool stage: md5 content fingerprint per document (stable,
    engine-agnostic — DuckDB md5() matches)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from shaclapi_ray.stages.md5kernel import md5_hex

        return pa.table({"doc_id": batch["doc_id"], "fp": md5_hex(batch["text"])})


def fingerprint(docs_ds, concurrency=None):
    """(doc_id, fp): md5 of text. Stateless -> task path by default
    (no actor ramp-up); pass ``concurrency`` to force an actor pool."""
    if concurrency:
        return docs_ds.map_batches(
            Fingerprinter,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    return docs_ds.map_batches(
        Fingerprinter(), batch_format="pyarrow", zero_copy_batch=True
    )


def repetition_signals(docs_ds):
    """(doc_id, n_lines, n_unique_lines, n_words, n_unique_words):
    Gopher-style repetition/diversity counts for quality filtering —
    duplicate-line fraction and type-token ratio are computed downstream
    from these exact integers (Rae et al. 2021, "Scaling Language Models",
    §A1.1 repetition filters). Vectorized polars list kernels (split /
    extract_all + list.len / list.n_unique); no per-row loops. The DuckDB
    oracle shares the same split semantics (string_split / list_distinct /
    regexp_extract_all)."""
    import polars as pl

    def fn(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        lines = pl.col("text").str.split("\n")
        words = pl.col("text").str.extract_all(TOKEN_RE)
        out = df.select(
            pl.col("doc_id"),
            lines.list.len().cast(pl.Int64).alias("n_lines"),
            lines.list.n_unique().cast(pl.Int64).alias("n_unique_lines"),
            words.list.len().cast(pl.Int64).alias("n_words"),
            words.list.n_unique().cast(pl.Int64).alias("n_unique_words"),
        )
        # top-word dominance (Gopher: "fraction of most common word"):
        # occurrence count of the doc's most frequent token, 0 when
        # tokenless — the ratio is computed downstream
        counts = (
            df.with_columns(words.alias("w"))
            .select("doc_id", "w")
            .explode("w")
            .filter(pl.col("w").is_not_null())
            .group_by("doc_id", "w")
            .len()
            .group_by("doc_id")
            .agg(pl.col("len").max().cast(pl.Int64).alias("max_word_count"))
        )
        out = out.join(counts, on="doc_id", how="left").with_columns(
            pl.col("max_word_count").fill_null(0)
        )
        return out.to_arrow()

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


TOPK_PER_GROUP = 3


def top_docs_per_group(docs_ds, k: int = TOPK_PER_GROUP, group_col: str = "lang"):
    """(lang, doc_id, n_chars, rank): the k largest documents per group —
    grouped top-k, the per-domain/per-language selection step of corpus
    curation. Two-level: each batch pre-truncates to its local top-k per
    group (vectorized polars sort + group head — the combiner), so the
    keyed shuffle moves at most k rows per (group, batch), never the
    corpus; the final groupby finishes the merge. Ties break by doc_id
    ascending — deterministic."""
    import polars as pl

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([group_col, "doc_id", "n_chars"]))
        out = (
            df.sort(["n_chars", "doc_id"], descending=[True, False])
            .group_by(group_col, maintain_order=True)
            .head(k)
        )
        return out.to_arrow()

    def final(g):
        import pandas as pd

        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = pd.RangeIndex(1, len(g) + 1).astype("int64")
        return g[[group_col, "doc_id", "n_chars", "rank"]]

    partials = docs_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby(group_col).map_groups(final, batch_format="pandas")


def _explode_tokens(batch: pa.Table, cols: list[str]):
    """polars frame of ``cols`` plus the exploded token column 't'
    (TOKEN_RE matches, null rows dropped) — the ONE tokenize kernel
    shared by every corpus operator here, mirrored by the single \\S+
    regex in the DuckDB oracles; change it in exactly one place."""
    import polars as pl

    df = pl.from_arrow(batch.select([*cols, "text"]))
    return (
        df.with_columns(pl.col("text").str.extract_all(TOKEN_RE).alias("t"))
        .drop("text")
        .explode("t")
        .filter(pl.col("t").is_not_null())
    )


def doc_frequency(docs_ds, min_df: int = 1):
    """(token, df): document frequency of every whitespace token — the
    inverted-index / IDF statistics build of a corpus pipeline.

    Shuffle discipline: each batch first reduces to DISTINCT (doc, token)
    and pre-counts per token (the combiner), so the groupby(token)
    all-to-all moves one row per (token, batch) — proportional to
    vocabulary, not corpus size. min_df filters AFTER the global sum
    (a token can be rare in one batch, frequent overall)."""
    import polars as pl
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = _explode_tokens(batch, ["doc_id"]).unique()
        counts = toks.group_by("t").agg(pl.len().cast(pl.Int64).alias("df"))
        return counts.rename({"t": "token"}).to_arrow()

    from shaclapi_ray.stages.aggregates import combine_partials_multi

    partials = docs_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = combine_partials_multi(partials, ["token"], ["df"])

    def finish(t: pa.Table) -> pa.Table:
        t = pa.table(
            {"token": t["token"], "df": pc.cast(t["df"], pa.int64())}
        )
        if min_df > 1:
            t = t.filter(pc.greater_equal(t["df"], min_df))
        return t

    return out.map_batches(finish, batch_format="pyarrow")


TFIDF_HASH_SEED = 0xBEEF


def tfidf_top_terms(docs_ds, k: int = 5, min_df: int = 1):
    """(doc_id, token, tf, tfidf, rank): the top-``k`` tokens of every
    document by TF-IDF (tfidf = tf * ln(N / df), rounded to 6 decimals) —
    the keyword/topic-signal stage of a corpus pipeline. Rank is 1-based,
    ties break token-ascending; tokens below ``min_df`` are excluded.

    Two-pass broadcast design: pass 1 is doc_frequency's combiner-first
    groupby (shuffle volume ∝ vocabulary); the resulting (token, idf)
    vocabulary is collected ONCE, hashed/sorted into two numpy arrays and
    ray.put — each map task reads it zero-copy from the object store (no
    per-task rebuild, no per-batch join). Pass 2 is embarrassingly
    parallel: one doc = one row, so per-doc tf and top-k never shuffle.
    Scale bound: the broadcast is vocabulary-sized (prune with min_df);
    beyond object-store vocab sizes, switch to a keyed token join."""
    import numpy as np
    import polars as pl
    import ray

    n_docs = docs_ds.count()
    vocab = doc_frequency(docs_ds, min_df=min_df).to_pandas()
    if len(vocab) == 0:
        # empty vocabulary (min_df filtered every token): an empty
        # Dataset.to_pandas() loses its schema, so vocab['token'] below
        # would KeyError — and nothing can match anyway
        import ray.data as _rd

        return _rd.from_arrow(
            pl.DataFrame(
                schema={
                    "doc_id": pl.Int64,
                    "token": pl.String,
                    "tf": pl.Int64,
                    "tfidf": pl.Float64,
                    "rank": pl.Int64,
                }
            ).to_arrow()
        )
    h = (
        pl.Series("t", vocab["token"].to_numpy())
        .hash(seed=TFIDF_HASH_SEED)
        .to_numpy()
    )
    order = np.argsort(h)
    idf = np.log(n_docs / vocab["df"].to_numpy(np.float64))
    vocab_ref = ray.put((h[order], idf[order]))

    def _empty() -> pa.Table:
        # built via polars so the Arrow types (large_string etc.) match
        # the non-empty blocks exactly
        return (
            pl.DataFrame(
                schema={
                    "doc_id": pl.Int64,
                    "token": pl.String,
                    "tf": pl.Int64,
                    "tfidf": pl.Float64,
                    "rank": pl.Int64,
                }
            )
        ).to_arrow()

    def fn(batch: pa.Table) -> pa.Table:
        hashes, idfs = ray.get(vocab_ref)
        if len(hashes) == 0:
            # empty vocabulary (e.g. min_df filtered every token):
            # hashes[pos_c]/idfs[pos_c] below would IndexError on any
            # non-empty batch — nothing can match, so short-circuit
            return _empty()
        tf = (
            _explode_tokens(batch, ["doc_id"])
            .group_by(["doc_id", "t"])
            .agg(pl.len().cast(pl.Int64).alias("tf"))
        )
        if tf.height == 0:
            return _empty()
        th = tf["t"].hash(seed=TFIDF_HASH_SEED).to_numpy()
        pos = np.searchsorted(hashes, th)
        pos_c = np.minimum(pos, max(len(hashes) - 1, 0))
        found = (len(hashes) > 0) & (hashes[pos_c] == th)
        out = (
            tf.with_columns(
                pl.Series("tfidf", tf["tf"].to_numpy() * idfs[pos_c]).round(6),
                pl.Series("found", found),
            )
            .filter(pl.col("found"))
            .sort(["doc_id", "tfidf", "t"], descending=[False, True, False])
            .with_columns(
                (pl.int_range(pl.len()).over("doc_id") + 1).alias("rank")
            )
            .filter(pl.col("rank") <= k)
        )
        return out.select(
            pl.col("doc_id"),
            pl.col("t").alias("token"),
            pl.col("tf"),
            pl.col("tfidf"),
            pl.col("rank").cast(pl.Int64),
        ).to_arrow()

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def rebalance_corpus(docs_ds, seed: int = 0):
    """(doc_id, lang_pred): class-balanced subsample — every language
    class (per the lang_id heuristic) downsampled to the MINORITY class
    size, the data-mixing step that equalizes domain/language proportions
    before training. Rows with null text are dropped.

    Pass 1 classifies per batch and pre-aggregates per-class counts (the
    shuffle moves one row per (class, batch)); the driver derives one
    exact integer threshold per class, thr = (min_count << 32) //
    class_count. Pass 2 re-classifies (cheap regex — recomputing beats
    materializing a doc_id->lang table at scale) and keeps rows where the
    sample_corpus Knuth hash < thr[class] — deterministic across runs,
    cluster sizes and block layouts, and exactly reproducible in SQL
    (integer arithmetic only, no float rounding)."""
    import numpy as np
    from ray.data.aggregate import Sum

    def classify(batch: pa.Table):
        keep = pc.is_valid(batch["text"])
        batch = batch.filter(keep)
        pats = {l: _word_alt_pattern(ws) for l, ws in sorted(STOPWORDS.items())}
        counts = {
            lang: pc.cast(pc.count_substring_regex(batch["text"], pat), pa.int64())
            for lang, pat in pats.items()
        }
        best_lang = pa.array(["und"] * batch.num_rows, type=pa.string())
        best_score = pa.array([0] * batch.num_rows, type=pa.int64())
        for lang in reversed(sorted(counts)):
            take = pc.and_(
                pc.greater_equal(counts[lang], best_score),
                pc.greater(counts[lang], 0),
            )
            best_lang = pc.if_else(take, lang, best_lang)
            best_score = pc.if_else(take, counts[lang], best_score)
        return batch, best_lang

    def partial_counts(batch: pa.Table) -> pa.Table:
        batch, lang = classify(batch)
        g = pa.table({"lang_pred": lang}).group_by("lang_pred").aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"lang_pred": g["lang_pred"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts_tbl = (
        docs_ds.map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang_pred")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    cnt = dict(zip(counts_tbl["lang_pred"], counts_tbl["n"].astype(int)))
    if not cnt:
        return docs_ds.map_batches(
            lambda b: pa.table(
                {"doc_id": pa.array([], pa.int64()), "lang_pred": pa.array([], pa.string())}
            ),
            batch_format="pyarrow",
        )
    m = min(cnt.values())
    thr = {lang: (m << 32) // n for lang, n in cnt.items()}

    def sample(batch: pa.Table) -> pa.Table:
        batch, lang = classify(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids + seed) * SAMPLE_KNUTH) % (1 << 32)
        lang_np = lang.to_numpy(zero_copy_only=False)
        t = np.zeros(len(ids), dtype=np.int64)
        for l, v in thr.items():
            t[lang_np == l] = v
        mask = pa.array(h < t)
        return pa.table(
            {
                "doc_id": pc.filter(batch["doc_id"], mask),
                "lang_pred": pc.filter(lang, mask),
            }
        )

    return docs_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


CHUNK_CHARS = 200
CHUNK_OVERLAP = 50


def chunk_text(docs_ds, chunk_chars: int = CHUNK_CHARS, overlap: int = CHUNK_OVERLAP):
    """(doc_id, chunk_id, chunk, n_chunk_chars): fixed-size overlapping
    character chunks — the 1->N sharding step that turns documents into
    training/RAG sequences. Chunk i covers characters [i*stride,
    i*stride + chunk_chars) with stride = chunk_chars - overlap; every
    character is in at least one chunk; docs with empty/null text emit no
    chunks.

    Vectorized 1->N explode: per-batch chunk counts from utf8_length,
    row repetition via take(np.repeat), per-row slicing via polars
    str.slice with a per-row offset column (character-based — verified
    identical to DuckDB substr). No per-doc Python loops. The explode
    happens inside map_batches, so output block sizes stay bounded by
    the input batch size times the worst-case expansion — size
    batch_size down for very long documents."""
    import numpy as np
    import polars as pl

    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap

    def fn(batch: pa.Table) -> pa.Table:
        lens = pc.fill_null(pc.utf8_length(batch["text"]), 0).to_numpy(
            zero_copy_only=False
        )
        n_chunks = np.where(lens > 0, (np.maximum(lens, 1) - 1) // stride + 1, 0)
        idx = np.repeat(np.arange(len(lens)), n_chunks)
        doc_starts = np.concatenate(([0], np.cumsum(n_chunks)[:-1].astype(np.int64)))
        chunk_id = np.arange(idx.size, dtype=np.int64) - np.repeat(
            doc_starts, n_chunks
        )
        rep = batch.select(["doc_id", "text"]).take(pa.array(idx))
        df = pl.from_arrow(rep).with_columns(
            pl.Series("chunk_id", chunk_id),
            pl.Series("off", chunk_id * stride),
        )
        out = df.select(
            pl.col("doc_id"),
            pl.col("chunk_id"),
            pl.col("text").str.slice(pl.col("off"), chunk_chars).alias("chunk"),
        ).with_columns(pl.col("chunk").str.len_chars().cast(pl.Int64).alias("n_chunk_chars"))
        return out.to_arrow()

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


GOPHER_STOPWORDS = ("and", "be", "have", "of", "that", "the", "to", "with")


def gopher_rules(
    docs_ds,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    return_docs: bool = False,
):
    """(doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_frac, n_stop_hits, gopher_pass): the Gopher
    document-quality rules (Rae et al. 2021, Table A1) as one composite
    boolean filter plus every contributing signal:

    - word count in [min_words, max_words]
    - mean word length in [min_mean_word_len, max_mean_word_len]
      (non-whitespace chars / words)
    - '#'/'...' symbol-to-word ratio <= max_symbol_ratio
    - fraction of lines starting with a bullet (- * •) <= max_bullet_frac
    - fraction of lines ending with an ellipsis <= max_ellipsis_frac
    - fraction of words containing an alphabetic char >= min_alpha_frac
    - at least min_stop_hits DISTINCT Gopher stop words present

    Ratios are rounded to 6 decimals BEFORE thresholding (the tfidf
    precedent) so the float arithmetic hashes identically to the DuckDB
    oracle. Row-local, one streaming pass, vectorized polars.

    ``return_docs=True`` returns the surviving FULL rows (every input
    column, gopher_pass == false rows removed) instead of the signal
    table — the rules are row-local so the filter happens inside the
    same streaming pass."""
    import polars as pl

    stop_alt = "|".join(GOPHER_STOPWORDS)

    def fn(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
            pl.col("text").fill_null("")
        )
        t = pl.col("text")
        nw = t.str.count_matches(TOKEN_RE).cast(pl.Int64)
        out = df.with_columns(
            nw.alias("n_words"),
            t.str.replace_all(r"\s", "").str.len_chars().cast(pl.Int64).alias("_nchars"),
            t.str.count_matches(r"#|\.\.\.").cast(pl.Int64).alias("_sym"),
        )
        lines = (
            df.with_columns(t.str.split("\n").alias("l"))
            .select("doc_id", "l")
            .explode("l")
            .with_columns(
                pl.col("l")
                .str.strip_chars(WS_STRIP)
                .str.contains(r"^[-*•]")
                .alias("b"),
                pl.col("l")
                .str.strip_chars(WS_STRIP)
                .str.contains(r"(\.\.\.|…)$")
                .alias("e"),
            )
            .group_by("doc_id")
            .agg(
                pl.len().cast(pl.Int64).alias("_nlines"),
                pl.col("b").sum().cast(pl.Int64).alias("_nbullet"),
                pl.col("e").sum().cast(pl.Int64).alias("_nellip"),
            )
        )
        words = (
            df.with_columns(t.str.extract_all(TOKEN_RE).alias("w"))
            .select("doc_id", "w")
            .explode("w")
            .filter(pl.col("w").is_not_null())
            .group_by("doc_id")
            .agg(
                pl.col("w")
                .str.contains(r"[A-Za-z]")
                .sum()
                .cast(pl.Int64)
                .alias("_nalpha"),
                pl.col("w")
                .filter(pl.col("w").str.contains(rf"^({stop_alt})$"))
                .n_unique()
                .cast(pl.Int64)
                .alias("n_stop_hits"),
            )
        )
        r6 = lambda e: (e * 1e6).round(0) / 1e6  # noqa: E731
        out = (
            out.join(lines, on="doc_id", how="left")
            .join(words, on="doc_id", how="left")
            .with_columns(
                pl.col("_nalpha").fill_null(0),
                pl.col("n_stop_hits").fill_null(0),
            )
            .with_columns(
                r6(
                    pl.when(nw > 0)
                    .then(pl.col("_nchars") / nw)
                    .otherwise(0.0)
                ).alias("mean_word_len"),
                r6(
                    pl.when(nw > 0).then(pl.col("_sym") / nw).otherwise(0.0)
                ).alias("symbol_ratio"),
                r6(pl.col("_nbullet") / pl.col("_nlines")).alias("bullet_frac"),
                r6(pl.col("_nellip") / pl.col("_nlines")).alias("ellipsis_frac"),
                r6(
                    pl.when(nw > 0)
                    .then(pl.col("_nalpha") / nw)
                    .otherwise(0.0)
                ).alias("alpha_frac"),
            )
        )
        out = out.with_columns(
            (
                (pl.col("n_words") >= min_words)
                & (pl.col("n_words") <= max_words)
                & (pl.col("mean_word_len") >= min_mean_word_len)
                & (pl.col("mean_word_len") <= max_mean_word_len)
                & (pl.col("symbol_ratio") <= max_symbol_ratio)
                & (pl.col("bullet_frac") <= max_bullet_frac)
                & (pl.col("ellipsis_frac") <= max_ellipsis_frac)
                & (pl.col("alpha_frac") >= min_alpha_frac)
                & (pl.col("n_stop_hits") >= min_stop_hits)
            ).alias("gopher_pass")
        )
        if return_docs:
            import numpy as np

            passing = out.filter(pl.col("gopher_pass"))["doc_id"].to_numpy()
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(np.isin(ids, passing)))
        return out.select(
            "doc_id",
            "n_words",
            "mean_word_len",
            "symbol_ratio",
            "bullet_frac",
            "ellipsis_frac",
            "alpha_frac",
            "n_stop_hits",
            "gopher_pass",
        ).to_arrow()

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


TERMINAL_PUNCT_RE = r'[.!?"]$'  # applied to the trimmed line
WS_STRIP = " \t\n\r\x0b\x0c"  # explicit so the SQL oracle trims identically


def clean_lines(
    docs_ds,
    min_words: int = 5,
    require_terminal_punct: bool = True,
    drop_brace_lines: bool = True,
    dedup_lines: bool = True,
    keep_cols: tuple = (),
):
    """(doc_id, clean_text, n_kept_lines, n_dropped_lines): the C4
    line-level cleaning pass (Raffel et al. 2020): keep only lines with
    at least ``min_words`` whitespace tokens, (optionally) ending in
    terminal punctuation (. ! ? \"), and not containing '{' (code/
    template debris); ``dedup_lines`` additionally keeps only the FIRST
    occurrence of each exact line within a document (C4 also removes
    repeated boilerplate lines). One output row per input document;
    kept lines re-join with newlines in original order.

    Row-local (one streaming map_batches pass, no shuffle — the within-
    doc dedup needs only the doc's own lines, which never straddle
    batches); all rules are vectorized polars kernels mirrored exactly
    by ``oracles.clean_lines_sql``."""
    import polars as pl

    def fn(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(
            batch.select(["doc_id", "text", *keep_cols])
        ).with_columns(pl.col("text").fill_null(""))
        lines = (
            df.select("doc_id", "text")
            .with_columns(pl.col("text").str.split("\n").alias("l"))
            .drop("text")
            .explode("l")
            .with_columns(pl.int_range(pl.len()).over("doc_id").alias("idx"))
        )
        trimmed = pl.col("l").str.strip_chars(WS_STRIP)
        keep = trimmed.str.count_matches(TOKEN_RE) >= min_words
        if require_terminal_punct:
            keep = keep & trimmed.str.contains(TERMINAL_PUNCT_RE)
        if drop_brace_lines:
            keep = keep & ~pl.col("l").str.contains("{", literal=True)
        kept = lines.filter(keep)
        if dedup_lines:
            kept = kept.filter(
                pl.col("l").cum_count().over(["doc_id", "l"]) == 1
            )
        agg = (
            kept.sort(["doc_id", "idx"])
            .group_by("doc_id", maintain_order=True)
            .agg(
                pl.col("l").str.join("\n").alias("clean_text"),
                pl.len().cast(pl.Int64).alias("n_kept_lines"),
            )
        )
        totals = lines.group_by("doc_id").agg(
            pl.len().cast(pl.Int64).alias("n_lines")
        )
        out = (
            df.select("doc_id", *keep_cols)
            .join(totals, on="doc_id", how="left")
            .join(agg, on="doc_id", how="left")
            .with_columns(
                pl.col("clean_text").fill_null(""),
                pl.col("n_kept_lines").fill_null(0),
            )
            .with_columns(
                (pl.col("n_lines") - pl.col("n_kept_lines")).alias(
                    "n_dropped_lines"
                )
            )
            .select(
                "doc_id",
                *keep_cols,
                "clean_text",
                "n_kept_lines",
                "n_dropped_lines",
            )
        )
        return out.to_arrow()

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def compression_signals(docs_ds, level: int = 6):
    """(doc_id, n_bytes, n_compressed, compression_ratio): per-document
    zlib redundancy signal — the RefinedWeb/Gopher-family quality
    heuristic: highly repetitive/boilerplate text compresses far below
    natural prose, so a HIGH ratio (n_bytes / n_compressed) marks
    low-entropy documents and a ratio near 1 marks natural or
    high-entropy text. ``level`` is the zlib level (6 = the stdlib
    default; the signal is deterministic for a fixed level AND a fixed
    zlib BUILD — compressed sizes differ between madler zlib and zlib-ng,
    common in conda/distro pythons, so the pinned golden is only valid on
    the zlib build that generated it; the golden test asserts
    ``zlib.ZLIB_RUNTIME_VERSION`` so a mismatch fails loudly with the
    real cause instead of a bogus value diff).

    Empty/null documents get ratio 0.0 (n_bytes = 0), keeping them
    distinguishable from incompressible text (~1.0). One streaming
    map_batches pass; the per-row work is stdlib zlib (C speed) over
    utf-8 bytes — no SQL analog (DuckDB has no compressor), so the
    driver check is a pinned golden and semantics are asserted by
    direct-recompute + planted-redundancy tests."""
    import zlib

    import numpy as np

    def fn(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n_bytes = np.empty(len(arr), dtype=np.int64)
        n_comp = np.empty(len(arr), dtype=np.int64)
        for i, v in enumerate(arr):
            s = v.as_py()
            b = s.encode("utf-8") if s else b""
            n_bytes[i] = len(b)
            n_comp[i] = len(zlib.compress(b, level))
        ratio = np.where(n_bytes > 0, n_bytes / np.maximum(n_comp, 1), 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes),
                "n_compressed": pa.array(n_comp),
                "compression_ratio": pa.array(ratio),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


ROLL_B = 1000003  # odd => invertible mod 2^64


def rolling_fingerprint(docs_ds, window: int = 32, concurrency=None):
    """(doc_id, fp_min): minimum 64-bit rolling (Rabin-Karp style) hash
    h_i = sum_j text_bytes[i+j] * B^(w-1-j) (mod 2^64) over ALL byte
    windows of the FULL document — a locality-sensitive fingerprint used
    for near-dup candidate buckets. Deterministic; no SQL analog (golden
    unit test instead). Docs shorter than the window get fp_min = 0.

    Vectorized across the whole batch AND zero-copy: the Arrow string
    value buffer is the concatenated byte stream (offsets = doc
    boundaries), every window hash comes from ONE O(n) prefix-sum pass
    (h_i = B^(i+w-1) * (S[i+w] - S[i]) with S the cumulative sum of
    data[j]*B^(-j) mod 2^64 — B is odd, hence invertible), windows
    crossing doc boundaries are masked arithmetically, and the
    per-doc minimum is a reduceat. No per-doc loops, no n*w matrix, no
    length truncation."""
    import numpy as np

    class Roller:
        def __init__(self):
            self.window = window
            self.inv = np.uint64(pow(ROLL_B, -1, 1 << 64))
            self.b = np.uint64(ROLL_B)

        def __call__(self, batch: pa.Table) -> pa.Table:
            w = self.window
            n_docs = batch.num_rows
            out = np.zeros(n_docs, dtype=np.uint64)
            # ZERO-COPY: the Arrow string value buffer is already the
            # concatenated utf-8 stream; its offsets are the doc
            # boundaries. Window hashes are position-relative, so this
            # yields byte-identical fingerprints to the old per-doc
            # encode + 0xFF-join construction.
            txt = pc.fill_null(batch["text"].combine_chunks(), "")
            vbuf = txt.buffers()[2]
            if n_docs and vbuf is not None:
                odt = np.int64 if pa.types.is_large_string(txt.type) else np.int32
                off = np.frombuffer(txt.buffers()[1], dtype=odt)[
                    txt.offset : txt.offset + n_docs + 1
                ].astype(np.int64, copy=False)
                data = np.frombuffer(vbuf, dtype=np.uint8)[off[0] : off[-1]]
                doc_starts = off[:-1] - off[0]
                n = data.size
                if n >= w:
                    d64 = data.astype(np.uint64)
                    pow_b = np.concatenate(
                        ([np.uint64(1)], np.cumprod(np.full(n, self.b, np.uint64)))
                    )
                    pow_inv = np.concatenate(
                        ([np.uint64(1)], np.cumprod(np.full(n - 1, self.inv, np.uint64)))
                    )
                    S = np.concatenate(([np.uint64(0)], np.cumsum(d64 * pow_inv)))
                    nwin = n - w + 1
                    starts_w = np.arange(nwin)
                    h = (S[starts_w + w] - S[starts_w]) * pow_b[starts_w + w - 1]
                    # windows crossing a doc boundary b (b-w < s < b) are
                    # invalid — O(n) range marking, no n*w bool matrix
                    delta = np.zeros(nwin + 1, dtype=np.int64)
                    interior = doc_starts[1:]
                    np.add.at(delta, np.maximum(interior - (w - 1), 0), 1)
                    np.add.at(delta, np.minimum(interior, nwin), -1)
                    valid = np.cumsum(delta[:-1]) == 0
                    if valid.any():
                        hv = h[valid]
                        win_start = starts_w[valid]
                        rows = np.searchsorted(doc_starts, win_start, side="right") - 1
                        run_starts = np.flatnonzero(np.diff(rows, prepend=-1))
                        mins = np.minimum.reduceat(hv, run_starts)
                        out[rows[run_starts]] = mins
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "fp_min": pa.array(out.view(np.int64), type=pa.int64()),
                }
            )

    # stateless (window + two derived constants): task path by default —
    # no actor-pool ramp; pass ``concurrency`` to force an actor pool
    if concurrency:
        return docs_ds.map_batches(
            Roller,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    return docs_ds.map_batches(
        Roller(), batch_format="pyarrow", zero_copy_batch=True
    )


def quality_quantile_filter(
    docs_ds, q: float = 0.5, group_col: str = "lang", return_docs: bool = False
):
    """(doc_id, <group_col>, score): documents whose token count strictly
    exceeds their group's exact q-quantile — the classic "keep the top
    half per language" corpus-curation filter.

    The quantile is EXACT and rank-defined (the ceil(q*n)-th smallest
    score in the group), not an approximation, yet no stage holds a
    corpus-sized group: scores are small integers, so the per-group
    distribution is a (group, score) HISTOGRAM. Per-batch partial counts
    (polars group_by) pre-aggregate before the shuffle, the global
    groupby moves only histogram rows, the cumulative scan over the tiny
    histogram runs on the driver, and the thresholds broadcast back as a
    hash map (stages/hashset — zero per-task build).

    ``return_docs=True`` returns the FULL surviving documents rows (every
    input column) instead of the narrow (doc_id, group, score) table: the
    thresholds broadcast the same way and the wide table streams through
    one extra map_batches filter (score recomputed per batch — cheaper
    than shipping the wide rows through any join).
    """
    import math

    import numpy as np
    import polars as pl
    import ray

    from shaclapi_ray.stages.hashset import build_hash_map, lookup

    if not 0.0 < q <= 1.0:
        raise ValueError("q must be in (0, 1]")

    def score_fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                group_col: batch[group_col],
                "score": pc.cast(
                    pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64()
                ),
            }
        )

    scored = docs_ds.map_batches(
        score_fn, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch.select([group_col, "score"]))
            .group_by([group_col, "score"])
            .len()
        )
        t = df.to_arrow()
        return pa.table(
            {
                group_col: t[group_col].cast(pa.string()),
                "score": t["score"],
                "c": t["len"].cast(pa.int64()),
            }
        )

    hist = (
        scored.map_batches(partial_counts, batch_format="pyarrow")
        .groupby([group_col, "score"])
        .sum("c")
        .to_pandas()  # |groups| x |distinct integer scores| rows — tiny
    )

    groups, thresholds = [], []
    for grp, sub in hist.groupby(group_col, sort=True):
        sub = sub.sort_values("score")
        cum = sub["sum(c)"].cumsum()
        k = math.ceil(q * int(cum.iloc[-1]))
        thr = int(sub["score"][cum >= k].iloc[0])
        groups.append(grp)
        thresholds.append(thr)
    thr_ref = ray.put(build_hash_map(groups, thresholds))

    def keep(batch: pa.Table) -> pa.Table:
        thr = lookup(ray.get(thr_ref), batch[group_col])
        score = batch["score"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(score > thr))

    if return_docs:

        def keep_docs(batch: pa.Table) -> pa.Table:
            thr = lookup(ray.get(thr_ref), batch[group_col])
            score = pc.cast(
                pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64()
            ).to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(score > thr))

        return docs_ds.map_batches(
            keep_docs, batch_format="pyarrow", zero_copy_batch=True
        )

    return scored.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


INDEX_COARSE_GROUPS = 256


def inverted_index(docs_ds, min_df: int = 2, max_df: int | None = None):
    """(token, df, postings): the materialized inverted index — per token,
    its document frequency and the ascending doc_id posting list as a
    comma-joined string (a deterministic, hashable surface for the layout
    an index writer would emit as list<int64> bucket-partitioned parquet).

    Shuffle discipline: each batch reduces to DISTINCT (token, doc_id)
    pairs first; the exchange then moves one row per distinct pair —
    proportional to the index itself (which IS the output), never to raw
    token occurrences. The keyed exchange groups by a COARSE 8-bit
    token-hash key (INDEX_COARSE_GROUPS groups, not one map_groups
    invocation per vocabulary entry) and builds every posting list of a
    coarse group with one vectorized polars group_by inside — the same
    regrouping that took simhash verify from 65k near-empty groups to
    2^8 dense ones. With ``max_df`` set, a cheap token-level df pass
    (doc_frequency's pre-aggregated combine) finds the stopword-class
    tokens FIRST and their hashes are broadcast so their pairs are
    dropped BEFORE the exchange — the hot-key/skew bound AND the output
    bound; ``min_df`` prunes the singleton tail after the global merge.
    """
    import numpy as np
    import polars as pl

    import ray as _ray

    from shaclapi_ray.stages.hashset import hash_strings

    stop_ref = None
    if max_df is not None:
        chunks = []
        for b in doc_frequency(docs_ds, min_df=1).iter_batches(
            batch_format="pyarrow"
        ):
            hot = b.filter(pc.greater(b["df"], max_df))
            if hot.num_rows:
                chunks.append(hash_strings(hot["token"]))
        stop = (
            np.sort(np.concatenate(chunks))
            if chunks
            else np.empty(0, dtype=np.uint64)
        )
        stop_ref = _ray.put(stop)

    def pairs(batch: pa.Table) -> pa.Table:
        toks = _explode_tokens(batch, ["doc_id"]).unique().rename({"t": "token"})
        out = toks.to_arrow()
        if stop_ref is not None and out.num_rows:
            stop_sorted = _ray.get(stop_ref)
            if stop_sorted.size:
                h = hash_strings(out["token"])
                pos = np.minimum(
                    np.searchsorted(stop_sorted, h), stop_sorted.size - 1
                )
                out = out.filter(pa.array(stop_sorted[pos] != h))
        ck = (hash_strings(out["token"]) % INDEX_COARSE_GROUPS).astype("int64")
        return out.append_column("ck", pa.array(ck, type=pa.int64()))

    pair_ds = docs_ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)

    def build(group: pa.Table) -> pa.Table:
        pf = pl.from_arrow(group.select(["token", "doc_id"]))
        agg = (
            pf.sort("doc_id")
            .group_by("token")
            .agg(
                pl.len().cast(pl.Int64).alias("df"),
                pl.col("doc_id").cast(pl.Utf8).str.join(",").alias("postings"),
            )
            .filter(pl.col("df") >= min_df)
        )
        if max_df is not None:
            agg = agg.filter(pl.col("df") <= max_df)
        return agg.select("token", "df", "postings").to_arrow()

    return pair_ds.groupby("ck").map_groups(build, batch_format="pyarrow")


VOCAB_BROADCAST_LIMIT = 50_000_000


def unigram_logprob(docs_ds, keep_cols: tuple = ()):
    """(doc_id, [*keep_cols,] n_tokens, logprob): mean natural-log corpus-unigram
    probability of each document's tokens — the language-model quality
    filter of CCNet-class pipelines (Wenzek et al. 2020) with the LM
    replaced by the corpus's own unigram statistics, so the operator is
    exact and self-contained. Low (very negative) scores mark documents
    of rare/garbage tokens; 0.0 marks empty documents.

    Scale design: pass 1 computes term frequencies with the
    pre-aggregate-then-combine discipline (one (token, cnt) row per
    batch leaves each task); the resulting unigram table is broadcast
    once via ray.put as a sorted-hash (token -> tf) numpy map
    (stages/hashset.build_hash_map — zero per-task setup) with a
    VOCAB_BROADCAST_LIMIT ceiling; a raw \\S+ web-scale vocabulary can
    exceed it, at which point ``unigram_logprob_sharded`` (hash-
    partitioned join on token) is the scale path (loud ValueError
    pointing there, not an OOM).
    Pass 2 streams: explode tokens, vectorized lookup, per-doc mean."""
    import numpy as np
    import polars as pl

    import ray as _ray

    from shaclapi_ray.stages.aggregates import combine_partials
    from shaclapi_ray.stages.hashset import build_hash_map, lookup

    def tf_partial(batch: pa.Table) -> pa.Table:
        counts = (
            _explode_tokens(batch, [])
            .group_by("t")
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
        )
        return counts.rename({"t": "token"}).to_arrow()

    partials = docs_ds.map_batches(
        tf_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    tf = combine_partials(partials, "token", "cnt", "tf", "auto")

    # vocab stays Arrow end-to-end (no Python string lists on the driver:
    # near the broadcast ceiling those copies are multi-GB)
    tok_chunks, cnt_chunks = [], []
    for b in tf.iter_batches(batch_format="pyarrow"):
        col = b["token"]
        tok_chunks.append(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        cnt_chunks.append(b["tf"].to_numpy(zero_copy_only=False))
    n_vocab = sum(len(c) for c in tok_chunks)
    if n_vocab > VOCAB_BROADCAST_LIMIT:
        raise ValueError(
            f"vocabulary has {n_vocab} tokens (> {VOCAB_BROADCAST_LIMIT}); "
            "use unigram_logprob_sharded (hash-partitioned join on token) "
            "at this scale"
        )
    tokens = (
        pa.concat_arrays(tok_chunks)
        if tok_chunks
        else pa.array([], type=pa.string())
    )
    counts = (
        np.concatenate(cnt_chunks) if cnt_chunks else np.empty(0, dtype=np.int64)
    )
    total = float(counts.sum()) if counts.size else 1.0
    hm_ref = _ray.put(build_hash_map(tokens, counts))

    def score(batch: pa.Table) -> pa.Table:
        hm = _ray.get(hm_ref)
        ex = _explode_tokens(batch, ["doc_id"])
        if len(ex):
            tfs = lookup(hm, ex["t"].to_arrow(), default=0)
            if not (tfs > 0).all():
                # every token came from this corpus, so tf >= 1 by
                # construction; a miss means pass 1 and pass 2 saw
                # different corpora (non-deterministic upstream stage?) —
                # fail loudly instead of folding log(0) = -inf into scores
                raise ValueError(
                    "token absent from the unigram table: the scored "
                    "corpus diverged from the one the statistics were "
                    "built on"
                )
            lp = np.log(tfs.astype(np.float64) / total)
            per_doc = (
                ex.with_columns(pl.Series("lp", lp))
                .group_by("doc_id")
                .agg(
                    pl.len().cast(pl.Int64).alias("n_tokens"),
                    pl.col("lp").mean().alias("logprob"),
                )
            )
        else:
            per_doc = pl.DataFrame(
                {
                    "doc_id": pl.Series([], dtype=pl.Int64),
                    "n_tokens": pl.Series([], dtype=pl.Int64),
                    "logprob": pl.Series([], dtype=pl.Float64),
                }
            )
        out = (
            pl.from_arrow(batch.select(["doc_id", *keep_cols]))
            .join(per_doc, on="doc_id", how="left")
            .with_columns(
                pl.col("n_tokens").fill_null(0),
                pl.col("logprob").fill_null(0.0),
            )
            .select("doc_id", *keep_cols, "n_tokens", "logprob")
        )
        return out.to_arrow()

    return docs_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


BIGRAM_LAMBDA = 0.7


def bigram_logprob(docs_ds, lam: float = BIGRAM_LAMBDA, keep_cols: tuple = ()):
    """(doc_id, [*keep_cols,] n_tokens, bigram_logprob): mean natural-log
    INTERPOLATED-BIGRAM probability of each document — the next step up
    from ``unigram_logprob`` toward CCNet's n-gram LM quality filter
    (Wenzek et al. 2020 use a 5-gram KenLM; a Jelinek-Mercer-interpolated
    bigram over the corpus's own statistics keeps the operator exact and
    self-contained). Position 1 scores ln(c1(w1)/T); positions i >= 2
    score ln(lam * c2(w_{i-1}, w_i)/c1(w_{i-1}) + (1-lam) * c1(w_i)/T);
    the document score is the mean over all n positions; 0.0 for empty
    documents. Low scores mark token sequences the corpus itself finds
    improbable (shuffled/garbage text that unigram statistics can't see).

    Scale design mirrors unigram_logprob: TWO pre-aggregated count
    combines (unigram ∝ vocab, bigram ∝ distinct adjacent pairs — each
    batch emits at most its distinct-gram partial rows), both tables
    broadcast once via ray.put as sorted-hash numpy maps
    (stages/hashset — zero per-task build) under VOCAB_BROADCAST_LIMIT
    with a loud ceiling error; the sharded fallback shape is exactly
    ``unigram_logprob_sharded``'s token-hash-partitioned join, applied
    per gram table. Scoring streams: one exploded-token frame per
    batch, the previous token via a within-doc shift (a doc never
    straddles batches — one row is one document), three vectorized
    hash-map lookups, one per-doc polars mean."""
    import numpy as np
    import polars as pl

    import ray as _ray

    from shaclapi_ray.stages.aggregates import combine_partials
    from shaclapi_ray.stages.hashset import build_hash_map, lookup

    def uni_partial(batch: pa.Table) -> pa.Table:
        counts = (
            _explode_tokens(batch, [])
            .group_by("t")
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
        )
        return counts.rename({"t": "token"}).to_arrow()

    def big_partial(batch: pa.Table) -> pa.Table:
        ex = _explode_tokens(batch, ["doc_id"])
        pairs = (
            ex.with_columns(pl.col("t").shift(1).over("doc_id").alias("prev"))
            .drop_nulls("prev")
            .select((pl.col("prev") + " " + pl.col("t")).alias("pair"))
            .group_by("pair")
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
        )
        return pairs.to_arrow()

    c1 = combine_partials(
        docs_ds.map_batches(uni_partial, batch_format="pyarrow", zero_copy_batch=True),
        "token",
        "cnt",
        "tf",
        "auto",
    )
    c2 = combine_partials(
        docs_ds.map_batches(big_partial, batch_format="pyarrow", zero_copy_batch=True),
        "pair",
        "cnt",
        "tf",
        "auto",
    )

    def _collect(tbl, key: str, what: str):
        keys_chunks, cnt_chunks = [], []
        for b in tbl.iter_batches(batch_format="pyarrow"):
            col = b[key]
            keys_chunks.append(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            )
            cnt_chunks.append(b["tf"].to_numpy(zero_copy_only=False))
        n = sum(len(c) for c in keys_chunks)
        if n > VOCAB_BROADCAST_LIMIT:
            raise ValueError(
                f"{what} table has {n} entries (> {VOCAB_BROADCAST_LIMIT}); "
                "shard it with the unigram_logprob_sharded token-hash-"
                "partitioned join pattern at this scale"
            )
        keys = (
            pa.concat_arrays(keys_chunks)
            if keys_chunks
            else pa.array([], type=pa.string())
        )
        counts = (
            np.concatenate(cnt_chunks) if cnt_chunks else np.empty(0, dtype=np.int64)
        )
        return build_hash_map(keys, counts), counts

    hm1, uni_counts = _collect(c1, "token", "unigram")
    hm2, _ = _collect(c2, "pair", "bigram")
    total = float(uni_counts.sum()) if uni_counts.size else 1.0
    maps_ref = _ray.put((hm1, hm2))

    def score(batch: pa.Table) -> pa.Table:
        m1, m2 = _ray.get(maps_ref)
        ex = _explode_tokens(batch, ["doc_id"])
        if len(ex):
            ex = ex.with_columns(pl.col("t").shift(1).over("doc_id").alias("prev"))
            c_cur = lookup(m1, ex["t"].to_arrow(), default=0)
            if not (c_cur > 0).all():
                raise ValueError(
                    "token absent from the unigram table: the scored "
                    "corpus diverged from the one the statistics were "
                    "built on"
                )
            first = ex["prev"].is_null().to_numpy()
            prev_filled = ex["prev"].fill_null("")
            c_prev = lookup(m1, prev_filled.to_arrow(), default=1)
            pair = (prev_filled + " " + ex["t"]).to_arrow()
            c_pair = lookup(m2, pair, default=0)
            cur = c_cur.astype(np.float64)
            v = np.where(
                first,
                np.log(cur / total),
                np.log(
                    lam * c_pair.astype(np.float64)
                    / np.maximum(c_prev.astype(np.float64), 1.0)
                    + (1.0 - lam) * cur / total
                ),
            )
            per_doc = (
                ex.select("doc_id")
                .with_columns(pl.Series("v", v))
                .group_by("doc_id")
                .agg(
                    pl.len().cast(pl.Int64).alias("n_tokens"),
                    pl.col("v").mean().alias("bigram_logprob"),
                )
            )
        else:
            per_doc = pl.DataFrame(
                {
                    "doc_id": pl.Series([], dtype=pl.Int64),
                    "n_tokens": pl.Series([], dtype=pl.Int64),
                    "bigram_logprob": pl.Series([], dtype=pl.Float64),
                }
            )
        out = (
            pl.from_arrow(batch.select(["doc_id", *keep_cols]))
            .join(per_doc, on="doc_id", how="left")
            .with_columns(
                pl.col("n_tokens").fill_null(0),
                pl.col("bigram_logprob").fill_null(0.0),
            )
            .select("doc_id", *keep_cols, "n_tokens", "bigram_logprob")
        )
        return out.to_arrow()

    return docs_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def write_inverted_index(
    docs_ds,
    index_dir: str,
    min_df: int = 2,
    max_df: int | None = None,
):
    """Persist the inverted index as TOKEN-HASH-PARTITIONED parquet
    (``ck=<id>/`` hive dirs, INDEX_COARSE_GROUPS partitions) — the same
    I/O-pruning layout as the IVF ANN index (knn.build_ivf_index): a
    token lookup then reads ONLY the partitions its tokens hash into, so
    point-lookup I/O is index_size/partitions, never a full index scan.
    Partition dirs are independent, which is also the resume unit."""
    import polars as pl  # noqa: F401  (parity with sibling stages)

    from shaclapi_ray.stages.hashset import hash_strings

    idx = inverted_index(docs_ds, min_df=min_df, max_df=max_df)

    def add_ck(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("ck", pa.array([], type=pa.int64()))
        ck = (hash_strings(t["token"]) % INDEX_COARSE_GROUPS).astype("int64")
        return t.append_column("ck", pa.array(ck, type=pa.int64()))

    idx.map_batches(add_ck, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["ck"]
    )
    return index_dir


def lookup_tokens(index_dir: str, tokens: list[str]) -> pa.Table:
    """(token, df, postings) for exactly ``tokens`` — reads ONLY the
    ``ck=`` partitions those tokens hash into (driver-local point lookup;
    at cluster scale, fan the per-partition reads out as Ray tasks)."""
    import os

    import pyarrow.parquet as pq

    from shaclapi_ray.stages.hashset import hash_strings

    empty = pa.table(
        {
            "token": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "postings": pa.array([], pa.string()),
        }
    )
    toks = sorted(set(tokens))
    if not toks:
        return empty
    cks = sorted({int(h) % INDEX_COARSE_GROUPS for h in hash_strings(toks)})
    parts = []
    for c in cks:
        d = os.path.join(index_dir, f"ck={c}")
        if os.path.isdir(d):
            parts.append(pq.read_table(d, columns=["token", "df", "postings"]))
    if not parts:
        return empty
    tbl = pa.concat_tables(parts)
    mask = pc.is_in(tbl["token"], value_set=pa.array(toks))
    out = tbl.filter(mask)
    return out.sort_by("token")


def ccnet_buckets(
    docs_ds,
    group_col: str = "lang",
    q1: float = 1.0 / 3.0,
    q2: float = 2.0 / 3.0,
    precision: int = 1000,
):
    """(doc_id, <group_col>, n_tokens, logprob, score_q, bucket): CCNet's
    head/middle/tail split (Wenzek et al. 2020) — per language, rank
    documents by unigram-LM log-probability and cut at the q1/q2
    quantiles: 'head' = most-probable (cleanest) text, 'tail' = rare/
    garbage-token text, 'middle' between.

    Exactness discipline: the quantiles are EXACT rank quantiles (the
    ceil(q*n)-th smallest), computed over the INTEGER-quantized score
    ``score_q = floor(logprob * precision + 0.5)`` so the per-group
    distribution is a small (group, score_q) histogram — the same
    pre-aggregate → tiny driver cumsum → broadcast-thresholds shape as
    quality_quantile_filter; no corpus-sized group ever materializes and
    the whole operator (scores, thresholds, buckets) is mirrored by
    ``oracles.ccnet_buckets_sql``. Rounding to NEAREST (not plain floor
    of the raw product) is deliberate: float group means reproduce only
    to ~1 ulp across block layouts/engines, and nearest-int absorbs that
    noise (a flip needs the true value within ~1e-12 of a half-integer
    boundary — which log means do not produce), where plain floor flips
    at every integer boundary. The formula is the LITERAL SAME
    floor(x*p + 0.5) float64 expression in numpy and in the SQL oracle
    (and q reaches SQL as a DOUBLE cast), so the two sides cannot
    diverge even at exact .5 / integer boundaries — np.rint (half to
    even) vs DuckDB round() (half away from zero) used to differ
    there."""
    import math

    import numpy as np
    import polars as pl

    import ray

    from shaclapi_ray.stages.hashset import build_hash_map, lookup

    # ONE materialization of the narrow (doc_id, group, n_tokens, logprob)
    # table feeds both the histogram pass and the assignment pass; the
    # cheap integer quantization recomputes per batch in each.
    lp = unigram_logprob(docs_ds, keep_cols=(group_col,)).materialize()

    def _score_q(batch: pa.Table) -> np.ndarray:
        # floor(x*p + 0.5): the literal same expression as the SQL oracle
        return np.floor(
            batch["logprob"].to_numpy(zero_copy_only=False) * precision + 0.5
        ).astype(np.int64)

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch.select([group_col]))
            .with_columns(pl.Series("score_q", _score_q(batch)))
            .group_by([group_col, "score_q"])
            .len()
        )
        t = df.to_arrow()
        return pa.table(
            {
                group_col: t[group_col].cast(pa.string()),
                "score_q": t["score_q"],
                "c": t["len"].cast(pa.int64()),
            }
        )

    hist = (
        lp.map_batches(partial_counts, batch_format="pyarrow")
        .groupby([group_col, "score_q"])
        .sum("c")
        .to_pandas()  # |groups| x |distinct quantized scores| — tiny
    )

    groups, t1s, t2s = [], [], []
    for grp, sub in hist.groupby(group_col, sort=True):
        sub = sub.sort_values("score_q")
        cum = sub["sum(c)"].cumsum()
        n = int(cum.iloc[-1])
        t1 = int(sub["score_q"][cum >= math.ceil(q1 * n)].iloc[0])
        t2 = int(sub["score_q"][cum >= math.ceil(q2 * n)].iloc[0])
        groups.append(grp)
        t1s.append(t1)
        t2s.append(t2)
    t1_ref = ray.put(build_hash_map(groups, t1s))
    t2_ref = ray.put(build_hash_map(groups, t2s))

    def assign(batch: pa.Table) -> pa.Table:
        t1 = lookup(ray.get(t1_ref), batch[group_col])
        t2 = lookup(ray.get(t2_ref), batch[group_col])
        sq = _score_q(batch)
        bucket = np.where(sq <= t1, "tail", np.where(sq <= t2, "middle", "head"))
        return batch.append_column(
            "score_q", pa.array(sq)
        ).append_column("bucket", pa.array(bucket.astype(object)))

    return lp.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def unigram_logprob_sharded(docs_ds):
    """The beyond-VOCAB_BROADCAST_LIMIT path unigram_logprob's loud
    ValueError points at: the (token, tf) unigram table stays a
    token-hash-partitioned Dataset — only the corpus token total (one
    scalar) reaches the driver. Scoring: per-batch (doc_id, token,
    tcnt) partials join the table on token, per-doc weighted log-prob
    sums pre-aggregate per batch, ONE doc_id combine, then a bounded
    join back onto (doc_id, n_tokens). Same (doc_id, n_tokens, logprob)
    contract and the same loud corpus-divergence check (matched tokens
    must equal n_tokens)."""
    import numpy as np
    import polars as pl

    import ray as _ray

    from shaclapi_ray.stages.aggregates import (
        combine_partials,
        combine_partials_multi,
    )
    from shaclapi_ray.stages.joins import drop_empty_blocks
    from shaclapi_ray.stages.referential import clamp_partitions

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
        "tf",
        "auto",
    ).materialize()
    total = 0
    for t in _ray.get(
        tf.map_batches(
            lambda b: pa.table(
                {"s": pa.array([int(b["tf"].to_numpy(zero_copy_only=False).sum())])}
            ),
            batch_format="pyarrow",
        ).to_arrow_refs()
    ):
        total += sum(t["s"].to_pylist())
    total = float(total) if total else 1.0

    def tok_partial(batch: pa.Table) -> pa.Table:
        ex = _explode_tokens(batch, ["doc_id"])
        return (
            ex.group_by(["doc_id", "t"])
            .agg(pl.len().cast(pl.Int64).alias("tcnt"))
            .rename({"t": "token"})
            .to_arrow()
        )

    toks_nb = drop_empty_blocks(
        docs_ds.map_batches(tok_partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    tf_nb = drop_empty_blocks(tf)
    sums = None
    if toks_nb is not None and tf_nb is not None:
        joined = toks_nb.join(
            tf_nb,
            join_type="inner",
            num_partitions=clamp_partitions(None),
            on=("token",),
        )

        def sum_partial(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            w = batch["tcnt"].to_numpy(zero_copy_only=False).astype(np.float64)
            lp = np.log(
                batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64) / total
            )
            uniq, inv = np.unique(ids, return_inverse=True)
            s = np.zeros(len(uniq))
            np.add.at(s, inv, lp * w)
            cnt = np.zeros(len(uniq))
            np.add.at(cnt, inv, w)
            return pa.table(
                {
                    "doc_id": pa.array(uniq),
                    "lp_sum": pa.array(s),
                    "matched": pa.array(cnt.astype(np.int64)),
                }
            )

        sums = combine_partials_multi(
            joined.map_batches(sum_partial, batch_format="pyarrow"),
            ["doc_id"],
            {"lp_sum": "sum", "matched": "sum"},
        )

    base = token_count(docs_ds)
    if sums is not None:
        sums_nb = drop_empty_blocks(
            sums.map_batches(
                lambda t: t.rename_columns(["j_doc_id", "lp_sum", "matched"]),
                batch_format="pyarrow",
            )
        )
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

        ntok = batch["n_tokens"].to_numpy(zero_copy_only=False)
        if "matched" in batch.column_names:
            matched = (
                pc.fill_null(batch["matched"], 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            lp_sum = (
                pc.fill_null(batch["lp_sum"], 0.0)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
        else:
            matched = np.zeros(len(ntok), dtype=np.int64)
            lp_sum = np.zeros(len(ntok))
        if (matched != ntok).any():
            raise ValueError(
                "token absent from the unigram table: the scored corpus "
                "diverged from the one the statistics were built on"
            )
        logprob = np.where(ntok > 0, lp_sum / np.maximum(ntok, 1), 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "logprob": pa.array(logprob),
            }
        )

    return base.map_batches(finish, batch_format="pyarrow")
