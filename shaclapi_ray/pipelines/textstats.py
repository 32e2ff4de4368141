"""Text-analysis operators over a documents table (doc_id, text, ...).

Large-scale training-data pipeline stages: token counting, quality
signals, language-ID heuristic, document fingerprinting. All vectorized
(pyarrow.compute regex kernels) except fingerprinting, which runs hashlib
in an actor pool.

Every count-producing operator returns INTEGER columns so results are
bit-exact across engines (the DuckDB oracles share the same regexes).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
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
    """(doc_id, n_tokens): whitespace-delimited token count."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pc.cast(
                    pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64()
                ),
            }
        )

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
        fps = [
            hashlib.md5(t.encode()).hexdigest() if t is not None else None
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "fp": pa.array(fps, type=pa.string())}
        )


def fingerprint(docs_ds, concurrency=(1, 4)):
    """(doc_id, fp): md5 of text."""
    return docs_ds.map_batches(
        Fingerprinter,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def rolling_fingerprint(docs_ds, window: int = 32, concurrency=(1, 4)):
    """(doc_id, fp_min): minimum 64-bit rolling (Rabin-Karp style) hash over
    byte windows — a locality-sensitive document fingerprint used for
    near-dup candidate buckets. Deterministic; no SQL analog."""
    import numpy as np

    B = np.uint64(1000003)

    class Roller:
        def __init__(self):
            self.pow_w = B ** np.uint64(window - 1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for t in batch["text"].to_pylist():
                if not t or len(t) < window:
                    out.append(0)
                    continue
                data = np.frombuffer(t.encode()[: 1 << 16], dtype=np.uint8).astype(
                    np.uint64
                )
                if data.size < window:
                    out.append(0)
                    continue
                # vectorized rolling hash: h_i = sum(data[i+j] * B^(w-1-j))
                powers = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
                n = data.size - window + 1
                idx = np.arange(window)[None, :] + np.arange(n)[:, None]
                h = (data[idx] * powers[None, :]).sum(axis=1)
                out.append(int(h.min()))
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "fp_min": pa.array(
                        [v - (1 << 64) if v >= (1 << 63) else v for v in out],
                        type=pa.int64(),
                    ),
                }
            )

    return docs_ds.map_batches(
        Roller, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )
