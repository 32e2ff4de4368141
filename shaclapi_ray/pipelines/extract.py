"""HTML -> visible-text extraction over the pages table.

The boilerplate-removal / text-extraction stage every webtext training
pipeline runs before quality filtering (the reference consumes SPARQL
bindings and never sees raw markup; this is the web-corpus analog of its
binding parsing, SURVEY.md §2.2). Regex tag-strip, not a DOM parse —
vectorized RE2 kernels over the whole batch, shared verbatim with the
DuckDB oracle; a real deployment would swap in a proper parser behind
the same (url, html) -> (url, text, n_text_chars) contract.

Scale notes: reads ONLY (url, html); html is decoded lossily (invalid
UTF-8 degrades instead of aborting — stages.links._decode_lossy); the
wide html column is dropped immediately so only the narrow extracted
text flows downstream.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.stages.links import _decode_lossy

TAG_RE = r"<[^>]*>"
# explicit class, not \s+: polars' Rust-regex \s is Unicode-aware while
# the DuckDB oracle's RE2 \s is exactly [\t\n\f\r ] — a literal \s+
# would collapse NBSP/U+3000 runs on the Ray side only (the TOKEN_RE
# rule in pipelines/textstats.py; cross-engine equality property-tested
# in tests/test_pred_property.py)
WS_RE = r"[ \t\n\f\r]+"


SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"


def url_canonicalize(pages_ds):
    """(url, canon_url, host): canonical form of every page url — the
    dedup key normalization of a web crawl (two spellings of one resource
    must collide BEFORE exact dedup / link joins). Rules: fragment
    stripped, scheme + host lowercased, default port (:80 http / :443
    https) dropped, trailing slashes stripped; non-absolute urls pass
    through fragment-stripped with host ''. Pure vectorized polars string
    kernels, no shuffle; regexes shared verbatim with the DuckDB oracle.
    Rows with null url are dropped (same contract as link extraction)."""
    import polars as pl

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["url"]))
        df = pl.from_arrow(batch.select(["url"]))
        frag = pl.col("url").str.replace(r"#.*$", "")
        df = df.with_columns(
            frag.alias("frag"),
            frag.str.extract(SCHEME_RE, 1).str.to_lowercase().alias("scheme"),
            frag.str.extract(HOSTPORT_RE, 1).str.to_lowercase().alias("hostport"),
            frag.str.replace(AUTHORITY_RE, "")
            .str.replace(r"/+$", "")
            .alias("rest"),
        )
        host = (
            pl.when(pl.col("scheme") == "http")
            .then(pl.col("hostport").str.replace(r":80$", ""))
            .when(pl.col("scheme") == "https")
            .then(pl.col("hostport").str.replace(r":443$", ""))
            .otherwise(pl.col("hostport"))
        )
        parseable = pl.col("scheme").is_not_null() & (pl.col("scheme") != "")
        out = df.select(
            pl.col("url"),
            pl.when(parseable)
            .then(pl.col("scheme") + "://" + host + pl.col("rest"))
            .otherwise(pl.col("frag"))
            .alias("canon_url"),
            pl.when(parseable).then(host).otherwise(pl.lit("")).alias("host"),
        )
        return out.to_arrow()

    return pages_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def extract_text(pages_ds):
    """(url, text, n_text_chars): visible text = html with tags stripped
    and whitespace runs collapsed; rows with null url are dropped (same
    contract as link extraction)."""

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        batch = batch.filter(pc.is_valid(batch["url"]))
        # polars' regex replace_all is ~1.7x pyarrow's RE2 on this
        # pattern single-threaded (measured on the real html column);
        # semantics are identical (verified value-equal, and the DuckDB
        # oracle shares the same regexes)
        s = pl.Series(_decode_lossy(batch["html"]))
        t = (
            s.str.replace_all(TAG_RE, "")
            .str.replace_all(WS_RE, " ")
            .str.strip_chars(" ")
            .to_arrow()
            .cast(pa.string())
        )
        return pa.table(
            {
                "url": batch["url"],
                "text": t,
                "n_text_chars": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return pages_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def url_quality_filter(
    pages_ds,
    *,
    max_len: int = 2048,
    max_digit_pct: int = 50,
    max_slashes: int = 8,
    blocked_words: tuple[str, ...] = (),
):
    """(url, n_chars, n_digits, n_slashes, kept): the URL-string quality
    gate of a web-crawl pipeline (the RefinedWeb/C4 pre-fetch filter
    family: Penedo et al. 2023 §3.1 run a word-blocklist + character
    heuristics over the URL before touching page content). A page is
    kept iff its url is non-null, absolute (http/https scheme), at most
    ``max_len`` characters, at most ``max_slashes`` path separators,
    digit share ``100*n_digits <= max_digit_pct*n_chars`` (session-id /
    tracking-url smell), and contains no blocked word
    (case-insensitive substring — porn/spam/SEO lists in production).

    Every input row is reported (null urls get zeroed counts and
    kept=false) so the output joins 1:1 against the crawl manifest.
    The digit rule is INTEGER cross-multiplication — no float ratio —
    so the DuckDB oracle (oracles.url_quality_sql) is exact, not
    tolerance-matched. Row-local streaming pass over the narrow url
    column: vectorized polars string kernels, no shuffle, no state —
    at 100 TB this runs at read speed on the url projection alone.
    """
    def fn(batch: pa.Table) -> pa.Table:
        return url_quality_frame(
            batch,
            max_len=max_len,
            max_digit_pct=max_digit_pct,
            max_slashes=max_slashes,
            blocked_words=blocked_words,
        )

    return pages_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def url_quality_frame(
    batch: pa.Table,
    *,
    max_len: int = 2048,
    max_digit_pct: int = 50,
    max_slashes: int = 8,
    blocked_words: tuple[str, ...] = (),
) -> pa.Table:
    """The per-batch url_quality_filter kernel (module-level so the
    hypothesis parity test can drive it against DuckDB without Ray)."""
    import re

    import polars as pl

    word_re = (
        "(?i)(" + "|".join(re.escape(w.lower()) for w in sorted(blocked_words)) + ")"
        if blocked_words
        else None
    )
    df = pl.from_arrow(batch.select(["url"]))
    u = pl.col("url")
    df = df.with_columns(
        u.str.len_chars().fill_null(0).cast(pl.Int64).alias("n_chars"),
        u.str.count_matches(r"[0-9]").fill_null(0).cast(pl.Int64).alias("n_digits"),
        u.str.count_matches("/", literal=True)
        .fill_null(0)
        .cast(pl.Int64)
        .alias("n_slashes"),
        u.str.contains(r"^https?://").fill_null(False).alias("_scheme"),
    )
    kept = (
        pl.col("_scheme")
        & (pl.col("n_chars") <= max_len)
        & (100 * pl.col("n_digits") <= max_digit_pct * pl.col("n_chars"))
        & (pl.col("n_slashes") <= max_slashes)
    )
    if word_re is not None:
        kept = kept & ~u.str.contains(word_re).fill_null(False)
    out = df.select(
        pl.col("url"),
        pl.col("n_chars"),
        pl.col("n_digits"),
        pl.col("n_slashes"),
        kept.alias("kept"),
    )
    return out.to_arrow()


def filter_hosts(pages_ds, blocked_hosts):
    """(url, host, blocked): flag pages whose canonical host is a blocked
    domain or any subdomain of one — the domain-blocklist gate of a web
    crawl pipeline (spam/adult/SEO-farm lists), run between
    canonicalization and text extraction so blocked pages never pay the
    html scan.

    The blocklist is an in-closure compiled alternation regex
    `(^|\\.)(d1|d2|...)$` — blocklists are small (1e4-1e6 domains) and
    ship inside the serialized stage, not per batch; at 1e6+ domains
    switch to a broadcast sorted-hash set over the registrable domain.
    Matching is on url_canonicalize's host (lowercased, default port
    stripped); non-absolute urls have host '' and are never blocked."""
    import re

    if not blocked_hosts:
        raise ValueError("blocked_hosts must be non-empty")
    alt = "|".join(re.escape(h.lower()) for h in sorted(blocked_hosts))
    pattern = rf"(^|\.)({alt})$"

    canon = url_canonicalize(pages_ds)

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["url", "host"]))
        out = df.with_columns(
            pl.col("host").str.contains(pattern).alias("blocked")
        )
        return out.to_arrow()

    return canon.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
