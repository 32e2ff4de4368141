"""Decontamination: planted-overlap semantics with an external eval set."""

import pyarrow as pa
import ray


def _docs_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_decontaminate_planted_overlap(ray_session):
    from shaclapi_ray.pipelines.decontam import decontaminate

    eval_ds = _docs_ds([(100, "the secret eval answer is here")])
    corpus = _docs_ds(
        [
            # contains "the secret eval" and "secret eval answer" (2 distinct
            # shared trigrams); the repeat of one of them counts ONCE
            (1, "leak: the secret eval answer the secret eval answer"),
            # shares words but no full trigram
            (2, "secret answer eval the"),
            # clean
            (3, "completely unrelated text about nothing"),
            # too short for a trigram
            (4, "two words"),
        ]
    )
    out = (
        decontaminate(corpus, eval_ds=eval_ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [1, 2, 3, 4]
    # doc 1 shares: "the secret eval", "secret eval answer", "eval answer the"?
    # eval grams: {"the secret eval","secret eval answer","eval answer is","answer is here"}
    assert out.n_hits.tolist()[0] == 2
    assert out.n_hits.tolist()[1:] == [0, 0, 0]
    assert out.contaminated.tolist() == [True, False, False, False]


def test_decontaminate_default_eval_subset(ray_session):
    """Self-decontamination default: eval docs (doc_id % mod == 0) are
    always flagged against themselves when long enough."""
    from shaclapi_ray.pipelines.decontam import decontaminate

    corpus = _docs_ds(
        [
            (0, "alpha beta gamma delta"),  # eval doc (0 % 5 == 0)
            (1, "alpha beta gamma epsilon"),  # shares "alpha beta gamma"
            (2, "zeta eta theta iota"),  # clean
        ]
    )
    out = (
        decontaminate(corpus, eval_mod=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.contaminated.tolist() == [True, True, False]
    assert out.n_hits.tolist() == [2, 1, 0]


def test_url_canonicalize_cases(ray_session):
    """Canonicalization over adversarial urls: case, default ports,
    fragments, trailing slashes, relative urls."""
    import ray
    import pyarrow as pa

    from shaclapi_ray.pipelines.extract import url_canonicalize

    urls = [
        "HTTP://Example.COM:80/A/b/#frag",
        "https://Host.org:443/",
        "https://host.org:8443/x",
        "ftp://Mixed.Case/z/",
        "not-a-url/path#f",
        None,
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = url_canonicalize(ds).to_pandas().sort_values("url").reset_index(drop=True)
    got = dict(zip(out.url, zip(out.canon_url, out.host)))
    assert got["HTTP://Example.COM:80/A/b/#frag"] == ("http://example.com/A/b", "example.com")
    assert got["https://Host.org:443/"] == ("https://host.org", "host.org")
    assert got["https://host.org:8443/x"] == ("https://host.org:8443/x", "host.org:8443")
    assert got["ftp://Mixed.Case/z/"] == ("ftp://mixed.case/z", "mixed.case")
    assert got["not-a-url/path#f"] == ("not-a-url/path", "")
    assert len(out) == 5  # null url dropped


def test_chunk_text_boundaries(ray_session):
    """Chunk math: overlap coverage, short docs, exact-multiple lengths,
    empty/null text, and non-ASCII character (not byte) offsets."""
    import ray
    import pyarrow as pa

    from shaclapi_ray.pipelines.textstats import chunk_text

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["abcdefghij", "ab", "", None, "éàçüöéàçüö"], pa.string()),
        }
    )
    out = (
        chunk_text(ray.data.from_arrow(docs), chunk_chars=6, overlap=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # stride 4: doc 1 (len 10) -> offsets 0,4,8
    d1 = out[out.doc_id == 1]
    assert d1.chunk.tolist() == ["abcdef", "efghij", "ij"]
    assert d1.n_chunk_chars.tolist() == [6, 6, 2]
    assert out[out.doc_id == 2].chunk.tolist() == ["ab"]
    assert (out.doc_id != 3).all() and (out.doc_id != 4).all()
    # non-ASCII: character offsets, 10 chars -> 3 chunks
    d5 = out[out.doc_id == 5]
    assert d5.chunk.tolist() == ["éàçüöé", "öéàçüö", "üö"]


def test_filter_hosts_subdomain_semantics(ray_session):
    """Blocklist matches exact hosts AND subdomains, never suffixes of a
    label ('notspam.net' must not match blocked 'spam.net')."""
    import ray
    import pyarrow as pa

    from shaclapi_ray.pipelines.extract import filter_hosts

    urls = [
        "https://spam.net/a",
        "https://sub.spam.net/b",
        "https://notspam.net/c",
        "https://SPAM.NET/d",  # host lowercased by canonicalization
        "https://clean.org/e",
        "relative/path",  # host '' — never blocked
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = filter_hosts(ds, ["spam.net"]).to_pandas()
    got = dict(zip(out.url, out.blocked))
    assert got["https://spam.net/a"] is True or got["https://spam.net/a"] == True  # noqa: E712
    assert bool(got["https://sub.spam.net/b"])
    assert not got["https://notspam.net/c"]
    assert bool(got["https://SPAM.NET/d"])
    assert not got["https://clean.org/e"]
    assert not got["relative/path"]


def test_filter_hosts_empty_blocklist_raises(ray_session):
    import pytest as _pytest

    from shaclapi_ray.pipelines.extract import filter_hosts

    with _pytest.raises(ValueError):
        filter_hosts(None, [])


URLQ_ADVERSARIAL = [
    "https://host1.example.org/p/1",  # clean absolute url
    "http://plain.org/x",  # http scheme also absolute
    "host0.example.org/p/5",  # no scheme -> blocked
    "",  # empty -> blocked
    None,  # null -> reported, kept=false
    "https://12345678",  # exactly 50% digits -> kept at pct=50 (<=)
    "https://123456789",  # just over 50% digits -> blocked at pct=50
    "https://a/b/c",  # 4 slashes -> kept at max_slashes=4
    "https://a/b/c/",  # 5 slashes -> blocked at max_slashes=4
    "https://www.CASINO-games.com/x",  # blocked word, case-insensitive
    "https://pokerXnet.com/y",  # 'poker.net' dot is escaped: no match
    "https://poker.net/z",  # literal blocked word match
    "https://long.org/" + "a" * 60,  # over max_len=64 -> blocked
    "https://étude.fr/é1",  # unicode: char counts, not bytes
]
URLQ_KW_TEST = dict(
    max_len=64,
    max_digit_pct=50,
    max_slashes=4,
    blocked_words=("casino", "poker.net"),
)


def test_url_quality_filter_rules(ray_session):
    """Every URL rule on an adversarial list: scheme, empty/null,
    exact digit-share boundary (integer cross-multiplication, kept at
    equality), slash cap boundary, case-insensitive blocked words with
    regex metacharacters escaped, length cap, unicode char counting."""
    import ray
    import pyarrow as pa

    from shaclapi_ray.pipelines.extract import url_quality_filter

    ds = ray.data.from_arrow(
        pa.table({"url": pa.array(URLQ_ADVERSARIAL, pa.string())})
    )
    out = url_quality_filter(ds, **URLQ_KW_TEST).to_pandas()
    assert len(out) == len(URLQ_ADVERSARIAL)  # nulls reported, not dropped
    got = dict(zip(out.url, out.kept))
    assert got["https://host1.example.org/p/1"]
    assert got["http://plain.org/x"]
    assert not got["host0.example.org/p/5"]
    assert not got[""]
    null_rows = out[out.url.isna()]
    assert len(null_rows) == 1 and not null_rows.kept.iloc[0]
    assert (null_rows[["n_chars", "n_digits", "n_slashes"]] == 0).all().all()
    assert got["https://12345678"]  # 8 digits / 16 chars == pct exactly
    assert not got["https://123456789"]
    assert got["https://a/b/c"]
    assert not got["https://a/b/c/"]
    assert not got["https://www.CASINO-games.com/x"]
    assert got["https://pokerXnet.com/y"]
    assert not got["https://poker.net/z"]
    assert not got["https://long.org/" + "a" * 60]
    uni = out[out.url == "https://étude.fr/é1"].iloc[0]
    assert uni.n_chars == 19 and uni.n_digits == 1 and bool(uni.kept)


def test_url_quality_filter_oracle_parity_adversarial(ray_session, tmp_path):
    """The DuckDB oracle and the Ray operator agree row-for-row on the
    adversarial list (not just the fixture profile the driver runs)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from shaclapi_ray.oracles import url_quality_sql
    from shaclapi_ray.pipelines.extract import url_quality_filter

    tbl = pa.table({"url": pa.array(URLQ_ADVERSARIAL, pa.string())})
    pq.write_table(tbl, tmp_path / "part-0.parquet")
    duck = (
        duckdb.sql(url_quality_sql(str(tmp_path), **URLQ_KW_TEST))
        .df()
        .sort_values("url", na_position="first")
        .reset_index(drop=True)
    )
    out = (
        url_quality_filter(ray.data.from_arrow(tbl), **URLQ_KW_TEST)
        .to_pandas()
        .sort_values("url", na_position="first")
        .reset_index(drop=True)
    )
    for c in ("url", "n_chars", "n_digits", "n_slashes", "kept"):
        assert out[c].fillna("__na__").tolist() == duck[c].fillna(
            "__na__"
        ).tolist(), c


def test_extract_text_unicode_whitespace_parity(ray_session, tmp_path):
    """WS_RE is the explicit RE2 \\s class: NBSP / ideographic-space
    runs must survive (not collapse) identically on the polars side
    and in the DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from shaclapi_ray.oracles import extract_text_sql
    from shaclapi_ray.pipelines.extract import extract_text

    htmls = [
        b"<p>a\xc2\xa0b  c</p>",  # NBSP stays, double space collapses
        "<p>x　y</p>".encode(),  # ideographic space stays
        b"<p>tab\there\r\nnext</p>",
    ]
    t = pa.table(
        {
            "url": pa.array([f"https://h/{i}" for i in range(len(htmls))]),
            "warc_ts": pa.array([1] * len(htmls), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(["-"] * len(htmls)),
            "lang": pa.array(["en"] * len(htmls)),
        }
    )
    pq.write_table(t, tmp_path / "part-0.parquet")
    got = (
        extract_text(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(extract_text_sql(str(tmp_path)))
        .df()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == want["text"].tolist()
    assert got["n_text_chars"].tolist() == want["n_text_chars"].tolist()
    assert got["text"].tolist()[0] == "a\xa0b c"
    assert got["text"].tolist()[1] == "x　y"
