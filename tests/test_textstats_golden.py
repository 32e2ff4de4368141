"""Golden-value checks for the deterministic no-SQL-oracle text
operators: rolling_fingerprint (Rabin-Karp min-hash) against a direct
per-document reference implementation, including docs past the old
64 KiB truncation point."""

import numpy as np
import pyarrow as pa


def _direct_fp_min(text: str, window: int = 32) -> int:
    """Independent O(n*w) reference: h_i = sum data[i+j]*B^(w-1-j) mod 2^64."""
    B = 1000003
    data = text.encode()
    if len(data) < window:
        return 0
    M = 1 << 64
    best = None
    powers = [pow(B, window - 1 - j, M) for j in range(window)]
    for i in range(len(data) - window + 1):
        h = sum(data[i + j] * powers[j] for j in range(window)) % M
        if best is None or h < best:
            best = h
    return best - M if best >= (1 << 63) else best


def _run(texts):
    import ray.data

    from shaclapi_ray.pipelines.textstats import rolling_fingerprint

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    df = rolling_fingerprint(ds).to_pandas().sort_values("doc_id")
    return dict(zip(df.doc_id, df.fp_min))


def test_rolling_fingerprint_matches_direct(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog and keeps running onward",
        "short",  # < window -> 0
        "",  # empty -> 0
        "a" * 31,  # exactly window-1 -> 0
        "b" * 32,  # exactly one window
        "unicode çöñtent with ünüsual bytes repeated " * 4,
    ]
    got = _run(texts)
    for i, t in enumerate(texts):
        assert got[i] == _direct_fp_min(t), f"doc {i}"


def test_rolling_fingerprint_hashes_full_long_docs(ray_session):
    """The old implementation silently truncated at 64 KiB; the minimum
    must now reflect windows in the tail of a long document."""
    rng = np.random.default_rng(9)
    head = "x" * 70_000  # uniform head: few distinct windows
    tail = "".join(chr(97 + c) for c in rng.integers(0, 26, size=2000))
    text = head + tail
    got = _run([text])[0]
    # reference over the FULL text (tail windows included)
    assert got == _direct_fp_min(text)
    # and the tail actually matters: hashing only the head gives a
    # different (larger) minimum than the full-document minimum
    head_only = _direct_fp_min(head)
    assert got <= head_only


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_tfidf_top_terms_golden(ray_session):
    from shaclapi_ray.pipelines.textstats import tfidf_top_terms

    texts = [
        "apple apple banana cherry",
        "banana banana banana date",
        "apple date date",
        None,  # null text contributes no tokens but counts toward N
    ]
    df = (
        tfidf_top_terms(_docs_ds(texts), k=2, min_df=1)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    n = 4  # N includes the null-text doc
    # doc 0: apple tf=2 df=2, banana tf=1 df=2, cherry tf=1 df=1
    # scores: apple 2*ln(2)=1.386294, cherry 1*ln(4)=1.386294 -> tie,
    # token asc => apple rank 1, cherry rank 2
    d0 = df[df.doc_id == 0]
    assert list(d0.token) == ["apple", "cherry"]
    assert list(d0["rank"]) == [1, 2]
    assert abs(d0.tfidf.iloc[0] - round(2 * np.log(n / 2), 6)) < 1e-9
    assert abs(d0.tfidf.iloc[1] - round(1 * np.log(n / 1), 6)) < 1e-9
    # doc 1: banana tf=3 beats date tf=1
    d1 = df[df.doc_id == 1]
    assert list(d1.token) == ["banana", "date"]
    # doc 3 (null) emits nothing
    assert not (df.doc_id == 3).any()


def test_tfidf_min_df_prunes_vocabulary(ray_session):
    from shaclapi_ray.pipelines.textstats import tfidf_top_terms

    texts = ["rare common", "common other"]
    df = tfidf_top_terms(_docs_ds(texts), k=5, min_df=2).to_pandas()
    # only 'common' (df=2) survives min_df=2 — and its idf is ln(1)=0
    assert set(df.token) == {"common"}
    assert (df.tfidf == 0.0).all()


def test_rebalance_corpus_thresholds(ray_session):
    """Every class is downsampled toward the minority class size with the
    deterministic Knuth-hash rule; verify against a direct recompute."""
    from shaclapi_ray.pipelines.textstats import (
        SAMPLE_KNUTH,
        rebalance_corpus,
    )

    # 20 english-ish, 5 und docs -> en downsampled to ~5
    texts = ["the and is of to be that" for _ in range(20)] + [
        "zzz qqq xxx" for _ in range(5)
    ]
    df = (
        rebalance_corpus(_docs_ds(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    thr = {"en": (5 << 32) // 20, "und": (5 << 32) // 5}
    expect = [
        (i, lang)
        for i, lang in enumerate(["en"] * 20 + ["und"] * 5)
        if (i * SAMPLE_KNUTH) % (1 << 32) < thr[lang]
    ]
    got = list(zip(df.doc_id, df.lang_pred))
    assert got == expect
    # the und class keeps everything (threshold == 2^32)
    assert sum(1 for _, l in got if l == "und") == 5


def test_quality_quantile_filter_golden(ray_session):
    """Per-group exact median filter: survivors are the docs STRICTLY
    above the ceil(q*n)-th smallest token count in their group."""
    import ray.data

    from shaclapi_ray.pipelines.textstats import quality_quantile_filter

    def words(n):
        return " ".join("w" for _ in range(n))

    # group a: token counts 1..5 (median value 3 -> keep 4, 5)
    # group b: counts [2, 2, 7] (ceil(.5*3)=2nd smallest = 2 -> keep 7)
    rows = [(0, words(1), "a"), (1, words(2), "a"), (2, words(3), "a"),
            (3, words(4), "a"), (4, words(5), "a"),
            (5, words(2), "b"), (6, words(2), "b"), (7, words(7), "b")]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    df = (
        quality_quantile_filter(ds, q=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(df.doc_id) == [3, 4, 7]
    assert list(df.score) == [4, 5, 7]

    # q=1: threshold is the max -> nothing strictly above it survives
    empty = quality_quantile_filter(ds, q=1.0).to_pandas()
    assert len(empty) == 0


def test_sample_stratified_subset_and_ratios(ray_session):
    """Per-group fractions hold (within hash tolerance), absent groups get
    the default, and raising a fraction only ADDS docs (subset property
    for stable tuning)."""
    import ray.data

    from shaclapi_ray.pipelines.textstats import sample_stratified

    docs = ray.data.from_items(
        [
            {"doc_id": i, "lang": ("en" if i % 2 == 0 else "fr"), "text": "t"}
            for i in range(4000)
        ]
    )
    a = sample_stratified(docs, {"en": 0.1}, default=0.8).to_pandas()
    en_a = set(a[a.lang == "en"].doc_id)
    fr_a = set(a[a.lang == "fr"].doc_id)
    assert 0.05 < len(en_a) / 2000 < 0.16
    assert 0.72 < len(fr_a) / 2000 < 0.88

    b = sample_stratified(docs, {"en": 0.5}, default=0.8).to_pandas()
    en_b = set(b[b.lang == "en"].doc_id)
    assert en_a <= en_b  # monotone: tuning a ratio up never churns the sample
    assert set(b[b.lang == "fr"].doc_id) == fr_a


def test_max_word_count_golden(ray_session):
    """Top-word dominance (Gopher 'fraction of most common word'): the
    max token occurrence count per doc, 0 for tokenless docs."""
    import pyarrow as pa
    import ray.data

    from shaclapi_ray.pipelines.textstats import repetition_signals

    texts = ["batch batch batch stream", "a b c", "", "x x y y y"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    df = repetition_signals(ds).to_pandas().sort_values("doc_id")
    assert list(df.max_word_count) == [3, 1, 0, 3]


def test_unigram_sharded_equals_broadcast(ray_session):
    """The hash-partitioned unigram path must match the broadcast scorer
    (n_tokens identical, logprob to float reassociation error)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from shaclapi_ray.pipelines.textstats import (
        unigram_logprob,
        unigram_logprob_sharded,
    )

    rng = np.random.default_rng(6)
    words = ["aa", "bb", "cc", "dd", "ee"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 14))) for _ in range(60)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(60), pa.int64()), "text": pa.array(texts)}
    )
    a = (
        unigram_logprob(rd.from_arrow(tbl).repartition(5))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        unigram_logprob_sharded(rd.from_arrow(tbl).repartition(5))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a["n_tokens"].tolist() == b["n_tokens"].tolist()
    np.testing.assert_allclose(a["logprob"], b["logprob"], atol=1e-9)


def _docs_from(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )


def test_compression_signals_match_direct(ray_session):
    """Exact byte/compressed sizes vs a direct zlib recompute, including
    null/empty/unicode edges."""
    import zlib

    from shaclapi_ray.pipelines.textstats import compression_signals

    texts = [None, "", "abc " * 200, "the quick brown fox", "δοκιμή " * 50]
    out = (
        compression_signals(_docs_from(texts))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, t in enumerate(texts):
        b = t.encode("utf-8") if t else b""
        assert out.loc[i, "n_bytes"] == len(b)
        assert out.loc[i, "n_compressed"] == len(zlib.compress(b, 6))
        if len(b) == 0:
            assert out.loc[i, "compression_ratio"] == 0.0
        else:
            assert out.loc[i, "compression_ratio"] == len(b) / len(
                zlib.compress(b, 6)
            )


def test_compression_signals_rank_redundancy(ray_session):
    """The signal's point: boilerplate/repetition compresses much harder
    than natural-looking prose of the same length."""
    import numpy as np

    from shaclapi_ray.pipelines.textstats import compression_signals

    rng = np.random.default_rng(5)
    words = ["data", "spark", "query", "merge", "vector", "line", "sort"]
    prose = " ".join(rng.choice(words, size=400))
    boiler = "click here to subscribe now " * 80
    out = (
        compression_signals(_docs_from([prose, boiler]))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "compression_ratio"] > out.loc[0, "compression_ratio"] * 2


def test_compression_signals_layout_independent(ray_session):
    from shaclapi_ray.pipelines.textstats import compression_signals

    texts = [f"doc {i} " + "pad " * (i % 17) for i in range(40)]
    a = (
        compression_signals(_docs_from(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        compression_signals(_docs_from(texts).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_ccnet_buckets_semantics(ray_session):
    """Planted quality gradient: repeated common words land in 'head',
    rare-token garbage in 'tail'; every group's bucket counts follow the
    rank-quantile definition."""
    from shaclapi_ray.pipelines.textstats import ccnet_buckets

    texts = (
        ["common words common words common words"] * 4   # high logprob
        + ["common words mixed with zxq%d unique" % i for i in range(4)]
        + ["zzqx%d wvut%d qqpl%d" % (i, i, i) for i in range(4)]  # rare
    )
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(12), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 12),
            }
        )
    ).repartition(3)
    out = ccnet_buckets(ds).to_pandas().set_index("doc_id").sort_index()
    assert (out.loc[0:3, "bucket"] == "head").all()
    assert (out.loc[8:11, "bucket"] == "tail").all()
    # layout independence: the raw float mean reproduces only to ~1 ulp
    # across block layouts (polars group-sum chunking), which is exactly
    # why score_q uses round-to-nearest — the DERIVED columns must be
    # bit-identical even where the float wobbles
    out1 = (
        ccnet_buckets(ds.repartition(1))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out7 = (
        ccnet_buckets(ds.repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ("doc_id", "lang", "n_tokens", "score_q", "bucket"):
        assert (out1[col] == out7[col]).all(), col
    assert np.allclose(out1["logprob"], out7["logprob"], rtol=1e-12)


def test_clean_lines_c4_rules(ray_session):
    """The C4 line pass on a planted doc: short lines, no-terminal-punct
    lines, brace lines, and repeated boilerplate all drop; kept lines
    preserve order and re-join with newlines."""
    import ray.data

    from shaclapi_ray.pipelines.textstats import clean_lines

    doc = "\n".join(
        [
            "This is a perfectly fine sentence with enough words.",  # keep
            "too short.",                                             # <5 words
            "No terminal punctuation in this line of text here",      # no punct
            "function() { return 42; } has code braces in it today.", # brace
            "Subscribe to our newsletter for updates every single day!",  # keep
            "Subscribe to our newsletter for updates every single day!",  # dup
            "  Trailing-space terminal punctuation also counts here.  ",  # keep
        ]
    )
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([doc])})
    )
    out = clean_lines(ds).to_pandas().iloc[0]
    kept = out["clean_text"].split("\n")
    assert kept == [
        "This is a perfectly fine sentence with enough words.",
        "Subscribe to our newsletter for updates every single day!",
        "  Trailing-space terminal punctuation also counts here.  ",
    ]
    assert out["n_kept_lines"] == 3 and out["n_dropped_lines"] == 4
    # dedup off keeps the repeated boilerplate twice
    out2 = clean_lines(ds, dedup_lines=False).to_pandas().iloc[0]
    assert out2["n_kept_lines"] == 4


def test_gopher_rules_planted(ray_session):
    """Each Gopher rule fires on a planted violator; a natural-looking doc
    passes the full default profile."""
    import ray.data

    from shaclapi_ray.pipelines.textstats import gopher_rules

    good = (
        "The quick brown fox jumps over the lazy dog and that is fine. "
        * 10
    )  # 130 words, stopwords the/and/that, alphabetic, no symbols
    too_short = "The dog and that cat."
    symbols = ("# " * 60) + "the and that"
    bullets = "\n".join("- the bullet line item here and that" for _ in range(10))
    ellipses = "\n".join("the line trails off and that..." for _ in range(10))
    numeric = ("42 7 99 " * 30) + "the and that"
    no_stop = "word " * 80
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(
                    [good, too_short, symbols, bullets, ellipses, numeric]
                ),
            }
        )
    )
    out = gopher_rules(ds).to_pandas().set_index("doc_id")
    assert bool(out.loc[0, "gopher_pass"])
    assert not out.loc[1:5, "gopher_pass"].any()
    assert out.loc[2, "symbol_ratio"] > 0.1
    assert out.loc[3, "bullet_frac"] == 1.0
    assert out.loc[4, "ellipsis_frac"] == 1.0
    assert out.loc[5, "alpha_frac"] < 0.8
    # the no-stopword rule alone
    ds2 = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": pa.array([no_stop])}
        )
    )
    o2 = gopher_rules(ds2).to_pandas().iloc[0]
    assert o2["n_stop_hits"] == 0 and not o2["gopher_pass"]


def test_zlib_build_matches_golden_generator():
    """The rolling_fingerprint golden pins zlib-compressed sizes, which
    differ between zlib BUILDS (madler zlib vs zlib-ng) — if this fails,
    the runtime links a different zlib than the golden generator and the
    compression goldens must be regenerated (tools/gen_goldens.py); a
    value diff in those goldens without this failing means a real bug."""
    import zlib

    with open("/root/repo/fixtures/goldens/ZLIB_VERSION.txt") as f:
        expected = f.read().strip()
    assert zlib.ZLIB_RUNTIME_VERSION == expected, (
        f"zlib build mismatch: runtime {zlib.ZLIB_RUNTIME_VERSION} vs "
        f"golden generator {expected} — regenerate the compression goldens"
    )
