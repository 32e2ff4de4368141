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
