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
