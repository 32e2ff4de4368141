"""Pure-Python oracle for the fixture shapes: recomputes expected verdicts
row-by-row from the generator's closed-form rules (FIXTURES.md), independent
of the Ray engine's vectorized evaluation. Comparison semantics follow the
reference's compare_results (/root/reference/tests/test_main.py:229-246):
sorted instance lists, exact counts.
"""

from __future__ import annotations

from shaclapi_ray.pagegen import (
    BLOCK,
    LANGS,
    LONG_TEXT_LEN,
    row_lang,
    row_link_targets,
    row_text,
    row_url,
    row_warc_ts_us,
)

TS_MIN_US = -1
TS_MAX_US = -1


def _ts_bounds():
    import numpy as np

    lo = np.datetime64("2008-01-01T00:00:00", "us").astype("int64")
    hi = np.datetime64("2026-06-30T00:00:00", "us").astype("int64")
    return int(lo), int(hi)


def url_key(i: int) -> str:
    u = row_url(i)
    return "null" if u is None else u


def s1_valid(i: int) -> bool:
    u = row_url(i)
    ok_null = u is not None
    ok_scheme = bool(u) and (u.startswith("https://") or u.startswith("http://"))
    ok_len = len(row_text(i)) >= 10
    return ok_null and ok_scheme and ok_len


def s2_target(i: int) -> bool:
    return row_lang(i) == "en"


def s2_valid(i: int) -> bool:
    lo, hi = _ts_bounds()
    ts = row_warc_ts_us(i)
    return lo <= ts <= hi and len(row_text(i)) <= 100_000


def s3_valid(i: int) -> bool:
    return row_lang(i) in LANGS


def s5_valid(i: int) -> bool:
    u = row_url(i)
    lo, hi = _ts_bounds()
    ok_scheme = bool(u) and (u.startswith("https://") or u.startswith("http://"))
    return ok_scheme and lo <= row_warc_ts_us(i) <= hi


def s4_target(i: int) -> bool:
    return row_lang(i) == "en"


def s4_qualified_count(i: int, n_rows: int) -> int:
    """Links of row i whose target url exists in the table AND is S5-valid."""
    url_of = {}
    for t in range(n_rows):
        u = row_url(t)
        if u:
            url_of.setdefault(u, []).append(t)
    q = 0
    for tgt in row_link_targets(i, n_rows):
        rows = url_of.get(tgt)
        if rows and any(s5_valid(t) for t in rows):
            q += 1
    return q


def s6_valid(i: int, n_rows: int) -> bool:
    return (
        len(row_text(i)) >= 10
        or row_lang(i) == "en"
        or len(row_link_targets(i, n_rows)) == 0
    )


def s7_valid(i: int, n_rows: int) -> bool:
    counts: dict[str, int] = {}
    for t in range(n_rows):
        counts[url_key(t)] = counts.get(url_key(t), 0) + 1
    return counts[url_key(i)] == 1


def expected_verdicts(shape_id: str, n_rows: int) -> list[tuple[str, bool]]:
    """Sorted (url, valid) rows — one per targeted row."""
    out: list[tuple[str, bool]] = []
    for i in range(n_rows):
        if shape_id == "UrlShape":
            out.append((url_key(i), s1_valid(i)))
        elif shape_id == "FreshPageShape":
            if s2_target(i):
                out.append((url_key(i), s2_valid(i)))
        elif shape_id == "LangShape":
            out.append((url_key(i), s3_valid(i)))
        elif shape_id == "TargetPageShape":
            out.append((url_key(i), s5_valid(i)))
        elif shape_id == "LinkedPageShape":
            if s4_target(i):
                out.append((url_key(i), s4_qualified_count(i, n_rows) >= 1))
        elif shape_id == "OrShape":
            out.append((url_key(i), s6_valid(i, n_rows)))
        elif shape_id == "UniqueUrlShape":
            out.append((url_key(i), s7_valid(i, n_rows)))
        else:
            raise ValueError(shape_id)
    return sorted(out)


def expected_links(n_rows: int) -> list[tuple[str, str]]:
    out = []
    for i in range(n_rows):
        u = row_url(i)
        if u is None:
            continue
        for t in row_link_targets(i, n_rows):
            out.append((u, t))
    return sorted(out)


__all__ = [
    "expected_verdicts",
    "expected_links",
    "url_key",
    "BLOCK",
    "LONG_TEXT_LEN",
]
