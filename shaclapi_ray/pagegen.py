"""Deterministic synthetic pages-table generator (FIXTURES.md).

Row content is a pure function of the global row index ``i`` (no RNG), so
goldens are stable across scales and parallelism levels and test oracles can
recompute any row independently. Violation indices are defined modulo a block
of ``BLOCK = 100`` rows, so expected valid/invalid *counts* scale linearly.

Columns per BASELINE.json ``input_hint``: (url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string).

Planted violations (i % 100 == ...):
    13 -> url == ''            27 -> url missing scheme     41 -> url null
     7 -> warc_ts < 2008       53 -> warc_ts > 2026-06-30
    19 -> lang ''              31 -> lang 'xx'              67 -> lang null
     3 -> len(text) < 10       71 -> len(text) > 100_000

Links: row i carries ``i % 6`` hrefs in ``html``; link j targets row
``(i*31 + j*17 + 7) % n_rows`` unless ``(i + j) % 13 == 0`` which plants a
dangling target (url absent from the table) — the referential violations of
the tc4 analog (/root/reference/tests/tc4/docs/TC4_preparation.txt).

Scale mapping: the testdata dirs sf0.001/sf0.01/sf0.1 map to 2k/20k/200k rows
(``n_rows = int(sf * 2_000_000)``).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BLOCK = 100
N_HOSTS = 10
BASE_TS_US = np.datetime64("2025-01-01T00:00:00", "us").astype("int64")
OLD_TS_US = np.datetime64("1999-06-15T12:00:00", "us").astype("int64")
FUTURE_TS_US = np.datetime64("2030-01-01T00:00:00", "us").astype("int64")
LANGS = ["en", "de", "es", "fr", "pt"]
SHORT_TEXT_LEN_MOD = 3  # i%100==3 -> short text
LONG_TEXT_LEN = 100_050
FILLER = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua "
)

ROWS_PER_FILE = 25_000
ROW_GROUP_SIZE = 5_000


def n_rows_for_sf_dir(sf_dir: str) -> int:
    """Map a testdata dir name (``.../sf0.01``) to a pages row count."""
    name = os.path.basename(os.path.normpath(sf_dir))
    m = re.match(r"sf([0-9.]+)$", name)
    sf = float(m.group(1)) if m else 0.001
    return max(BLOCK, int(round(sf * 2_000_000)))


def pages_dir_for(sf_dir: str, root: str = "/tmp/shaclapi_ray_pages") -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(root, name)


def _text_len(i: np.ndarray) -> np.ndarray:
    return 200 + (i * 37) % 4000


def row_url(i: int) -> str | None:
    m = i % BLOCK
    if m == 13:
        return ""
    if m == 41:
        return None
    host = i % N_HOSTS
    if m == 27:
        return f"host{host}.example.org/p/{i}"
    return f"https://host{host}.example.org/p/{i}"


def row_canonical_url(i: int) -> str:
    """The url row i would have without planted url violations — link targets
    always use the canonical form so referential checks are well-defined."""
    return f"https://host{i % N_HOSTS}.example.org/p/{i}"


def row_warc_ts_us(i: int) -> int:
    m = i % BLOCK
    if m == 7:
        return int(OLD_TS_US + i)
    if m == 53:
        return int(FUTURE_TS_US + i)
    return int(BASE_TS_US + i * 17_000_000)


def row_lang(i: int) -> str | None:
    m = i % BLOCK
    if m == 19:
        return ""
    if m == 31:
        return "xx"
    if m == 67:
        return None
    return LANGS[i % 5]


def row_text(i: int) -> str:
    m = i % BLOCK
    if m == SHORT_TEXT_LEN_MOD:
        return f"pg{i % 7}"
    target = LONG_TEXT_LEN if m == 71 else int(_text_len(np.int64(i)))
    head = f"page {i} body "
    need = target - len(head)
    filler = (FILLER * (need // len(FILLER) + 1))[:need]
    return head + filler


def row_link_targets(i: int, n_rows: int, skew: bool = False) -> list[str]:
    """Link targets for row i (canonical urls; some dangling).

    ``skew=True`` is the FIXTURES.md skew fixture: for rows in the upper
    half of the table, ~80% of links are redirected to host0 urls (target
    index snapped to a multiple of N_HOSTS), planting one hot key for the
    referential shuffle — the salted-join test input."""
    k = i % 6
    out = []
    for j in range(k):
        if (i + j) % 13 == 0:
            out.append(f"https://ghost.example.org/m/{i}_{j}")
        else:
            t = (i * 31 + j * 17 + 7) % n_rows
            if skew and i >= n_rows // 2 and (i + j) % 5 != 0:
                t = (t // N_HOSTS) * N_HOSTS  # snap to host0
            out.append(row_canonical_url(t))
    return out


def row_html(i: int, n_rows: int, skew: bool = False) -> bytes:
    anchors = "".join(
        f'<a href="{t}">l</a>' for t in row_link_targets(i, n_rows, skew)
    )
    return f"<html><body>{row_text(i)}{anchors}</body></html>".encode()


def _build_chunk(lo: int, hi: int, n_rows: int, skew: bool = False) -> pa.Table:
    idx = np.arange(lo, hi, dtype=np.int64)
    urls = [row_url(int(i)) for i in idx]
    ts = pa.array([row_warc_ts_us(int(i)) for i in idx], type=pa.int64()).cast(
        pa.timestamp("us")
    )
    langs = [row_lang(int(i)) for i in idx]
    texts = [row_text(int(i)) for i in idx]
    htmls = [row_html(int(i), n_rows, skew) for i in idx]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def generate_pages(
    out_dir: str, n_rows: int, force: bool = False, skew: bool = False
) -> str:
    """Write the pages table as a directory of parquet part files.

    Idempotent: a ``_MANIFEST`` file records ``n_rows``; matching manifests
    skip regeneration. Multiple part files + small row groups give the Ray
    reader natural block parallelism (SURVEY.md §4: blocks ≈ 2-4x CPUs).
    """
    manifest = os.path.join(out_dir, "_MANIFEST")
    stamp = f"{n_rows}:skew" if skew else str(n_rows)
    if not force and os.path.exists(manifest):
        with open(manifest) as f:
            if f.read().strip() == stamp:
                return out_dir
    tmp_dir = out_dir + ".tmp"
    if os.path.exists(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir, exist_ok=True)
    part = 0
    for lo in range(0, n_rows, ROWS_PER_FILE):
        hi = min(lo + ROWS_PER_FILE, n_rows)
        table = _build_chunk(lo, hi, n_rows, skew)
        pq.write_table(
            table,
            os.path.join(tmp_dir, f"part-{part:05d}.parquet"),
            row_group_size=ROW_GROUP_SIZE,
            compression="zstd",
        )
        part += 1
    with open(os.path.join(tmp_dir, "_MANIFEST"), "w") as f:
        f.write(stamp)
    if os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    os.replace(tmp_dir, out_dir)
    return out_dir


def ensure_pages(sf_dir: str, root: str = "/tmp/shaclapi_ray_pages") -> str:
    """Generate (once) and return the pages dir for a testdata sf dir."""
    out = pages_dir_for(sf_dir, root)
    return generate_pages(out, n_rows_for_sf_dir(sf_dir))


def pages_parquet_paths(pages_dir: str) -> list[str]:
    return sorted(
        os.path.join(pages_dir, f)
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )
