"""Link extraction: pages(url, html) -> links(url, target_url, host).

The referential analog of the reference's inter-shape dependency edges: a
page "references" the pages its ``href`` anchors point at, just as a shape
instance references child-shape instances
(/root/reference/shaclapi/reduction/travshacl/ReducedShapeParser.py:124-138).

Scale notes: the stage reads ONLY (url, html) (prune at the read; keep the
wide ``html`` binary out of every downstream shuffle — SURVEY.md §7.4),
decodes the binary html LOSSILY (invalid UTF-8 degrades to replacement
chars instead of aborting the job — see _decode_lossy), and emits a narrow
(url, target_url, host) table.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.schemas import LINKS_SCHEMA

HREF_RE = rb'href="([^"]+)"'
HOST_RE = r"^https?://(?P<host>[^/]+)"


_HREF_COMPILED = re.compile(HREF_RE)
HREF_STR_RE = r'href="[^"]+"'


def _decode_lossy(html_col) -> pa.Array:
    """binary html -> string, never raising on invalid UTF-8.

    Real web corpora contain pages that are not valid UTF-8; Arrow's
    ``cast(string)`` validates and would abort the whole job on one bad
    page. Fast path: the vectorized cast (zero-copy view). Fallback (only
    when the batch actually contains invalid bytes): per-row
    ``bytes.decode(errors='replace')`` — C-speed, malformed pages degrade
    to U+FFFD runs (=> fewer extracted links) instead of crashing."""
    try:
        # zero-copy per chunk (no combine_chunks: that would COPY the
        # whole binary column before the cast)
        return html_col.cast(pa.string())
    except pa.ArrowInvalid:
        return pa.array(
            [
                b.decode("utf-8", errors="replace") if b is not None else None
                for b in html_col.to_pylist()
            ],
            type=pa.string(),
        )


def extract_targets_vectorized(html_col):
    """(row_indices, target_url polars Series): vectorized href extraction
    via polars' extract_all — ~2x faster than a python findall loop and no
    per-row object conversion. Rows with null html or no links drop out."""
    import polars as pl

    s = pl.from_arrow(_decode_lossy(html_col))
    ex = s.str.extract_all(HREF_STR_RE)
    df = (
        pl.DataFrame({"row": pl.int_range(len(s), eager=True), "m": ex})
        .explode("m")
        .drop_nulls()
    )
    targets = df["m"].str.slice(6).str.strip_suffix('"')
    return df["row"].to_numpy(), targets


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """Stateless task body: explode href targets from html bytes."""
    rows, targets = extract_targets_vectorized(batch["html"])
    target_arr = targets.to_arrow().cast(pa.string())
    url_col = pc.take(batch["url"], pa.array(rows, type=pa.int64()))
    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    keep = pc.is_valid(url_col)  # rows with null url carry no links
    url_col = url_col.filter(keep)
    target_arr = target_arr.filter(keep)
    host = pc.struct_field(pc.extract_regex(target_arr, HOST_RE), "host")
    return pa.table(
        {
            "url": url_col,
            "target_url": target_arr,
            "host": pc.fill_null(host, ""),
        },
        schema=LINKS_SCHEMA,
    )


def extract_links(pages_ds, batch_size: int | None = None, concurrency=None):
    """pages Dataset (must contain url, html) -> links Dataset.

    Stateless tasks (elastic, no actor ramp-up). Default batch = whole
    block (lowest per-task overhead); pass ``batch_size`` to bound memory
    when html payloads are very large."""
    ds = pages_ds.select_columns(["url", "html"])
    kwargs = {}
    if concurrency:
        kwargs["concurrency"] = concurrency
    if batch_size:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(
        extract_links_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        **kwargs,
    )
