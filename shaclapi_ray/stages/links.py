"""Link extraction: pages(url, html) -> links(url, target_url, host).

The referential analog of the reference's inter-shape dependency edges: a
page "references" the pages its ``href`` anchors point at, just as a shape
instance references child-shape instances
(/root/reference/shaclapi/reduction/travshacl/ReducedShapeParser.py:124-138).

Scale notes: the stage reads ONLY (url, html) (prune at the read; keep the
wide ``html`` binary out of every downstream shuffle — SURVEY.md §7.4), runs
as an actor pool so the regex is compiled once per actor, scans bytes
directly (no utf-8 decode of the full page), and emits a narrow
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


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """Stateless task body: explode href targets from html bytes.

    Module-level compiled regex (compiled once per worker process at
    import); bytes scanned directly — no utf-8 decode of the full page."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    out_url: list[str] = []
    out_target: list[str] = []
    find = _HREF_COMPILED.findall
    for u, h in zip(urls, htmls):
        if u is None or h is None:
            continue
        for t in find(h):
            out_url.append(u)
            out_target.append(t.decode("utf-8", "replace"))
    target_arr = pa.array(out_target, type=pa.string())
    host = pc.struct_field(pc.extract_regex(target_arr, HOST_RE), "host")
    return pa.table(
        {
            "url": pa.array(out_url, type=pa.string()),
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
