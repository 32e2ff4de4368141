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


class LinkExtractor:
    """map_batches callable: explode href targets from html bytes."""

    def __init__(self, href_pattern: bytes = HREF_RE):
        self.href = re.compile(href_pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        out_url: list[str] = []
        out_target: list[str] = []
        find = self.href.findall
        for u, h in zip(urls, htmls):
            if u is None or h is None:
                continue
            for t in find(h):
                out_url.append(u)
                out_target.append(t.decode("utf-8", "replace"))
        target_arr = pa.array(out_target, type=pa.string())
        host = pc.struct_field(
            pc.extract_regex(target_arr, HOST_RE), "host"
        )
        return pa.table(
            {
                "url": pa.array(out_url, type=pa.string()),
                "target_url": target_arr,
                "host": pc.fill_null(host, ""),
            },
            schema=LINKS_SCHEMA,
        )


def extract_links(pages_ds, batch_size: int = 2048, concurrency=(1, 8)):
    """pages Dataset (must contain url, html) -> links Dataset."""
    ds = pages_ds.select_columns(["url", "html"])
    return ds.map_batches(
        LinkExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
