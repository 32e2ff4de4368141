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
WS_RE = r"\s+"


def extract_text(pages_ds):
    """(url, text, n_text_chars): visible text = html with tags stripped
    and whitespace runs collapsed; rows with null url are dropped (same
    contract as link extraction)."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["url"]))
        t = _decode_lossy(batch["html"])
        t = pc.replace_substring_regex(t, TAG_RE, "")
        t = pc.replace_substring_regex(t, WS_RE, " ")
        t = pc.utf8_trim(t, characters=" ")
        return pa.table(
            {
                "url": batch["url"],
                "text": t,
                "n_text_chars": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return pages_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
