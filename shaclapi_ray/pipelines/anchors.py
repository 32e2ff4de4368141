"""Inbound anchor-text profiles: per target url, who links to it and
with what words.

Anchor text is the classic web-graph quality/relevance signal (search
engines have aggregated it per target since PageRank-era crawls; web
corpus pipelines use inlink counts + anchor diversity as host/page
quality features). For every url that appears as an ``<a href>`` target
anywhere in the corpus this operator emits:

- ``n_inlinks``       total anchor occurrences pointing at it
- ``n_unique_sources`` distinct source pages linking to it
- ``n_distinct_anchors`` distinct anchor strings used
- ``top_anchor``      most frequent anchor string (count desc, then
                      lexicographic asc — deterministic)

Reference analog: none (beyond-reference training-data operator); the
explode → per-batch pre-aggregate → single combine → per-key finalize
shape mirrors ``stages/links.py`` + ``pipelines/hostcure.py``.

Scale notes (100 TB):
- The html decode + tag explode is the same stateless vectorized pass
  as ``extract_links`` (polars extract_all over a lossy-decoded view);
  html never leaves the scan — partials are narrow
  (target, key, kind, cnt) rows pre-aggregated per batch.
- BOTH aggregates ride ONE combine: anchor-count rows (kind='a') and
  distinct-source rows (kind='s') share the partial schema, so the
  whole profile costs a single `combine_partials_multi` exchange
  (driver merge below 5M partial rows, Ray shuffle above) plus a
  per-target finalize (driver below the limit, groupby(target) above).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

from shaclapi_ray.stages.aggregates import (
    DRIVER_MERGE_LIMIT,
    combine_partials_multi,
)
from shaclapi_ray.stages.links import _decode_lossy

# full <a> tag with href + inner text; group 1 = target, group 2 = anchor
ATAG_RE = r'<a href="([^"]+)"[^>]*>([^<]*)</a>'

_PARTIAL_SCHEMA = pa.schema(
    [
        ("target", pa.string()),
        ("k", pa.string()),
        ("kind", pa.string()),
        ("cnt", pa.int64()),
    ]
)

_OUT_SCHEMA = pa.schema(
    [
        ("target_url", pa.string()),
        ("n_inlinks", pa.int64()),
        ("n_unique_sources", pa.int64()),
        ("n_distinct_anchors", pa.int64()),
        ("top_anchor", pa.string()),
    ]
)


def _pairs(batch: pa.Table, url_col: str, html_col: str) -> pl.DataFrame:
    """(src, target, anchor) rows exploded from one batch's html; pages
    with a NULL url carry no links (mirrors extract_links / links_sql)."""
    s = pl.from_arrow(_decode_lossy(batch[html_col]))
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    src = pl.from_arrow(batch[url_col])
    if isinstance(src, pl.DataFrame):
        src = src.to_series()
    df = (
        pl.DataFrame(
            {"src": src, "tag": s.str.extract_all(ATAG_RE)}
        )
        .drop_nulls("src")
        .explode("tag")
        .drop_nulls("tag")
    )
    return df.with_columns(
        df["tag"].str.extract(ATAG_RE, 1).alias("target"),
        df["tag"].str.extract(ATAG_RE, 2).alias("anchor"),
    ).select(["src", "target", "anchor"])


def _partials(batch: pa.Table, url_col: str, html_col: str) -> pa.Table:
    p = _pairs(batch, url_col, html_col)
    if p.height == 0:
        return _PARTIAL_SCHEMA.empty_table()
    a = (
        p.group_by(["target", "anchor"])
        .agg(pl.len().cast(pl.Int64).alias("cnt"))
        .select(
            pl.col("target"),
            pl.col("anchor").alias("k"),
            pl.lit("a").alias("kind"),
            pl.col("cnt"),
        )
    )
    s = (
        p.group_by(["target", "src"])
        .agg(pl.len().cast(pl.Int64).alias("cnt"))
        .select(
            pl.col("target"),
            pl.col("src").alias("k"),
            pl.lit("s").alias("kind"),
            pl.col("cnt"),
        )
    )
    return pl.concat([a, s]).to_arrow().cast(_PARTIAL_SCHEMA)


def _finalize(df: pl.DataFrame) -> pa.Table:
    """Combined (target, k, kind, cnt) rows -> one profile row per target."""
    a = df.filter(pl.col("kind") == "a")
    s = df.filter(pl.col("kind") == "s")
    agg_a = a.group_by("target").agg(
        pl.col("cnt").sum().alias("n_inlinks"),
        pl.len().cast(pl.Int64).alias("n_distinct_anchors"),
    )
    top = (
        a.sort(["target", "cnt", "k"], descending=[False, True, False])
        .group_by("target", maintain_order=True)
        .first()
        .select(pl.col("target"), pl.col("k").alias("top_anchor"))
    )
    agg_s = s.group_by("target").agg(
        pl.len().cast(pl.Int64).alias("n_unique_sources")
    )
    out = (
        agg_a.join(agg_s, on="target", how="inner")
        .join(top, on="target", how="inner")
        .select(
            pl.col("target").alias("target_url"),
            "n_inlinks",
            "n_unique_sources",
            "n_distinct_anchors",
            "top_anchor",
        )
    )
    return out.to_arrow().cast(_OUT_SCHEMA)


_OUT_PROFILE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_pages", pa.int64()),
        ("n_links", pa.int64()),
        ("n_unique_hosts", pa.int64()),
        ("n_internal", pa.int64()),
    ]
)


def _outlink_partials(batch: pa.Table, url_col: str, html_col: str) -> pa.Table:
    """Per-batch pre-aggregated outlink partials, two kinds sharing one
    schema: kind='p' counts page copies per url (so zero-link pages
    still profile, and duplicate urls aggregate like the SQL GROUP BY);
    kind='l' counts links per (url, target-host)."""
    import pyarrow.compute as pc

    from shaclapi_ray.stages.links import HOST_RE

    url = batch[url_col]
    valid = pc.is_valid(url)
    urls = url.filter(valid)
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if len(urls) == 0:
        return _PARTIAL_SCHEMA.empty_table()
    pages_part = (
        pl.DataFrame({"target": pl.from_arrow(urls)})
        .group_by("target")
        .agg(pl.len().cast(pl.Int64).alias("cnt"))
        .select(
            pl.col("target"),
            pl.lit("").alias("k"),
            pl.lit("p").alias("kind"),
            pl.col("cnt"),
        )
    )
    s = pl.from_arrow(_decode_lossy(batch[html_col].filter(valid)))
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    links = (
        pl.DataFrame({"src": pl.from_arrow(urls), "href": s.str.extract_all(
            r'href="[^"]+"'
        )})
        .explode("href")
        .drop_nulls("href")
    )
    if links.height == 0:
        return pages_part.to_arrow().cast(_PARTIAL_SCHEMA)
    links = links.with_columns(
        links["href"]
        .str.slice(6)
        .str.strip_suffix('"')
        .str.extract(HOST_RE, 1)
        .fill_null("")
        .alias("thost")
    )
    link_part = (
        links.group_by(["src", "thost"])
        .agg(pl.len().cast(pl.Int64).alias("cnt"))
        .select(
            pl.col("src").alias("target"),
            pl.col("thost").alias("k"),
            pl.lit("l").alias("kind"),
            pl.col("cnt"),
        )
    )
    return pl.concat([pages_part, link_part]).to_arrow().cast(_PARTIAL_SCHEMA)


def _outlink_finalize(df: pl.DataFrame) -> pa.Table:
    """Combined (url, target-host, kind, cnt) rows -> one profile row
    per source url; n_internal recomputes the own host from the url
    string (functional, no extra exchange)."""
    from shaclapi_ray.stages.links import HOST_RE

    pages = df.filter(pl.col("kind") == "p").select(
        pl.col("target").alias("url"), pl.col("cnt").alias("n_pages")
    )
    ln = df.filter(pl.col("kind") == "l").with_columns(
        pl.col("target").str.extract(HOST_RE, 1).fill_null("").alias("own")
    )
    agg = ln.group_by("target").agg(
        pl.col("cnt").sum().alias("n_links"),
        pl.len().cast(pl.Int64).alias("n_unique_hosts"),
        pl.col("cnt")
        .filter(pl.col("k") == pl.col("own"))
        .sum()
        .fill_null(0)
        .alias("n_internal"),
    )
    out = (
        pages.join(agg.rename({"target": "url"}), on="url", how="left")
        .with_columns(
            pl.col("n_links").fill_null(0),
            pl.col("n_unique_hosts").fill_null(0),
            pl.col("n_internal").fill_null(0),
        )
        .select(["url", "n_pages", "n_links", "n_unique_hosts", "n_internal"])
    )
    return out.to_arrow().cast(_OUT_PROFILE_SCHEMA)


def outlink_profile(pages_ds, *, url_col: str = "url",
                    html_col: str = "html", mode: str = "auto"):
    """Per-source-url OUTBOUND link profile: total links, distinct
    target hosts, links into the page's own host (the link-density /
    internal-link quality signals; complements anchor_text_profile's
    inbound view). Duplicate urls aggregate into one profile row
    (n_pages counts the copies); zero-link pages profile as zeros;
    NULL-url pages carry no links (the links_sql convention). Same
    one-combine shape as anchor_text_profile: narrow (url, target-host,
    kind, cnt) partials pre-aggregated per batch, both aggregates ride
    one `combine_partials_multi`, per-url finalize driver/shuffle."""
    import ray
    import ray.data

    if mode not in ("auto", "driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    partials = pages_ds.map_batches(
        lambda b: _outlink_partials(b, url_col, html_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    combined = combine_partials_multi(
        partials,
        keys=["target", "k", "kind"],
        sums={"cnt": "sum"},
        mode=mode,
    )
    if mode == "shuffle":
        return combined.groupby("target").map_groups(
            lambda g: _outlink_finalize(pl.from_arrow(g)),
            batch_format="pyarrow",
        )
    combined = combined.materialize()
    if combined.count() > DRIVER_MERGE_LIMIT:
        return combined.groupby("target").map_groups(
            lambda g: _outlink_finalize(pl.from_arrow(g)),
            batch_format="pyarrow",
        )
    tables = [t for r in combined.to_arrow_refs() if (t := ray.get(r)).num_rows]
    if not tables:
        return ray.data.from_arrow(_OUT_PROFILE_SCHEMA.empty_table())
    return ray.data.from_arrow(
        _outlink_finalize(pl.from_arrow(pa.concat_tables(tables)))
    )


def anchor_text_profile(pages_ds, *, url_col: str = "url",
                        html_col: str = "html", mode: str = "auto"):
    """Per-target inbound anchor profile over a pages table (see module
    docstring). ``mode``: 'auto' (row-count switch), 'driver', or
    'shuffle' — pinned output-identical by test."""
    import ray
    import ray.data

    if mode not in ("auto", "driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    partials = pages_ds.map_batches(
        lambda b: _partials(b, url_col, html_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    combined = combine_partials_multi(
        partials,
        keys=["target", "k", "kind"],
        sums={"cnt": "sum"},
        mode=mode,
    )
    if mode == "shuffle":
        return combined.groupby("target").map_groups(
            lambda g: _finalize(pl.from_arrow(g)), batch_format="pyarrow"
        )
    combined = combined.materialize()
    if combined.count() > DRIVER_MERGE_LIMIT:
        return combined.groupby("target").map_groups(
            lambda g: _finalize(pl.from_arrow(g)), batch_format="pyarrow"
        )
    tables = [t for r in combined.to_arrow_refs() if (t := ray.get(r)).num_rows]
    if not tables:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    return ray.data.from_arrow(_finalize(pl.from_arrow(pa.concat_tables(tables))))
