"""Host-level corpus curation: domain aggregation -> verdict -> filter.

The domain/host curation family used by web-corpus pipelines (C4's
bad-domain blocklist, RefinedWeb's per-domain heuristics, CCNet's
per-site aggregation): doc-level signals roll up to the host, each host
gets a verdict from INTEGER-EXACT rules (no float thresholds — the SQL
oracle compares bit-identically), and the verdict applies back to the
page stream. Complements `extract.filter_hosts` (a *given* blocklist):
here the blocklist is *learned* from the corpus itself.

Reference analog: none (beyond-reference training-data operator per the
brief); the two-level aggregate-then-broadcast-back shape mirrors the
engine's child-verdict collect (`engine.py` pass A -> fused pass).

Scale notes (100 TB):
- Doc-level pass emits narrow (h1, h2, host, cnt, sum_tok) partials
  pre-aggregated per batch — text never leaves the scan.
- The rollup needs per-text-hash totals (is this text duplicated
  corpus-wide?) split back per host. Below DRIVER_MERGE_LIMIT partial
  rows that is one driver-side pyarrow group_by + join (one-time, not
  per-batch); above, one groupby(h1) shuffle computes per-(h1,h2)
  totals inside each group (a 64-bit hash group is a handful of rows)
  and a host-keyed combine finishes — two narrow exchanges total.
- Hosts are ~10^6-10^7 for a web corpus: the verdict table broadcasts
  as a sorted uint64 hash array (stages/hashset.py, zero per-task
  setup) with the repo-standard loud ceiling; `strategy='join'` keeps
  it a Dataset and anti-joins instead (both paths share the verdict
  semantics and are pinned output-identical by test).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.stages.aggregates import (
    DRIVER_MERGE_LIMIT,
    combine_partials_multi,
)
from shaclapi_ray.stages.links import HOST_RE

from shaclapi_ray.pipelines.textstats import TOKEN_RE

# blocked-host broadcast ceiling (entries are 8 B sorted uint64): far
# above any real web corpus's *blocked* host count; loud above it.
HOST_BROADCAST_LIMIT = 50_000_000


def _host_expr(url_arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """COALESCE(regexp_extract(url, '^https?://([^/]+)', 1), '') — the
    literal oracle expression (same regex as stages/links.HOST_RE)."""
    host = pc.struct_field(pc.extract_regex(url_arr, HOST_RE), "host")
    return pc.fill_null(host, "")


def _doc_partials(pages_ds, url_col: str, text_col: str):
    """Per-batch pre-aggregated (h1, h2, host, cnt, sum_tok) partials.

    h1/h2 = the repo's 128-bit exact-dedup content key (two independent
    64-bit polars hashes, seeds 17/23 — pipelines/dedup.exact_dedup);
    null text hashes as '' so the SQL oracle's coalesce(text,'')
    matches."""

    def fn(batch: pa.Table) -> pa.Table:
        host = _host_expr(batch[url_col])
        s = pl.from_arrow(batch[text_col]).fill_null("")
        if isinstance(s, pl.DataFrame):  # single-column frame on old polars
            s = s.to_series()
        n_tok = s.str.count_matches(TOKEN_RE).cast(pl.Int64)
        t = pa.table(
            {
                "h1": pa.array(s.hash(seed=17).to_numpy().view(np.int64)),
                "h2": pa.array(s.hash(seed=23).to_numpy().view(np.int64)),
                "host": host,
                "n_tok": pa.array(n_tok.to_numpy()),
            }
        )
        g = t.group_by(["h1", "h2", "host"]).aggregate(
            [("n_tok", "count"), ("n_tok", "sum")]
        )
        return pa.table(
            {
                "h1": g["h1"],
                "h2": g["h2"],
                "host": g["host"],
                "cnt": pc.cast(g["n_tok_count"], pa.int64()),
                "sum_tok": pc.cast(g["n_tok_sum"], pa.int64()),
            }
        )

    return pages_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _rollup_driver(tbl: pa.Table):
    """(h1,h2,host) rows -> (host, n_docs, n_dup, sum_tokens): one
    driver-side C++ group_by for per-hash totals + one hash join (a
    one-time merge over PRE-AGGREGATED rows, not a per-batch rebuild)."""
    tot = tbl.group_by(["h1", "h2"]).aggregate([("cnt", "sum")])
    j = tbl.join(tot, keys=["h1", "h2"], join_type="inner")
    dup = pc.if_else(
        pc.greater(j["cnt_sum"], pa.scalar(1, pa.int64())),
        j["cnt"],
        pa.scalar(0, pa.int64()),
    )
    j = j.append_column("dup_cnt", pc.cast(dup, pa.int64()))
    g = j.group_by("host").aggregate(
        [("cnt", "sum"), ("dup_cnt", "sum"), ("sum_tok", "sum")]
    )
    return pa.table(
        {
            "host": g["host"],
            "n_docs": pc.cast(g["cnt_sum"], pa.int64()),
            "n_dup": pc.cast(g["dup_cnt_sum"], pa.int64()),
            "sum_tokens": pc.cast(g["sum_tok_sum"], pa.int64()),
        }
    )


def _hash_group_rollup(group: pa.Table) -> pa.Table:
    """Inside one h1 group (a 64-bit hash value — a handful of rows):
    per-(h1,h2) totals decide dup, emit per-host partial rows."""
    df = pl.from_arrow(group)
    out = (
        df.with_columns(pl.col("cnt").sum().over(["h1", "h2"]).alias("n_hash"))
        .with_columns(
            pl.when(pl.col("n_hash") > 1)
            .then(pl.col("cnt"))
            .otherwise(pl.lit(0, dtype=pl.Int64))
            .alias("dup_cnt")
        )
        .group_by("host")
        .agg(
            pl.col("cnt").sum().alias("n_docs"),
            pl.col("dup_cnt").sum().alias("n_dup"),
            pl.col("sum_tok").sum().alias("sum_tokens"),
        )
    )
    return out.to_arrow().cast(
        pa.schema(
            [
                ("host", pa.string()),
                ("n_docs", pa.int64()),
                ("n_dup", pa.int64()),
                ("sum_tokens", pa.int64()),
            ]
        )
    )


def host_stats(pages_ds, *, url_col: str = "url", text_col: str = "text",
               mode: str = "auto"):
    """Per-host curation stats over a pages table.

    Returns a Dataset (host, n_docs, n_dup, sum_tokens) where n_dup
    counts this host's docs whose exact text (128-bit content key)
    occurs more than once CORPUS-WIDE (cross-host duplicates count).
    ``mode``: 'auto' (row-count switch), 'driver', or 'shuffle' — the
    distributed path is pinned output-identical to the driver path by
    test."""
    import ray
    import ray.data

    if mode not in ("auto", "driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    partials = _doc_partials(pages_ds, url_col, text_col)
    combined = combine_partials_multi(
        partials,
        keys=["h1", "h2", "host"],
        sums={"cnt": "sum", "sum_tok": "sum"},
        mode=mode,
    )
    if mode == "shuffle":
        per_host = combined.groupby("h1").map_groups(
            _hash_group_rollup, batch_format="pyarrow"
        )
        return combine_partials_multi(
            per_host,
            keys=["host"],
            sums={"n_docs": "sum", "n_dup": "sum", "sum_tokens": "sum"},
            mode="shuffle",
        )
    # driver / auto-small: the combined table is one driver-side merge away
    combined = combined.materialize()
    if combined.count() > DRIVER_MERGE_LIMIT:
        per_host = combined.groupby("h1").map_groups(
            _hash_group_rollup, batch_format="pyarrow"
        )
        return combine_partials_multi(
            per_host,
            keys=["host"],
            sums={"n_docs": "sum", "n_dup": "sum", "sum_tokens": "sum"},
            mode="auto",
        )
    tables = [t for r in combined.to_arrow_refs() if (t := ray.get(r)).num_rows]
    if not tables:
        return ray.data.from_arrow(
            pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                    "sum_tokens": pa.array([], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow(_rollup_driver(pa.concat_tables(tables)))


def host_verdicts(stats_ds, *, max_dup_pct: int = 10,
                  min_mean_tokens: int = 0, min_docs: int = 2):
    """Add the integer-exact ``blocked`` verdict to host_stats rows.

    blocked = n_docs >= min_docs AND (
        100 * n_dup > max_dup_pct * n_docs           -- dup share
        OR sum_tokens < min_mean_tokens * n_docs )   -- mean length

    All-integer arithmetic: the comparison is exact on both the numpy
    and SQL sides (no float thresholds, no rounding contract needed).
    Hosts with fewer than min_docs docs are never blocked (unjudged)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch["n_docs"].to_numpy(zero_copy_only=False)
        d = batch["n_dup"].to_numpy(zero_copy_only=False)
        s = batch["sum_tokens"].to_numpy(zero_copy_only=False)
        blocked = (n >= min_docs) & (
            (100 * d > max_dup_pct * n) | (s < min_mean_tokens * n)
        )
        return batch.append_column("blocked", pa.array(blocked))

    return stats_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def filter_by_host(pages_ds, verdicts_ds, *, url_col: str = "url",
                   strategy: str = "broadcast"):
    """Drop pages whose host is blocked; all other pages (including
    host == '' relative/unparseable urls, unless '' itself is blocked)
    stream through untouched.

    'broadcast': blocked hosts -> sorted uint64 hash array via ray.put
    (stages/hashset.py — zero per-task setup), loud
    HOST_BROADCAST_LIMIT ceiling. 'join': the verdict table stays a
    Dataset; pages left-anti-join it on the host hash — the
    beyond-ceiling path, output-identical by test."""
    import ray

    from shaclapi_ray.stages.hashset import build_hash_set, contains, hash_strings

    blocked_ds = verdicts_ds.map_batches(
        lambda t: t.filter(pc.equal(t["blocked"], True)).select(["host"]),
        batch_format="pyarrow",
    )

    if strategy == "broadcast":
        tables = [t for r in blocked_ds.to_arrow_refs() if (t := ray.get(r)).num_rows]
        hosts = (
            pa.concat_tables(tables)["host"] if tables else pa.chunked_array([], pa.string())
        )
        if len(hosts) > HOST_BROADCAST_LIMIT:
            raise ValueError(
                f"{len(hosts)} blocked hosts exceed HOST_BROADCAST_LIMIT "
                f"({HOST_BROADCAST_LIMIT}); use strategy='join'"
            )
        ref = ray.put(build_hash_set(hosts))

        def drop(batch: pa.Table) -> pa.Table:
            hit = contains(ray.get(ref), _host_expr(batch[url_col]))
            return batch.filter(pa.array(~hit))

        return pages_ds.map_batches(drop, batch_format="pyarrow",
                                    zero_copy_batch=True)

    if strategy == "join":
        from shaclapi_ray.stages.joins import drop_empty_blocks
        from shaclapi_ray.stages.referential import clamp_partitions

        def key_blocked(t: pa.Table) -> pa.Table:
            hh = hash_strings(t["host"]).view(np.int64)
            return pa.table(
                {"hh": pa.array(hh), "hit": pa.array(np.ones(len(hh), dtype=bool))}
            )

        def key_pages(t: pa.Table) -> pa.Table:
            hh = hash_strings(_host_expr(t[url_col])).view(np.int64)
            return t.append_column("hh", pa.array(hh))

        keyed_nb = drop_empty_blocks(
            pages_ds.map_batches(key_pages, batch_format="pyarrow",
                                 zero_copy_batch=True)
        )
        blocked_nb = drop_empty_blocks(
            blocked_ds.map_batches(key_blocked, batch_format="pyarrow")
        )
        if keyed_nb is None or blocked_nb is None:
            return pages_ds  # empty corpus or nothing blocked
        joined = keyed_nb.join(
            blocked_nb,
            join_type="left_outer",
            num_partitions=clamp_partitions(None),
            on=("hh",),
        )

        def keep(t: pa.Table) -> pa.Table:
            hit = pc.fill_null(t["hit"], False)
            return t.filter(pc.invert(hit)).drop_columns(["hh", "hit"])

        return joined.map_batches(keep, batch_format="pyarrow")

    raise ValueError(f"unknown strategy {strategy!r}")


def host_curation(pages_ds, *, url_col: str = "url", text_col: str = "text",
                  max_dup_pct: int = 10, min_mean_tokens: int = 0,
                  min_docs: int = 2, mode: str = "auto"):
    """host_stats + host_verdicts in one call: the learned blocklist."""
    return host_verdicts(
        host_stats(pages_ds, url_col=url_col, text_col=text_col, mode=mode),
        max_dup_pct=max_dup_pct,
        min_mean_tokens=min_mean_tokens,
        min_docs=min_docs,
    )
