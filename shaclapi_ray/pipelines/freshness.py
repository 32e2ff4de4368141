"""Recrawl freshness + per-host caps: keyed winner-set page filters.

Two classic Common-Crawl-shaped curation operators over the pages table:

- ``latest_snapshot``: a url is recrawled across snapshots; keep only
  each url's newest capture (max ``warc_ts``, md5-of-text tie-break).
  This is url-level dedup by freshness — the first pass of every CC
  pipeline before content-level dedup.
- ``cap_per_host``: keep at most ``k`` pages per host in a
  deterministic total order (RANK ≤ k, ties keep together) — the
  anti-monoculture cap web pipelines apply so one giant host cannot
  dominate the corpus.

Reference analog: none (beyond-reference training-data operators per
the brief); the narrow-exchange → winner-set → filter shape mirrors
``pipelines/hostcure.py`` and the engine's child-verdict collect.

Exactness contract (mirrors the SQL oracle bit-for-bit):
- Keys are the FULL 128-bit md5 of the url (``md5_pair`` ==
  DuckDB ``md5_number_lower``/``_upper``) plus an ``isnull`` bit, so
  NULL urls form their own group distinct from the '' url group and
  64-bit birthday collisions at 10^12 urls cannot merge groups.
- Winners carry the row's (ts, md5(text)) value tuple; a row survives
  iff its own tuple equals its key's winner tuple. Rows byte-identical
  in (url, warc_ts, text) therefore share fate on BOTH sides (the SQL
  mirror joins the winner tuple instead of ROW_NUMBER-ing, so exact
  full duplicates are kept together — downstream exact_dedup owns
  collapsing those).
- String order is UTF-8 byte order on both sides (polars/pyarrow
  codepoint order == DuckDB binary collation: UTF-8 preserves
  codepoint order).

Scale notes (100 TB):
- Pass 1 emits per-batch pre-reduced narrow candidates
  (hu_lo, hu_hi, isnull, ts, th_lo, th_hi) — html/text never leave
  the scan.
- Winner resolution: one driver-side reduce below DRIVER_MERGE_LIMIT
  candidate rows, else one groupby(hu_lo) shuffle of the narrow
  candidates (a 64-bit prefix group is a handful of rows).
- The filter applies winners back either as a broadcast sorted
  (hu_lo, hu_hi)-keyed tuple table (zero per-task setup, loud
  WINNER_BROADCAST_LIMIT ceiling — right for ≤50M distinct urls) or
  SKEW-AWARE (``strategy='join'`` — the 100-TB path): latest_snapshot
  broadcasts only the cnt>1 recrawled keys (singleton urls are their
  own winner and stream through), cap_per_host broadcasts only the
  over-cap hosts as one ts-threshold row per url, and the full-row
  hash-partitioned keyed join engages only when even those minority
  sets exceed the ceiling. Every path is output-identical by test —
  the expensive exchange scales with the recrawl rate / monoculture
  count, not the corpus.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.stages.aggregates import DRIVER_MERGE_LIMIT
from shaclapi_ray.stages.md5kernel import md5_pair

# broadcast winner-table ceiling (6 x 8 B columns per entry)
WINNER_BROADCAST_LIMIT = 50_000_000

_KEY = ["hu_lo", "hu_hi", "isnull"]
_VAL = ["ts", "th_lo", "th_hi"]
_VAL_TS = ["ts"]  # cap_per_host: no text hash in the order (see below)


def _keyed(batch: pa.Table, url_col: str, ts_col: str,
           text_col: str | None) -> pl.DataFrame:
    """Narrow key/value frame for one batch: 128-bit url key + null bit,
    int64 ts, and (when ``text_col`` is given) a 128-bit text hash as
    the deterministic tie-break. cap_per_host passes text_col=None —
    RANK keeps exact (url, ts) ties together anyway, so hashing every
    document's text (the dominant compute at corpus scale) would buy
    nothing."""
    url = batch[url_col].combine_chunks() if isinstance(
        batch[url_col], pa.ChunkedArray
    ) else batch[url_col]
    isnull = pc.is_null(url).to_numpy(zero_copy_only=False)
    hu_lo, hu_hi = md5_pair(pc.fill_null(url, ""))
    # null ts sorts OLDEST (int64 min) on both sides — the SQL mirror is
    # coalesce(epoch_us(ts), -9223372036854775808)
    ts = pc.fill_null(
        pc.cast(batch[ts_col], pa.int64()), np.iinfo(np.int64).min
    ).to_numpy(zero_copy_only=False)
    cols = {
        "hu_lo": hu_lo,
        "hu_hi": hu_hi,
        "isnull": isnull,
        "ts": ts,
    }
    if text_col is not None:
        cols["th_lo"], cols["th_hi"] = md5_pair(
            pc.fill_null(batch[text_col], "")
        )
    return pl.DataFrame(cols)


def _reduce_latest(df: pl.DataFrame) -> pl.DataFrame:
    """Per-key max (ts, th_lo, th_hi) — the newest capture, md5
    tie-break — plus the per-key ROW COUNT (summed across partials; the
    skew-aware join uses it to tell singleton urls from recrawled ones).
    A ``url`` column, when present (snapshot_delta carries the
    representative string through the combine), rides along via first()
    — every row in a 128-bit key group shares the same url string."""
    if "cnt" not in df.columns:
        df = df.with_columns(pl.lit(1, dtype=pl.Int64).alias("cnt"))
    extra = ["url"] if "url" in df.columns else []
    return (
        df.sort(_VAL, descending=True)
        .group_by(_KEY, maintain_order=True)
        .agg(*[pl.col(c).first() for c in _VAL + extra], pl.col("cnt").sum())
    )


_FIELD_TYPES = {
    "hu_lo": pa.uint64(),
    "hu_hi": pa.uint64(),
    "isnull": pa.bool_(),
    "ts": pa.int64(),
    "th_lo": pa.uint64(),
    "th_hi": pa.uint64(),
    "cnt": pa.int64(),
}


def _winner_schema(vals: list[str] = _VAL, cnt: bool = False) -> pa.Schema:
    cols = _KEY + vals + (["cnt"] if cnt else [])
    return pa.schema([(c, _FIELD_TYPES[c]) for c in cols])


def _resolve_winners(pages_ds, url_col, ts_col, text_col, mode):
    """Candidate pass + combine -> winner Dataset (one row per url key,
    carrying the key's total row count)."""
    import ray
    import ray.data

    wschema = _winner_schema(cnt=True)

    def candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return wschema.empty_table()
        return (
            _reduce_latest(_keyed(batch, url_col, ts_col, text_col))
            .to_arrow()
            .cast(wschema)
        )

    partials = pages_ds.map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True
    )

    def group_reduce(group: pa.Table) -> pa.Table:
        return _reduce_latest(pl.from_arrow(group)).to_arrow().cast(wschema)

    if mode == "shuffle":
        return partials.groupby("hu_lo").map_groups(
            group_reduce, batch_format="pyarrow"
        )
    partials = partials.materialize()
    if mode != "driver" and partials.count() > DRIVER_MERGE_LIMIT:
        return partials.groupby("hu_lo").map_groups(
            group_reduce, batch_format="pyarrow"
        )
    tables = [t for r in partials.to_arrow_refs() if (t := ray.get(r)).num_rows]
    if not tables:
        return ray.data.from_arrow(wschema.empty_table())
    merged = _reduce_latest(pl.from_arrow(pa.concat_tables(tables)))
    return ray.data.from_arrow(merged.to_arrow().cast(wschema))


def _broadcast_sorted(kept_ds, lo_col: str, hi_col: str):
    """Collect a materialized Dataset's non-empty blocks driver-side and
    lexsort by (lo_col, hi_col) — the order every probe's searchsorted
    requires. Returns None when there are no rows."""
    import ray

    tables = [t for r in kept_ds.to_arrow_refs() if (t := ray.get(r)).num_rows]
    if not tables:
        return None
    kept = pa.concat_tables(tables).combine_chunks()
    order = np.lexsort(
        (
            kept[hi_col].to_numpy(zero_copy_only=False),
            kept[lo_col].to_numpy(zero_copy_only=False),
        )
    )
    return kept.take(pa.array(order))


def _probe_kept(kept: pa.Table, probe: pl.DataFrame,
                vals: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(key_match, tuple_match) per probe row against the kept table:
    key_match = the row's url key appears at all, tuple_match = its FULL
    (key, value) tuple appears. One run scan computes both. kept is
    lexsorted by (hu_lo, hu_hi); probe runs over the (usually length-1)
    hu_lo run — run length is bounded by rows kept per url key plus
    rare 64-bit prefix collisions."""
    hul = kept["hu_lo"].to_numpy(zero_copy_only=False)
    if len(hul) == 0:
        z = np.zeros(len(probe), dtype=bool)
        return z, z
    cols = {c: kept[c].to_numpy(zero_copy_only=False) for c in _KEY + vals}
    p = {c: probe[c].to_numpy() for c in _KEY + vals}
    lo = np.searchsorted(hul, p["hu_lo"], side="left")
    hi = np.searchsorted(hul, p["hu_lo"], side="right")
    key_match = np.zeros(len(probe), dtype=bool)
    match = np.zeros(len(probe), dtype=bool)
    max_run = int((hi - lo).max()) if len(lo) else 0
    for k in range(max_run):
        idx = lo + k
        valid = idx < hi
        idx_c = np.where(valid, idx, 0)
        key_eq = valid
        for c in _KEY[1:]:
            key_eq = key_eq & (cols[c][idx_c] == p[c])
        key_match |= key_eq
        row_eq = key_eq
        for c in vals:
            row_eq = row_eq & (cols[c][idx_c] == p[c])
        match |= row_eq
    return key_match, match


def _filter_by_kept(pages_ds, kept_ds, url_col, ts_col, text_col, strategy,
                    vals: list[str] = _VAL):
    """Keep pages whose (key, value) tuple is in the kept set."""
    import ray

    if strategy == "broadcast":
        kept = _broadcast_sorted(kept_ds, "hu_lo", "hu_hi")
        if kept is None:
            return pages_ds.map_batches(
                lambda t: t.slice(0, 0), batch_format="pyarrow"
            )
        if kept.num_rows > WINNER_BROADCAST_LIMIT:
            raise ValueError(
                f"{kept.num_rows} kept tuples exceed WINNER_BROADCAST_LIMIT "
                f"({WINNER_BROADCAST_LIMIT}); use strategy='join'"
            )
        ref = ray.put(kept)

        def keep(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            probe = _keyed(batch, url_col, ts_col, text_col)
            _, tuple_ok = _probe_kept(ray.get(ref), probe, vals)
            return batch.filter(pa.array(tuple_ok))

        return pages_ds.map_batches(keep, batch_format="pyarrow",
                                    zero_copy_batch=True)

    if strategy == "join":
        from shaclapi_ray.stages.joins import drop_empty_blocks
        from shaclapi_ray.stages.referential import clamp_partitions

        # keyed join on the 128-bit url key, exact equality filter after
        def key_pages(batch: pa.Table) -> pa.Table:
            probe = _keyed(batch, url_col, ts_col, text_col)
            out = batch
            for c in _KEY + vals:
                out = out.append_column(
                    f"_p_{c}", pa.array(probe[c].to_numpy())
                )
            return out

        def key_kept(t: pa.Table) -> pa.Table:
            cols = {f"_k_{c}": t[c] for c in _KEY + vals}
            cols["_p_hu_lo"] = t["hu_lo"]
            cols["_p_hu_hi"] = t["hu_hi"]
            return pa.table(cols)

        keyed_nb = drop_empty_blocks(
            pages_ds.map_batches(key_pages, batch_format="pyarrow",
                                 zero_copy_batch=True)
        )
        kept_nb = drop_empty_blocks(
            kept_ds.map_batches(key_kept, batch_format="pyarrow")
        )
        if keyed_nb is None:
            return pages_ds
        if kept_nb is None:
            return pages_ds.map_batches(
                lambda t: t.slice(0, 0), batch_format="pyarrow"
            )
        joined = keyed_nb.join(
            kept_nb,
            join_type="left_outer",
            num_partitions=clamp_partitions(None),
            on=("_p_hu_lo", "_p_hu_hi"),
        )

        def keep(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            m = np.ones(t.num_rows, dtype=bool)
            m &= pc.fill_null(
                pc.equal(t["_k_isnull"], t["_p_isnull"]), False
            ).to_numpy(zero_copy_only=False)
            for c in vals:
                m &= pc.fill_null(
                    pc.equal(t[f"_k_{c}"], t[f"_p_{c}"]), False
                ).to_numpy(zero_copy_only=False)
            aux = [c for c in t.column_names if c.startswith(("_p_", "_k_"))]
            return t.filter(pa.array(m)).drop_columns(aux)

        return joined.map_batches(keep, batch_format="pyarrow")

    raise ValueError(f"unknown strategy {strategy!r}")


def latest_snapshot(pages_ds, *, url_col: str = "url", ts_col: str = "warc_ts",
                    text_col: str = "text", mode: str = "auto",
                    strategy: str = "broadcast"):
    """Keep each url's newest capture: max (warc_ts, md5(text)) per url
    key (NULL urls are their own group). Rows tying the winner tuple
    exactly (byte-identical url/ts/text) are all kept — exact_dedup owns
    collapsing full duplicates. ``mode`` picks the winner-resolution
    path ('auto'/'driver'/'shuffle'); ``strategy`` the filter path.
    All paths pinned output-identical by test.

    ``strategy='join'`` is SKEW-AWARE: a url captured once (the vast
    majority of any crawl) is trivially its own winner, so only the
    keys with cnt > 1 — the recrawled minority — need checking. Those
    multi-keys broadcast as a winner-tuple table (ceiling
    WINNER_BROADCAST_LIMIT applies to the MULTI set only, not all
    urls) and singleton rows stream through untouched; only if even
    the multi set exceeds the ceiling does the full-row hash join
    engage. This is the 100-TB path: the expensive exchange scales
    with the recrawl rate, not the corpus."""
    import ray

    if mode not in ("auto", "driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    winners = _resolve_winners(pages_ds, url_col, ts_col, text_col, mode)
    if strategy == "broadcast":
        winners = winners.materialize()
        return _filter_by_kept(
            pages_ds, winners, url_col, ts_col, text_col, "broadcast"
        )
    if strategy != "join":
        raise ValueError(f"unknown strategy {strategy!r}")

    multi = winners.map_batches(
        lambda t: t.filter(pc.greater(t["cnt"], 1)),
        batch_format="pyarrow",
    ).materialize()
    if multi.count() <= WINNER_BROADCAST_LIMIT:
        mt = _broadcast_sorted(multi, "hu_lo", "hu_hi")
        if mt is None:
            return pages_ds  # no url captured twice: everything survives
        ref = ray.put(mt)

        def keep(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            probe = _keyed(batch, url_col, ts_col, text_col)
            in_multi, tuple_ok = _probe_kept(ray.get(ref), probe, _VAL)
            return batch.filter(pa.array(~in_multi | tuple_ok))

        return pages_ds.map_batches(keep, batch_format="pyarrow",
                                    zero_copy_batch=True)
    # even the recrawled-key set is beyond broadcast: full keyed join
    return _filter_by_kept(pages_ds, multi_union_rest(winners), url_col,
                           ts_col, text_col, "join")


def multi_union_rest(winners):
    """Full winner set for the beyond-ceiling join (drop the cnt column
    so the join payload stays the (key, value) tuple)."""
    return winners.map_batches(
        lambda t: t.drop_columns(["cnt"]), batch_format="pyarrow"
    )


def _rank_group(group: pa.Table, k: int) -> pa.Table:
    """Within one host-hash group: RANK rows per host by the order
    (url NULLS FIRST, ts) — the EXACT order the ts-prefix threshold
    argument depends on — and keep rank <= k (ties keep together). No
    text hash in the order: RANK keeps exact (url, ts) ties together
    on both sides, so hashing every document's text would buy nothing."""
    df = pl.from_arrow(group)
    order = ["hh_lo", "hh_hi", "notnull", "url"] + _VAL_TS
    df = df.sort(order)
    key_cols = ["hh_lo", "hh_hi"]
    tup_cols = ["notnull", "url"] + _VAL_TS
    # RANK = 1 + count of strictly-smaller tuples in the host group:
    # new-tuple flags within each host, cumulative position of the
    # current tuple's first row
    df = df.with_columns(
        pl.int_range(pl.len()).over(key_cols).alias("_pos"),
        (
            pl.any_horizontal(
                *[
                    pl.col(c).ne_missing(pl.col(c).shift(1))
                    for c in tup_cols
                ]
            )
            .fill_null(True)
            .over(key_cols)
        ).alias("_new"),
    )
    df = df.with_columns(
        pl.when(pl.col("_new"))
        .then(pl.col("_pos") + 1)
        .otherwise(None)
        .alias("_rank_start")
    )
    df = df.with_columns(
        pl.col("_rank_start").forward_fill().over(key_cols).alias("_rank")
    )
    df = df.with_columns(pl.len().over(key_cols).alias("host_total"))
    kept = df.filter(pl.col("_rank") <= k)
    # tuple-identical kept rows collapse to ONE kept entry so the join
    # path cannot multiply a surviving page row; hh key + host_total ride
    # along so the broadcast path can restrict itself to over-cap hosts
    return (
        kept.select(["hh_lo", "hh_hi", "host_total"] + _KEY + _VAL_TS)
        .unique()
        .to_arrow()
        .cast(_kept_schema())
    )


def _kept_schema() -> pa.Schema:
    return pa.schema(
        [
            ("hh_lo", pa.uint64()),
            ("hh_hi", pa.uint64()),
            ("host_total", pa.uint32()),
        ]
        + [(c, _FIELD_TYPES[c]) for c in _KEY + _VAL_TS]
    )


def _probe_hosts(hosts: pa.Table, hh_lo: np.ndarray,
                 hh_hi: np.ndarray) -> np.ndarray:
    """Membership of each (hh_lo, hh_hi) pair in the lexsorted host
    table (same run-probe shape as _probe_kept)."""
    hl = hosts["hh_lo"].to_numpy(zero_copy_only=False)
    if len(hl) == 0:
        return np.zeros(len(hh_lo), dtype=bool)
    hh = hosts["hh_hi"].to_numpy(zero_copy_only=False)
    lo = np.searchsorted(hl, hh_lo, side="left")
    hi = np.searchsorted(hl, hh_lo, side="right")
    match = np.zeros(len(hh_lo), dtype=bool)
    max_run = int((hi - lo).max()) if len(lo) else 0
    for j in range(max_run):
        idx = lo + j
        valid = idx < hi
        match |= valid & (hh[np.where(valid, idx, 0)] == hh_hi)
    return match


def _probe_thr(thr: pa.Table, probe: pl.DataFrame) -> np.ndarray:
    """True per probe row iff its url key has a kept-threshold entry AND
    the row's ts is at or under it. thr is sorted by (hu_lo, hu_hi),
    one row per url key — runs are ~1 (prefix collisions aside)."""
    hul = thr["hu_lo"].to_numpy(zero_copy_only=False)
    if len(hul) == 0:
        return np.zeros(len(probe), dtype=bool)
    cols = {c: thr[c].to_numpy(zero_copy_only=False) for c in _KEY + ["thr"]}
    p = {c: probe[c].to_numpy() for c in _KEY + ["ts"]}
    lo = np.searchsorted(hul, p["hu_lo"], side="left")
    hi = np.searchsorted(hul, p["hu_lo"], side="right")
    ok = np.zeros(len(probe), dtype=bool)
    max_run = int((hi - lo).max()) if len(lo) else 0
    for j in range(max_run):
        idx = lo + j
        valid = idx < hi
        idx_c = np.where(valid, idx, 0)
        key_eq = (
            valid
            & (cols["hu_hi"][idx_c] == p["hu_hi"])
            & (cols["isnull"][idx_c] == p["isnull"])
        )
        ok |= key_eq & (p["ts"] <= cols["thr"][idx_c])
    return ok


def cap_per_host(pages_ds, k: int, *, url_col: str = "url",
                 ts_col: str = "warc_ts", strategy: str = "broadcast"):
    """Keep at most ``k`` pages per host: RANK() over (url NULLS FIRST,
    warc_ts) within host, keep rank <= k — rows tying on (url, ts)
    share a rank and keep/drop together on both the Ray and SQL sides,
    so no text hashing (the dominant compute at corpus scale) is needed
    anywhere in this operator and the text column is never read. Host =
    the repo-standard regex over the page's own url (COALESCE to '').

    SKEW-AWARE broadcast: a host at or under the cap keeps every page,
    so only the OVER-cap hosts' kept tuples broadcast (ceiling
    WINNER_BROADCAST_LIMIT applies to k x |over-cap hosts|, not the
    corpus) and under-cap rows stream through untouched —
    anti-monoculture cost scales with the monocultures. ``strategy=
    'join'`` is the beyond-ceiling full keyed join."""
    import ray

    from shaclapi_ray.pipelines.hostcure import _host_expr

    if k < 1:
        # k=0 would make the skew-aware "no over-cap host" shortcut and
        # the rank semantics diverge (empty kept table != keep nothing)
        raise ValueError(f"cap_per_host requires k >= 1, got {k}")

    def keyed_with_host(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _cap_schema().empty_table()
        probe = _keyed(batch, url_col, ts_col, None)
        hh_lo, hh_hi = md5_pair(_host_expr(batch[url_col]))
        url = pc.fill_null(batch[url_col], "")
        return pa.table(
            {
                "hh_lo": pa.array(hh_lo),
                "hh_hi": pa.array(hh_hi),
                "notnull": pa.array(~probe["isnull"].to_numpy()),
                "url": url.combine_chunks()
                if isinstance(url, pa.ChunkedArray)
                else url,
                "hu_lo": pa.array(probe["hu_lo"].to_numpy()),
                "hu_hi": pa.array(probe["hu_hi"].to_numpy()),
                "isnull": pa.array(probe["isnull"].to_numpy()),
                "ts": pa.array(probe["ts"].to_numpy()),
            }
        )

    narrow = pages_ds.map_batches(
        keyed_with_host, batch_format="pyarrow", zero_copy_batch=True
    )
    kept = narrow.groupby("hh_lo").map_groups(
        lambda g: _rank_group(g, k), batch_format="pyarrow"
    )

    if strategy == "join":
        kept = kept.map_batches(
            lambda t: t.drop_columns(["hh_lo", "hh_hi", "host_total"]),
            batch_format="pyarrow",
        )
        return _filter_by_kept(
            pages_ds, kept, url_col, ts_col, None, "join", vals=_VAL_TS
        )
    if strategy != "broadcast":
        raise ValueError(f"unknown strategy {strategy!r}")

    over = kept.map_batches(
        lambda t: t.filter(pc.greater(t["host_total"], k)),
        batch_format="pyarrow",
    ).materialize()
    tables = [t for r in over.to_arrow_refs() if (t := ray.get(r)).num_rows]
    if not tables:
        return pages_ds  # no host exceeds the cap: everything survives
    ot = pa.concat_tables(tables).combine_chunks()
    if ot.num_rows > WINNER_BROADCAST_LIMIT:
        raise ValueError(
            f"{ot.num_rows} over-cap kept tuples exceed "
            f"WINNER_BROADCAST_LIMIT ({WINNER_BROADCAST_LIMIT}); "
            f"use strategy='join'"
        )
    odf = pl.from_arrow(ot)
    hosts = (
        odf.select(["hh_lo", "hh_hi"])
        .unique()
        .sort(["hh_lo", "hh_hi"])
        .to_arrow()
    )
    # within one url, cap's kept rows are a ts-PREFIX of the (url, ts)
    # rank order (ties keep together), so per-url membership collapses
    # EXACTLY to ts <= that url's max kept ts — one threshold row per
    # url, probe runs stay ~1 even when one url keeps k rows
    thr = (
        odf.group_by(_KEY)
        .agg(pl.col("ts").max().alias("thr"))
        .sort(["hu_lo", "hu_hi"])
        .to_arrow()
    )
    href = ray.put(hosts)
    tref = ray.put(thr)

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        probe = _keyed(batch, url_col, ts_col, None)
        hh_lo, hh_hi = md5_pair(_host_expr(batch[url_col]))
        in_over = _probe_hosts(ray.get(href), hh_lo, hh_hi)
        under_thr = _probe_thr(ray.get(tref), probe)
        return batch.filter(pa.array(~in_over | under_thr))

    return pages_ds.map_batches(keep, batch_format="pyarrow",
                                zero_copy_batch=True)


def _cap_schema() -> pa.Schema:
    return pa.schema(
        [
            ("hh_lo", pa.uint64()),
            ("hh_hi", pa.uint64()),
            ("notnull", pa.bool_()),
            ("url", pa.string()),
            ("hu_lo", pa.uint64()),
            ("hu_hi", pa.uint64()),
            ("isnull", pa.bool_()),
            ("ts", pa.int64()),
        ]
    )


# --- snapshot delta ---------------------------------------------------

_DELTA_WINNER_SCHEMA = pa.schema(
    [(c, _FIELD_TYPES[c]) for c in _KEY + _VAL]
    + [("url", pa.string()), ("cnt", pa.int64()), ("side", pa.int8())]
)

_DELTA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.string()),
        ("old_ts", pa.int64()),
        ("new_ts", pa.int64()),
        ("old_cnt", pa.int64()),
        ("new_cnt", pa.int64()),
    ]
)


def _delta_winners(ds, url_col, ts_col, text_col, side: int):
    """Per-url winner table for one snapshot side: latest_snapshot's
    (key, max (ts, th) tuple, cnt) reduce, carrying the representative
    url string and a side tag. Narrow — text/html never leave the scan."""

    def candidates(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _DELTA_WINNER_SCHEMA.empty_table()
        df = _keyed(batch, url_col, ts_col, text_col)
        url = batch[url_col]
        df = df.with_columns(
            pl.Series("url", url.combine_chunks() if isinstance(
                url, pa.ChunkedArray) else url)
        )
        out = _reduce_latest(df).with_columns(
            pl.lit(side, dtype=pl.Int8).alias("side")
        )
        return out.to_arrow().select(
            _DELTA_WINNER_SCHEMA.names
        ).cast(_DELTA_WINNER_SCHEMA)

    return ds.map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True
    )


def _pair_sides(df: pl.DataFrame) -> pa.Table:
    """Collapse a (key, side)-level winner frame to one delta row per
    url key. Input rows may still be per-batch partials (several rows
    per (key, side)), so each side re-reduces to its max tuple first."""
    per_side = (
        df.sort(_VAL, descending=True)
        .group_by(_KEY + ["side"], maintain_order=True)
        .agg(
            *[pl.col(c).first() for c in _VAL + ["url"]],
            pl.col("cnt").sum(),
        )
    )
    aggs = [pl.col("url").first().alias("url")]
    for side, pref in ((0, "old"), (1, "new")):
        m = pl.col("side") == side
        aggs += [
            pl.col("ts").filter(m).first().alias(f"{pref}_ts"),
            pl.col("th_lo").filter(m).first().alias(f"{pref}_tl"),
            pl.col("th_hi").filter(m).first().alias(f"{pref}_tu"),
            pl.col("cnt").filter(m).first().alias(f"{pref}_cnt"),
        ]
    g = per_side.group_by(_KEY).agg(aggs)
    status = (
        pl.when(pl.col("old_ts").is_null())
        .then(pl.lit("added"))
        .when(pl.col("new_ts").is_null())
        .then(pl.lit("removed"))
        .when(
            (pl.col("old_tl") == pl.col("new_tl"))
            & (pl.col("old_tu") == pl.col("new_tu"))
        )
        .then(pl.lit("unchanged"))
        .otherwise(pl.lit("changed"))
    )
    out = g.select(
        pl.col("url"),
        status.alias("status"),
        pl.col("old_ts").fill_null(-1),
        pl.col("new_ts").fill_null(-1),
        pl.col("old_cnt").fill_null(0),
        pl.col("new_cnt").fill_null(0),
    )
    return out.to_arrow().cast(_DELTA_SCHEMA)


def snapshot_delta(old_ds, new_ds, *, url_col: str = "url",
                   ts_col: str = "warc_ts", text_col: str = "text",
                   mode: str = "auto"):
    """Cross-snapshot crawl diff: one row per distinct url key across
    two snapshots of the pages table, with ``status`` in {'added',
    'removed', 'changed', 'unchanged'} — the CC-index diff every
    incremental crawl/validation pipeline starts from (and the
    discovery pass feeding ``incremental.incremental_validate``).

    Semantics (mirrored exactly by oracles.snapshot_delta_sql):
    - A side's representative capture is its latest_snapshot winner —
      max (ts, md5(text)) per 128-bit url key, NULL urls their own
      group (the latest_snapshot exactness contract above).
    - status: 'added' = key only in new, 'removed' = only in old,
      'changed' = both sides but the winners' text hashes differ,
      'unchanged' = both sides, same text hash.
    - old_ts/new_ts = the winner's int64 epoch-us ts (-1 when that
      side lacks the key); old_cnt/new_cnt = that side's capture count.

    Scale: per-side narrow candidate passes (text never shuffled) →
    side-tagged winner union → ONE groupby(hu_lo) pairing shuffle over
    rows ∝ distinct urls; below DRIVER_MERGE_LIMIT the pairing merges
    driver-side instead ('auto', like latest_snapshot's mode)."""
    import ray
    import ray.data

    if mode not in ("auto", "driver", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    union = _delta_winners(old_ds, url_col, ts_col, text_col, 0).union(
        _delta_winners(new_ds, url_col, ts_col, text_col, 1)
    )

    def group_pair(group: pa.Table) -> pa.Table:
        return _pair_sides(pl.from_arrow(group))

    if mode == "shuffle":
        return union.groupby("hu_lo").map_groups(
            group_pair, batch_format="pyarrow"
        )
    union = union.materialize()
    if mode != "driver" and union.count() > DRIVER_MERGE_LIMIT:
        return union.groupby("hu_lo").map_groups(
            group_pair, batch_format="pyarrow"
        )
    tables = [t for r in union.to_arrow_refs() if (t := ray.get(r)).num_rows]
    if not tables:
        return ray.data.from_arrow(_DELTA_SCHEMA.empty_table())
    return ray.data.from_arrow(
        _pair_sides(pl.from_arrow(pa.concat_tables(tables)))
    )


def snapshot_delta_from(old_ds, new_input: str, **kw):
    """CLI-runner seam for snapshot_delta: the registry passes ONE input
    Dataset, so the second snapshot arrives as a path (parquet/JSONL/CSV
    via the io seam) in ``args``:

        {"pipeline": "snapshot_delta", "input": "/crawl/2026-01",
         "args": {"new_input": "/crawl/2026-02"}}
    """
    from shaclapi_ray.io import read_table_any

    return snapshot_delta(old_ds, read_table_any(new_input), **kw)
