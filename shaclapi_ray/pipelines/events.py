"""Stream-shaped operators over the events table (event_id, ts, user_id,
event_type, value, props).

Ray Data has no event-time windows; per the streaming recast (SURVEY.md
§2.8), bounded window semantics become groupby + within-group pandas over
ts-sorted rows. Tumbling windows pre-aggregate inside map_batches before
the keyed shuffle (partial combine), so the all-to-all moves one row per
(key, window, batch) instead of one per event.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum


def tumbling_window(events_ds, window_s: int = 300):
    """(user_id, window_start, n_events, sum_value): fixed windows on ts.

    Partial per-batch aggregation first; the groupby then shuffles only the
    per-batch partials."""

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch["ts"], pa.int64())  # microseconds
        win = pc.multiply(
            pc.divide(epoch, 1_000_000 * window_s), pa.scalar(window_s, pa.int64())
        )
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "window_start": win,
                "value": batch["value"],
            }
        )
        g = t.group_by(["user_id", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "window_start": g["window_start"],
                "sum_value": g["value_sum"],
                "n_events": pc.cast(g["value_count"], pa.int64()),
            }
        )

    partials = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby(["user_id", "window_start"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n_events", alias_name="n_events"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "window_start": t["window_start"],
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "sum_value": pc.round(t["sum_value"], 6),
            }
        ),
        batch_format="pyarrow",
    )


def hopping_window(events_ds, window_s: int = 300, hop_s: int = 100):
    """(user_id, window_start, n_events, sum_value): overlapping (hopping/
    sliding) windows of ``window_s`` advancing by ``hop_s`` — each event
    lands in exactly ``window_s // hop_s`` windows.

    Same shuffle shape as tumbling_window: the per-batch partial replicates
    each event's aggregate row once per overlapping window (k small
    vectorized group_bys, one per hop offset), so the all-to-all moves
    per-(key, window, batch) partials, never raw events."""
    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    k = window_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch["ts"], pa.int64())  # microseconds
        base = pc.divide(epoch, 1_000_000 * hop_s)  # hop index of event ts
        pieces = []
        for i in range(k):
            win = pc.multiply(
                pc.subtract(base, pa.scalar(i, pa.int64())),
                pa.scalar(hop_s, pa.int64()),
            )
            pieces.append(
                pa.table(
                    {
                        "user_id": batch["user_id"],
                        "window_start": win,
                        "value": batch["value"],
                    }
                )
            )
        t = pa.concat_tables(pieces)
        g = t.group_by(["user_id", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "window_start": g["window_start"],
                "sum_value": g["value_sum"],
                "n_events": pc.cast(g["value_count"], pa.int64()),
            }
        )

    partials = events_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = partials.groupby(["user_id", "window_start"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n_events", alias_name="n_events"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "window_start": t["window_start"],
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "sum_value": pc.round(t["sum_value"], 6),
            }
        ),
        batch_format="pyarrow",
    )


def sessionize(events_ds, gap_s: int = 1800):
    """(user_id, session_id, n_events, first_ts, last_ts): gap-based
    session windows per user. session_id is 1-based in ts order within
    user — deterministic. groupby(user).map_groups over ts-sorted rows."""

    def per_user(g):
        import pandas as pd

        g = g.sort_values(["ts", "event_id"])
        # normalize to ns first (pandas 2.x may keep us resolution), then
        # to integer epoch seconds
        ts_s = (
            pd.to_datetime(g["ts"]).astype("datetime64[ns]").astype("int64").to_numpy()
            // 1_000_000_000
        )
        new_session = np.ones(len(g), dtype=bool)
        new_session[1:] = (ts_s[1:] - ts_s[:-1]) > gap_s
        sid = np.cumsum(new_session)
        out = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"].to_numpy(),
                    "session_id": sid.astype("int64"),
                    "ts_s": ts_s,
                }
            )
            .groupby("session_id")
            .agg(
                user_id=("user_id", "first"),
                n_events=("ts_s", "size"),
                first_ts_s=("ts_s", "min"),
                last_ts_s=("ts_s", "max"),
            )
            .reset_index()
        )
        return out[
            ["user_id", "session_id", "n_events", "first_ts_s", "last_ts_s"]
        ].astype({"n_events": "int64", "first_ts_s": "int64", "last_ts_s": "int64"})

    return events_ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def assign_sessions(events_ds, gap_s: int = 1800):
    """(event_id, user_id, session_id): every event tagged with its
    gap-session — the event-level range join onto the session intervals
    sessionize() aggregates (same 1-based ts-ordered ids). One keyed
    shuffle (groupby user), vectorized cumsum within group."""

    def per_user(g):
        import pandas as pd

        g = g.sort_values(["ts", "event_id"])
        ts_s = (
            pd.to_datetime(g["ts"]).astype("datetime64[ns]").astype("int64").to_numpy()
            // 1_000_000_000
        )
        new_session = np.ones(len(g), dtype=bool)
        new_session[1:] = (ts_s[1:] - ts_s[:-1]) > gap_s
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "session_id": np.cumsum(new_session).astype("int64"),
            }
        )

    return events_ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def attribute_events(events_ds, left_type: str = "click", right_type: str = "purchase"):
    """(event_id, matched_event_id, lag_us): AS-OF JOIN — each ``right_type``
    event is matched to the most recent ``left_type`` event by the SAME user
    at or before its timestamp (attribution: purchase -> last click). Ray
    Data has no as-of join; this is the documented composition: ONE keyed
    shuffle (groupby user_id), then a vectorized np.searchsorted inside each
    group — no per-event loops, no second shuffle. Partitioning assumption:
    one user's events fit in a worker (same as sessionize; salt hot users
    upstream if violated). Ties (equal ts) break toward the larger
    event_id; unmatched rows get -1/-1 (avoids nullable-int schema drift
    between engines). Equivalent to DuckDB's ASOF JOIN modulo its
    unspecified tie order — the oracle spells out the tie-break instead."""

    def per_user(g):
        import pandas as pd

        g = g.sort_values(["ts", "event_id"])
        ts_us = (
            pd.to_datetime(g["ts"]).astype("datetime64[ns]").astype("int64").to_numpy()
            // 1_000
        )
        et = g["event_type"].to_numpy()
        eid = g["event_id"].to_numpy()
        lmask = et == left_type
        rmask = et == right_type
        lts, lid = ts_us[lmask], eid[lmask]
        rts, rid = ts_us[rmask], eid[rmask]
        if lid.size:
            idx = np.searchsorted(lts, rts, side="right") - 1
            pos = np.maximum(idx, 0)
            got = idx >= 0
            matched = np.where(got, lid[pos], -1)
            lag = np.where(got, rts - lts[pos], -1)
        else:
            matched = np.full(rid.size, -1, dtype=np.int64)
            lag = np.full(rid.size, -1, dtype=np.int64)
        return pd.DataFrame(
            {
                "event_id": rid.astype("int64"),
                "matched_event_id": matched.astype("int64"),
                "lag_us": lag.astype("int64"),
            }
        )

    return events_ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def event_type_stats(events_ds):
    """(event_type, n, sum_value, min_value, max_value): keyed aggregate
    with Ray-native partial+final combine."""
    out = events_ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="sum_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "n": pc.cast(t["n"], pa.int64()),
                "sum_value": pc.round(t["sum_value"], 6),
                "min_value": pc.round(t["min_value"], 6),
                "max_value": pc.round(t["max_value"], 6),
            }
        ),
        batch_format="pyarrow",
    )


def parse_props(events_ds):
    """(event_id, k): extract the integer field from the JSON props column —
    vectorized json-path extraction (polars) inside map_batches; the
    structured-payload parse stage of an events pipeline."""
    import polars as pl

    def fn(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["props"].combine_chunks() if hasattr(batch["props"], "combine_chunks") else batch["props"])
        k = s.str.json_path_match("$.k").cast(pl.Int64)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "k": k.to_arrow().cast(pa.int64()),
            }
        )

    return events_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
