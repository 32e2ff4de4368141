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
    from shaclapi_ray.stages.aggregates import combine_partials_multi

    out = combine_partials_multi(
        partials, ["user_id", "window_start"], ["sum_value", "n_events"]
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "window_start": t["window_start"],
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "sum_value": pc.round(pc.cast(t["sum_value"], pa.float64()), 6),
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
    from shaclapi_ray.stages.aggregates import combine_partials_multi

    out = combine_partials_multi(
        partials, ["user_id", "window_start"], ["sum_value", "n_events"]
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "window_start": t["window_start"],
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "sum_value": pc.round(pc.cast(t["sum_value"], pa.float64()), 6),
            }
        ),
        batch_format="pyarrow",
    )


N_USER_BUCKETS = 64  # coarse shuffle width for per-user sequential ops


def _with_user_bucket(events_ds, n_buckets: int, columns: list[str]):
    """Project to ``columns`` and add a ``bucket`` column = mixed hash of
    user_id mod n_buckets. The per-user sequential ops group by THIS
    coarse key (n_buckets groups) instead of by user_id (one near-empty
    pandas frame per user — the tiny-groups trap): one shuffle of narrow
    rows, then one vectorized multi-user kernel per bucket.

    Partitioning assumption: one BUCKET's (projected) rows fit in a
    worker. Size n_buckets ≈ table_bytes / target_partition_bytes at
    scale; the default 64 is right for the benchmark sizes. All events of
    one user always land in one bucket, so hot users still need upstream
    salting — same contract as the per-user form."""

    def add(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        h = u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        b = ((h >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int32)
        return batch.select(columns).append_column("bucket", pa.array(b))

    return events_ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _sorted_user_ts(group: pa.Table, unit_div: int):
    """Sort a bucket's rows by (user_id, ts, event_id); return the sorted
    (user, ts_int, event_id) numpy arrays plus the new-user boundary mask."""
    user = group["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
    ts = (
        group["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        // unit_div
    )
    eid = group["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, user))
    user, ts, eid = user[order], ts[order], eid[order]
    new_user = np.ones(len(user), dtype=bool)
    if len(user) > 1:
        new_user[1:] = user[1:] != user[:-1]
    return user, ts, eid, new_user, order


def _session_starts(ts_s, new_user, gap_s: int):
    """Boundary mask + 1-based within-user session ids over (user, ts)-
    sorted rows — one cumsum pass across ALL users in the bucket."""
    n = len(ts_s)
    new_session = np.ones(n, dtype=bool)
    if n > 1:
        new_session[1:] = new_user[1:] | ((ts_s[1:] - ts_s[:-1]) > gap_s)
    sid_global = np.cumsum(new_session)  # 1..S across the bucket
    # rebase to 1 at each user's first session
    user_first = np.where(new_user, sid_global, 0)
    np.maximum.accumulate(user_first, out=user_first)
    return new_session, (sid_global - user_first + 1).astype(np.int64)


def sessionize(events_ds, gap_s: int = 1800, n_buckets: int = N_USER_BUCKETS):
    """(user_id, session_id, n_events, first_ts_s, last_ts_s): gap-based
    session windows per user. session_id is 1-based in ts order within
    user — deterministic. One coarse keyed shuffle (see
    _with_user_bucket), then per-bucket segment reduction: session
    boundaries by flatnonzero, counts by diff, first/last by boundary
    indexing — no per-user or per-session frames."""

    def per_bucket(group: pa.Table) -> pa.Table:
        user, ts_s, _eid, new_user, _ = _sorted_user_ts(group, 1_000_000)
        new_session, sid = _session_starts(ts_s, new_user, gap_s)
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], len(ts_s)) - 1
        return pa.table(
            {
                "user_id": pa.array(user[starts], pa.int64()),
                "session_id": pa.array(sid[starts], pa.int64()),
                "n_events": pa.array(ends - starts + 1, pa.int64()),
                "first_ts_s": pa.array(ts_s[starts], pa.int64()),
                "last_ts_s": pa.array(ts_s[ends], pa.int64()),
            }
        )

    ds = _with_user_bucket(events_ds, n_buckets, ["user_id", "ts", "event_id"])
    return ds.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def assign_sessions(events_ds, gap_s: int = 1800, n_buckets: int = N_USER_BUCKETS):
    """(event_id, user_id, session_id): every event tagged with its
    gap-session — the event-level range join onto the session intervals
    sessionize() aggregates (same 1-based ts-ordered ids). Same coarse
    shuffle + one cumsum pass per bucket."""

    def per_bucket(group: pa.Table) -> pa.Table:
        user, ts_s, eid, new_user, _ = _sorted_user_ts(group, 1_000_000)
        _, sid = _session_starts(ts_s, new_user, gap_s)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(user, pa.int64()),
                "session_id": pa.array(sid, pa.int64()),
            }
        )

    ds = _with_user_bucket(events_ds, n_buckets, ["user_id", "ts", "event_id"])
    return ds.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def attribute_events(
    events_ds,
    left_type: str = "click",
    right_type: str = "purchase",
    n_buckets: int = N_USER_BUCKETS,
):
    """(event_id, matched_event_id, lag_us): AS-OF JOIN — each ``right_type``
    event is matched to the most recent ``left_type`` event by the SAME user
    at or before its timestamp (attribution: purchase -> last click). Ray
    Data has no as-of join; this is the documented composition: filter to
    the two event types at the read (everything else never enters the
    shuffle), ONE coarse keyed shuffle (see _with_user_bucket), then a
    single merged forward-scan per bucket — rows sorted by (user, ts,
    left-before-right, event_id), last-left positions via
    np.maximum.accumulate, user-boundary reset by comparing against each
    row's segment start. No per-event or per-user loops, no second
    shuffle. Ties (equal ts) break toward the larger left event_id
    (lefts sort before rights at equal ts, so same-ts lefts are visible —
    identical to per-user searchsorted side='right'); unmatched rows get
    -1/-1 (avoids nullable-int schema drift between engines). Equivalent
    to DuckDB's ASOF JOIN modulo its unspecified tie order — the oracle
    spells out the tie-break instead."""

    def per_bucket(group: pa.Table) -> pa.Table:
        user = group["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        # timestamp[us] casts to int64 microseconds directly
        ts = group["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        is_right = (
            pc.equal(group["event_type"], right_type)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, is_right, ts, user))
        user, ts, eid, is_right = (
            user[order],
            ts[order],
            eid[order],
            is_right[order],
        )
        n = len(user)
        pos = np.arange(n, dtype=np.int64)
        last_left = np.where(~is_right, pos, -1)
        np.maximum.accumulate(last_left, out=last_left)
        new_user = np.ones(n, dtype=bool)
        if n > 1:
            new_user[1:] = user[1:] != user[:-1]
        seg_start = np.where(new_user, pos, 0)
        np.maximum.accumulate(seg_start, out=seg_start)
        got = last_left >= seg_start  # a left exists in THIS user's segment
        safe = np.maximum(last_left, 0)
        matched = np.where(got, eid[safe], -1)
        lag = np.where(got, ts - ts[safe], -1)
        return pa.table(
            {
                "event_id": pa.array(eid[is_right], pa.int64()),
                "matched_event_id": pa.array(matched[is_right], pa.int64()),
                "lag_us": pa.array(lag[is_right], pa.int64()),
            }
        )

    filtered = events_ds.map_batches(
        lambda t: t.filter(
            pc.is_in(t["event_type"], value_set=pa.array([left_type, right_type]))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = _with_user_bucket(
        filtered, n_buckets, ["user_id", "ts", "event_id", "event_type"]
    )
    return ds.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def event_type_stats(events_ds):
    """(event_type, n, sum_value, min_value, max_value): keyed aggregate —
    per-batch pyarrow partials, then the auto driver-merge/shuffle
    combine (event_type has a handful of distinct keys, so partials are
    tiny and the aggregator-actor shuffle is pure overhead below the
    driver limit)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["event_type", "value"]).group_by("event_type").aggregate(
            [("value", "count"), ("value", "sum"), ("value", "min"), ("value", "max")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": pc.cast(g["value_count"], pa.int64()),
                "sum_value": g["value_sum"],
                "min_value": g["value_min"],
                "max_value": g["value_max"],
            }
        )

    from shaclapi_ray.stages.aggregates import combine_partials_multi

    out = combine_partials_multi(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        {"n": "sum", "sum_value": "sum", "min_value": "min", "max_value": "max"},
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


LATE_KNUTH = 2654435761  # sample_corpus Knuth constant (deterministic delay)


def drop_late_events(
    events_ds,
    window_s: int = 300,
    allowed_lateness_s: int = 60,
    max_delay_s: int = 600,
):
    """(event_id, window_start, delay_s, late): watermark-style late-data
    suppression over the bounded events table (SURVEY §2.8 'late data').

    The reference ignores post-emission arrivals via its finished_set
    (/root/reference/shaclapi/multiprocessing/functions.py:45-48 — once
    an id has been emitted, late mappings for it are dropped); the
    streaming analog is an allowed-lateness watermark: an event whose
    ARRIVAL lands after its tumbling window's close plus the allowed
    lateness is marked late and excluded from window results. The fixture
    events carry no arrival time, so arrival is derived deterministically
    as ts + delay with delay = (event_id * Knuth) mod 2^32 mod
    max_delay_s — reproducible across runs, cluster sizes and block
    layouts, and mirrored exactly in the SQL oracle.

    Pure per-batch vectorized arithmetic: once the watermark rule is
    fixed, the late verdict is row-local — no shuffle, no state."""
    import numpy as np

    def fn(batch: pa.Table) -> pa.Table:
        epoch_s = pc.divide(pc.cast(batch["ts"], pa.int64()), 1_000_000)
        win = pc.multiply(
            pc.divide(epoch_s, window_s), pa.scalar(window_s, pa.int64())
        )
        ids = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        delay = ((ids * LATE_KNUTH) % (1 << 32)) % max_delay_s
        arrival = epoch_s.to_numpy(zero_copy_only=False) + delay
        close = win.to_numpy(zero_copy_only=False) + window_s
        late = arrival > close + allowed_lateness_s
        return pa.table(
            {
                "event_id": batch["event_id"],
                "window_start": win,
                "delay_s": pa.array(delay, type=pa.int64()),
                "late": pa.array(late),
            }
        )

    return events_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
