"""Window-operator invariants over the events table (oracle-SQL parity is
covered separately in test_oracle_parity)."""

import pytest

from shaclapi_ray.io import read_table_split
from shaclapi_ray.pipelines.events import hopping_window, tumbling_window

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_hopping_counts_each_event_k_times(ray_session):
    """window_s/hop_s overlapping windows ⇒ every event lands in exactly
    k windows, so total n_events is k× the tumbling total."""
    ev = read_table_split(EVENTS)
    n_events = ev.count()
    hop = hopping_window(ev, window_s=300, hop_s=100).to_pandas()
    assert hop.n_events.sum() == 3 * n_events
    tum = tumbling_window(ev, window_s=300).to_pandas()
    assert tum.n_events.sum() == n_events
    # every tumbling window start also exists as a hopping window start
    assert set(tum.window_start) <= set(hop.window_start)


def test_hopping_rejects_unaligned_hop(ray_session):
    ev = read_table_split(EVENTS)
    with pytest.raises(ValueError, match="multiple"):
        hopping_window(ev, window_s=300, hop_s=99)


def test_pii_scan_planted(ray_session):
    import pyarrow as pa
    import ray.data

    from shaclapi_ray.pipelines.textstats import pii_scan

    texts = [
        "contact bob.smith+x@example.co.uk or 10.0.0.1 now",
        "call +1 800 555 0199 twice: +44 20 7946 0958.",
        "clean document, no pii at all",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)}
        )
    )
    df = pii_scan(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df.email_count.tolist() == [1, 0, 0]
    assert df.ipv4_count.tolist() == [1, 0, 0]
    assert df.phone_count.tolist() == [0, 2, 0]
    assert df.red_text[0] == "contact <EMAIL> or <IP> now"
    assert df.red_text[1] == "call <PHONE> twice: <PHONE>."
    assert df.red_text[2] == texts[2]


def test_sample_corpus_layout_invariant(ray_session):
    """The deterministic sample is identical regardless of block layout
    (the property Dataset.random_sample does NOT have)."""
    from shaclapi_ray.io import read_table_split
    from shaclapi_ray.pipelines.textstats import sample_corpus

    docs = read_table_split("/root/testdata/sf0.001/documents.parquet")
    a = sorted(sample_corpus(docs, 0.3).to_pandas().doc_id)
    b = sorted(
        sample_corpus(docs.repartition(7), 0.3, seed=0).to_pandas().doc_id
    )
    assert a == b and 0 < len(a) < docs.count()
    c = sorted(sample_corpus(docs, 0.3, seed=9).to_pandas().doc_id)
    assert c != a  # independent sample under a different seed


def test_attribute_events_asof_semantics(ray_session):
    """As-of join contract: latest click at-or-before the purchase wins,
    equal-ts ties break to the larger event_id, cross-user events never
    match, and purchases with no prior click get -1/-1."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from shaclapi_ray.pipelines.events import attribute_events

    def ts(s):
        return pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=s)

    rows = [
        # user 1: clicks at t=10 (ids 1,2 tie) and t=20; purchases at t=15, t=20, t=5
        (1, ts(10), 1, "click"),
        (2, ts(10), 1, "click"),
        (3, ts(20), 1, "click"),
        (4, ts(15), 1, "purchase"),   # -> id 2 (tie at t=10 -> larger id)
        (5, ts(20), 1, "purchase"),   # -> id 3 (click AT purchase ts counts)
        (6, ts(5), 1, "purchase"),    # -> unmatched
        # user 2: only a purchase; user 1's clicks must not leak
        (7, ts(30), 2, "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    out = (
        attribute_events(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out.event_id.tolist() == [4, 5, 6, 7]
    assert out.matched_event_id.tolist() == [2, 3, -1, -1]
    assert out.lag_us.tolist() == [5_000_000, 0, -1, -1]


def test_drop_late_events_golden(ray_session):
    """Hand-computed watermark verdicts on synthetic timestamps."""
    import pyarrow as pa
    import ray.data

    from shaclapi_ray.pipelines.events import LATE_KNUTH, drop_late_events

    # windows of 10s, lateness 2s, delays mod 20s
    # (Knuth delays for ids 0,1,2 are 0,1,6 — so only event 2, arriving
    # 19+6=25 > its window close 20 + 2, is late)
    ts = [pa.scalar(t * 1_000_000, type=pa.timestamp("us")) for t in [3, 9, 19]]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([0, 1, 2], pa.int64()),
                "ts": pa.array([s.as_py() for s in ts], pa.timestamp("us")),
            }
        )
    )
    df = (
        drop_late_events(ev, window_s=10, allowed_lateness_s=2, max_delay_s=20)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    delays = [((i * LATE_KNUTH) % (1 << 32)) % 20 for i in range(3)]
    assert delays == [0, 1, 6]
    assert df.delay_s.tolist() == delays
    assert df.window_start.tolist() == [0, 0, 10]
    assert df.late.tolist() == [False, False, True]
