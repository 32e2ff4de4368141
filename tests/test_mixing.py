"""Weighted corpus mixing + incremental (cross-snapshot) dedup tests:
epoch math, multiplicity/subset invariants, block-layout determinism,
broadcast-vs-join path equivalence, planted cross-snapshot duplicates."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(n=40, prefix="doc"):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array([f"{prefix} body {i}" for i in range(n)]),
                "lang": pa.array(["en" if i % 3 else "de" for i in range(n)]),
            }
        )
    )


# ---------------------------------------------------------------------------
# compute_epochs
# ---------------------------------------------------------------------------


def test_compute_epochs_share_math():
    from shaclapi_ray.pipelines.mixing import compute_epochs

    e = compute_epochs({"a": 100, "b": 400}, {"a": 1.0, "b": 1.0}, 400)
    # each source gets 200 expected rows: a repeats 2x, b samples half
    assert e["a"] == pytest.approx(2.0)
    assert e["b"] == pytest.approx(0.5)


def test_compute_epochs_validation():
    from shaclapi_ray.pipelines.mixing import compute_epochs

    with pytest.raises(ValueError):
        compute_epochs({"a": 10}, {"b": 1.0}, 10)  # name mismatch
    with pytest.raises(ValueError):
        compute_epochs({"a": 10}, {"a": -1.0}, 10)  # negative weight
    with pytest.raises(ValueError):
        compute_epochs({"a": 0}, {"a": 1.0}, 10)  # empty source


# ---------------------------------------------------------------------------
# mix_corpora
# ---------------------------------------------------------------------------


def test_mix_multiplicities_and_tags(ray_session):
    from shaclapi_ray.pipelines.mixing import mix_corpora

    n = 40
    mixed = mix_corpora(
        {"web": _docs(n)}, {"web": 2.5}, seed=3
    ).to_pandas()
    per_doc = mixed.groupby("doc_id").size()
    # every doc appears in both full copies; ~half get the fractional 3rd
    assert set(per_doc.unique()) <= {2, 3}
    assert (per_doc >= 2).all() and len(per_doc) == n
    frac_rows = mixed[mixed.mix_key == "web:2"]
    assert 0 < len(frac_rows) < n
    assert set(mixed.mix_key.unique()) == {"web:0", "web:1", "web:2"}


def test_mix_two_sources_and_salt_independence(ray_session):
    from shaclapi_ray.pipelines.mixing import mix_corpora

    docs = _docs(60)
    en = docs.filter(expr="lang == 'en'")
    mixed = mix_corpora(
        {"all": docs, "en": en}, {"all": 0.4, "en": 1.3}, seed=7
    ).to_pandas()
    keys = set(mixed.mix_key.unique())
    assert keys == {"all:0", "en:0", "en:1"}
    # the en full copy is complete
    assert (mixed.mix_key == "en:0").sum() == 40
    # fractional copies come from DIFFERENT salts: the all:0 sample is not
    # just the en:1 sample restricted/extended (overwhelmingly likely to
    # differ on 60 ids; deterministic given the fixed seed)
    a = set(mixed[mixed.mix_key == "all:0"].doc_id)
    b = set(mixed[mixed.mix_key == "en:1"].doc_id)
    assert a != b


def test_mix_deterministic_across_block_layouts(ray_session):
    from shaclapi_ray.pipelines.mixing import mix_corpora

    docs1 = _docs(50)
    docs2 = _docs(50).repartition(7)
    key = ["mix_key", "doc_id"]
    m1 = mix_corpora({"w": docs1}, {"w": 1.35}, seed=11).to_pandas()
    m2 = mix_corpora({"w": docs2}, {"w": 1.35}, seed=11).to_pandas()
    m1 = m1.sort_values(key).reset_index(drop=True)
    m2 = m2.sort_values(key).reset_index(drop=True)
    assert m1.equals(m2[m1.columns])


def test_mix_fraction_monotone_subset(ray_session):
    """Raising only the FRACTION (same epoch index) grows the kept set
    monotonically — retuning weights doesn't churn the sample."""
    from shaclapi_ray.pipelines.mixing import mix_corpora

    docs = _docs(80)
    lo = mix_corpora({"w": docs}, {"w": 0.3}, seed=5).to_pandas()
    hi = mix_corpora({"w": docs}, {"w": 0.6}, seed=5).to_pandas()
    assert set(lo.doc_id) <= set(hi.doc_id)


def test_mix_empty_raises(ray_session):
    from shaclapi_ray.pipelines.mixing import mix_corpora

    with pytest.raises(ValueError):
        mix_corpora({"w": _docs(5)}, {"w": 0.0})
    with pytest.raises(ValueError):
        mix_corpora({"w": _docs(5)}, {"w": float("nan")})


# ---------------------------------------------------------------------------
# split / shuffle
# ---------------------------------------------------------------------------


def test_split_partitions_every_row_once(ray_session):
    from shaclapi_ray.pipelines.mixing import split_corpus

    n = 200
    sp = split_corpus(
        _docs(n), {"train": 0.9, "val": 0.05, "test": 0.05}, seed=2
    ).to_pandas()
    assert len(sp) == n and sp.doc_id.nunique() == n
    shares = sp.split.value_counts(normalize=True)
    assert shares["train"] > 0.8  # hash-uniform, loose bound at n=200
    assert set(sp.split.unique()) <= {"train", "val", "test"}


def test_split_stable_under_corpus_growth(ray_session):
    """Adding rows never reassigns existing rows (leakage safety)."""
    from shaclapi_ray.pipelines.mixing import split_corpus

    fr = {"train": 0.8, "val": 0.2}
    small = split_corpus(_docs(50), fr, seed=9).to_pandas()
    big = split_corpus(_docs(150), fr, seed=9).to_pandas()
    merged = small.merge(big, on="doc_id", suffixes=("_s", "_b"))
    assert (merged.split_s == merged.split_b).all()


def test_split_validation():
    from shaclapi_ray.pipelines.mixing import split_corpus

    with pytest.raises(ValueError):
        split_corpus(None, {"a": 0.5, "b": 0.4})  # doesn't sum to 1
    with pytest.raises(ValueError):
        split_corpus(None, {"a": 1.5, "b": -0.5})


def test_shuffle_deterministic_and_complete(ray_session):
    from shaclapi_ray.pipelines.mixing import shuffle_corpus

    a = shuffle_corpus(_docs(100), seed=4).to_pandas()
    b = shuffle_corpus(_docs(100).repartition(9), seed=4).to_pandas()
    # identical shuffled ORDER regardless of input block layout
    assert list(a.doc_id) == list(b.doc_id)
    assert sorted(a.doc_id) == list(range(100))
    # actually shuffled (not identity order) and key is sorted
    assert list(a.doc_id) != list(range(100))
    assert list(a.shuffle_key) == sorted(a.shuffle_key)


# ---------------------------------------------------------------------------
# incremental dedup
# ---------------------------------------------------------------------------


def _snapshots():
    """(old, new): new shares texts 0 and 2 with old, has an internal
    duplicate pair (ids 102/103), and two fresh texts."""
    import ray.data

    old = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["alpha", "bravo", "charlie", "delta"]),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100, 101, 102, 103, 104], pa.int64()),
                "text": pa.array(["alpha", "echo", "foxtrot", "foxtrot", "charlie"]),
            }
        )
    )
    return old, new


def test_incremental_broadcast_filters_seen_texts(ray_session, tmp_path):
    from shaclapi_ray.pipelines.dedup import dedup_incremental, persist_dedup_state

    old, new = _snapshots()
    state = str(tmp_path / "state")
    manifest = persist_dedup_state(old, state)
    assert manifest["rows"] == 4
    kept = dedup_incremental(new, state, strategy="broadcast").to_pandas()
    # alpha (100) and charlie (104) were in the old corpus; the internal
    # foxtrot pair is KEPT (within-snapshot dedup is dedup_corpus's job)
    assert sorted(kept.doc_id) == [101, 102, 103]
    assert list(kept.columns) == ["doc_id", "text"]


def test_incremental_join_matches_broadcast(ray_session, tmp_path):
    from shaclapi_ray.pipelines.dedup import dedup_incremental, persist_dedup_state

    old, new = _snapshots()
    state = str(tmp_path / "state")
    persist_dedup_state(old, state)
    b = dedup_incremental(new, state, strategy="broadcast").to_pandas()
    j = dedup_incremental(new, state, strategy="join").to_pandas()
    assert sorted(b.doc_id) == sorted(j.doc_id)
    assert sorted(b.columns) == sorted(j.columns)


def test_incremental_state_layout_and_errors(ray_session, tmp_path):
    import os

    from shaclapi_ray.pipelines.dedup import dedup_incremental, persist_dedup_state

    old, new = _snapshots()
    state = str(tmp_path / "state")
    with pytest.raises(FileNotFoundError):
        dedup_incremental(new, state)
    persist_dedup_state(old, state)
    # bucket-partitioned layout (the pruned-read / resume unit)
    assert any(d.startswith("bucket=") for d in os.listdir(state))
    with pytest.raises(ValueError):
        dedup_incremental(new, state, strategy="bogus")


def test_persist_replaces_previous_state(ray_session, tmp_path):
    """Re-persisting into the same dir must NOT mix the old corpus's
    hashes in (the stale-index failure mode of round-2 advice)."""
    import ray.data

    from shaclapi_ray.pipelines.dedup import dedup_incremental, persist_dedup_state

    old, new = _snapshots()
    state = str(tmp_path / "state")
    persist_dedup_state(old, state)
    unrelated = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([9], pa.int64()),
                "text": pa.array(["zulu"]),
            }
        )
    )
    m = persist_dedup_state(unrelated, state)
    assert m["rows"] == 1
    kept = dedup_incremental(new, state).to_pandas()
    # alpha/charlie are NOT in the new state — everything survives
    assert sorted(kept.doc_id) == [100, 101, 102, 103, 104]


def test_incremental_larger_roundtrip(ray_session, tmp_path):
    """200-doc snapshot vs 150-doc state with 50 planted overlaps, both
    paths: survivors = exactly the non-overlapping texts."""
    import ray.data

    from shaclapi_ray.pipelines.dedup import dedup_incremental, persist_dedup_state

    old = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(150), pa.int64()),
                "text": pa.array([f"old text {i}" for i in range(150)]),
            }
        )
    ).repartition(5)
    new_texts = [f"old text {i}" for i in range(50)] + [
        f"new text {i}" for i in range(150)
    ]
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1000, 1000 + 200), pa.int64()),
                "text": pa.array(new_texts),
            }
        )
    ).repartition(4)
    state = str(tmp_path / "state")
    persist_dedup_state(old, state)
    for strat in ("broadcast", "join"):
        kept = dedup_incremental(new, state, strategy=strat).to_pandas()
        assert sorted(kept.doc_id) == list(range(1050, 1200)), strat


def test_extend_state_recurring_crawl_loop(ray_session, tmp_path):
    """persist -> filter snapshot 2 -> admit survivors -> extend ->
    filter snapshot 3: snapshot 3 is deduped against BOTH prior
    corpora, on both filter paths."""
    import ray.data

    from shaclapi_ray.pipelines.dedup import (
        dedup_incremental,
        extend_dedup_state,
        persist_dedup_state,
    )

    def mk(ids, texts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts),
                }
            )
        )

    state = str(tmp_path / "state")
    persist_dedup_state(mk([0, 1], ["alpha", "bravo"]), state)
    snap2 = mk([10, 11, 12], ["alpha", "golf", "hotel"])
    kept2 = dedup_incremental(snap2, state).to_pandas()
    assert sorted(kept2.doc_id) == [11, 12]
    m = extend_dedup_state(mk([11, 12], ["golf", "hotel"]), state)
    assert m["rows"] == 4
    snap3 = mk([20, 21, 22, 23], ["bravo", "golf", "india", "hotel"])
    for strat in ("broadcast", "join"):
        kept3 = dedup_incremental(snap3, state, strategy=strat).to_pandas()
        assert sorted(kept3.doc_id) == [22], strat


def test_extend_requires_existing_state(ray_session, tmp_path):
    import pytest as _pytest

    from shaclapi_ray.pipelines.dedup import extend_dedup_state

    with _pytest.raises(FileNotFoundError):
        extend_dedup_state(None, str(tmp_path / "nope"))
