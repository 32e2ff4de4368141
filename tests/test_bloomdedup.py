"""bloom_dup_paragraphs: constant-memory (counting-bloom) paragraph
dedup — exactness vs ground truth at generous m, zero false negatives at
tiny m, layout/combine invariance, and the driver-slot profile guard."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from shaclapi_ray.pipelines.bloomdedup import (
    _pack2,
    _positions,
    _unpack2,
    bloom_dup_bitmap,
    bloom_dup_paragraphs,
)

SEP = "\n\n"


def _corpus():
    # paragraphs: A duplicated across docs, B duplicated within one doc,
    # C/D/E unique, '' from consecutive separators
    return [
        (0, "A" + SEP + "C"),
        (1, "A" + SEP + "D"),
        (2, "B" + SEP + "B" + SEP + "E"),
        (3, None),
        (4, ""),
    ]


def _ds(rows, blocks=1):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _exact(rows):
    """Ground truth: drop ALL copies of paragraphs with global count>=2
    (null text == one '' paragraph)."""
    counts = collections.Counter()
    for _, t in rows:
        counts.update((t or "").split(SEP))
    out = {}
    for i, t in rows:
        paras = (t or "").split(SEP)
        kept = [p for p in paras if counts[p] < 2]
        out[i] = (SEP.join(kept), len(kept), len(paras) - len(kept))
    return out


def test_exact_at_generous_m(ray_session):
    rows = _corpus()
    got = (
        bloom_dup_paragraphs(_ds(rows), m_bits=1 << 16)
        .to_pandas()
        .set_index("doc_id")
    )
    exact = _exact(rows)
    for i, (txt, nk, nd) in exact.items():
        assert got.loc[i, "clean_text"] == txt
        assert got.loc[i, "n_kept"] == nk
        assert got.loc[i, "n_dropped"] == nd
    # note: the '' paragraph is globally duplicated (docs 3 and 4) and so
    # is dropped from BOTH — count semantics are per occurrence
    assert got.loc[3, "n_dropped"] == 1 and got.loc[4, "n_dropped"] == 1


def test_no_false_negatives_at_tiny_m(ray_session):
    # m=64 guarantees collisions; duplicated paragraphs must STILL all
    # drop (false positives may add drops, never removals of drops)
    rows = _corpus()
    got = (
        bloom_dup_paragraphs(_ds(rows), m_bits=64, k=2)
        .to_pandas()
        .set_index("doc_id")
    )
    exact = _exact(rows)
    for i, (txt, nk, nd) in exact.items():
        assert got.loc[i, "n_dropped"] >= nd
        for p in got.loc[i, "clean_text"].split(SEP) if got.loc[i, "clean_text"] else []:
            assert p in txt.split(SEP)  # survivors are a subset of exact survivors


def test_layout_and_combine_invariance(ray_session):
    rng = np.random.default_rng(3)
    rows = [
        (i, SEP.join(f"p{rng.integers(0, 40)}" for _ in range(rng.integers(1, 6))))
        for i in range(60)
    ]
    base = (
        bloom_dup_paragraphs(_ds(rows), m_bits=1 << 14)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for blocks, combine in [(7, "driver"), (13, "tree"), (3, "tree")]:
        other = (
            bloom_dup_paragraphs(
                _ds(rows, blocks=blocks), m_bits=1 << 14, combine=combine, tree_groups=4
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert base.equals(other), f"{blocks=} {combine=}"


def test_bitmap_merge_is_saturating_and_packed_roundtrip():
    c = np.array([0, 1, 2, 2, 0, 0, 1, 1], np.uint8)
    np.testing.assert_array_equal(_unpack2(_pack2(c), 8), c)
    a = _unpack2(_pack2(np.array([1, 1, 2, 0, 1, 0, 0, 2], np.uint8)), 8)
    s = np.minimum(a + c, 2)
    assert s.max() == 2 and s.dtype == np.uint8


def test_positions_distinct_per_occurrence():
    # the odd double-hash stride makes one occurrence's k positions
    # distinct, so a unique paragraph can never self-mark as duplicated
    h1 = np.array([12345], np.uint64)
    h2 = np.array([0], np.uint64)  # worst case: stride would be 0 without |1
    pos = _positions(h1, h2, 8, 64)
    assert len(set(pos.tolist())) == 8


def test_single_unique_paragraph_never_flagged(ray_session):
    got = bloom_dup_paragraphs(
        _ds([(0, "only-para")]), m_bits=64, k=8
    ).to_pandas()
    assert got["n_dropped"].iloc[0] == 0 and got["clean_text"].iloc[0] == "only-para"


def test_bitmap_is_fixed_size(ray_session):
    rows = _corpus()
    bm = bloom_dup_bitmap(_ds(rows), m_bits=1 << 10)
    assert bm.nbytes == (1 << 10) // 8


def test_param_validation(ray_session):
    with pytest.raises(ValueError, match="power of two"):
        bloom_dup_bitmap(_ds(_corpus()), m_bits=1000)
    with pytest.raises(ValueError, match="k must"):
        bloom_dup_bitmap(_ds(_corpus()), m_bits=64, k=0)
    with pytest.raises(ValueError, match="combine"):
        bloom_dup_bitmap(_ds(_corpus()), m_bits=64, combine="bogus")


def test_incremental_state_equals_union(ray_session, tmp_path):
    from shaclapi_ray.pipelines.bloomdedup import (
        load_bloom_state,
        persist_bloom_state,
        update_bloom_state,
    )

    rng = np.random.default_rng(11)
    mk = lambda lo, hi: [
        (i, SEP.join(f"q{rng.integers(0, 30)}" for _ in range(3)))
        for i in range(lo, hi)
    ]
    a, b, c = mk(0, 30), mk(30, 55), mk(55, 70)
    path = str(tmp_path / "bloom_state.parquet")
    kw = dict(m_bits=1 << 14, k=4, sep=SEP)
    persist_bloom_state(_ds(a), path, **kw)
    update_bloom_state(_ds(b), path)
    # state(A) + B == counts(A ∪ B), exactly
    from shaclapi_ray.pipelines.bloomdedup import bloom_counts

    union_counts = bloom_counts(_ds(a + b), **kw)
    np.testing.assert_array_equal(load_bloom_state(path)[0], union_counts)
    # dedup of C against the persisted state == dedup of C within A∪B∪C
    got = (
        bloom_dup_paragraphs(_ds(c), state_path=path, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    full = (
        bloom_dup_paragraphs(_ds(a + b + c), **kw)
        .to_pandas()
        .set_index("doc_id")
    )
    for _, row in got.iterrows():
        assert row["clean_text"] == full.loc[row["doc_id"], "clean_text"]


def test_state_param_mismatch_rejected(ray_session, tmp_path):
    from shaclapi_ray.pipelines.bloomdedup import persist_bloom_state

    path = str(tmp_path / "s.parquet")
    persist_bloom_state(_ds(_corpus()), path, m_bits=1 << 10, k=4, sep=SEP)
    with pytest.raises(ValueError, match="must match"):
        bloom_dup_paragraphs(
            _ds(_corpus()), m_bits=1 << 12, k=4, sep=SEP, state_path=path
        )


def test_slot_profile_collision_free_sf0001(ray_session):
    """The driver slot's SQL oracle is the exact drop-all rule; it is
    valid because the slot's m_bits is collision-free on the fixtures.
    Pin that here for sf0.001 (sf0.01 is pinned by the parity suite)."""
    import os

    import duckdb
    import ray.data

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("testdata missing")
    from __ray_entry__ import BLOOM_KW

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    got = (
        bloom_dup_paragraphs(docs, **BLOOM_KW)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    from shaclapi_ray.pipelines.bloomdedup import bloom_dup_paragraphs_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    exp = (
        con.execute(
            bloom_dup_paragraphs_sql(sep=BLOOM_KW["sep"])
            + " ORDER BY doc_id"
        )
        .fetchdf()
        .reset_index(drop=True)
    )
    assert list(got["clean_text"]) == list(exp["clean_text"])
    assert list(got["n_kept"].astype(int)) == list(exp["n_kept"].astype(int))
    assert list(got["n_dropped"].astype(int)) == list(exp["n_dropped"].astype(int))
    # non-degenerate on the fixture: something drops, something survives
    assert got["n_dropped"].sum() > 0 and got["n_kept"].sum() > 0
