"""host_boilerplate — GROUP-scoped boilerplate removal (site-wide headers/
footers dropped from EVERY doc of a host when they appear in >= frac of the
host's docs), distinct from dedup_paragraphs (which keeps the corpus-wide
first occurrence). Pins: exact semantics on a planted fixture, DuckDB oracle
parity, broadcast == join strategy equality, layout invariance, threshold
edge behavior (integer cross-multiplication at an exact boundary)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from shaclapi_ray.pipelines.dedup import host_boilerplate, host_boilerplate_sql


def _fixture() -> pa.Table:
    # group A: HEAD in 3/4 docs, FOOT in 2/4; group B: HEAD in 1/4,
    # '' (null/empty text) in 2/4 — at frac 1/2 A drops HEAD+FOOT
    # everywhere (including the FIRST occurrence), B drops only ''
    return pa.table(
        {
            "doc_id": list(range(8)),
            "text": [
                "HEAD\n\nalpha one\n\nFOOT",
                "HEAD\n\nbeta two\n\nFOOT",
                "HEAD\n\ngamma",
                "delta\n\nFOOT",
                "HEAD\n\nepsilon",
                "zeta\n\neta",
                None,
                "",
            ],
            "source": ["A", "A", "A", "A", "B", "B", "B", "B"],
        }
    )


def _run(docs: pa.Table, parts: int = 3, **kw) -> pd.DataFrame:
    ds = ray.data.from_arrow(docs).repartition(parts)
    out = host_boilerplate(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _oracle(docs: pa.Table, **kw) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return con.execute(host_boilerplate_sql(**kw)).df()


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_group_scoped_removal_matches_oracle(ray_session, strategy):
    docs = _fixture()
    out = _run(docs, min_docs=2, frac_num=1, frac_den=2, strategy=strategy)
    exp = _oracle(docs, min_docs=2, frac_num=1, frac_den=2)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    by_id = dict(zip(out["doc_id"], out["clean_text"]))
    # the FIRST occurrence of HEAD is dropped too (unlike dedup_paragraphs)
    assert by_id[0] == "alpha one"
    # group B keeps HEAD (1/4 < 1/2 of B's docs)
    assert by_id[4] == "HEAD\n\nepsilon"


def test_min_docs_guard_silences_small_groups(ray_session):
    docs = _fixture()
    out = _run(docs, min_docs=5, frac_num=1, frac_den=2)
    # no paragraph reaches 5 docs in any group -> pure pass-through
    assert int(out["n_dropped"].sum()) == 0
    exp = _oracle(docs, min_docs=5, frac_num=1, frac_den=2)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_exact_threshold_boundary_is_integer_exact(ray_session):
    # PARA appears in exactly 2 of 5 docs; frac 2/5 -> c*5 >= 2*5 fires
    # exactly at the boundary on both sides, frac 41/100 does not
    docs = pa.table(
        {
            "doc_id": list(range(5)),
            "text": ["PARA\n\na", "PARA\n\nb", "c", "d", "e"],
            "source": ["s"] * 5,
        }
    )
    hit = _run(docs, min_docs=2, frac_num=2, frac_den=5)
    assert int(hit["n_dropped"].sum()) == 2
    miss = _run(docs, min_docs=2, frac_num=41, frac_den=100)
    assert int(miss["n_dropped"].sum()) == 0
    for kw in (dict(frac_num=2, frac_den=5), dict(frac_num=41, frac_den=100)):
        pd.testing.assert_frame_equal(
            _run(docs, min_docs=2, **kw),
            _oracle(docs, min_docs=2, **kw),
            check_dtype=False,
        )


def test_layout_invariance_and_strategy_equality(ray_session):
    # word-separator profile over a larger synthetic corpus: every block
    # layout and both strategies must agree row-for-row
    docs = pa.table(
        {
            "doc_id": list(range(60)),
            "text": [
                f"common filler doc{i} " + ("shared tail" if i % 3 else "rare")
                for i in range(60)
            ],
            "source": [f"g{i % 4}" for i in range(60)],
        }
    )
    kw = dict(sep=" ", min_docs=2, frac_num=3, frac_den=5)
    base = _run(docs, parts=1, **kw)
    assert 0 < int(base["n_dropped"].sum())
    assert int(base["n_kept"].sum()) > 0
    for parts in (5, 11):
        pd.testing.assert_frame_equal(_run(docs, parts=parts, **kw), base)
    pd.testing.assert_frame_equal(
        _run(docs, parts=7, strategy="join", **kw), base
    )
    pd.testing.assert_frame_equal(_oracle(docs, **kw), base, check_dtype=False)


def test_null_group_collapses_to_empty_string(ray_session):
    # null and '' sources are ONE group on both sides (COALESCE contract)
    docs = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["X\n\na", "X\n\nb", "X\n\nc"],
            "source": [None, "", None],
        }
    )
    out = _run(docs, min_docs=2, frac_num=1, frac_den=2)
    assert list(out["clean_text"]) == ["a", "b", "c"]
    pd.testing.assert_frame_equal(
        out, _oracle(docs, min_docs=2, frac_num=1, frac_den=2), check_dtype=False
    )


def test_unknown_strategy_raises(ray_session):
    with pytest.raises(ValueError, match="strategy"):
        host_boilerplate(ray.data.from_arrow(_fixture()), strategy="nope")


def test_broadcast_ceiling_raises_loudly(ray_session, monkeypatch):
    import shaclapi_ray.pipelines.dedup as dd

    monkeypatch.setattr(dd, "BOILER_BROADCAST_LIMIT", 1)
    with pytest.raises(ValueError, match="strategy='join'"):
        dd.host_boilerplate(
            ray.data.from_arrow(_fixture()), min_docs=2, frac_num=1, frac_den=2
        )
