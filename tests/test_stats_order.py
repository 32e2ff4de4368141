"""Stats-aware node order — the reference's default 'TARGET IN BIG'
heuristic (/root/reference/shaclapi/config.py:205-209) recast as
tie-breaking independent shapes by estimated target-set size from
Parquet row-group statistics (SURVEY.md §7.1)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from shaclapi_ray.shapes.dag import ConstraintDAG
from shaclapi_ray.shapes.ir import PredicateConstraint, Shape


def _shape(sid, lang):
    return Shape(
        shape_id=sid,
        target={"op": "==", "column": "lang", "value": lang},
        constraints=[
            PredicateConstraint(name=f"{sid}_p", pred={"op": "not_null", "column": "url"})
        ],
    )


def _write(path, counts: dict[str, int]):
    """One file per lang value so row-group stats separate cleanly."""
    import os

    os.makedirs(path, exist_ok=True)
    for i, (lang, n) in enumerate(sorted(counts.items())):
        tbl = pa.table(
            {
                "url": pa.array([f"https://{lang}/{j}" for j in range(n)], pa.string()),
                "lang": pa.array([lang] * n, pa.string()),
            }
        )
        pq.write_table(tbl, f"{path}/part-{i:05d}.parquet", row_group_size=1000)
    return path


def test_estimate_rows_matching_prunes_by_stats(tmp_path):
    from shaclapi_ray.io import estimate_rows_matching

    p = _write(str(tmp_path / "pages"), {"aa": 900, "zz": 50})
    assert estimate_rows_matching(p, {"op": "==", "column": "lang", "value": "aa"}) == 900
    assert estimate_rows_matching(p, {"op": "==", "column": "lang", "value": "zz"}) == 50
    assert estimate_rows_matching(p, {"op": "==", "column": "lang", "value": "mm"}) == 0
    assert estimate_rows_matching(p, None) == 950
    # non-prunable op falls back to the full count (upper bound)
    assert (
        estimate_rows_matching(p, {"op": "regex", "column": "url", "pattern": "x"})
        == 950
    )
    # range over strings prunes lexicographically
    assert (
        estimate_rows_matching(p, {"op": "range", "column": "lang", "min": "y"}) == 50
    )


def test_node_order_flips_with_stats(tmp_path):
    """The 'done' criterion: the order of independent shapes flips when
    the stats flip."""
    dag = ConstraintDAG.from_shapes([_shape("A", "aa"), _shape("B", "zz")])
    from shaclapi_ray.io import estimate_rows_matching

    big_aa = _write(str(tmp_path / "big_aa"), {"aa": 900, "zz": 50})
    big_zz = _write(str(tmp_path / "big_zz"), {"aa": 50, "zz": 900})

    def order_for(pages):
        est = {
            sid: estimate_rows_matching(pages, s.target)
            for sid, s in dag.shapes.items()
        }
        return dag.node_order(None, size_estimates=est)

    assert order_for(big_aa) == ["A", "B"]  # A's target set is bigger
    assert order_for(big_zz) == ["B", "A"]  # flipped stats flip the order


def test_engine_applies_stats_order(ray_session, tmp_path):
    from shaclapi_ray.engine import JobConfig, ValidationEngine

    pages = _write(str(tmp_path / "pages"), {"aa": 50, "zz": 900})
    # pages table lacks the standard columns used by fixtures, so build
    # shapes over (url, lang) only
    eng = ValidationEngine([_shape("A", "aa"), _shape("B", "zz")], JobConfig())
    assert eng.order == ["A", "B"]  # static tie-break is lexicographic
    eng.run(pages)
    assert eng.order == ["B", "A"]  # stats put the big target set first


def test_targets_still_precede_estimates():
    dag = ConstraintDAG.from_shapes([_shape("A", "aa"), _shape("B", "zz")])
    order = dag.node_order(["B"], size_estimates={"A": 1000, "B": 1})
    assert order[0] == "B"  # target-first beats size
