"""ConstraintDAG reduction unit tests — the tc6 analog
(/root/reference/tests/test_main.py:286-403): network pruning, constraint
removal vs requested columns, OR-option collapse, node order."""

import pytest

from shaclapi_ray.fixtures import full_schema, or_shape
from shaclapi_ray.shapes.dag import ConstraintDAG
from shaclapi_ray.shapes.ir import (
    OrConstraint,
    PredicateConstraint,
    RefConstraint,
    Shape,
    shape_from_dict,
)


def test_reduce_to_reachable():
    dag = ConstraintDAG.from_shapes(full_schema())
    red = dag.reduce(["LinkedPageShape"])
    assert set(red.shapes) == {"LinkedPageShape", "TargetPageShape"}


def test_reduce_no_target_keeps_all():
    dag = ConstraintDAG.from_shapes(full_schema())
    assert set(dag.reduce(None).shapes) == set(dag.shapes)


def test_node_order_children_first():
    dag = ConstraintDAG.from_shapes(full_schema())
    order = dag.node_order(["LinkedPageShape"])
    assert order.index("TargetPageShape") < order.index("LinkedPageShape")


def test_cycle_detection():
    a = Shape("A", constraints=[RefConstraint(name="ra", min=1, shape="B")])
    b = Shape("B", constraints=[RefConstraint(name="rb", min=1, shape="A")])
    dag = ConstraintDAG.from_shapes([a, b])
    with pytest.raises(ValueError, match="cycle"):
        dag.node_order()


def test_unknown_reference_rejected():
    a = Shape("A", constraints=[RefConstraint(name="ra", min=1, shape="Zed")])
    with pytest.raises(ValueError, match="unknown shape"):
        ConstraintDAG.from_shapes([a]).validate()


def test_project_drops_unrequested_constraint():
    dag = ConstraintDAG.from_shapes(full_schema())
    red = dag.project({"url", "warc_ts"}, ["UrlShape"])
    names = [c.name for c in red.shapes["UrlShape"].constraints]
    assert "text_min_len" not in names
    assert "url_not_null" in names and "url_scheme" in names
    # non-target shapes keep all constraints
    assert len(red.shapes["LangShape"].constraints) == 1


def test_or_collapse_all_removed():
    # requesting no OR-option columns => constraint vanishes entirely
    dag = ConstraintDAG.from_shapes([or_shape()])
    red = dag.project({"warc_ts"}, ["OrShape"])
    assert red.shapes["OrShape"].constraints == []


def test_or_collapse_single_option_promoted():
    # only 'text' requested => one option survives => promoted to plain
    dag = ConstraintDAG.from_shapes([or_shape()])
    red = dag.project({"text"}, ["OrShape"])
    cs = red.shapes["OrShape"].constraints
    assert len(cs) == 1
    assert isinstance(cs[0], PredicateConstraint)
    assert cs[0].pred["op"] == "len_range"


def test_or_multiple_options_survive():
    dag = ConstraintDAG.from_shapes([or_shape()])
    red = dag.project({"text", "lang"}, ["OrShape"])
    cs = red.shapes["OrShape"].constraints
    assert len(cs) == 1 and isinstance(cs[0], OrConstraint)
    assert len(cs[0].options) == 2


def test_overlap_metric():
    dag = ConstraintDAG.from_shapes(full_schema())
    a = dag.reduce(["LinkedPageShape"])
    b = dag.reduce(["TargetPageShape"])
    assert a.overlap(b) == 1.0  # {TPS} ⊂ {LPS, TPS}


def test_push_target_filter():
    dag = ConstraintDAG.from_shapes(full_schema())
    out = dag.push_target_filter(
        "UrlShape", {"op": "==", "column": "lang", "value": "en"}
    )
    assert out.shapes["UrlShape"].target == {"op": "==", "column": "lang", "value": "en"}
    out2 = out.push_target_filter(
        "FreshPageShape", {"op": "==", "column": "lang", "value": "en"}
    )
    assert out2.shapes["FreshPageShape"].target["op"] == "and"


def test_shape_from_dict_json_format():
    d = {
        "name": "MyShape",
        "targetDef": {"filter": {"op": "==", "column": "lang", "value": "en"}},
        "constraintDef": {
            "conjunctions": [
                [
                    {"name": "p1", "pred": {"op": "not_null", "column": "url"}},
                    {"name": "r1", "min": 1, "shape": "Other"},
                    {
                        "name": "o1",
                        "options": [
                            {"pred": {"op": "len_range", "column": "text", "min": 5}},
                            {"pred": {"op": "==", "column": "lang", "value": "en"}},
                        ],
                    },
                ]
            ]
        },
    }
    s = shape_from_dict(d)
    assert s.shape_id == "MyShape"
    assert isinstance(s.constraints[0], PredicateConstraint)
    assert isinstance(s.constraints[1], RefConstraint)
    assert s.constraints[1].shape == "Other"
    assert isinstance(s.constraints[2], OrConstraint)
    assert s.referenced_shapes() == ["Other"]


def test_shape_from_dict_dnf():
    """Multiple conjunctions = disjunction (reference backend semantics):
    row valid iff ANY conjunction fully holds."""
    import pyarrow as pa

    from shaclapi_ray.shapes.ir import shape_from_dict

    d = {
        "name": "DnfShape",
        "targetDef": {"filter": None},
        "constraintDef": {
            "conjunctions": [
                [
                    {"pred": {"op": "==", "column": "lang", "value": "en"}},
                    {"pred": {"op": "len_range", "column": "text", "min": 5}},
                ],
                [{"pred": {"op": "==", "column": "lang", "value": "de"}}],
            ]
        },
    }
    s = shape_from_dict(d)
    assert len(s.constraints) == 1 and isinstance(s.constraints[0], OrConstraint)
    tbl = pa.table(
        {
            "lang": ["en", "en", "de", "fr"],
            "text": ["long enough", "abc", "x", "whatever"],
        }
    )
    mask = s.constraints[0].evaluate(tbl).to_pylist()
    # en+long ok; en+short fails conj1 and isn't de; de ok; fr fails both
    assert mask == [True, False, True, False]


def test_node_order_in_degree_breaks_size_ties():
    """The IN component of the reference's 'TARGET IN BIG' heuristic
    (/root/reference/shaclapi/config.py:205-209): on a diamond DAG where
    size estimates tie, the shape consumed by MORE dependents evaluates
    first; when in-degrees tie too, bigger estimated target sets win."""
    # diamond: Top -> {A, B} -> C, plus D -> A  (A has in-degree 2, B 1)
    top = Shape(
        "Top",
        constraints=[
            RefConstraint(name="ta", min=1, shape="A"),
            RefConstraint(name="tb", min=1, shape="B"),
        ],
    )
    d = Shape("D", constraints=[RefConstraint(name="da", min=1, shape="A")])
    a = Shape("A", constraints=[RefConstraint(name="ac", min=1, shape="C")])
    b = Shape("B", constraints=[RefConstraint(name="bc", min=1, shape="C")])
    c = Shape("C", constraints=[PredicateConstraint(name="cp", pred={"op": "not_null", "column": "url"})])
    dag = ConstraintDAG.from_shapes([top, d, a, b, c])

    ties = {"A": 100, "B": 100, "C": 100, "Top": 100, "D": 100}
    order = dag.node_order(["Top"], size_estimates=ties)
    assert order.index("A") < order.index("B")  # in-degree 2 beats 1

    # equal in-degrees (drop D): size decides — B bigger -> B first
    dag2 = ConstraintDAG.from_shapes([top, a, b, c])
    order2 = dag2.node_order(["Top"], size_estimates={"A": 10, "B": 900, "C": 50})
    assert order2.index("B") < order2.index("A")
