"""TTL/SHACL shape parsing + reduction, mirroring the reference's tc6
constraint assertions (/root/reference/tests/test_main.py:286-403) and
the tc4/tc2 shape files — parsed by the built-in Turtle-subset reader
(no rdflib)."""

import pytest

from shaclapi_ray.shapes.dag import ConstraintDAG
from shaclapi_ray.shapes.ir import (
    OrConstraint,
    RefConstraint,
    load_schema_dir,
    shape_from_ttl,
)

TC6_A = "/root/reference/tests/tc6/shapes/shapeA.ttl"
TC6_DIR = "/root/reference/tests/tc6/shapes"
TC4_A = "/root/reference/tests/tc4/shapes/shapeA.ttl"
TC2_B = "/root/reference/tests/tc2/shapes/shapeB.ttl"

T6 = "http://example.org/testGraph6#"
SHAPE_A = "<http://example.org/ShapeA>"
SHAPE_B = "<http://example.org/ShapeB>"


def _by_path(constraints):
    return sorted(constraints, key=lambda c: c.path or "")


def test_parse_tc6_shape_a():
    s = shape_from_ttl(TC6_A)
    assert s.shape_id == SHAPE_A
    assert s.target_class == f"<{T6}classA>"
    # one sh:or (3 options) + two sh:property blocks
    ors = [c for c in s.constraints if isinstance(c, OrConstraint)]
    props = [c for c in s.constraints if isinstance(c, RefConstraint)]
    assert len(ors) == 1 and len(props) == 2
    opts = _by_path(ors[0].options)
    assert [(o.path, o.min, o.max) for o in opts] == [
        (f"<{T6}property0>", 1, None),
        (f"<{T6}property1>", 3, None),
        (f"^<{T6}property2>", None, 0),
    ]
    assert opts[2].inverse is True
    by_path = {c.path: c for c in props}
    belongs = by_path[f"<{T6}belongsTo>"]
    assert belongs.shape == SHAPE_B and belongs.min == 1
    p3 = by_path[f"<{T6}property3>"]
    assert p3.min == 1 and p3.shape is None


def test_parse_tc4_inverse_qualified():
    s = shape_from_ttl(TC4_A)
    (c,) = s.constraints
    assert isinstance(c, RefConstraint)
    assert c.inverse is True
    assert c.path == "^<http://example.org/testGraph4#refersTo>"
    assert c.shape == SHAPE_B
    assert c.min == 2 and c.max is None


def test_parse_tc2_target_query():
    s = shape_from_ttl(TC2_B)
    assert s.shape_id == SHAPE_B
    assert s.target_query is not None and s.target_query.startswith("SELECT ?x")
    (c,) = s.constraints
    assert c.shape == "<http://example.org/ShapeC>" and c.min == 1


def _tc6_dag():
    return ConstraintDAG.from_shapes(load_schema_dir(TC6_DIR))


def _reduce_with_query_paths(paths: set[str]):
    """Mirror the reference flow: remove target-shape constraints whose
    path the query does not bind, then prune to reachable shapes
    (ReducedShapeParser.parse_constraint + Reduction.reduce_shape_network)."""
    dag = _tc6_dag().project(paths, [SHAPE_A])
    return dag.reduce([SHAPE_A])


def test_tc6_remove_one():
    """≙ test_main.py:286 test_tc6_remove_one: query binds property0,
    ^property2, property3, belongsTo -> or keeps 2 options, both property
    constraints stay, ShapeB still referenced."""
    dag = _reduce_with_query_paths(
        {f"<{T6}property0>", f"^<{T6}property2>", f"<{T6}property3>", f"<{T6}belongsTo>"}
    )
    assert len(dag.shapes) == 2
    cons = dag.shapes[SHAPE_A].constraints
    assert len(cons) == 3
    ors = [c for c in cons if isinstance(c, OrConstraint)]
    assert len(ors) == 1
    opts = _by_path(ors[0].options)
    assert [(o.path, o.min, o.max) for o in opts] == [
        (f"<{T6}property0>", 1, None),
        (f"^<{T6}property2>", None, 0),
    ]
    by_path = {c.path: c for c in cons if isinstance(c, RefConstraint)}
    assert by_path[f"<{T6}belongsTo>"].shape == SHAPE_B
    assert by_path[f"<{T6}property3>"].min == 1


def test_tc6_remove_down_to_one():
    """≙ test_remove_down_to_one: or collapses to its single surviving
    option (promoted to a plain constraint); belongsTo removed => ShapeB
    pruned."""
    dag = _reduce_with_query_paths({f"<{T6}property1>", f"<{T6}property3>"})
    assert len(dag.shapes) == 1
    cons = _by_path(dag.shapes[SHAPE_A].constraints)
    assert all(isinstance(c, RefConstraint) for c in cons)
    assert [(c.path, c.min) for c in cons] == [
        (f"<{T6}property1>", 3),
        (f"<{T6}property3>", 1),
    ]


def test_tc6_remove_all_or_constraints():
    """≙ test_remove_all_or_constraints: every or option removed => the
    constraint vanishes entirely."""
    dag = _reduce_with_query_paths({f"<{T6}property3>"})
    assert len(dag.shapes) == 1
    (c,) = dag.shapes[SHAPE_A].constraints
    assert isinstance(c, RefConstraint)
    assert c.path == f"<{T6}property3>" and c.min == 1


def test_tc6_remove_all_but_one_from_or():
    """≙ test_remove_all_but_one_from_or: single surviving (inverse,
    max-only) option promoted to a plain constraint."""
    dag = _reduce_with_query_paths({f"^<{T6}property2>"})
    assert len(dag.shapes) == 1
    (c,) = dag.shapes[SHAPE_A].constraints
    assert isinstance(c, RefConstraint)
    assert c.path == f"^<{T6}property2>"
    assert c.max == 0 and c.min is None and c.inverse is True
