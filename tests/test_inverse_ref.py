"""Inverse (inbound) referential constraints — the sh:inversePath analog
(/root/reference/tests/tc4/shapes/shapeA.ttl:8,
/root/reference/tests/tc6/shapes/shapeA.ttl:17): a page is valid by how
many links FROM child-valid pages point AT it, evaluated via a
groupby(target_url) over the links table."""

import pytest

from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.fixtures import inverse_schema
from shaclapi_ray.shapes.ir import PredicateConstraint, RefConstraint, Shape

from .test_advice_fixes import _page, _write_pages


@pytest.fixture(scope="module")
def inbound_pages(tmp_path_factory):
    # p1 (en) links p3 twice and p4 once; p2 (de, child-INVALID) links p4;
    # p5 has no inbound links at all
    rows = [
        _page("https://p1/", lang="en", links=["https://p3/", "https://p3/", "https://p4/"]),
        _page("https://p2/", lang="de", links=["https://p4/"]),
        _page("https://p3/"),
        _page("https://p4/"),
        _page("https://p5/"),
    ]
    return _write_pages(rows, str(tmp_path_factory.mktemp("inbound") / "pages"))


def _shapes(min_inbound: int):
    return [
        Shape(
            shape_id="Child",
            target=None,
            constraints=[
                PredicateConstraint(
                    name="lang_en", pred={"op": "==", "column": "lang", "value": "en"}
                )
            ],
        ),
        Shape(
            shape_id="Popular",
            target=None,
            constraints=[
                RefConstraint(
                    name="inbound", min=min_inbound, shape="Child", inverse=True
                )
            ],
        ),
    ]


def _vmap(res, shape_id):
    v = res.verdicts().to_pandas()
    sub = v[v.shape_id == shape_id]
    return dict(zip(sub.url, sub.valid))


@pytest.mark.parametrize("strategy", ["broadcast", "bucket", "auto"])
def test_inbound_counts_from_child_valid_sources(ray_session, inbound_pages, strategy):
    res = ValidationEngine(
        _shapes(1), JobConfig(ref_strategy=strategy)
    ).run(inbound_pages)
    # only p1 is child-valid (lang=en among linkers); p3 gets 2 inbound
    # edges, p4 gets 1 valid + 1 invalid-source edge => counts 1
    assert _vmap(res, "Popular") == {
        "https://p1/": False,
        "https://p2/": False,
        "https://p3/": True,
        "https://p4/": True,
        "https://p5/": False,
    }


def test_inbound_min2_counts_link_edges(ray_session, inbound_pages):
    # p3 has TWO inbound edges from p1 (edge multiset, not distinct
    # sources); p4 has one valid-source edge
    res = ValidationEngine(_shapes(2), JobConfig()).run(inbound_pages)
    vm = _vmap(res, "Popular")
    assert vm["https://p3/"] is True
    assert vm["https://p4/"] is False


def test_inverse_max_only_zero_inbound_is_valid(ray_session, inbound_pages):
    shapes = _shapes(1)
    shapes[1].constraints[0] = RefConstraint(
        name="at_most_one_inbound", max=1, shape="Child", inverse=True
    )
    res = ValidationEngine(shapes, JobConfig()).run(inbound_pages)
    vm = _vmap(res, "Popular")
    assert vm["https://p5/"] is True  # zero inbound satisfies max-only
    assert vm["https://p3/"] is False  # 2 inbound > max 1


@pytest.fixture(scope="module")
def skewed_pages(tmp_path_factory):
    from shaclapi_ray.pagegen import generate_pages

    out = str(tmp_path_factory.mktemp("inv_skew") / "pages")
    generate_pages(out, 600, skew=True)
    return out


def test_inverse_strategies_agree_on_skewed_input(ray_session, skewed_pages):
    """Hot inbound targets (host0 pages absorb ~80% of upper-half links in
    the skew fixture): broadcast, bucket, and salted-bucket paths must
    produce identical verdicts."""
    results = {}
    for name, cfg in {
        "broadcast": JobConfig(ref_strategy="broadcast"),
        "bucket": JobConfig(ref_strategy="bucket"),
        "salted": JobConfig(ref_strategy="bucket", salt_k=4),
    }.items():
        res = ValidationEngine(inverse_schema(), cfg).run(skewed_pages)
        v = res.verdicts().to_pandas()
        sub = v[v.shape_id == "PopularPageShape"]
        results[name] = sorted(zip(sub.url, sub.valid))
    assert results["broadcast"] == results["bucket"] == results["salted"]
    # the fixture must actually exercise both outcomes
    valids = {v for _, v in results["broadcast"]}
    assert valids == {True, False}
