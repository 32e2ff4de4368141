"""Pluggable evaluation backends: named registry dispatch, unknown-name
failure surface, and fused/staged/auto verdict equivalence — the recast of
the reference's backend selection
(/root/reference/shaclapi/reduction/__init__.py:14-21)."""

import pytest

from shaclapi_ray.backends import (
    EvaluationBackend,
    get_backend,
    register_backend,
)
from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.fixtures import full_schema


def _verdict_set(result):
    t = result.verdicts().to_pandas()
    return set(zip(t.shape_id, t.url, t.valid))


def test_unknown_backend_raises():
    with pytest.raises(NotImplementedError, match="nope"):
        get_backend("nope")


def test_backend_equivalence(ray_session, small_pages_dir):
    """fused, staged and auto evaluators produce identical verdicts."""
    outs = {}
    for name in ("auto", "fused", "staged"):
        res = ValidationEngine(
            full_schema(), JobConfig(backend=name, target_shape="LinkedPageShape")
        ).run(small_pages_dir)
        outs[name] = _verdict_set(res)
    assert outs["fused"] == outs["staged"]
    assert outs["auto"] == outs["staged"]
    assert len(outs["staged"]) > 0


def test_staged_backend_takes_no_shapes(small_pages_dir):
    shapes = {s.shape_id: s for s in full_schema()}
    assert get_backend("staged").select_fused(shapes, JobConfig(), 600) == set()
    fused = get_backend("fused").select_fused(shapes, JobConfig(), 600)
    assert "LinkedPageShape" in fused


def test_backend_flows_through_api_config(ray_session, small_pages_dir):
    """The reference-style config dict selects the backend by name; an
    unknown name fails with the reference's error surface."""
    from shaclapi_ray import api

    base = {
        "schema_dir": "/root/repo/fixtures/schemas/full",
        "pages_dir": small_pages_dir,
        "target_shape": "LinkedPageShape",
    }
    out_staged = api.run_job({**base, "backend": "staged"})
    out_auto = api.run_job(base)
    assert out_staged["result"]["validTargets"] == out_auto["result"]["validTargets"]
    assert len(out_staged["result"]["validTargets"]) > 0
    with pytest.raises(NotImplementedError):
        api.run_job({**base, "backend": "s2spy-not-here"})


def test_custom_backend_dispatch(ray_session, small_pages_dir):
    """A registered third-party backend is actually consulted for both
    shape selection and evaluation."""
    calls = []

    class CountingBackend(EvaluationBackend):
        name = "counting"

        def select_fused(self, shapes, cfg, rows_hint):
            from shaclapi_ray.backends import FusedBackend

            return FusedBackend().select_fused(shapes, cfg, rows_hint)

        def eval_shape(self, pages_ref, shape, child_refs):
            calls.append(shape.shape_id)
            return super().eval_shape(pages_ref, shape, child_refs)

    register_backend(CountingBackend())
    res = ValidationEngine(
        full_schema(), JobConfig(backend="counting", target_shape="LinkedPageShape")
    ).run(small_pages_dir)
    baseline = ValidationEngine(
        full_schema(), JobConfig(backend="staged", target_shape="LinkedPageShape")
    ).run(small_pages_dir)
    assert calls == ["LinkedPageShape"]
    assert _verdict_set(res) == _verdict_set(baseline)
