"""Configuration sweep (≙ the reference's robustness matrix,
/root/reference/tests/test_main.py:166-213: every test × backend ×
prune × remove_constraints × replace_target_query × ... must not throw,
and semantics-preserving combos must agree on the target verdicts)."""

import pytest

from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.fixtures import full_schema, referential_schema


def _target_verdicts(res, shape_id):
    df = res.verdicts().to_pandas()
    sub = df[df.shape_id == shape_id]
    return sorted(zip(sub.url, sub.valid))


BASELINE = {}


@pytest.fixture(scope="module")
def baseline(ray_session, small_pages_dir):
    res = ValidationEngine(
        referential_schema(), JobConfig(target_shape="LinkedPageShape")
    ).run(small_pages_dir)
    return _target_verdicts(res, "LinkedPageShape")


@pytest.mark.parametrize("prune", [True, False])
@pytest.mark.parametrize("replace_target_query", [True, False])
@pytest.mark.parametrize(
    "ref_strategy,salt_k,bloom",
    [
        ("broadcast", 0, False),
        ("bucket", 0, False),
        ("bucket", 3, True),
    ],
)
def test_sweep_semantics_invariant(
    ray_session,
    small_pages_dir,
    baseline,
    prune,
    replace_target_query,
    ref_strategy,
    salt_k,
    bloom,
):
    """Execution-strategy and reduction options must not change the target
    shape's verdicts (they only change what else is computed / how)."""
    cfg = JobConfig(
        target_shape="LinkedPageShape",
        prune=prune,
        replace_target_query=replace_target_query,
        ref_strategy=ref_strategy,
        combine_strategy="bucket" if ref_strategy == "bucket" else "auto",
        salt_k=salt_k,
        bloom_prefilter=bloom,
        num_partitions=4,
    )
    res = ValidationEngine(full_schema(), cfg).run(small_pages_dir)
    assert _target_verdicts(res, "LinkedPageShape") == baseline


@pytest.mark.parametrize("agg_mode", ["driver", "shuffle"])
def test_sweep_agg_modes(ray_session, small_pages_dir, baseline, agg_mode):
    cfg = JobConfig(
        target_shape="LinkedPageShape",
        ref_strategy="bucket",
        combine_strategy="bucket",
        agg_mode=agg_mode,
        num_partitions=4,
    )
    res = ValidationEngine(referential_schema(), cfg).run(small_pages_dir)
    assert _target_verdicts(res, "LinkedPageShape") == baseline
