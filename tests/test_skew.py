"""Skew fixture (FIXTURES.md): one hot referential key (host0 receives
~80% of upper-half links). The salted bucket join must produce verdicts
identical to the broadcast join on the same skewed input."""

import pytest

from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.fixtures import referential_schema
from shaclapi_ray.pagegen import generate_pages, row_link_targets


@pytest.fixture(scope="module")
def skewed_pages(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skew") / "pages")
    generate_pages(out, 600, skew=True)
    return out


def test_skew_fixture_is_skewed():
    targets = [
        t
        for i in range(300, 600)
        for t in row_link_targets(i, 600, skew=True)
        if "ghost" not in t
    ]
    host0 = sum("host0" in t for t in targets)
    assert host0 / len(targets) > 0.7  # hot key planted


def _verdicts(res, shape_id):
    df = res.verdicts().to_pandas()
    sub = df[df.shape_id == shape_id]
    return sorted(zip(sub.url, sub.valid))


def test_salted_join_identical_on_skewed_input(ray_session, skewed_pages):
    base = ValidationEngine(
        referential_schema(), JobConfig(ref_strategy="broadcast")
    ).run(skewed_pages)
    salted = ValidationEngine(
        referential_schema(),
        JobConfig(
            ref_strategy="bucket",
            combine_strategy="bucket",
            num_partitions=4,
            salt_k=4,
            bloom_prefilter=True,
        ),
    ).run(skewed_pages)
    assert _verdicts(base, "LinkedPageShape") == _verdicts(salted, "LinkedPageShape")
    assert _verdicts(base, "TargetPageShape") == _verdicts(salted, "TargetPageShape")
