"""Planted-drift detection: a host whose text-length distribution is
shifted must fail the DriftShape KS check while unshifted hosts pass
(FIXTURES.md S8)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.fixtures import drift_shape


@pytest.fixture(scope="module")
def drifted_pages(tmp_path_factory):
    """600-row pages table where host7 rows get 5x text length."""
    from shaclapi_ray.pagegen import _build_chunk

    out = tmp_path_factory.mktemp("drift")
    tbl = _build_chunk(0, 600, 600)
    texts = tbl["text"].to_pylist()
    urls = tbl["url"].to_pylist()
    for i in range(600):
        if urls[i] and "host7" in urls[i]:
            texts[i] = texts[i] * 5  # shift the length distribution
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
    )
    path = str(out / "pages")
    import os

    os.makedirs(path)
    pq.write_table(tbl, f"{path}/part-00000.parquet", row_group_size=200)
    with open(f"{path}/_MANIFEST", "w") as f:
        f.write("600")
    return path


def test_drift_flags_shifted_host(ray_session, drifted_pages):
    res = ValidationEngine([drift_shape(threshold=0.3)], JobConfig()).run(
        drifted_pages
    )
    df = res.verdicts().to_pandas()
    verdicts = dict(zip(df.url, df.valid))
    assert verdicts["host:host7.example.org"] == np.False_
    ok_hosts = [u for u, v in verdicts.items() if "host7" not in u and u != "host:"]
    assert all(verdicts[u] for u in ok_hosts)
    vio = res.violations().to_pandas()
    assert (vio.url == "host:host7.example.org").any()
    assert float(vio.iloc[0].offending_value) > 0.3
