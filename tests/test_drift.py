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


def test_tdigest_merge_many_order_insensitive():
    """merge_many is a pure function of the input centroid multiset —
    any permutation of the digests yields byte-identical results (the
    property the distributed groupby('host') merge relies on, since a
    shuffle delivers a group's rows in nondeterministic order)."""
    import numpy as np

    from shaclapi_ray.state.sketches import TDigest

    rng = np.random.default_rng(7)
    parts = []
    for _ in range(20):
        td = TDigest()
        td.add_array(rng.normal(size=500))
        parts.append(td)
    a = TDigest.merge_many(parts)
    b = TDigest.merge_many(parts[::-1])
    rng.shuffle(parts)
    c = TDigest.merge_many(parts)
    assert np.array_equal(a.means, b.means) and np.array_equal(a.weights, b.weights)
    assert np.array_equal(a.means, c.means) and np.array_equal(a.weights, c.weights)


def test_drift_many_hosts_distributed_merge(ray_session, tmp_path):
    """10k-host corpus: the per-host digest merge must happen inside the
    cluster (groupby('host') map_groups), with the driver merging only
    the <=64 bucket digests — TDigest.loads never runs in the driver
    process during _eval_drift except for those bucket rows. A planted
    5x-length host must still be flagged."""
    import os
    from unittest.mock import patch

    import numpy as np
    import pyarrow.parquet as _pq

    from shaclapi_ray.state.sketches import TDigest

    n_hosts, rows_per_host = 10_000, 5
    urls, texts = [], []
    for h in range(n_hosts):
        for r in range(rows_per_host):
            urls.append(f"https://h{h}.example.org/p{r}")
            # every unshifted host sees the SAME length sequence, so its
            # KS vs global is ~0 by construction (no statistical noise)
            body = "x" * (40 + 4 * r)
            texts.append(body * 5 if h == 77 else body)
    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * len(urls), pa.timestamp("us")),
            "html": pa.array([b""] * len(urls), pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }
    )
    path = str(tmp_path / "pages")
    os.makedirs(path)
    _pq.write_table(tbl, f"{path}/part-00000.parquet", row_group_size=5000)
    with open(f"{path}/_MANIFEST", "w") as f:
        f.write(str(len(urls)))

    shape = drift_shape(threshold=0.3)
    shape.constraints[0].partition_regex = r"https?://([^/]+)/"

    driver_loads = 0
    real_loads = TDigest.loads.__func__

    def counting_loads(cls, raw):
        nonlocal driver_loads
        driver_loads += 1
        return real_loads(cls, raw)

    with patch.object(TDigest, "loads", classmethod(counting_loads)):
        res = ValidationEngine([shape], JobConfig()).run(path)
        df = res.verdicts().to_pandas()
    verdicts = dict(zip(df.url, df.valid))
    assert len(verdicts) == n_hosts
    assert verdicts["host:h77.example.org"] == np.False_
    assert sum(verdicts.values()) == n_hosts - 1  # every unshifted host passes
    # driver-side loads bounded by the bucket count, not |hosts|x|batches|
    assert driver_loads <= 64
