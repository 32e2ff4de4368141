import numpy as np

from shaclapi_ray.state.sketches import (
    BloomFilter,
    HyperLogLog,
    TDigest,
    ks_statistic,
    psi_statistic,
)


def test_bloom_membership_and_merge():
    a = BloomFilter.sized(1000, 0.01)
    b = BloomFilter(m=a.m, k=a.k)
    xs = [f"https://host{i}.example.org/p/{i}" for i in range(500)]
    ys = [f"https://other{i}.example.org/q/{i}" for i in range(500, 1000)]
    a.add_array(xs)
    b.add_array(ys)
    a.merge(b)
    assert a.contains_array(xs).all()
    assert a.contains_array(ys).all()
    misses = a.contains_array([f"absent-{i}" for i in range(1000)])
    assert misses.mean() < 0.05  # fp rate in the ballpark


def test_bloom_serialization_roundtrip():
    a = BloomFilter.sized(100)
    a.add_array(["x", "y"])
    b = BloomFilter.loads(a.to_bytes())
    assert b.contains_array(["x", "y"]).all()
    assert not b.contains_array(["z"]).any()


def test_hll_estimate_and_merge():
    a, b = HyperLogLog(p=12), HyperLogLog(p=12)
    a.add_array([f"u{i}" for i in range(5000)])
    b.add_array([f"u{i}" for i in range(2500, 7500)])
    a.merge(b)
    est = a.estimate()
    assert abs(est - 7500) / 7500 < 0.1


def test_hll_merge_commutative():
    xs = [f"a{i}" for i in range(1000)]
    ys = [f"b{i}" for i in range(1000)]
    h1, h2 = HyperLogLog(p=10), HyperLogLog(p=10)
    h1.add_array(xs)
    h2.add_array(ys)
    m1 = HyperLogLog.loads(h1.to_bytes()).merge(h2)
    m2 = HyperLogLog.loads(h2.to_bytes()).merge(h1)
    assert np.array_equal(m1.registers, m2.registers)


def test_tdigest_quantiles():
    td = TDigest()
    rng = np.random.default_rng(42)
    data = rng.normal(100, 15, 20000)
    for chunk in np.array_split(data, 10):
        part = TDigest()
        part.add_array(chunk)
        td.merge(part)
    assert abs(td.quantile(0.5) - np.median(data)) < 1.0
    assert abs(td.quantile(0.9) - np.quantile(data, 0.9)) < 2.0


def test_ks_psi_detect_shift():
    a, b, c = TDigest(), TDigest(), TDigest()
    rng = np.random.default_rng(0)
    base = rng.normal(0, 1, 5000)
    a.add_array(base)
    b.add_array(rng.normal(0, 1, 5000))
    c.add_array(rng.normal(3, 1, 5000))  # strongly shifted
    assert ks_statistic(a, b) < 0.08
    assert ks_statistic(a, c) > 0.5
    assert psi_statistic(a, b) < 0.1
    assert psi_statistic(a, c) > 1.0


def test_cms_onesided_and_merge():
    from shaclapi_ray.state.sketches import CountMinSketch

    import pyarrow as pa

    rng = np.random.default_rng(7)
    vals = [f"host{i}.example" for i in rng.integers(0, 200, 5000)]
    vals += ["hot.example"] * 500
    full = CountMinSketch(width=2048, depth=4)
    full.add_array(pa.array(vals))
    # split-merge equals one-shot (layout independence)
    a = CountMinSketch(width=2048, depth=4)
    b = CountMinSketch(width=2048, depth=4)
    a.add_array(pa.array(vals[:2000]))
    b.add_array(pa.array(vals[2000:]))
    assert (a.merge(b).counts == full.counts).all()
    # one-sided error: estimate >= true, and tight for the heavy key
    import collections

    true = collections.Counter(vals)
    keys = list(true)
    est = full.estimate_array(pa.array(keys))
    exact = np.array([true[k] for k in keys])
    assert (est >= exact).all()
    assert est[keys.index("hot.example")] <= true["hot.example"] + 20
    # weighted adds == repeated adds
    w = CountMinSketch(width=2048, depth=4)
    w.add_array(pa.array(keys), weights=exact)
    assert (w.counts == full.counts).all()


def test_cms_serialization_roundtrip():
    from shaclapi_ray.state.sketches import CountMinSketch

    import pyarrow as pa

    c = CountMinSketch(width=128, depth=3)
    c.add_array(pa.array(["x", "y", "x"]))
    r = CountMinSketch.loads(c.to_bytes())
    assert (r.counts == c.counts).all()
    assert r.estimate_array(pa.array(["x"]))[0] == 2


def test_heavy_hitters_ray():
    import pyarrow as pa
    import ray.data as rd

    from shaclapi_ray.pipelines.profile import heavy_hitters

    rng = np.random.default_rng(3)
    hosts = [f"h{i}.net" for i in rng.integers(0, 50, 3000)] + ["big.net"] * 400
    ds = rd.from_arrow(pa.table({"host": pa.array(hosts)})).repartition(6)
    out = heavy_hitters(ds, "host", k=3)
    assert list(out.columns) == ["value", "n_exact", "n_cms"]
    assert out.loc[0, "value"] == "big.net" and out.loc[0, "n_exact"] == 400
    assert (out["n_cms"] >= out["n_exact"]).all()
    # layout independence of the whole operator
    out1 = heavy_hitters(
        rd.from_arrow(pa.table({"host": pa.array(hosts)})).repartition(1), "host", k=3
    )
    assert out.equals(out1)
