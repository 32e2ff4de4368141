"""Property tests for the corpus-assembly operators: split bands
partition the hash range exactly; mix multiplicities follow
floor/ceil(epochs); int8 quantization bounds the cosine error.
Pure-numpy re-statements of the per-row arithmetic — no Ray session
needed (the Ray paths run the same vectorized kernels, covered by
test_mixing / test_knn_ivf)."""

import hypothesis.strategies as st
import numpy as np
from hypothesis import given, settings

from shaclapi_ray.pipelines.textstats import SAMPLE_KNUTH


@st.composite
def fraction_dicts(draw):
    k = draw(st.integers(min_value=1, max_value=5))
    raw = draw(
        st.lists(
            st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
            min_size=k,
            max_size=k,
        )
    )
    total = sum(raw)
    names = [f"s{i}" for i in range(k)]
    return {n: r / total for n, r in zip(names, raw)}


@given(fraction_dicts(), st.integers(0, 1000), st.integers(1, 300))
@settings(max_examples=40, deadline=None)
def test_split_bands_partition_every_row_exactly_once(fractions, seed, n):
    """Every doc_id lands in EXACTLY one band regardless of float
    rounding in the thresholds (the last band is clamped to 2^32)."""
    names = list(fractions)
    edges = np.cumsum([int(fractions[m] * (1 << 32)) for m in names])
    edges[-1] = 1 << 32
    ids = np.arange(n, dtype=np.int64)
    h = ((ids + seed) * SAMPLE_KNUTH) % (1 << 32)
    band = np.searchsorted(edges, h, side="right")
    assert (band >= 0).all() and (band < len(names)).all()
    # band index i covers [edges[i-1], edges[i])
    lo = np.concatenate(([0], edges[:-1]))
    assert (h >= lo[band]).all() and (h < edges[band]).all()


@given(
    st.floats(min_value=0.0, max_value=4.0, allow_nan=False),
    st.integers(0, 100),
    st.integers(1, 200),
)
@settings(max_examples=40, deadline=None)
def test_mix_multiplicity_is_floor_or_ceil_of_epochs(e, seed, n):
    """Each doc appears floor(e) or floor(e)+1 times, and the expected
    total is n*e within binomial tolerance (deterministic hash, so the
    exact count equals the threshold-filter count)."""
    from shaclapi_ray.pipelines.mixing import _frac_threshold, mix_salt

    full = int(e)
    frac = e - full
    ids = np.arange(n, dtype=np.int64)
    count = np.full(n, full, dtype=np.int64)
    if frac > 1e-12:
        salt = mix_salt(seed, 0, full)
        h = ((ids + salt) * SAMPLE_KNUTH) % (1 << 32)
        count += (h < _frac_threshold(frac)).astype(np.int64)
    assert ((count == full) | (count == full + 1)).all()
    if frac <= 1e-12:
        assert (count == full).all()


@given(st.integers(0, 2**31), st.integers(1, 64), st.integers(1, 128))
@settings(max_examples=30, deadline=None)
def test_quantization_cosine_error_bound(seed, n, dim):
    """Symmetric int8 quantization keeps cosine(original, dequantized)
    above 1 - dim/(2*127^2) - slack for random normal vectors."""
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    amax = np.abs(mat).max(axis=1)
    safe = np.where(amax > 0, amax / 127.0, 1.0)
    q = np.rint(mat / safe[:, None]).astype(np.int8)
    back = q.astype(np.float64) * safe[:, None]
    a = mat.astype(np.float64)
    na = np.linalg.norm(a, axis=1)
    nb = np.linalg.norm(back, axis=1)
    ok = (na > 0) & (nb > 0)
    cos = (a[ok] * back[ok]).sum(axis=1) / (na[ok] * nb[ok])
    # worst-case per-component error is safe/2 = amax/254; for unit-ish
    # normal vectors that bounds cosine loss well above 0.99 at dim<=128
    assert (cos > 0.99).all()


def test_combine_partials_multi_driver_equals_shuffle(ray_session):
    """The two combine paths must agree exactly — mixed sum/min/max
    merge ops over multi-key partials (the shuffle path is what runs
    beyond DRIVER_MERGE_LIMIT, so it needs the same semantics)."""
    import pyarrow as pa
    import ray.data

    from shaclapi_ray.stages.aggregates import combine_partials_multi

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table(
        {
            "k1": pa.array(rng.integers(0, 7, n)),
            "k2": pa.array([f"g{i}" for i in rng.integers(0, 11, n)]),
            "s": pa.array(rng.integers(-100, 100, n)),
            "mn": pa.array(rng.integers(0, 1000, n)),
            "mx": pa.array(rng.normal(size=n)),
        }
    )
    aggs = {"s": "sum", "mn": "min", "mx": "max"}

    def run(mode):
        ds = ray.data.from_arrow(t).repartition(8)
        out = combine_partials_multi(ds, ["k1", "k2"], aggs, mode=mode)
        df = out.to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
        return df[["k1", "k2", "s", "mn", "mx"]]

    a, b = run("driver"), run("shuffle")
    assert len(a) == len(b)
    assert (a["k1"] == b["k1"]).all() and (a["k2"] == b["k2"]).all()
    assert (a["s"].astype("int64") == b["s"].astype("int64")).all()
    assert (a["mn"].astype("int64") == b["mn"].astype("int64")).all()
    assert np.allclose(a["mx"], b["mx"])
