"""Incremental cross-snapshot validation (shaclapi_ray/incremental.py):
verdicts/violations must equal a full revalidation of the new snapshot,
only delta rows may enter the engine, broadcast == join strategy, and
unsafe schemas / stale state refuse loudly."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.fixtures import (
    fresh_page_shape,
    lang_shape,
    target_page_shape,
    url_shape,
)
from shaclapi_ray.incremental import (
    incremental_validate,
    persist_validation_state,
)

SHAPES = lambda: [url_shape(), fresh_page_shape(), lang_shape(), target_page_shape()]

N_LANG, N_TEXT, N_NEW, N_DROP = 30, 20, 25, 15


def _v1_frame() -> pd.DataFrame:
    from shaclapi_ray.pagegen import generate_pages

    d = generate_pages("/tmp/incr_pages/v1", 600)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    return df.sort_values("url").reset_index(drop=True)


def _v2_frame(v1: pd.DataFrame) -> pd.DataFrame:
    v2 = v1.copy()
    v2.loc[v2.index[:N_LANG], "lang"] = "zz"  # flips LangShape
    v2.loc[v2.index[N_LANG : N_LANG + N_TEXT], "text"] = "x"  # flips len rule
    drop_idx = v2.index[N_LANG + N_TEXT : N_LANG + N_TEXT + N_DROP]
    v2 = v2.drop(drop_idx)
    new = v1.iloc[: N_NEW].copy()
    new["url"] = [f"https://new{i}.example.org/p" for i in range(N_NEW)]
    return pd.concat([v2, new], ignore_index=True)


def _write(df: pd.DataFrame, path: str) -> str:
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(path, "part0.parquet"))
    return path


def _sorted_pd(ds, cols):
    return (
        ds.to_pandas()[cols]
        .sort_values(cols, kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def snapshots(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("incr")
    v1 = _v1_frame()
    v2 = _v2_frame(v1)
    v1_dir = _write(v1, str(base / "v1"))
    v2_dir = _write(v2, str(base / "v2"))
    res1 = ValidationEngine(SHAPES(), JobConfig()).run(v1_dir)
    state = str(base / "state")
    from shaclapi_ray.io import read_parquet

    persist_validation_state(state, read_parquet(v1_dir), res1)
    return dict(
        base=base, v1_dir=v1_dir, v2_dir=v2_dir, state=state, v1=v1, v2=v2
    )


def _full_v2(snapshots):
    res = ValidationEngine(SHAPES(), JobConfig()).run(snapshots["v2_dir"])
    return (
        _sorted_pd(res.verdicts(), ["url", "shape_id", "valid", "reason"]),
        _sorted_pd(
            res.violations(), ["url", "shape_id", "constraint", "offending_value"]
        ),
    )


def test_incremental_equals_full(snapshots):
    from shaclapi_ray.io import read_parquet

    inc = incremental_validate(
        SHAPES(),
        read_parquet(snapshots["v2_dir"]),
        snapshots["state"],
        out_state_dir=str(snapshots["base"] / "state2"),
    )
    want_v, want_viol = _full_v2(snapshots)
    got_v = _sorted_pd(inc.verdicts, ["url", "shape_id", "valid", "reason"])
    got_viol = _sorted_pd(
        inc.violations, ["url", "shape_id", "constraint", "offending_value"]
    )
    pd.testing.assert_frame_equal(got_v, want_v)
    pd.testing.assert_frame_equal(got_viol, want_viol)
    # only the perturbed + new keys entered the engine, plus any key
    # that collides in the state (null/duplicate urls always revalidate
    # — deterministic conservatism, see incremental._url_key)
    v1, v2 = snapshots["v1"], snapshots["v2"]
    k1 = v1.url.fillna("null")
    k2 = v2.url.fillna("null")
    perturbed = set(k2.iloc[: N_LANG + N_TEXT]) | set(k2.iloc[-N_NEW:])
    dup_old = set(k1[k1.duplicated(keep=False)])
    expected = perturbed | (dup_old & set(k2))
    assert inc.stats["n_delta"] == len(expected)
    assert inc.stats["n_unchanged"] == inc.stats["n_new_corpus"] - len(expected)


def test_second_hop_no_changes(snapshots):
    """Rerunning against the state persisted by the first incremental
    hop with an identical corpus revalidates nothing and still equals
    the full run."""
    from shaclapi_ray.io import read_parquet

    state2 = str(snapshots["base"] / "state2")
    if not os.path.exists(os.path.join(state2, "manifest.json")):
        incremental_validate(
            SHAPES(),
            read_parquet(snapshots["v2_dir"]),
            snapshots["state"],
            out_state_dir=state2,
        )
    inc = incremental_validate(
        SHAPES(), read_parquet(snapshots["v2_dir"]), state2
    )
    # only keys that collide (null/duplicate urls) revalidate on an
    # identical corpus; everything else reuses
    k2 = snapshots["v2"].url.fillna("null")
    expected = set(k2[k2.duplicated(keep=False)])
    assert inc.stats["n_delta"] == len(expected)
    if not expected:
        assert inc.delta_result is None
    want_v, _ = _full_v2(snapshots)
    got_v = _sorted_pd(inc.verdicts, ["url", "shape_id", "valid", "reason"])
    pd.testing.assert_frame_equal(got_v, want_v)


def test_join_strategy_identical(snapshots):
    from shaclapi_ray.io import read_parquet

    a = incremental_validate(
        SHAPES(), read_parquet(snapshots["v2_dir"]), snapshots["state"]
    )
    b = incremental_validate(
        SHAPES(),
        read_parquet(snapshots["v2_dir"]),
        snapshots["state"],
        strategy="join",
    )
    cols = ["url", "shape_id", "valid", "reason"]
    pd.testing.assert_frame_equal(_sorted_pd(a.verdicts, cols), _sorted_pd(b.verdicts, cols))
    assert a.stats == b.stats


def test_refuses_unique_and_drift_shapes(snapshots):
    """r5: referential DAGs are incremental-capable (see
    test_incremental_referential.py); only the truly global constraints
    — unique, drift — still refuse (no bounded revalidation set)."""
    from shaclapi_ray.fixtures import drift_shape, unique_url_shape
    from shaclapi_ray.io import read_parquet

    for shape in (unique_url_shape(), drift_shape()):
        with pytest.raises(ValueError, match="aggregates over ALL rows"):
            incremental_validate(
                [shape],
                read_parquet(snapshots["v2_dir"]),
                snapshots["state"],
            )


def test_referential_against_column_state_refuses_stale(snapshots):
    """A referential schema against state persisted for a column-only
    schema must refuse as STALE (no links table there), never silently
    compute."""
    from shaclapi_ray.fixtures import linked_page_shape, target_page_shape
    from shaclapi_ray.io import read_parquet

    with pytest.raises(ValueError, match="stale"):
        incremental_validate(
            [target_page_shape(), linked_page_shape()],
            read_parquet(snapshots["v2_dir"]),
            snapshots["state"],
        )


def test_refuses_stale_state(snapshots):
    from shaclapi_ray.io import read_parquet

    with pytest.raises(ValueError, match="stale"):
        incremental_validate(
            [url_shape(), lang_shape()],  # different shape set
            read_parquet(snapshots["v2_dir"]),
            snapshots["state"],
        )
