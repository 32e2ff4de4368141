"""Referential incremental validation (r5, VERDICT r4 #1): incremental
== full-run equality for RefConstraint schemas under child-page edits /
adds / drops, including the cases verdict reuse alone cannot catch — an
UNCHANGED parent whose verdict flips because a child page it links to
changed (forward), an unchanged page whose inbound-link count flips
(inverse), and a two-hop chain (grandparent flips because the parent's
ref verdict flips). The full engine run over the new snapshot is the
oracle in every test."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.fixtures import (
    linked_page_shape,
    popular_page_shape,
    target_page_shape,
)
from shaclapi_ray.incremental import (
    incremental_validate,
    persist_validation_state,
)
from shaclapi_ray.shapes.ir import RefConstraint, Shape

N = 600
# rows whose warc_ts flips out of the valid window in v2: their OWN
# fingerprint changes, and every UNCHANGED parent linking to them must
# be revalidated via the blast radius (m=0 rows — no planted violations)
TS_FLIP = [100, 205, 310]
# rows whose html (links) is rewritten in v2
HTML_EDIT = [50, 151]
# rows dropped in v2 (several are link targets of surviving parents)
DROP = list(range(400, 410))
N_ADD = 5

OLD_TS = np.datetime64("1999-06-15T12:00:00", "us")


def _grand_shape() -> Shape:
    return Shape(
        shape_id="GrandShape",
        target={"op": "==", "column": "lang", "value": "de"},
        constraints=[
            RefConstraint(name="g_link", min=1, shape="LinkedPageShape")
        ],
    )


FWD = lambda: [target_page_shape(), linked_page_shape()]
INV = lambda: [target_page_shape(), popular_page_shape()]
CHAIN = lambda: [target_page_shape(), linked_page_shape(), _grand_shape()]


def _v1_frame() -> pd.DataFrame:
    import glob

    from shaclapi_ray.pagegen import generate_pages

    d = generate_pages("/tmp/incr_ref_pages/v1", N)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    return df.reset_index(drop=True)


def _v2_frame(v1: pd.DataFrame) -> pd.DataFrame:
    from shaclapi_ray.pagegen import row_canonical_url

    v2 = v1.copy()
    urls = v2["url"]

    def idx_of(i):
        m = urls[urls == row_canonical_url(i)].index
        assert len(m) == 1, i
        return m[0]

    for i in TS_FLIP:
        v2.loc[idx_of(i), "warc_ts"] = OLD_TS
    for i in HTML_EDIT:
        v2.loc[idx_of(i), "html"] = (
            f'<a href="{row_canonical_url(TS_FLIP[0])}">x</a>'
            f'<a href="{row_canonical_url(20)}">y</a>'
        ).encode()
    v2 = v2.drop([idx_of(i) for i in DROP])
    add = v1.iloc[:N_ADD].copy()
    add["url"] = [f"https://newhost.example.org/p/{i}" for i in range(N_ADD)]
    add["lang"] = "en"  # LinkedPageShape targets them
    add["html"] = [
        f'<a href="{row_canonical_url(20 + i)}">n</a>'.encode()
        for i in range(N_ADD)
    ]
    return pd.concat([v2, add], ignore_index=True)


def _write(df: pd.DataFrame, path: str) -> str:
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(path, "part0.parquet"),
    )
    return path


def _sorted_pd(ds, cols):
    return (
        ds.to_pandas()[cols]
        .sort_values(cols, kind="mergesort")
        .reset_index(drop=True)
    )


V_COLS = ["url", "shape_id", "valid", "reason"]
VIOL_COLS = ["url", "shape_id", "constraint", "offending_value"]


@pytest.fixture(scope="module")
def snaps(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("incr_ref")
    v1 = _v1_frame()
    v2 = _v2_frame(v1)
    return dict(
        base=base,
        v1_dir=_write(v1, str(base / "v1")),
        v2_dir=_write(v2, str(base / "v2")),
        v1=v1,
        v2=v2,
    )


def _persist_v1(snaps, shapes, name):
    from shaclapi_ray.io import read_parquet

    state = str(snaps["base"] / name)
    if not os.path.exists(os.path.join(state, "manifest.json")):
        res1 = ValidationEngine(shapes, JobConfig()).run(snaps["v1_dir"])
        persist_validation_state(state, read_parquet(snaps["v1_dir"]), res1)
    return state


def _full(shapes, pages_dir):
    res = ValidationEngine(shapes, JobConfig()).run(pages_dir)
    return _sorted_pd(res.verdicts(), V_COLS), _sorted_pd(res.violations(), VIOL_COLS)


def _assert_equal(inc, shapes, pages_dir):
    want_v, want_viol = _full(shapes, pages_dir)
    pd.testing.assert_frame_equal(_sorted_pd(inc.verdicts, V_COLS), want_v)
    pd.testing.assert_frame_equal(_sorted_pd(inc.violations, VIOL_COLS), want_viol)


def test_forward_ref_incremental_equals_full(snaps):
    from shaclapi_ray.io import read_parquet

    state = _persist_v1(snaps, FWD(), "state_fwd")
    inc = incremental_validate(
        FWD(),
        read_parquet(snaps["v2_dir"]),
        state,
        out_state_dir=str(snaps["base"] / "state_fwd2"),
    )
    _assert_equal(inc, FWD(), snaps["v2_dir"])
    st = inc.stats
    assert st["mode"] == "incremental"
    # the blast actually fired: unchanged parents of TS_FLIP/DROP
    # children revalidated beyond the fingerprint delta...
    assert st["n_blast"] > 0
    # ...while most of the corpus was still reused
    assert st["n_delta"] < st["n_new_corpus"] / 2
    assert st["n_removed"] == len(DROP)


def test_inverse_ref_incremental_equals_full(snaps):
    from shaclapi_ray.io import read_parquet

    state = _persist_v1(snaps, INV(), "state_inv")
    inc = incremental_validate(INV(), read_parquet(snaps["v2_dir"]), state)
    _assert_equal(inc, INV(), snaps["v2_dir"])
    assert inc.stats["n_blast"] > 0


def test_two_hop_chain_incremental_equals_full(snaps):
    """TS_FLIP children flip TargetPageShape; LinkedPageShape parents
    flip without changing; GrandShape grandparents linking to THOSE
    parents flip two hops from any fingerprint change — the fixpoint
    propagation case."""
    from shaclapi_ray.io import read_parquet

    state = _persist_v1(snaps, CHAIN(), "state_chain")
    inc = incremental_validate(CHAIN(), read_parquet(snaps["v2_dir"]), state)
    _assert_equal(inc, CHAIN(), snaps["v2_dir"])
    assert inc.stats["n_blast"] > 0


def test_second_hop_roundtrips_links_state(snaps):
    """v2 -> v3 using the state the FIRST incremental hop persisted:
    the merged links table (old minus changed/removed, plus fresh delta
    links) must reproduce full-run verdicts for a v3 that perturbs a
    page whose links were rewritten in v2 AND a page only the v2-added
    rows link to."""
    from shaclapi_ray.io import read_parquet
    from shaclapi_ray.pagegen import row_canonical_url

    state2 = str(snaps["base"] / "state_fwd2")
    if not os.path.exists(os.path.join(state2, "manifest.json")):
        pytest.skip("first-hop state missing (run order)")
    v3 = snaps["v2"].copy()
    # flip a target the v2-edited html (HTML_EDIT) points at -> blast
    # must find the editor through the MERGED (fresh) links rows
    t20 = v3["url"] == row_canonical_url(20)
    v3.loc[t20, "warc_ts"] = OLD_TS
    v3_dir = _write(v3, str(snaps["base"] / "v3"))
    inc = incremental_validate(FWD(), read_parquet(v3_dir), state2)
    _assert_equal(inc, FWD(), v3_dir)
    assert inc.stats["n_blast"] > 0


def test_full_fallback_above_ratio(snaps):
    from shaclapi_ray.io import read_parquet

    state = _persist_v1(snaps, FWD(), "state_fwd")
    inc = incremental_validate(
        FWD(),
        read_parquet(snaps["v2_dir"]),
        state,
        out_state_dir=str(snaps["base"] / "state_fb"),
        full_run_ratio=0.0,
    )
    assert inc.stats["mode"] == "full_fallback"
    _assert_equal(inc, FWD(), snaps["v2_dir"])
    # fallback persisted usable state: a no-change second hop reuses
    # everything except the colliding ''/null url keys, which
    # deterministically revalidate (incremental._url_key contract)
    inc2 = incremental_validate(
        FWD(), read_parquet(snaps["v2_dir"]), str(snaps["base"] / "state_fb")
    )
    k2 = snaps["v2"]["url"].fillna("null")
    n_colliding = len(set(k2[k2.duplicated(keep=False)]))
    assert inc2.stats["n_delta"] <= max(n_colliding, 1) + inc2.stats["n_blast"]
    assert inc2.stats["n_delta"] < inc2.stats["n_new_corpus"] / 10
    _assert_equal(inc2, FWD(), snaps["v2_dir"])


def test_forward_ref_join_strategy_equals_broadcast(snaps):
    """The fingerprint-delta 'join' strategy (beyond-FP_BROADCAST_LIMIT
    path) composed with the referential blast radius must produce the
    same verdicts as broadcast — and as the full run."""
    from shaclapi_ray.io import read_parquet

    state = _persist_v1(snaps, FWD(), "state_fwd")
    inc_b = incremental_validate(
        FWD(), read_parquet(snaps["v2_dir"]), state, strategy="broadcast"
    )
    inc_j = incremental_validate(
        FWD(), read_parquet(snaps["v2_dir"]), state, strategy="join"
    )
    vb = _sorted_pd(inc_b.verdicts, V_COLS)
    vj = _sorted_pd(inc_j.verdicts, V_COLS)
    pd.testing.assert_frame_equal(vb, vj)
    _assert_equal(inc_j, FWD(), snaps["v2_dir"])
    assert inc_j.stats["n_blast"] > 0
