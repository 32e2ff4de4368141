"""Property test: host_boilerplate vs its DuckDB oracle on randomized
document tables built to collide — repeated paragraphs within and across
groups, NULL/'' texts and groups, single-doc groups, threshold-straddling
frequencies — on BOTH strategies (the broadcast sorted-void24 probe and
the hash-partitioned keyed-join tail must agree with SQL and each other)."""

import duckdb
import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import given, settings

from shaclapi_ray.pipelines.dedup import host_boilerplate, host_boilerplate_sql

_PARAS = st.sampled_from(["HEAD", "FOOT", "x", "yy", "日本", ""])
_TEXTS = st.one_of(
    st.none(),
    st.lists(_PARAS, min_size=0, max_size=4).map(lambda ps: "\n\n".join(ps)),
)
_GROUPS = st.sampled_from([None, "", "A", "B"])
_ROWS = st.lists(st.tuples(_TEXTS, _GROUPS), min_size=1, max_size=12)
_FRACS = st.sampled_from([(1, 2), (1, 3), (2, 3), (1, 1)])


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id").reset_index(drop=True)


@settings(max_examples=12, deadline=None)  # the join leg pays ~4 Dataset
# executions per example; 12 keeps the suite's wall-time budget
@given(rows=_ROWS, frac=_FRACS, min_docs=st.integers(min_value=1, max_value=3))
def test_host_boilerplate_matches_duckdb(ray_session, rows, frac, min_docs):
    docs = pa.table(
        {
            "doc_id": list(range(len(rows))),
            "text": pa.array([r[0] for r in rows], pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    con = duckdb.connect()
    con.register("documents", docs)
    kw = dict(min_docs=min_docs, frac_num=frac[0], frac_den=frac[1])
    exp = _norm(con.execute(host_boilerplate_sql(**kw)).df())
    for strategy in ("broadcast", "join"):
        out = _norm(
            host_boilerplate(
                ray.data.from_arrow(docs).repartition(3), strategy=strategy, **kw
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)
