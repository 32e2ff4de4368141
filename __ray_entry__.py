"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().

- entry(): flagship validation pipeline (referential shape schema) over the
  deterministic pages table derived from sf0.001.
- queries(): one entry per implemented operator/pipeline (SURVEY.md §2 +
  the training-data operators); each callable takes sf_dir.
- oracle_sql(): DuckDB-equivalent SQL per query (generated from the SAME
  shape IR via shaclapi_ray.oracles, so Ray code and SQL cannot drift).
  Pages-table oracles read the generated parquet via read_parquet();
  documents/embeddings/events use the driver's pre-registered views.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

KNN_QUERY_IDS = list(range(8))
KNN_K = 10
WINDOW_S = 300
HOP_S = 100
SESSION_GAP_S = 1800


def _pages(sf_dir: str) -> str:
    from shaclapi_ray.pagegen import ensure_pages

    return ensure_pages(sf_dir)


def _sorted(ds, cols):
    """Deterministic output ordering (small results only)."""
    import pandas as pd

    if hasattr(ds, "to_pandas"):
        df = ds.to_pandas()
    elif isinstance(ds, pd.DataFrame):
        df = ds
    else:  # pyarrow.Table
        df = ds.to_pandas()
    if df.empty and not set(cols) <= set(df.columns):
        return df  # empty Dataset.to_pandas() loses the schema
    return df.sort_values(cols, kind="mergesort").reset_index(drop=True)


# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: referential validation (LinkedPageShape -> TargetPageShape)
    over the sf0.001-derived pages table; returns the verdicts Dataset."""
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import referential_schema

    pages = _pages(SF001)
    res = ValidationEngine(
        referential_schema(), JobConfig(target_shape="LinkedPageShape")
    ).run(pages)
    return res.verdicts()


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------


def _shape_verdict_query(shape_fn):
    def q(sf_dir: str):
        from shaclapi_ray.engine import JobConfig, ValidationEngine

        res = ValidationEngine([shape_fn()], JobConfig()).run(_pages(sf_dir))
        return _sorted(res.verdicts().select_columns(["url", "valid"]), ["url", "valid"])

    return q


def _q_column_violations(sf_dir: str):
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import column_schema

    res = ValidationEngine(column_schema(), JobConfig()).run(_pages(sf_dir))
    return _sorted(res.violations(), ["url", "shape_id", "constraint"])


def _q_links(sf_dir: str):
    """Link extraction + the per-source outbound link profile
    (pipelines/anchors.outlink_profile — link-density / internal-link
    quality signals) as a kind-tagged union."""
    import pandas as pd
    import ray.data

    from shaclapi_ray.pipelines.anchors import outlink_profile
    from shaclapi_ray.stages.links import extract_links

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    ldf = extract_links(pages).to_pandas()
    link = pd.DataFrame(
        {
            "url": ldf["url"],
            "kind": "link",
            "value": ldf["target_url"],
            "extra": ldf["host"],
        }
    )
    pdf = outlink_profile(
        ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    ).to_pandas()
    prof = pd.DataFrame(
        {
            "url": pdf["url"],
            "kind": "profile",
            "value": pdf["n_pages"].astype(str)
            + "|"
            + pdf["n_links"].astype(str)
            + "|"
            + pdf["n_unique_hosts"].astype(str)
            + "|"
            + pdf["n_internal"].astype(str),
            "extra": "",
        }
    )
    return _sorted(
        pd.concat([link, prof], ignore_index=True), ["url", "kind", "value"]
    )


def _q_extract_text(sf_dir: str):
    import ray.data

    from shaclapi_ray.pipelines.extract import extract_text

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    return _sorted(extract_text(pages), ["url"])


def _q_url_canonicalize(sf_dir: str):
    import ray.data

    from shaclapi_ray.pipelines.extract import url_canonicalize

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url"])
    return _sorted(url_canonicalize(pages), ["url"])


def _q_linked_page_verdicts(sf_dir: str):
    """Forward referential verdicts, kind-tagged union (r5):
    kind='full' — one engine run over the pages table;
    kind='incref' — the SAME verdicts produced by REFERENTIAL
    INCREMENTAL validation (VERDICT r4 #1): a derived v1 snapshot
    (ts-shifted len%10==0 rows, len%10==3 rows absent) is fully
    validated, its state persisted (fingerprints + verdicts + links),
    and `incremental_validate` brings it to the real table — adds,
    changes, and the link blast radius all fire. Incremental == full
    run is the operator's contract, so the oracle is the same SQL
    twice; a hash match driver-checks the whole blast machinery."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from shaclapi_ray.engine import JobConfig, ValidationEngine, _filter_events
    from shaclapi_ray.fixtures import referential_schema

    res = ValidationEngine(
        referential_schema(), JobConfig(target_shape="LinkedPageShape")
    ).run(_pages(sf_dir))
    v = _filter_events(res.verdicts(), shape_id="LinkedPageShape").select_columns(
        ["url", "valid"]
    )
    full = _sorted(v, ["url", "valid"])
    full.insert(0, "kind", "full")

    OLD_TS_US = np.int64(-1_000_000_000_000_000)  # far outside the window

    def to_v1(batch: pa.Table) -> pa.Table:
        tl = (
            pc.utf8_length(pc.fill_null(batch["text"], ""))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            % 10
        )
        t = batch.filter(pa.array(tl != 3))
        tl2 = (
            pc.utf8_length(pc.fill_null(t["text"], ""))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            % 10
        )
        ts = (
            t["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
        )
        ts[tl2 == 0] = OLD_TS_US
        return t.set_column(
            t.schema.get_field_index("warc_ts"),
            "warc_ts",
            pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        )

    import ray.data

    from shaclapi_ray.incremental import (
        incremental_validate,
        persist_validation_state,
    )

    v1 = ray.data.read_parquet(_pages(sf_dir)).map_batches(
        to_v1, batch_format="pyarrow", zero_copy_batch=True
    )
    state = tempfile.mkdtemp(prefix="shaclapi_ray_incref_")
    try:
        r1 = ValidationEngine(
            referential_schema(), JobConfig(target_shape="LinkedPageShape")
        ).run(v1)
        persist_validation_state(state, v1, r1)
        inc = incremental_validate(
            referential_schema(),
            ray.data.read_parquet(_pages(sf_dir)),
            state,
            config=JobConfig(target_shape="LinkedPageShape"),
        )
        iv = inc.verdicts.to_pandas()
        iv = iv[iv["shape_id"] == "LinkedPageShape"][["url", "valid"]]
    finally:
        shutil.rmtree(state, ignore_errors=True)
    iv = iv.sort_values(["url", "valid"], kind="mergesort").reset_index(drop=True)
    iv.insert(0, "kind", "incref")
    return pd.concat([full, iv], ignore_index=True)


def _q_inverse_linked_verdicts(sf_dir: str):
    """Inverse (inbound) referential constraint — sh:inversePath analog."""
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import inverse_schema

    from shaclapi_ray.engine import _filter_events

    res = ValidationEngine(
        inverse_schema(), JobConfig(target_shape="PopularPageShape")
    ).run(_pages(sf_dir))
    v = _filter_events(res.verdicts(), shape_id="PopularPageShape").select_columns(
        ["url", "valid"]
    )
    return _sorted(v, ["url", "valid"])


def _q_unique_url_verdicts(sf_dir: str):
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import unique_url_shape

    res = ValidationEngine([unique_url_shape()], JobConfig()).run(_pages(sf_dir))
    return _sorted(res.verdicts().select_columns(["url", "valid"]), ["url", "valid"])


def _q_verdict_counts(sf_dir: str):
    """Per-shape valid/invalid counts (kind='counts') + the per-HOST
    violation rollup (kind='host': which hosts produce the violations,
    per shape — the ops-dashboard view) as a kind-tagged union over ONE
    engine run's verdict stream."""
    import pandas as pd

    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import column_schema

    res = ValidationEngine(column_schema(), JobConfig()).run(_pages(sf_dir))
    c = res.verdict_counts().to_pandas().assign(kind="counts", host="")
    c["valid"] = c["valid"].map({True: "true", False: "false"})
    c["n_valid"] = -1
    c["n_invalid"] = -1
    r = res.verdict_rollup().to_pandas().assign(kind="host", valid="", n=-1)
    cols = ["kind", "shape_id", "host", "valid", "n", "n_valid", "n_invalid"]
    return (
        pd.concat([c[cols], r[cols]], ignore_index=True)
        .sort_values(["kind", "shape_id", "host", "valid"])
        .reset_index(drop=True)
    )


def _q_reduce_schema(sf_dir: str):
    import pandas as pd

    from shaclapi_ray.fixtures import full_schema
    from shaclapi_ray.shapes.dag import ConstraintDAG

    dag = ConstraintDAG.from_shapes(full_schema()).reduce(["LinkedPageShape"])
    return pd.DataFrame({"shape_id": sorted(dag.shapes)})


def _q_annotated_pages(sf_dir: str):
    import ray.data

    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import fresh_page_shape

    pages_dir = _pages(sf_dir)
    res = ValidationEngine(
        [fresh_page_shape()], JobConfig(target_shape="FreshPageShape")
    ).run(pages_dir)
    pages = ray.data.read_parquet(pages_dir, columns=["url", "lang"])
    ann = res.annotate(pages).to_pandas()[["url", "lang", "valid", "reason"]]
    return ann.sort_values(
        ["url", "lang"], na_position="first", kind="mergesort"
    ).reset_index(drop=True)


def _q_drift_verdicts(sf_dir: str):
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import drift_shape

    res = ValidationEngine([drift_shape()], JobConfig()).run(_pages(sf_dir))
    return _sorted(res.verdicts().select_columns(["url", "valid"]), ["url", "valid"])


# the DELTA fixture srcs carry only these three columns; the profile-drift
# slot part profiles exactly them on both sides
DRIFT_PROFILE_COLUMNS = {"url": "string", "warc_ts": "timestamp", "text": "string"}


def _delta_side_ds(sf_dir: str, which: str):
    """The snapshot-delta fixture's derived crawls as Datasets: old drops
    len(text)%10==DELTA_DROP_OLD rows, new drops ==DELTA_DROP_NEW and
    appends ' v2' to ==DELTA_CHANGE texts (null text drops from both —
    matching the SQL srcs' WHERE NULL semantics). Shared by the
    kind='delta' part of extract_canonicalize and the kind='profile'
    part of psi_drift."""
    import polars as pl
    import ray.data

    def fn(batch):
        df = pl.from_arrow(batch)
        ln = pl.col("text").str.len_chars().cast(pl.Int64)
        if which == "old":
            return df.filter((ln % 10 != DELTA_DROP_OLD).fill_null(False)).to_arrow()
        df = df.filter((ln % 10 != DELTA_DROP_NEW).fill_null(False))
        return df.with_columns(
            pl.when(ln % 10 == DELTA_CHANGE)
            .then(pl.col("text") + " v2")
            .otherwise(pl.col("text"))
            .alias("text")
        ).to_arrow()

    return ray.data.read_parquet(
        _pages(sf_dir), columns=["url", "warc_ts", "text"]
    ).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_profile_columns(sf_dir: str):
    """Column profile (kind='stat') + Deequ-style constraint suggestions
    derived from it (kind='suggest': not_null / unique / low_card /
    value_range rows with -1 / '' stat fills) as a kind-tagged union —
    the profiler and its forward companion to the reference's schema
    reduction in one slot."""
    import pandas as pd
    import ray.data

    from shaclapi_ray.pipelines.profile import profile_columns, suggest_constraints

    prof = profile_columns(ray.data.read_parquet(_pages(sf_dir)))
    stat = prof.assign(kind="stat", rule="", param="")
    sugg = suggest_constraints(prof).assign(
        kind="suggest",
        n_rows=-1,
        n_nulls=-1,
        n_distinct=-1,
        min_v="",
        max_v="",
        avg_len=-1.0,
    )
    cols = [
        "kind",
        "column",
        "rule",
        "param",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_v",
        "max_v",
        "avg_len",
    ]
    return (
        pd.concat([stat[cols], sugg[cols]], ignore_index=True)
        .sort_values(["kind", "column", "rule"])
        .reset_index(drop=True)
    )


def _q_psi_drift(sf_dir: str):
    """Per-host PSI of the text-length distribution (kind='psi') +
    Deequ-style profile anomaly detection between the DELTA fixture's two
    derived crawls (kind='profile': row_count / null_rate /
    distinct_ratio / range_expansion per column with exact
    cross-multiplied tolerances) — value-level and schema-level drift in
    one slot."""
    import pandas as pd
    import ray.data

    from shaclapi_ray.pipelines.profile import profile_drift, psi_drift

    p = psi_drift(
        ray.data.read_parquet(_pages(sf_dir), columns=["url", "warc_ts", "text"])
    ).assign(kind="psi", check="", old_v="", new_v="")
    p = p.rename(columns={"host": "name"})
    d = profile_drift(
        _delta_side_ds(sf_dir, "old"),
        _delta_side_ds(sf_dir, "new"),
        columns=DRIFT_PROFILE_COLUMNS,
    ).assign(kind="profile", n_ref=-1, n_cur=-1, psi=-1.0)
    d = d.rename(columns={"column": "name"})
    cols = [
        "kind",
        "name",
        "check",
        "n_ref",
        "n_cur",
        "psi",
        "drifted",
        "old_v",
        "new_v",
    ]
    return (
        pd.concat([p[cols], d[cols]], ignore_index=True)
        .sort_values(["kind", "name", "check"])
        .reset_index(drop=True)
    )


def _q_pagerank(sf_dir: str):
    import ray.data

    from shaclapi_ray.pipelines.graph import pagerank

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    return _sorted(pagerank(pages), ["url"])


def _q_link_components(sf_dir: str):
    import ray.data

    from shaclapi_ray.pipelines.graph import connected_components

    # auto: union-find under CC_LOCAL_EDGE_LIMIT edges; the any-scale
    # 'propagate' path is equivalence-tested in tests/test_graph.py
    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    return _sorted(connected_components(pages, strategy="auto"), ["url"])


def _q_hll_distinct_urls(sf_dir: str):
    """Sketch estimates as a (kind, key, value) tagged union (golden):
    kind='hll_distinct_urls' — merged HLL url-cardinality estimate;
    kind='cms_host' / 'host_exact' — Count-Min estimated vs exact counts
    of the top-5 linked hosts (profile.heavy_hitters), side by side so
    the sketch's one-sided error is pinned by the golden."""
    import pandas as pd
    import ray.data

    from shaclapi_ray.io import read_parquet
    from shaclapi_ray.pipelines.profile import heavy_hitters
    from shaclapi_ray.stages.links import extract_links
    from shaclapi_ray.state.sketches import HyperLogLog

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url"])

    def partial(batch):
        import pyarrow as pa

        h = HyperLogLog(p=12)
        h.add_array(batch["url"])
        return pa.table({"sketch": pa.array([h.to_bytes()], type=pa.binary())})

    merged = HyperLogLog(p=12)
    for b in pages.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b["sketch"].to_pylist():
            merged.merge(HyperLogLog.loads(raw))

    hosts = extract_links(read_parquet(_pages(sf_dir), columns=["url", "html"]))
    hh = heavy_hitters(hosts, "host", k=5)
    out = pd.concat(
        [
            pd.DataFrame(
                {
                    "kind": ["hll_distinct_urls"],
                    "key": [""],
                    "value": [int(round(merged.estimate()))],
                }
            ),
            pd.DataFrame(
                {"kind": "cms_host", "key": hh["value"], "value": hh["n_cms"]}
            ),
            pd.DataFrame(
                {"kind": "host_exact", "key": hh["value"], "value": hh["n_exact"]}
            ),
        ],
        ignore_index=True,
    )
    out["value"] = out["value"].astype("int64")
    return _sorted(out, ["kind", "key"])


# documents / embeddings / events ------------------------------------------


def _docs(sf_dir: str):
    from shaclapi_ray.io import read_table_split

    return read_table_split(f"{sf_dir}/documents.parquet")


def _q_token_count(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import token_count

    return _sorted(token_count(_docs(sf_dir)), ["doc_id"])


SAMPLE_FRACTION = 0.35


STRAT_FRACTIONS = {"en": 0.15, "zh": 0.9, "de": 0.5}  # default 0.25 for the rest
MIX_EPOCHS = {"all": 0.35, "en": 1.6}  # weighted corpus mix: sources all/en
MIX_SEED = 5
SPLIT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}
SPLIT_SEED = 2
# domain blocklist for the filter_hosts slot component: host3.example.org
# exists in the generated pages table; spam.example.net does not
# (exercises the no-match branch)
BLOCKED_HOSTS = ["host3.example.org", "spam.example.net"]
# learned host-curation profile for the top_hosts slot: tuned to the
# SYNTHETIC fixture so the verdict is non-degenerate at sf0.001 AND
# sf0.01 (host3 blocked, the rest kept) — same rationale as
# CLEAN_LINES_KW/GOPHER_KW; integer-exact rules, no float thresholds
HOSTCURE_KW = dict(max_dup_pct=10, min_mean_tokens=310, min_docs=100)
# per-host page cap for the top_hosts slot's kind='cap' part: fixture
# hosts carry ~180 docs at sf0.001 and ~1800 at sf0.01, so K=120 caps
# every real host at BOTH scales while keeping the ''/null-url groups
# intact (non-degenerate in each direction)
CAP_K = 120
# snapshot_delta fixture: the two crawl snapshots derive from the SAME
# pages table by deterministic char-length mod rules (SQL-expressible,
# scale-independent): old drops len(text)%10==3 rows (-> 'added'), new
# drops %10==7 (-> 'removed') and appends ' v2' to %10==0 texts
# (-> 'changed'); everything else is 'unchanged' — all four statuses
# present at every scale
DELTA_DROP_OLD = 3
DELTA_DROP_NEW = 7
DELTA_CHANGE = 0
# host_boilerplate profile for the exact_dedup slot's hb_* columns: the
# fixture documents have NO paragraph separators, so the paper-default
# sep='\n\n' would be a pass-through; sep=' ' makes "paragraphs" = words
# and the operator per-SOURCE ubiquitous-token removal — at 80%
# (frac 4/5) roughly half the (source, word) doc-frequency mass falls on
# each side of the threshold at sf0.001 AND sf0.01 (measured: bands
# cluster 0.6-0.9), non-degenerate in both directions; integer
# cross-multiplied threshold, no float ratio (CLEAN_LINES_KW rationale —
# don't "fix" sep back to the paper default)
HOSTBP_KW = dict(sep=" ", min_docs=2, frac_num=4, frac_den=5)
# bloom (counting-filter) paragraph-dedup profile for the exact_dedup
# slot's bf_* columns: word-level "paragraphs" are degenerate on this
# fixture (31-word vocabulary — every word globally duplicated) and
# whole-doc paragraphs never duplicate (texts are unique), so the
# separator is the literal ' the ' token — the resulting chunks split
# ~1200 unique / ~100-130 duplicated occurrences at sf0.001 AND sf0.01
# (measured), non-degenerate in both directions. m_bits=2^20 is
# collision-free for ~1300 chunks x k=4 probes (deterministic once
# verified — pinned by test_bloomdedup + the sf0.01 parity suite), which
# is what makes the EXACT drop-all SQL a valid oracle for the bloom path
BLOOM_KW = dict(sep=" the ", m_bits=1 << 20, k=4)
# url-quality profile for the extract_canonicalize slot's kind='urlq'
# part: fixture urls are "https://host{h}.example.org/p/{i}", so digits
# grow with the row index while length barely moves — max_digit_pct=16
# keeps every absolute url at sf0.001 (only the planted ''/null/
# scheme-less urls are dropped there) and splits sf0.01 roughly in half
# on the digit rule (i >= 10000 crosses 16%), non-degenerate with a
# different rule mix at each scale (CLEAN_LINES_KW rationale);
# integer-exact rules, no float thresholds
URLQ_KW = dict(max_len=2048, max_digit_pct=16, max_slashes=8)
# robots profile for the extract_canonicalize slot's kind='robots'
# part: fixture paths are "/p/{i}" with host = i%10, so "/p/1" on host1
# disallows i=1,11,1x1..(prefix growth) while the longer allow "/p/11"
# re-admits the 11-prefixed subset (longest-match override exercised at
# every scale); host4's "/" blocks the whole host; host7 mixes both
# rules AND carries the planted scheme-less urls (i%100==27 -> host
# index 7), so the non-absolute -> no-host -> allowed branch is live.
# Non-degenerate at sf0.001 and sf0.01 in both directions
# (tests/test_robots.py pins it).
ROBOTS_RULES = (
    ("host1.example.org", "disallow", "/p/1"),
    ("host1.example.org", "allow", "/p/11"),
    ("host4.example.org", "disallow", "/"),
    ("host7.example.org", "disallow", "/p/7"),
    ("host7.example.org", "allow", "/p/77"),
)


DSIR_K = 150


def _q_sample_corpus(sf_dir: str):
    """Uniform + stratified samplers + weighted corpus MIX + DSIR
    Gumbel-top-k importance resample as a kind-tagged union (the
    stratified sampler rebalances languages; the mix runs Pile-style
    source weighting — a full 'en' pass plus fractional passes; the
    DSIR part selects the DSIR_K docs most like the lang='en' target
    distribution; all four full code paths run)."""
    import pandas as pd

    from shaclapi_ray.pipelines.dsir import dsir_resample
    from shaclapi_ray.pipelines.mixing import MIX_COL, mix_corpora
    from shaclapi_ray.pipelines.textstats import sample_corpus, sample_stratified

    u = sample_corpus(_docs(sf_dir), SAMPLE_FRACTION).to_pandas()
    u.insert(0, "kind", "uniform")
    s = sample_stratified(_docs(sf_dir), STRAT_FRACTIONS, default=0.25).to_pandas()
    s.insert(0, "kind", "stratified")
    import pyarrow.compute as pc

    docs = _docs(sf_dir)
    en = docs.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")), batch_format="pyarrow"
    )
    m = mix_corpora({"all": docs, "en": en}, MIX_EPOCHS, seed=MIX_SEED).to_pandas()
    m.insert(0, "kind", "mix:" + m.pop(MIX_COL))
    from shaclapi_ray.pipelines.mixing import split_corpus

    sp = split_corpus(_docs(sf_dir), SPLIT_FRACTIONS, seed=SPLIT_SEED).to_pandas()
    sp.insert(0, "kind", "split:" + sp.pop("split"))
    d = dsir_resample(_docs(sf_dir), k=DSIR_K)
    d.insert(0, "kind", "dsir")
    return _sorted(
        pd.concat([u, s, m, sp, d], ignore_index=True), ["kind", "doc_id"]
    )


def _q_pii_scan(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import pii_scan

    return _sorted(pii_scan(_docs(sf_dir)), ["doc_id"])


def _q_normalize_text(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import normalize_text

    return _sorted(normalize_text(_docs(sf_dir)), ["doc_id"])


def _q_repetition_signals(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import repetition_signals

    return _sorted(repetition_signals(_docs(sf_dir)), ["doc_id"])


def _q_top_docs_per_lang(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import top_docs_per_group

    return _sorted(top_docs_per_group(_docs(sf_dir)), ["lang", "rank"])


def _q_quality_signals(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import quality_signals

    return _sorted(quality_signals(_docs(sf_dir)), ["doc_id"])


def _q_quantile_filter(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import quality_quantile_filter

    return _sorted(quality_quantile_filter(_docs(sf_dir), q=0.5), ["doc_id"])


def _q_lang_id(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import lang_id

    return _sorted(lang_id(_docs(sf_dir)), ["doc_id"])


def _q_fingerprint(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import fingerprint

    return _sorted(fingerprint(_docs(sf_dir)), ["doc_id"])


def _q_rolling_fingerprint(sf_dir: str):
    """Rolling Rabin-Karp fingerprint + zlib compression-ratio signals,
    joined on doc_id (both deterministic, no SQL analog — one pinned
    golden covers the pair)."""
    from shaclapi_ray.pipelines.textstats import (
        compression_signals,
        rolling_fingerprint,
    )

    fp = rolling_fingerprint(_docs(sf_dir)).to_pandas()
    cz = compression_signals(_docs(sf_dir)).to_pandas()
    return _sorted(fp.merge(cz, on="doc_id", how="inner"), ["doc_id"])


MIN_DF = 2


def _q_chunk_text(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import chunk_text

    return _sorted(chunk_text(_docs(sf_dir)), ["doc_id", "chunk_id"])


def _q_doc_frequency(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import doc_frequency

    return _sorted(doc_frequency(_docs(sf_dir), min_df=MIN_DF), ["token"])


def _q_inverted_index(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import inverted_index

    return _sorted(inverted_index(_docs(sf_dir), min_df=MIN_DF), ["token"])


def _q_unigram_logprob(sf_dir: str):
    """unigram_logprob + CCNet head/middle/tail bucketing (ccnet_buckets
    runs the full unigram scorer inside, then per-lang exact quantile
    cuts) + the interpolated-bigram LM score (one step up the CCNet
    n-gram family) — one slot exercises all three, all columns
    SQL-mirrored."""
    from shaclapi_ray.pipelines.textstats import bigram_logprob, ccnet_buckets

    out = ccnet_buckets(_docs(sf_dir)).to_pandas()
    bg = bigram_logprob(_docs(sf_dir)).to_pandas()[["doc_id", "bigram_logprob"]]
    out = out.merge(bg, on="doc_id", how="left")
    return _sorted(
        out[
            [
                "doc_id",
                "lang",
                "n_tokens",
                "logprob",
                "bigram_logprob",
                "score_q",
                "bucket",
            ]
        ],
        ["doc_id"],
    )


TFIDF_K = 5


def _q_tfidf_top_terms(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import tfidf_top_terms

    return _sorted(
        tfidf_top_terms(_docs(sf_dir), k=TFIDF_K, min_df=MIN_DF), ["doc_id", "rank"]
    )


def _q_rebalance_corpus(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import rebalance_corpus

    return _sorted(rebalance_corpus(_docs(sf_dir)), ["doc_id"])


def _q_decontaminate(sf_dir: str):
    from shaclapi_ray.pipelines.decontam import decontaminate

    return _sorted(decontaminate(_docs(sf_dir)), ["doc_id"])


PACK_SHARDS = 8
PACK_BUDGET = 512


def _q_dup_span_coverage(sf_dir: str):
    """dup_span_coverage + remove_dup_spans joined on doc_id (one shared
    window-union semantics — the removal's clean_text and n_removed are
    checked against the same SQL gram discovery), plus the COMPOSED
    five-stage preprocess_corpus flagship left-joined in (pp_text /
    pp_n_tokens; dropped docs get the deterministic '' / -1 fill so the
    value hash still covers which rows the chain removed)."""
    from shaclapi_ray.pipelines.preprocess import preprocess_corpus
    from shaclapi_ray.pipelines.spans import dup_span_coverage, remove_dup_spans

    cov = dup_span_coverage(_docs(sf_dir)).to_pandas()
    rem = remove_dup_spans(_docs(sf_dir)).to_pandas()
    out = cov.merge(rem.drop(columns=["n_tokens"]), on="doc_id", how="inner")
    pp = preprocess_corpus(_docs(sf_dir)).to_pandas()
    pp = pp.rename(columns={"text": "pp_text", "n_tokens": "pp_n_tokens"})
    out = out.merge(pp, on="doc_id", how="left")
    out["pp_text"] = out["pp_text"].fillna("")
    out["pp_n_tokens"] = out["pp_n_tokens"].fillna(-1).astype("int64")
    return _sorted(out, ["doc_id"])


def _q_pack_sequences(sf_dir: str):
    from shaclapi_ray.pipelines.spans import pack_sequences

    return _sorted(
        pack_sequences(_docs(sf_dir), n_shards=PACK_SHARDS, budget=PACK_BUDGET),
        ["doc_id"],
    )


def _q_exact_dedup(sf_dir: str):
    from shaclapi_ray.pipelines.dedup import exact_dedup

    return _sorted(exact_dedup(_docs(sf_dir)), ["doc_id"])


def _q_minhash_clusters(sf_dir: str):
    from shaclapi_ray.pipelines.dedup import minhash_lsh_clusters

    return _sorted(minhash_lsh_clusters(_docs(sf_dir)), ["doc_id"])


def _q_simhash(sf_dir: str):
    from shaclapi_ray.pipelines.dedup import simhash_signatures

    return _sorted(simhash_signatures(_docs(sf_dir)), ["doc_id"])


def _q_simhash_neardup(sf_dir: str):
    from shaclapi_ray.pipelines.dedup import simhash_neardup_pairs

    return _sorted(simhash_neardup_pairs(_docs(sf_dir)), ["a", "b"])


def _q_dedup_corpus(sf_dir: str):
    from shaclapi_ray.pipelines.dedup import dedup_corpus

    return _sorted(dedup_corpus(_docs(sf_dir)), ["doc_id"])


def _q_dedup_corpus_minhash(sf_dir: str):
    """Near-dup corpus materializers, kind-tagged union of BOTH scale
    strategies over the same documents table: kind='minhash' (LSH
    cluster reps) and kind='semantic' (SemDeDup — hash-embed + exact
    k-means + per-cluster cosine components, pipelines/cluster.py).
    Both deterministic across layouts -> one golden pins the pair."""
    import pandas as pd

    from shaclapi_ray.pipelines.dedup import dedup_corpus

    m = dedup_corpus(_docs(sf_dir), strategy="minhash").to_pandas()
    m.insert(0, "kind", "minhash")
    s = dedup_corpus(
        _docs(sf_dir), strategy="semantic", semantic_k=4, semantic_tau=0.995
    ).to_pandas()
    s.insert(0, "kind", "semantic")
    return _sorted(pd.concat([m, s], ignore_index=True), ["kind", "doc_id"])


def _q_ngram_jaccard(sf_dir: str):
    from shaclapi_ray.pipelines.dedup import ngram_jaccard_pairs

    return _sorted(ngram_jaccard_pairs(_docs(sf_dir)), ["a", "b"])


def _emb(sf_dir: str):
    from shaclapi_ray.io import read_table_split

    return read_table_split(f"{sf_dir}/embeddings.parquet")


EMB_NEARDUP_TAU = 0.45  # the synthetic embeddings' near-dup band (max sim ~0.51)


def _q_embedding_neardup(sf_dir: str):
    """Exact cosine-pair baseline (block-pair tasks, oracle-checked)."""
    from shaclapi_ray.pipelines.dedup import embedding_neardup_pairs

    return _sorted(
        embedding_neardup_pairs(_emb(sf_dir), tau=EMB_NEARDUP_TAU, method="bruteforce"),
        ["a", "b"],
    )


def _q_embedding_neardup_lsh(sf_dir: str):
    """Approximate embedding near-dup, BOTH scale paths, kind-tagged union:

    - kind='lsh': bucketed multi-table hyperplane LSH pairs (a, b),
      cluster=-1. Bucket-bit count must be sized to tau: P(bit agrees)
      = 1 - theta/pi, so at this fixture's LOW tau (0.45, theta ~63 deg)
      the default 12-bit buckets give ~3% recall by construction; 4
      planes x 12 tables puts recall near 0.8 here (measured 11/14 true
      pairs); the (12, 6) default is tuned for realistic tau >= 0.9.
    - kind='semantic': SemDeDup (pipelines/cluster.py) — exact-int64
      k-means partition + per-cluster cosine components; a=vec_id,
      b=rep_id (min id of the component; a==b means keep).
    Both deterministic across block layouts -> golden-pinnable; semantic
    correctness via tests/test_cluster.py (bruteforce equivalence) and
    tests/test_dedup.py (LSH recall)."""
    import pandas as pd

    from shaclapi_ray.pipelines.cluster import semantic_dedup
    from shaclapi_ray.pipelines.dedup import embedding_neardup_pairs

    lsh = embedding_neardup_pairs(
        _emb(sf_dir), tau=EMB_NEARDUP_TAU, method="lsh", n_planes=4, n_tables=12
    ).to_pandas()
    lsh.insert(0, "kind", "lsh")
    lsh["cluster"] = -1
    sem_raw = semantic_dedup(
        _emb(sf_dir), k=4, tau=EMB_NEARDUP_TAU, iters=8, seed=3
    ).to_pandas()
    sem = pd.DataFrame(
        {
            "kind": "semantic",
            "a": sem_raw["vec_id"].astype("int64"),
            "b": sem_raw["rep_id"].astype("int64"),
            "cluster": sem_raw["cluster"].astype("int64"),
        }
    )
    out = pd.concat([lsh, sem], ignore_index=True)
    out["cluster"] = out["cluster"].astype("int64")
    return _sorted(out, ["kind", "a", "b"])


def _q_embed_corpus(sf_dir: str):
    """Batched 'model inference' over documents (deterministic
    feature-hash encoder; rows-only check — float-vector output).
    Returns (doc_id, dim, norm) so the driver check is schema-stable."""
    import numpy as np
    import pandas as pd

    from shaclapi_ray.pipelines.knn import embed_corpus

    rows = []
    for b in embed_corpus(_docs(sf_dir)).iter_batches(batch_format="pyarrow"):
        m = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
        rows.append(
            pd.DataFrame(
                {
                    "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
                    "dim": m.shape[1] if m.ndim == 2 else 0,
                    "norm": np.round(np.linalg.norm(m, axis=1), 6)
                    if m.ndim == 2
                    else 0.0,
                }
            )
        )
    out = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
        {"doc_id": [], "dim": [], "norm": []}
    )
    return _sorted(out, ["doc_id"])


def _q_knn_bruteforce(sf_dir: str):
    from shaclapi_ray.pipelines.knn import knn_bruteforce

    return _sorted(
        knn_bruteforce(_emb(sf_dir), KNN_QUERY_IDS, k=KNN_K), ["query_id", "rank"]
    )


def _q_knn_ivf(sf_dir: str):
    """Approximate ANN, every compressed path, kind-tagged union:
    kind='ivf' — bucket-partitioned IVF probe (I/O-pruned);
    kind='pq' — product-quantized ADC search (pipelines/pq.py, 32×
    smaller codes);
    kind='ivfpq' — the combined IVF-PQ index probe (pipelines/pq.py:
    bucket pruning AND uint8 codes, the FAISS-IVFADC 100-TB layout);
    kind='ivfpq_res' — the same probe over a RESIDUAL-encoded index
    (codebooks fit on v - centroid, the full IVFADC scheme — strictly
    tighter quantization, r5 golden-pinned per VERDICT r4 #3).
    All deterministic -> one golden pins the quad."""
    import pandas as pd

    from shaclapi_ray.pipelines.knn import knn_ivf
    from shaclapi_ray.pipelines.pq import knn_ivf_pq, pq_search

    ivf = knn_ivf(_emb(sf_dir), KNN_QUERY_IDS, k=KNN_K)
    if hasattr(ivf, "to_pandas"):
        ivf = ivf.to_pandas()
    ivf.insert(0, "kind", "ivf")
    pq = pq_search(_emb(sf_dir), KNN_QUERY_IDS, k=KNN_K, m=8)
    if hasattr(pq, "to_pandas"):
        pq = pq.to_pandas()
    pq.insert(0, "kind", "pq")
    ivfpq = knn_ivf_pq(
        _emb(sf_dir),
        KNN_QUERY_IDS,
        k=KNN_K,
        m=8,
        index_dir=f"/tmp/shaclapi_ray_ivfpq_entry/{_sf_name(sf_dir)}",
    )
    if hasattr(ivfpq, "to_pandas"):
        ivfpq = ivfpq.to_pandas()
    ivfpq.insert(0, "kind", "ivfpq")
    ivfpq_res = knn_ivf_pq(
        _emb(sf_dir),
        KNN_QUERY_IDS,
        k=KNN_K,
        m=8,
        index_dir=f"/tmp/shaclapi_ray_ivfpq_res_entry/{_sf_name(sf_dir)}",
        residual=True,
    )
    if hasattr(ivfpq_res, "to_pandas"):
        ivfpq_res = ivfpq_res.to_pandas()
    ivfpq_res.insert(0, "kind", "ivfpq_res")
    return _sorted(
        pd.concat([ivf, pq, ivfpq, ivfpq_res], ignore_index=True),
        ["kind", "query_id", "rank"],
    )


def _events(sf_dir: str):
    from shaclapi_ray.io import read_table_split

    return read_table_split(f"{sf_dir}/events.parquet")


def _q_tumbling_window(sf_dir: str):
    from shaclapi_ray.pipelines.events import tumbling_window

    return _sorted(tumbling_window(_events(sf_dir), WINDOW_S), ["user_id", "window_start"])


def _q_drop_late_events(sf_dir: str):
    from shaclapi_ray.pipelines.events import drop_late_events

    return _sorted(drop_late_events(_events(sf_dir), WINDOW_S), ["event_id"])


def _q_hopping_window(sf_dir: str):
    from shaclapi_ray.pipelines.events import hopping_window

    return _sorted(
        hopping_window(_events(sf_dir), WINDOW_S, HOP_S), ["user_id", "window_start"]
    )


def _q_assign_sessions(sf_dir: str):
    from shaclapi_ray.pipelines.events import assign_sessions

    return _sorted(assign_sessions(_events(sf_dir), SESSION_GAP_S), ["event_id"])


def _q_attribute_events(sf_dir: str):
    from shaclapi_ray.pipelines.events import attribute_events

    return _sorted(attribute_events(_events(sf_dir)), ["event_id"])


def _q_sessionize(sf_dir: str):
    from shaclapi_ray.pipelines.events import sessionize

    return _sorted(sessionize(_events(sf_dir), SESSION_GAP_S), ["user_id", "session_id"])


def _q_parse_props(sf_dir: str):
    from shaclapi_ray.pipelines.events import parse_props

    return _sorted(parse_props(_events(sf_dir)), ["event_id"])


def _q_event_type_stats(sf_dir: str):
    from shaclapi_ray.pipelines.events import event_type_stats

    return _sorted(event_type_stats(_events(sf_dir)), ["event_type"])


def _q_media_metadata(sf_dir: str):
    import ray.data

    from shaclapi_ray.pipelines.multimodal import media_metadata

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    df = media_metadata(pages).to_pandas()
    return df.sort_values(
        ["url"], na_position="first", kind="mergesort"
    ).reset_index(drop=True)


def _q_resize_media(sf_dir: str):
    import ray.data

    from shaclapi_ray.pipelines.multimodal import resize_media

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    df = resize_media(pages, width=16, height=16).to_pandas()
    df["media_crc"] = [__import__("zlib").crc32(m) for m in df["media"]]
    df = df.drop(columns=["media"])
    return df.sort_values(["url"], na_position="first", kind="mergesort").reset_index(
        drop=True
    )


def _q_sample_frames(sf_dir: str):
    import ray.data

    from shaclapi_ray.pipelines.multimodal import sample_frames

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    df = sample_frames(pages, every_n=2, max_frames=4, frame_bytes=512).to_pandas()
    df["frame_crc"] = [__import__("zlib").crc32(f) for f in df["frame"]]
    df = df.drop(columns=["frame"])
    return df.sort_values(
        ["url", "frame_idx"], na_position="first", kind="mergesort"
    ).reset_index(drop=True)


def _q_featurize_media(sf_dir: str):
    import ray.data

    from shaclapi_ray.pipelines.multimodal import featurize_media

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    df = featurize_media(pages).to_pandas()
    return df.sort_values(["url"], na_position="first", kind="mergesort").reset_index(
        drop=True
    )


def _q_top_hosts(sf_dir: str):
    """Sort/limit/top-k + learned host curation, as a kind-tagged union:
    'top' = most-linked-to hosts (count desc, host asc — deterministic);
    'cure' = pipelines/hostcure.host_curation per-host stats with the
    integer-exact blocked verdict learned from the corpus itself;
    'kept' = pages surviving filter_by_host against those verdicts
    (broadcast path; the join path is pinned output-identical in
    tests/test_hostcure.py); 'cap' = pages surviving cap_per_host's
    per-host page cap (RANK <= CAP_K, tests/test_freshness.py);
    'chain' = the composed curate_pages flagship (URL gate ->
    latest_snapshot -> learned host filter -> cap), its oracle
    CTE-chained from the same stage generators (the preprocess_corpus
    composition pattern); 'comp' = the corpus-composition rollup
    (docs/tokens per host x capture month x lang)."""
    import pandas as pd
    import ray.data

    from shaclapi_ray.io import read_parquet
    from shaclapi_ray.pipelines.curate import curate_pages
    from shaclapi_ray.pipelines.freshness import cap_per_host
    from shaclapi_ray.pipelines.hostcure import filter_by_host, host_curation
    from shaclapi_ray.stages.aggregates import grouped_count
    from shaclapi_ray.stages.links import extract_links

    pages = read_parquet(_pages(sf_dir), columns=["url", "html"])
    links = extract_links(pages).map_batches(
        lambda t: t.select(["host"]).rename_columns(["url"]),
        batch_format="pyarrow",
    )
    counts = grouped_count(links, "url", out_name="n").to_pandas()
    counts = counts.rename(columns={"url": "host"})
    counts = counts.sort_values(["n", "host"], ascending=[False, True], kind="mergesort")
    counts = counts.head(5)
    top = pd.DataFrame(
        {
            "key": counts["host"],
            "kind": "top",
            "value": counts["n"].astype("int64").astype(str),
            "extra": "",
        }
    )
    cure_pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "text"])
    verdicts = host_curation(cure_pages, **HOSTCURE_KW).materialize()
    cdf = verdicts.to_pandas()
    cure = pd.DataFrame(
        {
            "key": cdf["host"],
            "kind": "cure",
            "value": cdf["n_docs"].astype(str)
            + "|"
            + cdf["n_dup"].astype(str)
            + "|"
            + cdf["sum_tokens"].astype(str),
            "extra": cdf["blocked"].map({True: "true", False: "false"}),
        }
    )
    kdf = filter_by_host(
        ray.data.read_parquet(_pages(sf_dir), columns=["url"]), verdicts
    ).to_pandas()
    kept = pd.DataFrame(
        {"key": kdf["url"], "kind": "kept", "value": "", "extra": ""}
    )
    capped = cap_per_host(
        ray.data.read_parquet(_pages(sf_dir), columns=["url", "warc_ts"]),
        CAP_K,
    ).to_pandas()
    cap = pd.DataFrame(
        {
            "key": capped["url"],
            "kind": "cap",
            "value": capped["warc_ts"].astype("int64").astype(str),
            "extra": "",
        }
    )
    ch = curate_pages(
        ray.data.read_parquet(_pages(sf_dir), columns=["url", "warc_ts", "text"]),
        cap_k=CAP_K,
        urlq_kw=URLQ_KW,
        **HOSTCURE_KW,
    ).to_pandas()
    chain = pd.DataFrame(
        {
            "key": ch["url"],
            "kind": "chain",
            "value": ch["warc_ts"].astype("int64").astype(str),
            "extra": "",
        }
    )
    from shaclapi_ray.pipelines.profile import corpus_composition

    cc = corpus_composition(
        ray.data.read_parquet(
            _pages(sf_dir), columns=["url", "warc_ts", "text", "lang"]
        )
    ).to_pandas()
    comp = pd.DataFrame(
        {
            "key": cc["host"],
            "kind": "comp",
            "value": cc["period_us"].astype(str)
            + "|"
            + cc["lang"].fillna("∅"),
            "extra": cc["n_docs"].astype(str) + "|" + cc["n_tokens"].astype(str),
        }
    )
    out = pd.concat([top, cure, kept, cap, chain, comp], ignore_index=True)
    return out.sort_values(
        ["kind", "key", "value"], na_position="first", kind="mergesort"
    ).reset_index(drop=True)


def _q_or_shape_verdicts(sf_dir: str):
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import or_shape

    res = ValidationEngine([or_shape()], JobConfig()).run(_pages(sf_dir))
    return _sorted(res.verdicts().select_columns(["url", "valid"]), ["url", "valid"])


# ---------------------------------------------------------------------------
# merged queries — the driver's CORRECTNESS gate checks the FIRST 50
# queries() entries only, so near-duplicate operator checks are merged
# (join on the row key, or union with a `kind` tag) into one driver slot
# each. Every merged query still exercises each component operator's full
# code path, and the SQL oracle is the same composition of the
# components' oracles. COVERAGE.md maps SURVEY §2 operators -> query.
# ---------------------------------------------------------------------------


def _q_basic_shape_verdicts(sf_dir: str):
    """url/fresh/lang/target/consistent column shapes in ONE engine run
    (they are independent shapes; per-shape verdicts are identical to 5
    single-shape runs, which tests/test_engine.py covers; the fifth is
    the col_cmp property-pair shape — fixtures.consistent_page_shape)."""
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import column_schema

    res = ValidationEngine(column_schema(), JobConfig()).run(_pages(sf_dir))
    v = res.verdicts().to_pandas()[["shape_id", "url", "valid"]]
    return _sorted(v, ["shape_id", "url", "valid"])


def _q_extract_canonicalize(sf_dir: str):
    """extract_text + url_canonicalize + filter_hosts (domain blocklist)
    + latest_snapshot (recrawl freshness dedup: newest capture per url)
    + anchor_text_profile (per-target inbound anchor aggregation)
    + url_quality_filter (RefinedWeb-style pre-fetch URL gate, URLQ_KW
    profile) + robots_filter (longest-match allow/disallow prefix gate,
    ROBOTS_RULES profile) + registrable_domain (eTLD+1 via the embedded
    public-suffix subset, kind='domain') + the WARC sink->source
    roundtrip (kind='warc':
    pages -> .warc.gz shards -> pages must be the identity on
    url/warc_ts/text/lang; html byte-parity is unit-tested) as a
    kind-tagged union (a join on url would mis-multiply: the fixture
    plants duplicate urls, and anchor targets are a different key set)."""
    import pandas as pd
    import ray.data

    from shaclapi_ray.pipelines.anchors import anchor_text_profile
    from shaclapi_ray.pipelines.extract import (
        extract_text,
        filter_hosts,
        url_canonicalize,
        url_quality_filter,
    )
    from shaclapi_ray.pipelines.freshness import latest_snapshot

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    et = extract_text(pages).to_pandas()
    uc = url_canonicalize(
        ray.data.read_parquet(_pages(sf_dir), columns=["url"])
    ).to_pandas()
    fh = filter_hosts(
        ray.data.read_parquet(_pages(sf_dir), columns=["url"]), BLOCKED_HOSTS
    ).to_pandas()
    part1 = pd.DataFrame(
        {
            "url": et["url"],
            "kind": "text",
            "value": et["text"],
            "extra": et["n_text_chars"].astype("int64").astype(str),
        }
    )
    part2 = pd.DataFrame(
        {
            "url": uc["url"],
            "kind": "canon",
            "value": uc["canon_url"],
            "extra": uc["host"],
        }
    )
    part3 = pd.DataFrame(
        {
            "url": fh["url"],
            "kind": "blocked",
            "value": fh["blocked"].map({True: "true", False: "false"}),
            "extra": fh["host"],
        }
    )
    ls = latest_snapshot(
        ray.data.read_parquet(_pages(sf_dir), columns=["url", "warc_ts", "text"])
    ).to_pandas()
    part4 = pd.DataFrame(
        {
            "url": ls["url"],
            "kind": "latest",
            "value": ls["warc_ts"].astype("int64").astype(str),
            "extra": "",
        }
    )
    ap = anchor_text_profile(
        ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    ).to_pandas()
    part5 = pd.DataFrame(
        {
            "url": ap["target_url"],
            "kind": "anchor",
            "value": ap["top_anchor"],
            "extra": ap["n_inlinks"].astype(str)
            + "|"
            + ap["n_unique_sources"].astype(str)
            + "|"
            + ap["n_distinct_anchors"].astype(str),
        }
    )
    from shaclapi_ray.pipelines.freshness import snapshot_delta

    sd = snapshot_delta(
        _delta_side_ds(sf_dir, "old"), _delta_side_ds(sf_dir, "new")
    ).to_pandas()
    part7 = pd.DataFrame(
        {
            "url": sd["url"],
            "kind": "delta",
            "value": sd["status"],
            "extra": sd["old_ts"].astype(str)
            + "|"
            + sd["new_ts"].astype(str)
            + "|"
            + sd["old_cnt"].astype(str)
            + "|"
            + sd["new_cnt"].astype(str),
        }
    )
    from shaclapi_ray.pipelines.robots import robots_filter

    rb = robots_filter(
        ray.data.read_parquet(_pages(sf_dir), columns=["url"]), ROBOTS_RULES
    ).to_pandas()
    part8 = pd.DataFrame(
        {
            "url": rb["url"],
            "kind": "robots",
            "value": rb["allowed"].map({True: "true", False: "false"}),
            "extra": rb["path"] + "|" + rb["rule"],
        }
    )
    uq = url_quality_filter(
        ray.data.read_parquet(_pages(sf_dir), columns=["url"]), **URLQ_KW
    ).to_pandas()
    part6 = pd.DataFrame(
        {
            "url": uq["url"],
            "kind": "urlq",
            "value": uq["kept"].map({True: "true", False: "false"}),
            "extra": uq["n_chars"].astype(str)
            + "|"
            + uq["n_digits"].astype(str)
            + "|"
            + uq["n_slashes"].astype(str),
        }
    )
    from shaclapi_ray.pipelines.domains import registrable_domain

    rd = registrable_domain(
        ray.data.read_parquet(_pages(sf_dir), columns=["url"])
    ).to_pandas()
    part10 = pd.DataFrame(
        {
            "url": rd["url"],
            "kind": "domain",
            "value": rd["domain"],
            "extra": rd["suffix"] + "|" + rd["host"],
        }
    )
    import os
    import shutil

    from shaclapi_ray.pipelines.warc import read_pages_warc, write_warc

    wdir = os.path.join(
        "/tmp/shaclapi_ray_warc", os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(wdir, ignore_errors=True)
    write_warc(ray.data.read_parquet(_pages(sf_dir)), wdir)
    wp = read_pages_warc(wdir).to_pandas()
    ts64 = wp["warc_ts"].to_numpy().astype("datetime64[us]").astype("int64")
    ts_str = pd.Series(ts64.astype(str), index=wp.index).where(
        wp["warc_ts"].notna(), "-1"
    )
    part9 = pd.DataFrame(
        {
            "url": wp["url"],
            "kind": "warc",
            "value": wp["text"],
            "extra": ts_str + "|" + wp["lang"].where(wp["lang"].notna(), "∅"),
        }
    )
    return _sorted(
        pd.concat(
            [part1, part2, part3, part4, part5, part6, part7, part8,
             part9, part10],
            ignore_index=True,
        ),
        ["url", "kind", "value"],
    )


def _q_graph_metrics(sf_dir: str):
    """pagerank + connected components joined on url (node set is
    identical by construction: both derive from the same link graph)."""
    import ray.data

    from shaclapi_ray.pipelines.graph import connected_components, pagerank

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    pr = pagerank(pages).to_pandas()
    pages2 = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    cc = connected_components(pages2, strategy="auto").to_pandas()
    return _sorted(pr.merge(cc, on="url", how="inner"), ["url"])


def _merge_docs(frames: list, key: str = "doc_id"):
    out = frames[0]
    for f in frames[1:]:
        out = out.merge(f, on=key, how="inner")
    return out


BPE_MERGES = 100
# unigram-LM tokenizer profile for the doc_signals golden part: the
# 31-word fixture vocabulary trains in milliseconds; vocab_size=64
# leaves room for multi-char pieces beyond the ~20 fixture characters
# (non-degenerate: whole frequent words become pieces, so ug_tokens
# differs from both whitespace and BPE counts)
UNIGRAM_KW = dict(vocab_size=64, seed_size=400, max_piece_len=8)


def _bpe_part(sf_dir: str):
    """(doc_id, bpe_tokens, bpe_ids_fp, ug_tokens, ug_ids_fp):
    corpus-trained BPE piece counts PLUS a crc32 fingerprint of each
    doc's actual token-ID sequence (pipelines/bpe.py tokenize_corpus),
    PLUS the same pair from the SentencePiece-family unigram-LM
    tokenizer (pipelines/unigram.py — EM training + Viterbi apply) —
    the golden-backed part of doc_signals (iterative training is not
    SQL-expressible; semantic correctness in tests/test_bpe.py and
    tests/test_unigram.py)."""
    import pyarrow as _pa

    from shaclapi_ray.pipelines.bpe import (
        _flatten_id_lists,
        tokenize_corpus,
        train_bpe,
    )

    merges = train_bpe(_docs(sf_dir), n_merges=BPE_MERGES)

    def make_fingerprint(counts_in, tokens_out, fp_out):
        # one crc32-over-id-sequence kernel shared by the BPE and
        # unigram parts so the two golden contracts cannot drift
        def fingerprint(batch):
            import zlib

            import numpy as np

            lens, flat = _flatten_id_lists(batch["token_ids"])
            offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
            fps = np.array(
                [
                    zlib.crc32(flat[offs[i] : offs[i + 1]].tobytes())
                    for i in range(batch.num_rows)
                ],
                dtype=np.int64,
            )
            return _pa.table(
                {
                    "doc_id": batch["doc_id"],
                    tokens_out: batch[counts_in],
                    fp_out: _pa.array(fps),
                }
            )

        return fingerprint

    toks = tokenize_corpus(_docs(sf_dir), merges).map_batches(
        make_fingerprint("n_bpe_tokens", "bpe_tokens", "bpe_ids_fp"),
        batch_format="pyarrow",
    )

    from shaclapi_ray.pipelines.unigram import (
        tokenize_corpus_unigram,
        train_unigram,
    )

    vocab = train_unigram(_docs(sf_dir), **UNIGRAM_KW)
    ug = tokenize_corpus_unigram(_docs(sf_dir), vocab).map_batches(
        make_fingerprint("n_ug_tokens", "ug_tokens", "ug_ids_fp"),
        batch_format="pyarrow",
    )
    out = _sorted(toks, ["doc_id"]).merge(
        _sorted(ug, ["doc_id"]), on="doc_id", how="inner"
    )
    return _sorted(out, ["doc_id"])


def _q_doc_signals(sf_dir: str):
    """token_count + lang_id + fingerprint + Naive-Bayes classifier
    (self-trained on the lang column — the learned counterpart of the
    stopword heuristic) + corpus-trained BPE piece counts (golden part)
    + DSIR hashed-n-gram importance log-weights (full SQL oracle)
    joined on doc_id (each is a row-wise map over documents; doc_id is
    unique)."""
    from shaclapi_ray.pipelines.classify import nb_classify, train_nb
    from shaclapi_ray.pipelines.dsir import dsir_scores
    from shaclapi_ray.pipelines.textstats import fingerprint, lang_id, token_count

    docs = _docs(sf_dir)
    nb = nb_classify(_docs(sf_dir), train_nb(_docs(sf_dir))).to_pandas()
    nb = nb.rename(columns={"pred": "nb_pred", "score": "nb_score"})
    ds = dsir_scores(_docs(sf_dir)).to_pandas()
    ds = ds.rename(columns={"n_grams": "dsir_grams"})
    frames = [
        token_count(docs).to_pandas(),
        lang_id(_docs(sf_dir)).to_pandas(),
        fingerprint(_docs(sf_dir)).to_pandas(),
        nb,
        ds,
        _bpe_part(sf_dir),
    ]
    return _sorted(_merge_docs(frames), ["doc_id"])


CLEAN_LINES_KW = dict(require_terminal_punct=False, min_words=40)
# fixture text carries no terminal punctuation, so the driver profile
# exercises the min-words + brace + within-doc-dedup rules (the
# punctuation rule is parity-tested separately in test_textstats_golden)


def _q_clean_pii(sf_dir: str):
    """normalize_text + pii_scan + the C4 clean_lines pass, joined on
    doc_id."""
    from shaclapi_ray.pipelines.textstats import (
        clean_lines,
        normalize_text,
        pii_scan,
    )

    frames = [
        normalize_text(_docs(sf_dir)).to_pandas(),
        pii_scan(_docs(sf_dir)).to_pandas(),
        clean_lines(_docs(sf_dir), **CLEAN_LINES_KW).to_pandas(),
    ]
    return _sorted(_merge_docs(frames), ["doc_id"])


GOPHER_KW = dict(min_stop_hits=1)
# the synthetic vocabulary carries only one of the eight Gopher stop
# words, so the driver profile lowers that one threshold to keep the
# composite verdict non-degenerate (the full default profile is
# parity-tested in tests/test_textstats_golden.py)


def _q_quality_repetition(sf_dir: str):
    """quality_signals + repetition_signals + the Gopher composite
    quality rules + the within-doc duplicated-n-gram fraction, joined
    on doc_id."""
    from shaclapi_ray.pipelines.spans import intra_dup_ngram
    from shaclapi_ray.pipelines.textstats import (
        gopher_rules,
        quality_signals,
        repetition_signals,
    )

    frames = [
        quality_signals(_docs(sf_dir)).to_pandas(),
        repetition_signals(_docs(sf_dir)).to_pandas(),
        # n_words duplicates repetition_signals' identical \S+ count
        gopher_rules(_docs(sf_dir), **GOPHER_KW)
        .to_pandas()
        .drop(columns=["n_words"]),
        # n_tokens duplicates quality_signals' count
        intra_dup_ngram(_docs(sf_dir)).to_pandas().drop(columns=["n_tokens"]),
    ]
    return _sorted(_merge_docs(frames), ["doc_id"])


def _q_exact_dedup_corpus(sf_dir: str):
    """exact_dedup stats + dedup_corpus materialization + corpus-wide
    paragraph dedup, joined on doc_id (inner: survivor docs only), plus
    an inc_state column from the INCREMENTAL cross-snapshot dedup (even
    doc_ids persisted as the accepted-corpus hash state, odd doc_ids
    deduped against it: 'state' / 'kept' / 'dup'), plus hb_* columns from
    host_boilerplate (per-SOURCE ubiquitous-paragraph removal, HOSTBP_KW
    fixture profile: sep=' ' so fixture "paragraphs" are words), plus
    bf_* columns from bloom_dup_paragraphs (the constant-memory
    counting-bloom drop-all-duplicates pass, BLOOM_KW profile — its SQL
    is the exact rule, valid because the profile is collision-free on
    the fixtures) — six operators' full code paths in one slot."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow.compute as pc

    from shaclapi_ray.pipelines.dedup import (
        dedup_corpus,
        dedup_incremental,
        dedup_paragraphs,
        exact_dedup,
        host_boilerplate,
        persist_dedup_state,
    )

    stats = exact_dedup(_docs(sf_dir)).to_pandas()
    kept = dedup_corpus(_docs(sf_dir)).to_pandas()
    paras = dedup_paragraphs(_docs(sf_dir)).to_pandas()
    hb = (
        host_boilerplate(_docs(sf_dir), **HOSTBP_KW)
        .to_pandas()
        .rename(
            columns={
                "clean_text": "hb_text",
                "n_kept": "hb_kept",
                "n_dropped": "hb_dropped",
            }
        )
    )
    from shaclapi_ray.pipelines.bloomdedup import bloom_dup_paragraphs

    bf = (
        bloom_dup_paragraphs(_docs(sf_dir), **BLOOM_KW)
        .to_pandas()
        .rename(
            columns={
                "clean_text": "bf_text",
                "n_kept": "bf_kept",
                "n_dropped": "bf_dropped",
            }
        )
    )
    out = (
        stats.merge(kept, on="doc_id", how="inner")
        .merge(paras, on="doc_id", how="inner")
        .merge(hb, on="doc_id", how="inner")
        .merge(bf, on="doc_id", how="inner")
    )

    def half(rem):
        return _docs(sf_dir).map_batches(
            lambda t: t.filter(
                pc.equal(pc.bit_wise_and(t["doc_id"], 1), rem)
            ),
            batch_format="pyarrow",
        )

    state_dir = tempfile.mkdtemp(prefix="shaclapi_ray_incstate_")
    try:
        persist_dedup_state(half(0), state_dir, num_buckets=16)
        inc_kept = set(
            dedup_incremental(half(1), state_dir)
            .select_columns(["doc_id"])
            .to_pandas()["doc_id"]
        )
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
    ids = out["doc_id"].to_numpy()
    out["inc_state"] = np.where(
        ids % 2 == 0, "state", np.where(np.isin(ids, list(inc_kept)), "kept", "dup")
    )
    return _sorted(out, ["doc_id"])


def _q_windows(sf_dir: str):
    """tumbling + hopping windows as a kind-tagged union (same output
    schema, different window assignment kernels)."""
    import pandas as pd

    from shaclapi_ray.pipelines.events import hopping_window, tumbling_window

    t = tumbling_window(_events(sf_dir), WINDOW_S).to_pandas()
    t.insert(0, "kind", "tumbling")
    h = hopping_window(_events(sf_dir), WINDOW_S, HOP_S).to_pandas()
    h.insert(0, "kind", "hopping")
    return _sorted(
        pd.concat([t, h], ignore_index=True), ["kind", "user_id", "window_start"]
    )


def _q_session_assignments(sf_dir: str):
    """assign_sessions (per-event) joined with sessionize (per-session
    aggregates) on (user_id, session_id) — each event maps to exactly one
    session row."""
    from shaclapi_ray.pipelines.events import assign_sessions, sessionize

    ev = assign_sessions(_events(sf_dir), SESSION_GAP_S).to_pandas()
    ses = sessionize(_events(sf_dir), SESSION_GAP_S).to_pandas()
    out = ev.merge(ses, on=["user_id", "session_id"], how="inner")
    return _sorted(out, ["event_id"])


def _q_event_attribution(sf_dir: str):
    """parse_props (all events) left-joined with the as-of attribution
    (purchase events only) on event_id; unmatched attribution columns are
    -1 so both sides stay integer-typed."""
    from shaclapi_ray.pipelines.events import attribute_events, parse_props

    props = parse_props(_events(sf_dir)).to_pandas()
    attr = attribute_events(_events(sf_dir)).to_pandas()
    out = props.merge(attr, on="event_id", how="left")
    for c in ("matched_event_id", "lag_us"):
        out[c] = out[c].fillna(-1).astype("int64")
    return _sorted(out, ["event_id"])


def _media_feat_part(sf_dir: str):
    """featurize_media exploded to (url, kind='feat', idx, value) — the
    golden-backed half of media_features: kind='feat' (deterministic
    byte-stats stub over html) + kind='wav' (the REAL stdlib WAV decode
    path over audio synthesized deterministically from each row's html —
    int16 view of the first 4000 bytes at 8 kHz — so the audio seam is
    driver-golden-checked like IVF-PQ) + kind='png' (the REAL zlib+numpy
    PNG decode path — pngcodec.py — over 16x16 RGB images synthesized
    from the first 768 html bytes and Paeth-encoded; decode recovers
    exact pixels regardless of zlib build, so the features are
    golden-safe even though the intermediate compressed bytes are not)
    + kind='gif' (the REAL from-scratch variable-width LZW decode —
    gifcodec.py — over 16x16 palette images synthesized from the first
    256 html bytes; the GIF path has no zlib dependence at all)
    + kind='jpeg' (the REAL from-scratch baseline Huffman+DCT decode —
    jpegcodec.py — over the SAME synthesized RGB images as the png
    part, re-encoded lossy at q=85; deterministic float64 8x8 einsum
    math, no BLAS threading, so the features golden cleanly)
    + kind='jprog' (the PROGRESSIVE/SOF2 decode path — multi-scan
    successive approximation incl. DC approx — over the same images
    via encode_jpeg_progressive(dc_approx=True); its features must
    EQUAL the kind='jpeg' rows by construction, a cross-check baked
    into the golden itself) + kind='flac' (the REAL from-scratch FLAC
    decode — flaccodec.py — over the SAME samples as the wav part,
    FLAC-compressed; lossless, so its rows must EQUAL the kind='wav'
    rows — the second in-golden cross-check).
    Sort includes 'value' so the order is total across duplicate-url
    rows (the transform_media advice-fix rationale)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from shaclapi_ray.pipelines.multimodal import (
        encode_gif,
        encode_jpeg,
        encode_png,
        encode_wav,
        featurize_media,
    )

    def pages():
        return ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])

    def to_wav(batch):
        import pyarrow as _pa

        outs = []
        for raw in batch["html"].to_pylist():
            b = (raw or b"")[:4000]
            if len(b) % 2:
                b = b[:-1]
            s = (
                np.frombuffer(b, dtype="<i2")
                if b
                else np.zeros(1, dtype=np.int16)
            )
            outs.append(encode_wav(s, 8000))
        return _pa.table({"url": batch["url"], "html": _pa.array(outs, _pa.binary())})

    def to_flac(batch):
        import pyarrow as _pa

        from shaclapi_ray.pipelines.flaccodec import encode_flac

        outs = []
        for raw in batch["html"].to_pylist():
            b = (raw or b"")[:4000]
            if len(b) % 2:
                b = b[:-1]
            s = (
                np.frombuffer(b, dtype="<i2")
                if b
                else np.zeros(1, dtype=np.int16)
            )
            outs.append(encode_flac(s, 8000))
        return _pa.table({"url": batch["url"], "html": _pa.array(outs, _pa.binary())})

    def explode(feat_ds, kind):
        rows = []
        for b in feat_ds.iter_batches(batch_format="pyarrow"):
            feats = b["feature"]
            n = len(feats)
            if n == 0:
                continue
            flat = feats.combine_chunks().flatten().to_numpy(zero_copy_only=False)
            dim = flat.size // n
            rows.append(
                pd.DataFrame(
                    {
                        "url": np.repeat(b["url"].to_numpy(zero_copy_only=False), dim),
                        "kind": kind,
                        "idx": np.tile(np.arange(dim, dtype=np.int64), n),
                        "value": flat.astype(np.float64),
                    }
                )
            )
        return rows

    def to_png(batch):
        import pyarrow as _pa

        outs = []
        for raw in batch["html"].to_pylist():
            b = (raw or b"")[:768]
            b += b"\x00" * (768 - len(b))
            rgb = np.frombuffer(b, dtype=np.uint8).reshape(16, 16, 3)
            outs.append(encode_png(rgb, filter_type=4))
        return _pa.table({"url": batch["url"], "html": _pa.array(outs, _pa.binary())})

    def to_gif(batch):
        import pyarrow as _pa

        outs = []
        for raw in batch["html"].to_pylist():
            b = (raw or b"")[:256]
            b += b"\x00" * (256 - len(b))
            v = np.frombuffer(b, dtype=np.uint8).reshape(16, 16)
            rgb = np.stack([v, 255 - v, v ^ 0x55], axis=2)  # <=256 colors
            outs.append(encode_gif(rgb))
        return _pa.table({"url": batch["url"], "html": _pa.array(outs, _pa.binary())})

    def make_to_jpeg(progressive):
        def to_jpeg(batch):
            import pyarrow as _pa

            from shaclapi_ray.pipelines.jpegcodec import encode_jpeg_progressive

            outs = []
            for raw in batch["html"].to_pylist():
                b = (raw or b"")[:768]
                b += b"\x00" * (768 - len(b))
                rgb = np.frombuffer(b, dtype=np.uint8).reshape(16, 16, 3)
                outs.append(
                    encode_jpeg_progressive(rgb, quality=85, dc_approx=True)
                    if progressive
                    else encode_jpeg(rgb, quality=85)
                )
            return _pa.table(
                {"url": batch["url"], "html": _pa.array(outs, _pa.binary())}
            )

        return to_jpeg

    rows = (
        explode(featurize_media(pages()), "feat")
        + explode(
            featurize_media(
                pages().map_batches(
                    to_wav, batch_format="pyarrow", zero_copy_batch=True
                ),
                decode_stub="wav",
            ),
            "wav",
        )
        + explode(
            featurize_media(
                pages().map_batches(
                    to_png, batch_format="pyarrow", zero_copy_batch=True
                ),
                decode_stub="png",
            ),
            "png",
        )
        + explode(
            featurize_media(
                pages().map_batches(
                    to_gif, batch_format="pyarrow", zero_copy_batch=True
                ),
                decode_stub="gif",
            ),
            "gif",
        )
        + explode(
            featurize_media(
                pages().map_batches(
                    make_to_jpeg(False), batch_format="pyarrow", zero_copy_batch=True
                ),
                decode_stub="jpeg",
            ),
            "jpeg",
        )
        + explode(
            featurize_media(
                pages().map_batches(
                    make_to_jpeg(True), batch_format="pyarrow", zero_copy_batch=True
                ),
                decode_stub="jpeg",
            ),
            "jprog",
        )
        + explode(
            featurize_media(
                pages().map_batches(
                    to_flac, batch_format="pyarrow", zero_copy_batch=True
                ),
                decode_stub="flac",
            ),
            "flac",
        )
    )
    out = (
        pd.concat(rows, ignore_index=True)
        if rows
        else pd.DataFrame({"url": [], "kind": [], "idx": [], "value": []})
    )
    return out.sort_values(
        ["url", "kind", "idx", "value"], na_position="first", kind="mergesort"
    ).reset_index(drop=True)


def _q_media_features(sf_dir: str):
    """media_metadata (real SQL oracle) + featurize_media (golden) as a
    kind-tagged union — a url join would mis-multiply on duplicate urls."""
    import pandas as pd
    import ray.data

    from shaclapi_ray.pipelines.multimodal import media_metadata

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    meta = media_metadata(pages).to_pandas()
    part1 = pd.DataFrame(
        {
            "url": meta["url"],
            "kind": "meta",
            "idx": 0,
            "value": meta["n_bytes"].astype("float64"),
        }
    )
    part1["idx"] = part1["idx"].astype("int64")
    out = pd.concat([part1, _media_feat_part(sf_dir)], ignore_index=True)
    return out.sort_values(
        ["url", "kind", "idx", "value"], na_position="first", kind="mergesort"
    ).reset_index(drop=True)


def _q_transform_media(sf_dir: str):
    """resize_media + sample_frames as a kind-tagged union of
    (url, kind, idx, value=crc32) rows (golden-backed: crc of transformed
    bytes is not SQL-expressible)."""
    import zlib

    import pandas as pd
    import ray.data

    from shaclapi_ray.pipelines.multimodal import resize_media, sample_frames

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    rs = resize_media(pages, width=16, height=16).to_pandas()
    part1 = pd.DataFrame(
        {
            "url": rs["url"],
            "kind": "resize",
            "idx": 0,
            "value": [zlib.crc32(m) for m in rs["media"]],
        }
    )
    pages2 = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    fr = sample_frames(pages2, every_n=2, max_frames=4, frame_bytes=512).to_pandas()
    part2 = pd.DataFrame(
        {
            "url": fr["url"],
            "kind": "frame",
            "idx": fr["frame_idx"],
            "value": [zlib.crc32(f) for f in fr["frame"]],
        }
    )
    # kind='png': the REAL zlib+numpy resize path (decode -> nn-resize ->
    # re-encode, pipelines/pngcodec.py). The golden value is the crc of
    # the DECODED output pixels — exact and zlib-build-independent —
    # never of the re-encoded bytes (those vary by zlib build).
    import numpy as np

    from shaclapi_ray.pipelines.multimodal import decode_png, encode_png

    def to_png(batch):
        import pyarrow as _pa

        outs = []
        for raw in batch["html"].to_pylist():
            b = (raw or b"")[:768]
            b += b"\x00" * (768 - len(b))
            rgb = np.frombuffer(b, dtype=np.uint8).reshape(16, 16, 3)
            outs.append(encode_png(rgb, filter_type=3))
        return _pa.table({"url": batch["url"], "html": _pa.array(outs, _pa.binary())})

    pages3 = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    rp = resize_media(
        pages3.map_batches(to_png, batch_format="pyarrow", zero_copy_batch=True),
        width=8,
        height=8,
        decode_stub="png",
    ).to_pandas()
    part3 = pd.DataFrame(
        {
            "url": rp["url"],
            "kind": "png",
            "idx": 0,
            "value": [zlib.crc32(decode_png(m).tobytes()) for m in rp["media"]],
        }
    )
    out = pd.concat([part1, part2, part3], ignore_index=True)
    out["idx"] = out["idx"].astype("int64")
    out["value"] = out["value"].astype("int64")
    # 'value' makes the sort key TOTAL: many frame rows share a null/empty
    # url + idx, and a [url, kind, idx]-only sort left their tie order
    # layout-dependent (an order-sensitive golden compare could flake)
    return out.sort_values(
        ["url", "kind", "idx", "value"], na_position="first", kind="mergesort"
    ).reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # validation engine (SURVEY.md §2 core)
        "basic_shape_verdicts": _q_basic_shape_verdicts,
        "or_shape_verdicts": _q_or_shape_verdicts,
        "column_violations": _q_column_violations,
        "links": _q_links,
        "extract_canonicalize": _q_extract_canonicalize,
        "top_hosts": _q_top_hosts,
        "linked_page_verdicts": _q_linked_page_verdicts,
        "inverse_linked_verdicts": _q_inverse_linked_verdicts,
        "unique_url_verdicts": _q_unique_url_verdicts,
        "verdict_counts": _q_verdict_counts,
        "reduce_schema": _q_reduce_schema,
        "annotated_pages": _q_annotated_pages,
        "drift_verdicts": _q_drift_verdicts,
        "profile_columns": _q_profile_columns,
        "psi_drift": _q_psi_drift,
        "graph_metrics": _q_graph_metrics,
        "hll_distinct_urls": _q_hll_distinct_urls,
        # text analysis
        "doc_signals": _q_doc_signals,
        "clean_pii": _q_clean_pii,
        "sample_corpus": _q_sample_corpus,
        "quality_repetition": _q_quality_repetition,
        "quantile_filter": _q_quantile_filter,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "rolling_fingerprint": _q_rolling_fingerprint,
        "decontaminate": _q_decontaminate,
        "inverted_index": _q_inverted_index,
        "unigram_logprob": _q_unigram_logprob,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "rebalance_corpus": _q_rebalance_corpus,
        "chunk_text": _q_chunk_text,
        "pack_sequences": _q_pack_sequences,
        # dedup
        "dup_span_coverage": _q_dup_span_coverage,
        "exact_dedup": _q_exact_dedup_corpus,
        "dedup_corpus_minhash": _q_dedup_corpus_minhash,
        "minhash_clusters": _q_minhash_clusters,
        "simhash": _q_simhash,
        "simhash_neardup": _q_simhash_neardup,
        "ngram_jaccard": _q_ngram_jaccard,
        "embedding_neardup": _q_embedding_neardup,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        # similarity search
        "embed_corpus": _q_embed_corpus,
        "knn_bruteforce": _q_knn_bruteforce,
        "knn_ivf": _q_knn_ivf,
        # stream-shaped
        "windows": _q_windows,
        "drop_late_events": _q_drop_late_events,
        "session_assignments": _q_session_assignments,
        "event_attribution": _q_event_attribution,
        "event_type_stats": _q_event_type_stats,
        # multimodal
        "media_features": _q_media_features,
        "transform_media": _q_transform_media,
    }


def _profile_sql(pages_dir: str) -> str:
    from shaclapi_ray.pipelines.profile import (
        profile_columns_sql,
        suggest_constraints_sql,
    )

    return f"""
SELECT 'stat' AS kind, "column", '' AS rule, '' AS param,
       n_rows, n_nulls, n_distinct, min_v, max_v, avg_len
FROM ({profile_columns_sql(pages_dir)})
UNION ALL
SELECT 'suggest' AS kind, "column", rule, param,
       -1 AS n_rows, -1 AS n_nulls, -1 AS n_distinct,
       '' AS min_v, '' AS max_v, -1.0 AS avg_len
FROM ({suggest_constraints_sql(pages_dir)})
ORDER BY kind, "column", rule
"""


def _psi_sql(pages_dir: str) -> str:
    from shaclapi_ray.pipelines.profile import profile_drift_sql, psi_drift_sql

    drift = profile_drift_sql(
        _delta_old_src(pages_dir),
        _delta_new_src(pages_dir),
        columns=DRIFT_PROFILE_COLUMNS,
    )
    return f"""
SELECT 'psi' AS kind, host AS name, '' AS "check",
       n_ref, n_cur, psi, drifted, '' AS old_v, '' AS new_v
FROM ({psi_drift_sql(pages_dir)})
UNION ALL
SELECT 'profile' AS kind, "column" AS name, "check",
       -1 AS n_ref, -1 AS n_cur, -1.0 AS psi, drifted, old_v, new_v
FROM ({drift})
ORDER BY kind, name, "check"
"""


def _pagerank_sql(pages_dir: str) -> str:
    from shaclapi_ray.pipelines.graph import pagerank_sql

    return pagerank_sql(pages_dir)


def _components_sql(pages_dir: str) -> str:
    from shaclapi_ray.pipelines.graph import connected_components_sql

    return connected_components_sql(pages_dir)


def oracle_sql() -> dict[str, str]:
    return oracle_sql_for(SF01)  # driver compares at sf=0.01


# -- golden oracles -----------------------------------------------------------
# Some operators are deterministic but not SQL-expressible (seeded minhash
# clustering, rolling Rabin-Karp hashes, HLL register merges, crc of
# transformed media bytes, IVF probe results). For these the oracle is a
# PINNED GOLDEN parquet generated by tools/gen_goldens.py at each sf and
# checked into fixtures/goldens/<sf>/<name>.parquet — the driver hash then
# verifies determinism across runs/block layouts, while the SEMANTIC
# correctness of each operator is asserted by dedicated tests (planted
# duplicates, bruteforce equivalence, reference-implementation goldens).

GOLDEN_DIR = "/root/repo/fixtures/goldens"

# full-result goldens; each entry names the sort columns the golden (and
# the live query result) are ordered by
GOLDEN_QUERIES: dict[str, list[str]] = {
    "drift_verdicts": ["url", "valid"],
    "hll_distinct_urls": ["kind", "key"],
    "rolling_fingerprint": ["doc_id"],
    "minhash_clusters": ["doc_id"],
    "dedup_corpus_minhash": ["kind", "doc_id"],
    "embedding_neardup_lsh": ["kind", "a", "b"],
    "knn_ivf": ["kind", "query_id", "rank"],
    "transform_media": ["url", "kind", "idx", "value"],
}


def _sf_name(sf_dir: str) -> str:
    import os

    return os.path.basename(os.path.normpath(sf_dir))


def golden_path(sf_dir: str, name: str) -> str:
    return f"{GOLDEN_DIR}/{_sf_name(sf_dir)}/{name}.parquet"


def _golden_sql(sf_dir: str, name: str, order_cols: list[str]) -> str:
    order = ", ".join(f'"{c}"' for c in order_cols)
    return (
        f"SELECT * FROM read_parquet('{golden_path(sf_dir, name)}') ORDER BY {order}"
    )


def _dsir_part_sql() -> str:
    from shaclapi_ray.pipelines.dsir import dsir_scores_sql

    return (
        "SELECT doc_id, n_grams AS dsir_grams, dsir_logratio FROM "
        f"({dsir_scores_sql()})"
    )


def _dsir_resample_part_sql() -> str:
    from shaclapi_ray.pipelines.dsir import dsir_resample_sql

    return dsir_resample_sql(DSIR_K)


def _delta_old_src(pages_dir: str) -> str:
    from shaclapi_ray.oracles import pages_rel

    return (
        f"(SELECT url, warc_ts, text FROM {pages_rel(pages_dir)} "
        f"WHERE length(text) % 10 != {DELTA_DROP_OLD})"
    )


def _delta_new_src(pages_dir: str) -> str:
    from shaclapi_ray.oracles import pages_rel

    return (
        f"(SELECT url, warc_ts, CASE WHEN length(text) % 10 = "
        f"{DELTA_CHANGE} THEN text || ' v2' ELSE text END AS text "
        f"FROM {pages_rel(pages_dir)} "
        f"WHERE length(text) % 10 != {DELTA_DROP_NEW})"
    )


def _tagged_union_sql(parts: list[tuple[str, str]], tag_col: str, order: str) -> str:
    body = "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS {tag_col}, * FROM ({sql})" for tag, sql in parts
    )
    return f"SELECT * FROM ({body}) ORDER BY {order}"


def _join_sql(parts: list[str], on: str, order: str, how: str = "JOIN") -> str:
    sql = f"({parts[0]}) AS t0"
    for i, p in enumerate(parts[1:], start=1):
        sql += f" {how} ({p}) AS t{i} USING ({on})"
    return f"SELECT * FROM {sql} ORDER BY {order}"


def _pp_join_sql(base_sql: str) -> str:
    """Left-join the composed preprocess_corpus oracle onto a per-doc
    query, with the same deterministic '' / -1 fills as the Ray side."""
    from shaclapi_ray.pipelines.preprocess import preprocess_corpus_sql

    return f"""
SELECT t.*, coalesce(p.pp_text, '') AS pp_text,
       coalesce(p.pp_n_tokens, -1) AS pp_n_tokens
FROM ({base_sql}) t LEFT JOIN ({preprocess_corpus_sql()}) p USING (doc_id)
ORDER BY doc_id
"""


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    from shaclapi_ray import oracles as o
    from shaclapi_ray.fixtures import (
        consistent_page_shape,
        fresh_page_shape,
        lang_shape,
        target_page_shape,
        url_shape,
    )
    from shaclapi_ray.pipelines import dedup as dp
    from shaclapi_ray.pipelines.bloomdedup import bloom_dup_paragraphs_sql
    from shaclapi_ray.pipelines import spans as sp

    pages_dir = _pages(sf_dir)

    basic_shapes_sql = _tagged_union_sql(
        [
            (s.shape_id, o.shape_verdicts_sql(s, pages_dir))
            for s in (url_shape(), fresh_page_shape(), lang_shape(), target_page_shape(), consistent_page_shape())
        ],
        tag_col="shape_id",
        order="shape_id, url, valid",
    )
    extract_canon_sql = _tagged_union_sql(
        [
            (
                "text",
                f"SELECT url, text AS value, CAST(n_text_chars AS VARCHAR) AS extra "
                f"FROM ({o.extract_text_sql(pages_dir)})",
            ),
            (
                "canon",
                f"SELECT url, canon_url AS value, host AS extra "
                f"FROM ({o.url_canonicalize_sql(pages_dir)})",
            ),
            (
                "blocked",
                f"SELECT url, CASE WHEN blocked THEN 'true' ELSE 'false' END "
                f"AS value, host AS extra "
                f"FROM ({o.filter_hosts_sql(pages_dir, BLOCKED_HOSTS)})",
            ),
            (
                "latest",
                f"SELECT url, CAST(ts AS VARCHAR) AS value, '' AS extra "
                f"FROM ({o.latest_snapshot_sql(pages_dir)})",
            ),
            (
                "anchor",
                f"SELECT target_url AS url, top_anchor AS value, "
                f"n_inlinks || '|' || n_unique_sources || '|' || "
                f"n_distinct_anchors AS extra "
                f"FROM ({o.anchor_profile_sql(pages_dir)})",
            ),
            (
                "urlq",
                f"SELECT url, CASE WHEN kept THEN 'true' ELSE 'false' END "
                f"AS value, n_chars || '|' || n_digits || '|' || n_slashes "
                f"AS extra "
                f"FROM ({o.url_quality_sql(pages_dir, **URLQ_KW)})",
            ),
            (
                "delta",
                f"SELECT url, status AS value, "
                f"old_ts || '|' || new_ts || '|' || old_cnt || '|' || "
                f"new_cnt AS extra "
                f"FROM ({o.snapshot_delta_sql(_delta_old_src(pages_dir), _delta_new_src(pages_dir))})",
            ),
            (
                "robots",
                f"SELECT url, CASE WHEN allowed THEN 'true' ELSE 'false' END "
                f"AS value, path || '|' || rule AS extra "
                f"FROM ({o.robots_sql(pages_dir, ROBOTS_RULES)})",
            ),
            ("warc", o.warc_roundtrip_sql(pages_dir)),
            (
                "domain",
                f"SELECT url, domain AS value, suffix || '|' || host AS extra "
                f"FROM ({o.registrable_domain_sql(pages_dir)})",
            ),
        ],
        tag_col="kind",
        order="url, kind, value",
    )
    windows_sql = _tagged_union_sql(
        [
            ("tumbling", o.tumbling_window_sql(WINDOW_S)),
            ("hopping", o.hopping_window_sql(WINDOW_S, HOP_S)),
        ],
        tag_col="kind",
        order="kind, user_id, window_start",
    )
    media_features_sql = (
        "SELECT * FROM ("
        f"SELECT url, 'meta' AS kind, CAST(0 AS BIGINT) AS idx, "
        f"CAST(n_bytes AS DOUBLE) AS value FROM ({o.media_metadata_sql(pages_dir)})"
        "\nUNION ALL\n"
        f"SELECT url, kind, idx, value FROM "
        f"read_parquet('{golden_path(sf_dir, 'media_features_feat')}')"
        ") ORDER BY url NULLS FIRST, kind, idx, value"
    )
    event_attr_sql = (
        f"SELECT event_id, k, COALESCE(matched_event_id, -1) AS matched_event_id, "
        f"COALESCE(lag_us, -1) AS lag_us "
        f"FROM ({o.parse_props_sql()}) AS p LEFT JOIN ({o.attribute_events_sql()}) AS a "
        f"USING (event_id) ORDER BY event_id"
    )
    top_hosts_union_sql = _tagged_union_sql(
        [
            (
                "top",
                f"SELECT host AS key, CAST(n AS VARCHAR) AS value, '' AS extra "
                f"FROM ({o.top_hosts_sql(pages_dir)})",
            ),
            (
                "cure",
                f"SELECT host AS key, "
                f"n_docs || '|' || n_dup || '|' || sum_tokens AS value, "
                f"CASE WHEN blocked THEN 'true' ELSE 'false' END AS extra "
                f"FROM ({o.host_curation_sql(pages_dir, **HOSTCURE_KW)})",
            ),
            (
                "kept",
                f"SELECT url AS key, '' AS value, '' AS extra "
                f"FROM ({o.filter_by_host_sql(pages_dir, **HOSTCURE_KW)})",
            ),
            (
                "cap",
                f"SELECT url AS key, CAST(ts AS VARCHAR) AS value, '' AS extra "
                f"FROM ({o.cap_per_host_sql(pages_dir, CAP_K)})",
            ),
            (
                "chain",
                f"SELECT url AS key, CAST(ts AS VARCHAR) AS value, '' AS extra "
                f"FROM ({o.curate_pages_sql(pages_dir, CAP_K, urlq_kw=URLQ_KW, **HOSTCURE_KW)})",
            ),
            (
                "comp",
                f"SELECT host AS key, "
                f"period_us || '|' || COALESCE(lang, '∅') AS value, "
                f"n_docs || '|' || n_tokens AS extra "
                f"FROM ({o.corpus_composition_sql(pages_dir)})",
            ),
        ],
        tag_col="kind",
        order="kind, key NULLS FIRST, value",
    )

    out = {
        "basic_shape_verdicts": basic_shapes_sql,
        "or_shape_verdicts": o.or_shape_verdicts_sql(pages_dir),
        "column_violations": o.violations_sql(o.all_column_shapes(), pages_dir),
        "links": _tagged_union_sql(
            [
                (
                    "link",
                    f"SELECT url, target_url AS value, host AS extra "
                    f"FROM ({o.links_sql(pages_dir)})",
                ),
                (
                    "profile",
                    f"SELECT url, n_pages || '|' || n_links || '|' || "
                    f"n_unique_hosts || '|' || n_internal AS value, "
                    f"'' AS extra FROM ({o.outlink_profile_sql(pages_dir)})",
                ),
            ],
            tag_col="kind",
            order="url, kind, value",
        ),
        "extract_canonicalize": extract_canon_sql,
        "top_hosts": top_hosts_union_sql,
        # kind='incref' is the referential-incremental path, whose
        # contract is exact equality with the full run — same SQL twice
        "linked_page_verdicts": f"""
SELECT 'full' AS kind, url, valid FROM ({o.linked_page_verdicts_sql(pages_dir)})
UNION ALL
SELECT 'incref' AS kind, url, valid FROM ({o.linked_page_verdicts_sql(pages_dir)})
ORDER BY kind, url, valid
""",
        "inverse_linked_verdicts": o.inverse_linked_verdicts_sql(pages_dir),
        "unique_url_verdicts": o.unique_url_verdicts_sql(pages_dir),
        "verdict_counts": f"""
SELECT 'counts' AS kind, shape_id, '' AS host,
       CASE WHEN valid THEN 'true' ELSE 'false' END AS valid,
       n, -1 AS n_valid, -1 AS n_invalid
FROM ({o.verdict_counts_sql(o.all_column_shapes(), pages_dir)})
UNION ALL
SELECT 'host' AS kind, shape_id, host, '' AS valid,
       -1 AS n, n_valid, n_invalid
FROM ({o.verdict_rollup_sql(o.all_column_shapes(), pages_dir)})
ORDER BY kind, shape_id, host, valid
""",
        "reduce_schema": o.reduce_schema_sql(["LinkedPageShape", "TargetPageShape"]),
        "annotated_pages": o.annotated_pages_sql(pages_dir),
        "profile_columns": _profile_sql(pages_dir),
        "psi_drift": _psi_sql(pages_dir),
        "graph_metrics": _join_sql(
            [_pagerank_sql(pages_dir), _components_sql(pages_dir)],
            on="url",
            order="url",
        ),
        "doc_signals": _join_sql(
            [
                o.token_count_sql(),
                o.lang_id_sql(),
                o.fingerprint_sql(),
                o.nb_classify_sql(),
                _dsir_part_sql(),
            ],
            on="doc_id",
            order="doc_id",
        ),
        "clean_pii": _join_sql(
            [
                o.normalize_text_sql(),
                o.pii_scan_sql(),
                o.clean_lines_sql(**CLEAN_LINES_KW),
            ],
            on="doc_id",
            order="doc_id",
        ),
        "sample_corpus": _tagged_union_sql(
            [
                ("uniform", o.sample_corpus_sql(SAMPLE_FRACTION)),
                (
                    "stratified",
                    o.sample_stratified_sql(STRAT_FRACTIONS, default=0.25),
                ),
            ]
            + [
                (f"mix:{key}", sql)
                for key, sql in o.mix_corpora_parts(
                    MIX_EPOCHS, {"all": "", "en": "lang = 'en'"}, seed=MIX_SEED
                )
            ]
            + [
                (f"split:{name}", sql)
                for name, sql in o.split_corpus_parts(
                    SPLIT_FRACTIONS, seed=SPLIT_SEED
                )
            ]
            + [("dsir", _dsir_resample_part_sql())],
            tag_col="kind",
            order="kind, doc_id",
        ),
        "quality_repetition": _join_sql(
            [
                o.quality_signals_sql(),
                o.repetition_signals_sql(),
                "SELECT doc_id, mean_word_len, symbol_ratio, bullet_frac, "
                "ellipsis_frac, alpha_frac, n_stop_hits, gopher_pass FROM ("
                + o.gopher_rules_sql(**GOPHER_KW)
                + ")",
                "SELECT doc_id, dup_ngram_tokens, dup_ngram_frac FROM ("
                + sp.intra_dup_ngram_sql()
                + ")",
            ],
            on="doc_id",
            order="doc_id",
        ),
        "quantile_filter": o.quantile_filter_sql(q=0.5),
        "top_docs_per_lang": o.top_docs_per_group_sql(3),
        "decontaminate": o.decontaminate_sql(),
        "inverted_index": o.inverted_index_sql(MIN_DF),
        "unigram_logprob": _join_sql(
            [
                o.ccnet_buckets_sql(),
                "SELECT doc_id, bigram_logprob FROM "
                f"({o.bigram_logprob_sql()})",
            ],
            on="doc_id",
            order="doc_id",
        ),
        "tfidf_top_terms": o.tfidf_top_terms_sql(TFIDF_K, MIN_DF),
        "rebalance_corpus": o.rebalance_corpus_sql(),
        "chunk_text": o.chunk_text_sql(200, 50),
        "pack_sequences": sp.pack_sequences_sql(PACK_SHARDS, PACK_BUDGET),
        "dup_span_coverage": _pp_join_sql(
            _join_sql(
                [sp.dup_span_coverage_sql(), sp.remove_dup_spans_sql()],
                on="doc_id",
                order="doc_id",
            )
        ),
        "exact_dedup": _join_sql(
            [
                o.exact_dedup_sql(),
                o.dedup_corpus_sql(),
                dp.dedup_paragraphs_sql(),
                o.dedup_incremental_sql(),
                dp.host_boilerplate_sql(
                    cols=("hb_text", "hb_kept", "hb_dropped"), **HOSTBP_KW
                ),
                bloom_dup_paragraphs_sql(
                    sep=BLOOM_KW["sep"], cols=("bf_text", "bf_kept", "bf_dropped")
                ),
            ],
            on="doc_id",
            order="doc_id",
        ),
        "simhash": o.simhash_sql(),
        "simhash_neardup": o.simhash_neardup_sql(),
        "ngram_jaccard": o.ngram_jaccard_sql(),
        "embedding_neardup": o.embedding_neardup_sql(EMB_NEARDUP_TAU),
        "embed_corpus": o.embed_corpus_sql(),
        "knn_bruteforce": o.knn_bruteforce_sql(KNN_QUERY_IDS, KNN_K),
        "windows": windows_sql,
        "drop_late_events": o.drop_late_events_sql(WINDOW_S),
        "session_assignments": _join_sql(
            [o.assign_sessions_sql(SESSION_GAP_S), o.sessionize_sql(SESSION_GAP_S)],
            on="user_id, session_id",
            order="event_id",
        ),
        "event_attribution": event_attr_sql,
        "event_type_stats": o.event_type_stats_sql(),
    }
    import os

    if os.path.exists(golden_path(sf_dir, "media_features_feat")):
        out["media_features"] = media_features_sql
    if os.path.exists(golden_path(sf_dir, "doc_signals_bpe")):
        # mixed slot: 5 SQL parts + the golden-backed BPE piece counts
        out["doc_signals"] = _join_sql(
            [
                o.token_count_sql(),
                o.lang_id_sql(),
                o.fingerprint_sql(),
                o.nb_classify_sql(),
                _dsir_part_sql(),
                "SELECT doc_id, bpe_tokens, bpe_ids_fp, ug_tokens, ug_ids_fp "
                f"FROM read_parquet('{golden_path(sf_dir, 'doc_signals_bpe')}')",
            ],
            on="doc_id",
            order="doc_id",
        )
    for name, order_cols in GOLDEN_QUERIES.items():
        p = golden_path(sf_dir, name)
        if os.path.exists(p):
            out[name] = _golden_sql(sf_dir, name, order_cols)
        # else: no golden generated for this sf yet -> the driver records
        # the weaker rows-only check for this query at this scale
    return out
