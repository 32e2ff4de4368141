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
    import ray.data

    from shaclapi_ray.stages.links import extract_links

    pages = ray.data.read_parquet(_pages(sf_dir), columns=["url", "html"])
    return _sorted(extract_links(pages), ["url", "target_url"])


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
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import referential_schema

    res = ValidationEngine(
        referential_schema(), JobConfig(target_shape="LinkedPageShape")
    ).run(_pages(sf_dir))
    v = res.verdicts().to_pandas()
    v = v[v.shape_id == "LinkedPageShape"][["url", "valid"]]
    return _sorted(v, ["url", "valid"])


def _q_inverse_linked_verdicts(sf_dir: str):
    """Inverse (inbound) referential constraint — sh:inversePath analog."""
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import inverse_schema

    res = ValidationEngine(
        inverse_schema(), JobConfig(target_shape="PopularPageShape")
    ).run(_pages(sf_dir))
    v = res.verdicts().to_pandas()
    v = v[v.shape_id == "PopularPageShape"][["url", "valid"]]
    return _sorted(v, ["url", "valid"])


def _q_unique_url_verdicts(sf_dir: str):
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import unique_url_shape

    res = ValidationEngine([unique_url_shape()], JobConfig()).run(_pages(sf_dir))
    return _sorted(res.verdicts().select_columns(["url", "valid"]), ["url", "valid"])


def _q_verdict_counts(sf_dir: str):
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import column_schema

    res = ValidationEngine(column_schema(), JobConfig()).run(_pages(sf_dir))
    return _sorted(res.verdict_counts(), ["shape_id", "valid"])


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


def _q_profile_columns(sf_dir: str):
    import ray.data

    from shaclapi_ray.pipelines.profile import profile_columns

    return profile_columns(ray.data.read_parquet(_pages(sf_dir)))


def _q_psi_drift(sf_dir: str):
    import ray.data

    from shaclapi_ray.pipelines.profile import psi_drift

    return psi_drift(
        ray.data.read_parquet(_pages(sf_dir), columns=["url", "warc_ts", "text"])
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
    import pandas as pd
    import ray.data

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
    return pd.DataFrame({"distinct_est": [int(round(merged.estimate()))]})


# documents / embeddings / events ------------------------------------------


def _docs(sf_dir: str):
    from shaclapi_ray.io import read_table_split

    return read_table_split(f"{sf_dir}/documents.parquet")


def _q_token_count(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import token_count

    return _sorted(token_count(_docs(sf_dir)), ["doc_id"])


SAMPLE_FRACTION = 0.35


def _q_sample_corpus(sf_dir: str):
    from shaclapi_ray.pipelines.textstats import sample_corpus

    return _sorted(sample_corpus(_docs(sf_dir), SAMPLE_FRACTION), ["doc_id"])


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
    from shaclapi_ray.pipelines.textstats import rolling_fingerprint

    return _sorted(rolling_fingerprint(_docs(sf_dir)), ["doc_id"])


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
    from shaclapi_ray.pipelines.textstats import unigram_logprob

    return _sorted(unigram_logprob(_docs(sf_dir)), ["doc_id"])


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
    from shaclapi_ray.pipelines.spans import dup_span_coverage

    return _sorted(dup_span_coverage(_docs(sf_dir)), ["doc_id"])


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
    from shaclapi_ray.pipelines.dedup import dedup_corpus

    return _sorted(dedup_corpus(_docs(sf_dir), strategy="minhash"), ["doc_id"])


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
    """Scale path: bucketed multi-table hyperplane LSH (approximate).

    Bucket-bit count must be sized to tau: P(bit agrees) = 1 - theta/pi,
    so at this fixture's LOW tau (0.45, theta ~63 deg) the default 12-bit
    buckets give ~3% recall by construction. 4 planes x 12 tables puts
    recall near 0.8 here (measured 11/14 true pairs); the (12, 6) default
    is tuned for realistic near-dup thresholds (tau >= 0.9)."""
    from shaclapi_ray.pipelines.dedup import embedding_neardup_pairs

    return _sorted(
        embedding_neardup_pairs(
            _emb(sf_dir), tau=EMB_NEARDUP_TAU, method="lsh", n_planes=4, n_tables=12
        ),
        ["a", "b"],
    )


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
    from shaclapi_ray.pipelines.knn import knn_ivf

    return _sorted(
        knn_ivf(_emb(sf_dir), KNN_QUERY_IDS, k=KNN_K), ["query_id", "rank"]
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
    """Sort/limit/top-k coverage: most-linked-to hosts (count desc, host
    asc tie-break — deterministic)."""
    import ray.data

    from shaclapi_ray.io import read_parquet
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
    return counts.head(5).reset_index(drop=True)


def _q_or_shape_verdicts(sf_dir: str):
    from shaclapi_ray.engine import JobConfig, ValidationEngine
    from shaclapi_ray.fixtures import or_shape

    res = ValidationEngine([or_shape()], JobConfig()).run(_pages(sf_dir))
    return _sorted(res.verdicts().select_columns(["url", "valid"]), ["url", "valid"])


def queries() -> dict[str, Callable[[str], Any]]:
    from shaclapi_ray.fixtures import (
        fresh_page_shape,
        lang_shape,
        target_page_shape,
        url_shape,
    )

    return {
        # validation engine (SURVEY.md §2 core)
        "url_shape_verdicts": _shape_verdict_query(url_shape),
        "fresh_page_verdicts": _shape_verdict_query(fresh_page_shape),
        "lang_shape_verdicts": _shape_verdict_query(lang_shape),
        "target_page_verdicts": _shape_verdict_query(target_page_shape),
        "or_shape_verdicts": _q_or_shape_verdicts,
        "column_violations": _q_column_violations,
        "links": _q_links,
        "extract_text": _q_extract_text,
        "url_canonicalize": _q_url_canonicalize,
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
        "pagerank": _q_pagerank,
        "link_components": _q_link_components,
        "hll_distinct_urls": _q_hll_distinct_urls,
        # text analysis
        "token_count": _q_token_count,
        "normalize_text": _q_normalize_text,
        "pii_scan": _q_pii_scan,
        "sample_corpus": _q_sample_corpus,
        "quality_signals": _q_quality_signals,
        "quantile_filter": _q_quantile_filter,
        "repetition_signals": _q_repetition_signals,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "rolling_fingerprint": _q_rolling_fingerprint,
        "decontaminate": _q_decontaminate,
        "doc_frequency": _q_doc_frequency,
        "inverted_index": _q_inverted_index,
        "unigram_logprob": _q_unigram_logprob,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "rebalance_corpus": _q_rebalance_corpus,
        "chunk_text": _q_chunk_text,
        "pack_sequences": _q_pack_sequences,
        # dedup
        "dup_span_coverage": _q_dup_span_coverage,
        "exact_dedup": _q_exact_dedup,
        "dedup_corpus": _q_dedup_corpus,
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
        "tumbling_window": _q_tumbling_window,
        "drop_late_events": _q_drop_late_events,
        "hopping_window": _q_hopping_window,
        "sessionize": _q_sessionize,
        "assign_sessions": _q_assign_sessions,
        "attribute_events": _q_attribute_events,
        "event_type_stats": _q_event_type_stats,
        "parse_props": _q_parse_props,
        # multimodal
        "media_metadata": _q_media_metadata,
        "featurize_media": _q_featurize_media,
        "resize_media": _q_resize_media,
        "sample_frames": _q_sample_frames,
    }


def _profile_sql(pages_dir: str) -> str:
    from shaclapi_ray.pipelines.profile import profile_columns_sql

    return profile_columns_sql(pages_dir)


def _psi_sql(pages_dir: str) -> str:
    from shaclapi_ray.pipelines.profile import psi_drift_sql

    return psi_drift_sql(pages_dir)


def _pagerank_sql(pages_dir: str) -> str:
    from shaclapi_ray.pipelines.graph import pagerank_sql

    return pagerank_sql(pages_dir)


def _components_sql(pages_dir: str) -> str:
    from shaclapi_ray.pipelines.graph import connected_components_sql

    return connected_components_sql(pages_dir)


def oracle_sql() -> dict[str, str]:
    return oracle_sql_for(SF01)  # driver compares at sf=0.01


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    from shaclapi_ray import oracles as o
    from shaclapi_ray.pipelines import spans as sp
    from shaclapi_ray.fixtures import (
        fresh_page_shape,
        lang_shape,
        target_page_shape,
        url_shape,
    )

    pages_dir = _pages(sf_dir)
    return {
        "url_shape_verdicts": o.shape_verdicts_sql(url_shape(), pages_dir),
        "fresh_page_verdicts": o.shape_verdicts_sql(fresh_page_shape(), pages_dir),
        "lang_shape_verdicts": o.shape_verdicts_sql(lang_shape(), pages_dir),
        "target_page_verdicts": o.shape_verdicts_sql(target_page_shape(), pages_dir),
        "or_shape_verdicts": o.or_shape_verdicts_sql(pages_dir),
        "column_violations": o.violations_sql(o.all_column_shapes(), pages_dir),
        "links": o.links_sql(pages_dir),
        "extract_text": o.extract_text_sql(pages_dir),
        "url_canonicalize": o.url_canonicalize_sql(pages_dir),
        "top_hosts": o.top_hosts_sql(pages_dir),
        "linked_page_verdicts": o.linked_page_verdicts_sql(pages_dir),
        "inverse_linked_verdicts": o.inverse_linked_verdicts_sql(pages_dir),
        "unique_url_verdicts": o.unique_url_verdicts_sql(pages_dir),
        "verdict_counts": o.verdict_counts_sql(o.all_column_shapes(), pages_dir),
        "reduce_schema": o.reduce_schema_sql(["LinkedPageShape", "TargetPageShape"]),
        "annotated_pages": o.annotated_pages_sql(pages_dir),
        "profile_columns": _profile_sql(pages_dir),
        "psi_drift": _psi_sql(pages_dir),
        "pagerank": _pagerank_sql(pages_dir),
        "link_components": _components_sql(pages_dir),
        "token_count": o.token_count_sql(),
        "normalize_text": o.normalize_text_sql(),
        "pii_scan": o.pii_scan_sql(),
        "sample_corpus": o.sample_corpus_sql(SAMPLE_FRACTION),
        "quality_signals": o.quality_signals_sql(),
        "quantile_filter": o.quantile_filter_sql(q=0.5),
        "repetition_signals": o.repetition_signals_sql(),
        "top_docs_per_lang": o.top_docs_per_group_sql(3),
        "lang_id": o.lang_id_sql(),
        "fingerprint": o.fingerprint_sql(),
        "decontaminate": o.decontaminate_sql(),
        "doc_frequency": o.doc_frequency_sql(MIN_DF),
        "inverted_index": o.inverted_index_sql(MIN_DF),
        "unigram_logprob": o.unigram_logprob_sql(),
        "tfidf_top_terms": o.tfidf_top_terms_sql(TFIDF_K, MIN_DF),
        "rebalance_corpus": o.rebalance_corpus_sql(),
        "chunk_text": o.chunk_text_sql(200, 50),
        "pack_sequences": sp.pack_sequences_sql(PACK_SHARDS, PACK_BUDGET),
        "dup_span_coverage": sp.dup_span_coverage_sql(),
        "exact_dedup": o.exact_dedup_sql(),
        "simhash": o.simhash_sql(),
        "simhash_neardup": o.simhash_neardup_sql(),
        "dedup_corpus": o.dedup_corpus_sql(),
        "ngram_jaccard": o.ngram_jaccard_sql(),
        "embedding_neardup": o.embedding_neardup_sql(EMB_NEARDUP_TAU),
        "embed_corpus": o.embed_corpus_sql(),
        "knn_bruteforce": o.knn_bruteforce_sql(KNN_QUERY_IDS, KNN_K),
        "tumbling_window": o.tumbling_window_sql(WINDOW_S),
        "drop_late_events": o.drop_late_events_sql(WINDOW_S),
        "hopping_window": o.hopping_window_sql(WINDOW_S, HOP_S),
        "sessionize": o.sessionize_sql(SESSION_GAP_S),
        "assign_sessions": o.assign_sessions_sql(SESSION_GAP_S),
        "attribute_events": o.attribute_events_sql(),
        "event_type_stats": o.event_type_stats_sql(),
        "parse_props": o.parse_props_sql(),
        "media_metadata": o.media_metadata_sql(pages_dir),
        # intentionally no oracle (non-SQL-expressible / approximate;
        # each has a hard check in tests/ instead — golden values,
        # bruteforce equivalence, or planted-pair recall):
        # drift_verdicts, hll_distinct_urls, rolling_fingerprint,
        # minhash_clusters, embedding_neardup_lsh, knn_ivf,
        # featurize_media
    }
