"""The page-level curation flagship: the canonical Common-Crawl page
chain run BEFORE any document-level processing.

    latest_snapshot  ->  filter_by_host(learned host_curation)  ->  cap_per_host

Stage 1 collapses recrawls to each url's newest capture; stage 2 learns
the per-host blocklist from the snapshot-filtered stream and applies
it; stage 3 caps any single host's share. The surviving pages feed
extract_text / preprocess_corpus downstream.

Composition mirrors ``pipelines/preprocess.py`` and SHARES its
``_boundary`` implementation: each stage is the library operator, stage
boundaries either materialize in the object store or parquet-checkpoint
under ``checkpoint_dir`` (the within-run retry/materialization unit at
100 TB scale — boundaries are REQUIRED because every stage is
multi-pass over its input; without them a lazy chain would re-execute
all upstream stages once per pass), and ``resume=True`` makes
checkpointed stages the CROSS-RUN resume unit (completion-marker
semantics and staleness caveats exactly as preprocess documents). The
SQL mirror (oracles.curate_pages_sql) chains the stages' rows
generators through their ``src`` seam, so the WHOLE chain is
value-checked end-to-end, not just each stage.
"""

from __future__ import annotations

from shaclapi_ray.pipelines.preprocess import _boundary


def curate_pages(pages_ds, *, cap_k: int, max_dup_pct: int = 10,
                 min_mean_tokens: int = 0, min_docs: int = 2,
                 urlq_kw: dict | None = None,
                 checkpoint_dir: str | None = None, resume: bool = False,
                 latest_strategy: str = "broadcast",
                 host_strategy: str = "broadcast",
                 cap_strategy: str = "broadcast"):
    """Run the page-curation chain over a pages Dataset (must carry
    url, warc_ts, text). Returns the surviving pages.
    ``urlq_kw`` enables the RefinedWeb URL gate
    (extract.url_quality_filter kwargs) as stage 0 — row-local and
    streaming, so it fuses into the first latest_snapshot scan with NO
    boundary (the preprocess pattern for its optional C4/Gopher
    pre-stages). Each multi-pass stage's beyond-broadcast-ceiling
    fallback is reachable from the composed flagship:
    ``latest_strategy`` / ``host_strategy`` / ``cap_strategy`` pass
    through to latest_snapshot, filter_by_host and cap_per_host
    ('broadcast' or 'join'). ``resume=True`` (with ``checkpoint_dir``)
    skips stages whose dir carries the completion marker."""
    from shaclapi_ray.pipelines.freshness import cap_per_host, latest_snapshot
    from shaclapi_ray.pipelines.hostcure import filter_by_host, host_curation

    if urlq_kw is not None:
        from shaclapi_ray.pipelines.extract import url_quality_frame

        kw = dict(urlq_kw)

        def gate(batch):
            if batch.num_rows == 0:
                return batch
            kept = url_quality_frame(batch, **kw)["kept"]
            return batch.filter(kept.combine_chunks())

        pages_ds = pages_ds.map_batches(
            gate, batch_format="pyarrow", zero_copy_batch=True
        )

    s1 = _boundary(
        latest_snapshot(pages_ds, strategy=latest_strategy),
        checkpoint_dir,
        "s1_latest",
        resume,
    )
    verdicts = host_curation(
        s1,
        max_dup_pct=max_dup_pct,
        min_mean_tokens=min_mean_tokens,
        min_docs=min_docs,
    ).materialize()
    s2 = filter_by_host(s1, verdicts, strategy=host_strategy)
    if checkpoint_dir is not None or host_strategy != "broadcast":
        # checkpointed runs keep the s2 dir as the cross-run resume unit;
        # the join path materializes because consuming a lazy join twice
        # would re-execute the whole keyed exchange per cap pass
        s2 = _boundary(s2, checkpoint_dir, "s2_hosts", resume)
    # else FUSED (the preprocess stages-2+3 pattern): filter_by_host's
    # broadcast form is row-local with its blocked set built once at call
    # time, so cap_per_host's two passes (rank, filter) re-run the cheap
    # host filter over s1's materialized blocks instead of paying a full
    # filtered-corpus materialization between the stages
    return cap_per_host(s2, cap_k, strategy=cap_strategy)
