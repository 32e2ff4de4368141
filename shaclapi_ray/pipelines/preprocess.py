"""End-to-end corpus preprocessing: the composed flagship pipeline a
training-data user actually runs, chaining the already-oracled stages
over the documents table:

  0. (optional) C4 line pass      — textstats.clean_lines via
                                    ``clean_lines_kw``
  0g. (optional) Gopher doc filter — textstats.gopher_rules via
                                    ``gopher_kw``
  1. quality filter   — keep docs above their language's exact q-quantile
                        token count (textstats.quality_quantile_filter,
                        return_docs=True)
  2. exact dedup      — first occurrence per byte-identical text survives
                        (dedup.dedup_corpus, strategy='exact')
  3. paragraph dedup  — CCNet-style boilerplate removal: first corpus-wide
                        occurrence of each exact paragraph survives
                        (dedup.dedup_paragraphs)
  4. span removal     — Lee et al. 2021 exact-substring removal of
                        cross-document duplicated n-gram windows
                        (spans.remove_dup_spans)
  5. decontamination  — drop documents sharing any word n-gram with the
                        eval set (decontam.decontaminate, drop=True)
  6. (optional) DSIR selection — Gumbel-top-k importance resample of
                        the cleaned corpus against a target
                        distribution (dsir.dsir_resample via
                        ``dsir_kw``)

Output: (doc_id, text, n_tokens) — the final training corpus rows, fully
deterministic, with a COMPOSED DuckDB oracle (``preprocess_corpus_sql``)
built by nesting each stage's existing SQL generator over the previous
stage's CTE, so the whole chain is value-checked end to end, not just
stage by stage.

Scale shape: every stage is the library operator itself (their documented
exchange/broadcast disciplines apply unchanged). Stage BOUNDARIES are
materialization points — stages 2-5 are multi-pass algorithms (each
builds a global winner/dup/blocklist state, then streams the corpus
against it), so without a boundary each pass would re-execute the entire
upstream chain (2^k blowup). On the default broadcast path stages 2+3
SHARE one boundary: the exact-dedup drop set and the paragraph winner set
are both built from the s1 blocks and applied in one fused map_batches
pass (see preprocess_corpus's docstring for the equivalence argument).
With ``checkpoint_dir`` set, each boundary is written as partitioned
parquet and re-read — the within-run retry/materialization unit; pass
``resume=True`` to also make it the CROSS-RUN resume unit (stages whose
dir carries a completion marker are read back, not recomputed — stale if
inputs/parameters changed, so use a fresh dir per configuration). Without
checkpoint_dir, boundaries materialize in the Ray object store (fine up
to memory+spill, the single-job default). ``dedup_strategy='join'``
switches stages 2-4 to their hash-partitioned-join forms for corpora
whose dup/winner state exceeds the broadcast ceilings.

The reference has no corpus-preprocessing surface; this composes the
training-data operators the brief makes first-class.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.pipelines.decontam import EVAL_MOD, N_GRAM
from shaclapi_ray.pipelines.spans import MIN_DUP_DOCS, N_SPAN, TOKEN_RE


_DONE_MARKER = "_PREPROCESS_STAGE_DONE"


def _boundary(ds, checkpoint_dir: str | None, stage: str, resume: bool = False):
    """Stage boundary: parquet checkpoint or object-store materialization
    (single-job). Either way downstream multi-pass stages re-read blocks
    instead of re-executing the upstream chain — the within-run
    retry/materialization unit.

    With ``resume=True`` a stage dir carrying the completion marker is
    read back instead of recomputed, making checkpoint_dir a CROSS-RUN
    resume unit for a 100 TB run. Resume trusts the marker: rerunning
    with different inputs or parameters into the same checkpoint_dir
    returns the stale stage output — use a fresh dir per configuration.
    Default (resume=False) keeps the idempotent-overwrite semantics: the
    stage dir is removed and rewritten, so a rerun never appends a
    second copy of every file."""
    if checkpoint_dir:
        import os
        import shutil

        import ray.data

        out = os.path.join(checkpoint_dir, stage)
        marker = os.path.join(out, _DONE_MARKER)
        if resume and os.path.exists(marker):
            return ray.data.read_parquet(out)
        shutil.rmtree(out, ignore_errors=True)
        ds.write_parquet(out)
        if not os.path.isdir(out):
            # an all-rows-filtered stage writes zero files; pin the empty
            # result (with schema) so the boundary read and the marker hold
            import pyarrow.parquet as _pq

            os.makedirs(out, exist_ok=True)
            _pq.write_table(
                ds.schema().base_schema.empty_table(),
                os.path.join(out, "empty-0.parquet"),
            )
        with open(marker, "w") as f:
            f.write("done")
        return ray.data.read_parquet(out)
    return ds.materialize()


def preprocess_corpus(
    docs_ds,
    q: float = 0.5,
    group_col: str = "lang",
    sep: str = "\n\n",
    span_n: int = N_SPAN,
    span_min_docs: int = MIN_DUP_DOCS,
    decontam_n: int = N_GRAM,
    eval_mod: int = EVAL_MOD,
    eval_ds=None,
    clean_lines_kw: dict | None = None,
    gopher_kw: dict | None = None,
    checkpoint_dir: str | None = None,
    dedup_strategy: str = "broadcast",
    resume: bool = False,
    dsir_kw: dict | None = None,
):
    """documents -> (doc_id, text, n_tokens): the cleaned, deduplicated,
    decontaminated training corpus (see module docstring for the five
    stages and the scale notes).

    ``clean_lines_kw`` enables an optional STAGE 0: the C4 line pass
    (textstats.clean_lines) with those keyword arguments, run before the
    quality filter — pass ``{}`` for the canonical C4 rules. Off by
    default because the terminal-punctuation rule empties corpora whose
    text carries no sentence punctuation (like the synthetic fixtures).
    ``gopher_kw`` likewise enables an optional document-level Gopher
    rules filter (textstats.gopher_rules, return_docs) after stage 0 —
    pass ``{}`` for the Rae et al. 2021 defaults. The composed oracle
    mirrors whatever configs are passed.

    ``dedup_strategy``: 'broadcast' (default) FUSES stages 2+3 — the
    exact-dedup drop set and the paragraph winner set are both built by
    streaming the SAME s1 boundary blocks (paragraph winners over the
    pre-dedup corpus provably equal winners over the deduped corpus: an
    exactly-dropped doc's keeper has identical text, hence the same
    paragraphs at the same indices under a smaller doc_id, so the min
    key always lands in a keeper), then ONE fused map_batches pass drops
    duplicate docs and rebuilds paragraphs — saving a full corpus
    materialize+scan cycle. 'join' is the beyond-broadcast-ceiling path:
    staged dedup_corpus / dedup_paragraphs(strategy='join') /
    remove_dup_spans(strategy='join'), every global state a
    hash-partitioned Dataset (output-identical, tested).

    ``resume=True`` (with ``checkpoint_dir``) skips any stage whose
    checkpoint dir carries a completion marker — the cross-run resume
    unit; see ``_boundary`` for the staleness caveat.

    ``dsir_kw`` enables an optional STAGE 6: DSIR importance
    resampling (pipelines/dsir.dsir_resample) over the decontaminated
    corpus — the FineWeb/DSIR-style final data-selection cap. Pass the
    dsir_resample kwargs (``k`` required; the cleaned corpus carries
    only (doc_id, text), so the target is normally a separate
    ``target_ds`` — e.g. the raw documents filtered to a language).
    Off by default; the composed oracle mirrors the configuration via
    ``preprocess_corpus_sql(dsir_kw=...)``."""
    import numpy as np
    import ray

    from shaclapi_ray.pipelines.decontam import decontaminate
    from shaclapi_ray.pipelines.dedup import (
        _para_explode,
        _para_reassemble,
        _paragraph_keep_mask,
        collect_sorted_drop_ids,
        dedup_corpus,
        dedup_paragraphs,
        exact_drop_ds,
        paragraph_winner_lookup,
    )
    from shaclapi_ray.pipelines.spans import remove_dup_spans
    from shaclapi_ray.pipelines.textstats import (
        clean_lines,
        gopher_rules,
        quality_quantile_filter,
    )

    if dedup_strategy not in ("broadcast", "join"):
        raise ValueError(f"unknown dedup_strategy {dedup_strategy!r}")

    docs = docs_ds
    if clean_lines_kw is not None:
        # stage 0 rewrites text; carry the columns later stages consume
        rest = [c for c in docs_ds.schema().names if c not in ("doc_id", "text")]
        docs = clean_lines(docs, keep_cols=tuple(rest), **clean_lines_kw)
        docs = docs.drop_columns(
            ["n_kept_lines", "n_dropped_lines"]
        ).rename_columns({"clean_text": "text"})
        docs = _boundary(docs, checkpoint_dir, "s0_lines", resume)

    if gopher_kw is not None:
        # row-local filter — streams, no boundary needed before the next
        # stage's own materialization
        docs = gopher_rules(docs, return_docs=True, **gopher_kw)

    docs = quality_quantile_filter(
        docs, q=q, group_col=group_col, return_docs=True
    )
    docs = _boundary(docs, checkpoint_dir, "s1_quality", resume)

    if dedup_strategy == "broadcast":
        # fused stages 2+3: both global states stream the s1 blocks; one
        # map_batches pass applies the drop filter AND the paragraph
        # rebuild (no intermediate corpus materialization between them)
        drops = exact_drop_ds(docs)
        drop_ids = (
            collect_sorted_drop_ids(drops)
            if drops is not None
            else np.empty(0, dtype=np.int64)
        )
        drop_ref = ray.put(drop_ids)
        lookup_ref = ray.put(paragraph_winner_lookup(docs, sep))

        def drop_then_rebuild(batch: pa.Table) -> pa.Table:
            d = ray.get(drop_ref)
            if d.size:
                ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(d, ids)
                hit = (pos < d.size) & (
                    d[np.clip(pos, 0, max(0, d.size - 1))] == ids
                )
                batch = batch.filter(pa.array(~hit))
            df = _para_explode(batch, sep, "text")
            keep = _paragraph_keep_mask(df, ray.get(lookup_ref))
            out = _para_reassemble(df, keep, sep)
            return out.select(["doc_id", "clean_text"]).rename_columns(
                ["doc_id", "text"]
            )

        docs = docs.select_columns(["doc_id", "text"]).map_batches(
            drop_then_rebuild, batch_format="pyarrow", zero_copy_batch=True
        )
        docs = _boundary(docs, checkpoint_dir, "s3_paragraphs", resume)
    else:
        docs = dedup_corpus(docs, strategy="exact")
        docs = _boundary(docs, checkpoint_dir, "s2_dedup", resume)

        docs = dedup_paragraphs(docs, sep=sep, strategy="join").select_columns(
            ["doc_id", "clean_text"]
        ).rename_columns({"clean_text": "text"})
        docs = _boundary(docs, checkpoint_dir, "s3_paragraphs", resume)

    docs = remove_dup_spans(
        docs, n=span_n, min_docs=span_min_docs, strategy=dedup_strategy
    ).select_columns(
        ["doc_id", "clean_text"]
    ).rename_columns({"clean_text": "text"})
    docs = _boundary(docs, checkpoint_dir, "s4_spans", resume)

    docs = decontaminate(
        docs, eval_ds=eval_ds, n=decontam_n, eval_mod=eval_mod, drop=True
    )

    if dsir_kw is not None:
        from shaclapi_ray.pipelines.dsir import dsir_resample

        # dsir is multi-pass (count, score, filter) — boundary first so
        # the decontaminated corpus isn't recomputed per pass
        docs = _boundary(docs, checkpoint_dir, "s5_decontam", resume)
        docs = dsir_resample(docs, materialize=False, **dsir_kw)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "n_tokens": pc.cast(
                    pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64()
                ),
            }
        )

    return docs.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def preprocess_corpus_sql(
    q: float = 0.5,
    sep: str = "\n\n",
    span_n: int = N_SPAN,
    span_min_docs: int = MIN_DUP_DOCS,
    decontam_n: int = N_GRAM,
    eval_mod: int = EVAL_MOD,
    clean_lines_kw: dict | None = None,
    gopher_kw: dict | None = None,
    dsir_kw: dict | None = None,
) -> str:
    """The composed DuckDB oracle: each stage's existing SQL generator is
    aimed at the previous stage's CTE via its ``src`` parameter, so the
    chain's semantics are defined by exactly the SQL already validated
    per stage. Output (doc_id, pp_text, pp_n_tokens).

    ``dsir_kw`` mirrors the optional stage-6 selection: the
    dsir_resample_sql kwargs with ``target_src`` a SQL subquery string
    for the target corpus (e.g. "(SELECT * FROM documents WHERE
    lang = 'en')") — aimed at the decontaminated-chain CTE via src=."""
    from shaclapi_ray.oracles import (
        clean_lines_sql,
        decontaminate_sql,
        dedup_corpus_sql,
        gopher_rules_sql,
        quantile_filter_sql,
    )
    from shaclapi_ray.pipelines.dedup import dedup_paragraphs_sql
    from shaclapi_ray.pipelines.spans import remove_dup_spans_sql

    base = "documents"
    pre = ""
    if clean_lines_kw is not None:
        pre += f"""s0 AS (
  SELECT c.doc_id, c.clean_text AS text, d.lang, d.source, d.n_chars
  FROM ({clean_lines_sql(**clean_lines_kw)}) c
  JOIN documents d USING (doc_id)
),
"""
        base = "s0"
    if gopher_kw is not None:
        pre += f"""s0g AS (
  SELECT d.* FROM {base} d
  JOIN ({gopher_rules_sql(src=base, **gopher_kw)}) g USING (doc_id)
  WHERE g.gopher_pass
),
"""
        base = "s0g"

    chain = f"""{pre}s1 AS (
  SELECT d.* FROM {base} d
  JOIN ({quantile_filter_sql(q, src=base)}) f USING (doc_id)
),
s2 AS ({dedup_corpus_sql(src="s1")}),
s3 AS (
  SELECT doc_id, clean_text AS text
  FROM ({dedup_paragraphs_sql(sep, src="s2")})
),
s4 AS (
  SELECT doc_id, clean_text AS text
  FROM ({remove_dup_spans_sql(span_n, span_min_docs, src="s3")})
),
dec AS ({decontaminate_sql(decontam_n, eval_mod, src="s4")})"""

    if dsir_kw is not None:
        from shaclapi_ray.pipelines.dsir import dsir_resample_sql

        sel = dsir_resample_sql(src="s5", cols=("doc_id", "text"), **dsir_kw)
        return f"""
WITH {chain},
s5 AS (
  SELECT s4.doc_id, s4.text FROM s4 JOIN dec USING (doc_id)
  WHERE NOT dec.contaminated
)
SELECT doc_id, text AS pp_text,
       length(regexp_extract_all(text, '{TOKEN_RE}'))::BIGINT AS pp_n_tokens
FROM ({sel}) ORDER BY doc_id"""

    return f"""
WITH {chain}
SELECT s4.doc_id, s4.text AS pp_text,
       length(regexp_extract_all(s4.text, '{TOKEN_RE}'))::BIGINT AS pp_n_tokens
FROM s4 JOIN dec USING (doc_id)
WHERE NOT dec.contaminated
ORDER BY doc_id
"""
