"""ValidationEngine — orchestrates constraint-DAG evaluation over Ray Data.

The Ray-Data recast of the reference's main pipeline
(/root/reference/shaclapi/api.py:73-236, traced in SURVEY.md §3.1):

reference stage               | here
------------------------------|-----------------------------------------------
CONTACT_SOURCE (endpoint)     | ray.data.read_parquet(pages, columns=pruned)
VALIDATION (backend engine)   | Pass A: fused map_batches column predicates;
                              | Pass B: link extraction + hash-partitioned
                              |         referential joins; global constraints
                              |         (uniqueness counts, drift digests)
prepare_validation reductions | ConstraintDAG.reduce / project / node_order /
                              | push_target_filter (driver-side)
XJOIN (Xgoptional ⟕)          | annotate(): pages ⟕ verdict_agg on url
POST_PROCESSING + OUTPUT      | test_output(): verdict collection into
                              | validTargets/invalidTargets/advanced* sets

Early pass/fail short-circuiting: per-batch target-mask skip in Pass A, and
DAG-level pruning before any cluster work (shapes unreachable from the
target are never evaluated — the reference's shape-network reduction).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

from shaclapi_ray.shapes.dag import ConstraintDAG
from shaclapi_ray.shapes.ir import (
    DriftConstraint,
    Pred,
    RefConstraint,
    Shape,
    UniqueConstraint,
    load_schema_dir,
)
from shaclapi_ray.stages.links import extract_links
from shaclapi_ray.stages.predicates import EVENTS_SCHEMA, ColumnShapeEvaluator
from shaclapi_ray.stages.referential import (
    child_valid_urls,
    combine_ref_verdicts,
    plain_link_counts,
    qualified_counts,
)
from shaclapi_ray.state.sketches import TDigest, ks_statistic


@dataclass
class JobConfig:
    """Engine job spec (≙ the reference's ~25-option config dict,
    /root/reference/shaclapi/config.py:5-331 — kept to the options that
    change semantics; execution knobs are explicit Ray parameters)."""

    target_shape: str | None = None
    row_filter: Pred | None = None  # ANDed onto the target shape's target
    prune: bool = True  # ≙ prune_shape_network
    requested_columns: set[str] | None = None  # ≙ remove_constraints
    replace_target_query: bool = True  # apply row_filter pushdown
    ref_strategy: str = "auto"  # broadcast | bucket | auto (semi-join side)
    combine_strategy: str = "auto"  # broadcast | bucket | auto (counts join)
    num_partitions: int = 32
    salt_k: int = 0  # >1 => salted bucket join
    bloom_prefilter: bool = False
    batch_size: int | None = None  # None => block-sized batches
    agg_mode: str = "auto"  # driver | shuffle | auto (keyed count combine)
    concurrency: Any = None  # actor-pool size for pass A; None => tasks
    drift_threshold: float = 0.25
    stats_order: bool = True  # 'TARGET IN BIG' order from parquet stats
    backend: str = "auto"  # evaluation backend (backends.BACKENDS)
    scan_pushdown: bool = True  # push weakened target filters into the read


@dataclass
class ValidationResult:
    events: ray.data.Dataset  # EVENTS_SCHEMA, materialized
    dag: ConstraintDAG
    target_shape: str | None
    order: list[str]
    timings: dict[str, float] = field(default_factory=dict)

    def verdicts(self) -> ray.data.Dataset:
        return _filter_events(self.events, kind="verdict").select_columns(
            ["url", "shape_id", "valid", "reason"]
        )

    def violations(self) -> ray.data.Dataset:
        return _filter_events(self.events, kind="violation").select_columns(
            ["url", "shape_id", "constraint", "offending_value"]
        )

    def test_output(self) -> dict[str, list[tuple[str, str]]]:
        """The reference's test-format result dict
        (/root/reference/shaclapi/multiprocessing/functions.py:119,152-173):
        valid/invalid × target/advanced, sorted by (url, shape_id).
        Partition-level verdicts (url like 'host:...') are excluded —
        they're engine-level additions, reported via metrics."""
        tbl = _collect(self.verdicts())
        out: dict[str, list[tuple[str, str]]] = {
            "validTargets": [],
            "invalidTargets": [],
            "advancedValid": [],
            "advancedInvalid": [],
        }
        rows = sorted(
            zip(
                tbl["url"].to_pylist(),
                tbl["shape_id"].to_pylist(),
                tbl["valid"].to_pylist(),
                tbl["reason"].to_pylist(),
            )
        )
        for url, shape_id, valid, reason in rows:
            if url.startswith("host:"):
                continue
            is_target = self.target_shape is None or shape_id == self.target_shape
            if is_target:
                key = "validTargets" if valid else "invalidTargets"
            else:
                key = "advancedValid" if valid else "advancedInvalid"
            out[key].append((url, reason))
        return out

    def verdict_counts(self) -> pa.Table:
        """Per-shape valid/invalid counts (≙ the /validation route's
        {shape: {valid, invalid}} summary,
        /root/reference/shaclapi/api.py:372-387)."""
        from shaclapi_ray.stages.aggregates import combine_partials_multi

        def partial(batch: pa.Table) -> pa.Table:
            g = (
                batch.select(["shape_id", "valid"])
                .group_by(["shape_id", "valid"])
                .aggregate([("valid", "count")])
            )
            return pa.table(
                {
                    "shape_id": g["shape_id"],
                    "valid": g["valid"],
                    "n": pc.cast(g["valid_count"], pa.int64()),
                }
            )

        ds = combine_partials_multi(
            self.verdicts().map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["shape_id", "valid"],
            ["n"],
        )
        return _collect(ds).sort_by([("shape_id", "ascending"), ("valid", "ascending")])

    def verdict_rollup(self) -> pa.Table:
        """(host, shape_id, n_valid, n_invalid): the ops-dashboard view of
        the verdict stream — which HOSTS produce the violations, per shape.
        Host = the repo-standard regex over the verdict's url (nulls and
        non-absolute urls roll into ''); the engine's partition-level
        'host:...' verdict rows are EXCLUDED (they aggregate other rows —
        including them would double-count, and the SQL oracle computes
        verdicts from pages directly). One per-batch pre-aggregated
        (host, shape_id) partial pass + the unified combine — the exchange
        is |hosts|×|shapes| rows, never the verdict stream."""
        from shaclapi_ray.pipelines.hostcure import _host_expr
        from shaclapi_ray.stages.aggregates import combine_partials_multi

        def partial(batch: pa.Table) -> pa.Table:
            keep = pc.invert(
                pc.starts_with(pc.fill_null(batch["url"], ""), "host:")
            )
            t = batch.filter(keep)
            valid_i = pc.cast(t["valid"], pa.int64())
            g = pa.table(
                {
                    "host": _host_expr(t["url"]),
                    "shape_id": t["shape_id"],
                    "n_valid": valid_i,
                    "n_invalid": pc.subtract(pa.scalar(1, pa.int64()), valid_i),
                }
            ).group_by(["host", "shape_id"]).aggregate(
                [("n_valid", "sum"), ("n_invalid", "sum")]
            )
            return pa.table(
                {
                    "host": g["host"],
                    "shape_id": g["shape_id"],
                    "n_valid": g["n_valid_sum"],
                    "n_invalid": g["n_invalid_sum"],
                }
            )

        ds = combine_partials_multi(
            self.verdicts().map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["host", "shape_id"],
            ["n_valid", "n_invalid"],
        )
        return _collect(ds).sort_by(
            [("host", "ascending"), ("shape_id", "ascending")]
        )

    def annotate(self, pages_ds: ray.data.Dataset, num_partitions: int = 32):
        """pages ⟕ target-shape verdicts on url — the Xgoptional left-outer
        join (/root/reference/shaclapi/multiprocessing/Xgoptional/
        Xgoptional.py:23-256): rows never targeted flow through with null
        verdict columns."""
        v = self.verdicts()
        if self.target_shape is not None:
            v = _filter_events(
                self.events, kind="verdict", shape_id=self.target_shape
            ).select_columns(["url", "valid", "reason"])
        else:
            v = v.select_columns(["url", "valid", "reason"])
        v = v.map_batches(
            lambda t: pa.table(
                {"v_url": t["url"], "valid": t["valid"], "reason": t["reason"]}
            ),
            batch_format="pyarrow",
        )
        from shaclapi_ray.stages.joins import drop_empty_blocks
        from shaclapi_ray.stages.referential import clamp_partitions

        pages_nb = drop_empty_blocks(pages_ds)
        v_nb = drop_empty_blocks(v)
        if pages_nb is None:
            return pages_ds  # no pages: empty annotated output
        if v_nb is None:
            # no verdicts: every row flows through with null verdict cols
            # (the Xgoptional unmatched-left 'bag' semantics)
            def add_nulls(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "valid", pa.nulls(t.num_rows, pa.bool_())
                ).append_column("reason", pa.nulls(t.num_rows, pa.string()))

            return pages_nb.map_batches(
                add_nulls, batch_format="pyarrow", zero_copy_batch=True
            )
        return pages_nb.join(
            v_nb,
            join_type="left_outer",
            num_partitions=clamp_partitions(num_partitions),
            on=("url",),
            right_on=("v_url",),
        )


def _filter_events(events: ray.data.Dataset, **conds) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        mask = None
        for col, val in conds.items():
            m = pc.equal(batch[col], val)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(pc.fill_null(mask, False))

    return events.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _collect(ds: ray.data.Dataset) -> pa.Table:
    refs = ds.to_arrow_refs()
    tables = [ray.get(r) for r in refs]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return ds.schema().base_schema.empty_table() if hasattr(
            ds.schema(), "base_schema"
        ) else EVENTS_SCHEMA.empty_table()
    return pa.concat_tables(tables).combine_chunks()


class ValidationEngine:
    """Shape-schema validation over a pages table.

    Data contract: ``url`` is the focus-node key (the IRI analog of the
    reference's SHACL instances) and is expected to be UNIQUE per corpus
    — the synthetic fixtures guarantee it, and `exact_dedup`/
    `dedup_corpus` are the operators that enforce it upstream on real
    data. With duplicate urls, per-row evaluation (fused backend) and
    per-url aggregation (staged backend) legitimately diverge: SHACL
    semantics are per focus node, so deduplicate first."""

    def __init__(self, shapes: list[Shape] | str, config: JobConfig | None = None):
        if isinstance(shapes, str):
            shapes = load_schema_dir(shapes)
        self.config = config or JobConfig()
        dag = ConstraintDAG.from_shapes(shapes)
        dag.validate()
        cfg = self.config
        targets = [cfg.target_shape] if cfg.target_shape else None
        if cfg.prune and targets:
            dag = dag.reduce(targets)
        if cfg.requested_columns is not None:
            dag = dag.project(cfg.requested_columns, targets)
        if cfg.replace_target_query and cfg.target_shape and cfg.row_filter:
            dag = dag.push_target_filter(cfg.target_shape, cfg.row_filter)
        self.dag = dag
        self.order = dag.node_order(targets)

    # -- column selection for the pruned read --------------------------------
    def pass_a_columns(self) -> list[str]:
        """Columns pass A must read: target predicates + column constraints.

        ``html`` is normally excluded (RefConstraints read it via the
        dedicated link-extraction pass), but a column constraint that
        genuinely matches on html (e.g. a 'has no links' regex option)
        pulls it in."""
        from shaclapi_ray.shapes.ir import pred_columns

        cols = {"url"}
        for s in self.dag.shapes.values():
            cols |= pred_columns(s.target)
            for c in s.constraints:
                if not isinstance(c, (RefConstraint, DriftConstraint)):
                    cols |= c.columns()
        return sorted(cols)

    def _scan_filter_expr(self, shape_subset, pages_path: str):
        """Weakened OR-of-target-filters scan expression for the pass-A
        read, or None when pushdown is unsound/useless.

        Sound because (a) pass A emits events only for rows matching SOME
        shape's target (the per-batch target-mask skip), so rows outside
        the union are pure read cost; (b) each shape's expression is a
        SUPERSET of its targets (shapes.ir.pred_to_scan_expr weakening);
        (c) it is disabled whenever any shape carries a Unique or Drift
        constraint — those aggregate over ALL rows of their source read,
        which pruning would change. A shape with an untranslatable (or
        absent) target restriction makes the union unbounded -> None."""
        from shaclapi_ray.shapes.ir import UniqueConstraint, pred_to_scan_expr

        if any(
            isinstance(c, (UniqueConstraint, DriftConstraint))
            for s in self.dag.shapes.values()
            for c in s.constraints
        ):
            return None
        try:
            import pyarrow.parquet as _pq

            f = pages_path
            import os as _os

            if _os.path.isdir(pages_path):
                names = [
                    n for n in _os.listdir(pages_path) if n.endswith(".parquet")
                ]
                if not names:
                    return None
                f = _os.path.join(pages_path, sorted(names)[0])
            schema = _pq.read_schema(f)
        except Exception:
            schema = None
        exprs = []
        for s in shape_subset:
            e = pred_to_scan_expr(s.target, schema)
            if e is None:
                return None
            exprs.append(e)
        if not exprs:
            return None
        out = exprs[0]
        for e in exprs[1:]:
            out = out | e
        return out

    def needs_links(self) -> bool:
        return any(
            isinstance(c, RefConstraint)
            for s in self.dag.shapes.values()
            for c in s.constraints
        )

    # -- main ----------------------------------------------------------------
    def run(
        self,
        pages_path: str | ray.data.Dataset,
        extra_child_events: ray.data.Dataset | None = None,
        links_override: ray.data.Dataset | None = None,
    ) -> ValidationResult:
        """``extra_child_events`` (optional) injects EVENTS_SCHEMA rows —
        kind='verdict' verdicts reused from persisted state — into the
        pass-B event view so referential child-valid sets see the FULL
        snapshot while only a subset of pages streams through the run
        (incremental.incremental_validate's referential path). Injected
        rows feed child_valid_urls / the fused child hash sets only; they
        are excluded from the returned result's events.

        ``links_override`` (optional) replaces the staged ref pipeline's
        extracted links with a caller-supplied (url, target_url) Dataset.
        Required when the pages input is a SUBSET of the snapshot and the
        DAG carries inverse (inbound) refs: inbound counts aggregate
        links from OTHER rows, so the links table must cover the full
        corpus even though only delta pages re-run. Counts for urls
        outside the subset fall out in the colpart left-join."""
        cfg = self.config
        timings: dict[str, float] = {}
        t0 = time.monotonic()

        shapes = self.dag.shapes
        drift_only = {
            sid
            for sid, s in shapes.items()
            if any(isinstance(c, DriftConstraint) for c in s.constraints)
        }

        rows_hint = None
        if isinstance(pages_path, str):
            from shaclapi_ray.io import _metadata_rows

            rows_hint = _metadata_rows(pages_path)
        self._rows_hint = rows_hint
        self._pages_source = pages_path

        # refine the evaluation order with target-set size estimates from
        # parquet row-group stats (the reference's TARGET IN BIG default,
        # /root/reference/shaclapi/config.py:205-209) — metadata-only scan
        if cfg.stats_order and isinstance(pages_path, str):
            from shaclapi_ray.io import estimate_rows_matching_many

            try:
                est = estimate_rows_matching_many(
                    pages_path, {sid: s.target for sid, s in shapes.items()}
                )
                targets_ = [cfg.target_shape] if cfg.target_shape else None
                self.order = self.dag.node_order(targets_, size_estimates=est)
            except Exception:
                pass  # stats unavailable: keep the static order

        # the evaluation backend decides UPFRONT which shapes it takes
        # over in its own single pass (those skip pass A entirely — no
        # colpart rows to emit or drop later); everything else flows
        # through the staged pipeline
        from shaclapi_ray.backends import get_backend

        self._backend = get_backend(cfg.backend)
        fused_sids = self._backend.select_fused(shapes, cfg, rows_hint)
        self._fused_sids = fused_sids

        pass_a_shapes = [
            s
            for sid, s in shapes.items()
            if sid not in drift_only and sid not in fused_sids
        ]

        # ---- source(s): prune at the read ---------------------------------
        if isinstance(pages_path, str):
            from shaclapi_ray.io import read_parquet as _read
            from shaclapi_ray.io import target_blocks

            # blocks ≈ CPUs (but bounded rows/block): Ray's default ~200-way
            # read parallelism leaves materialized events in hundreds of tiny
            # blocks (per-task overhead x blocks); too FEW blocks makes html
            # blocks multi-GB and spills the object store
            nb = target_blocks(factor=1, rows=rows_hint)
            scan = (
                self._scan_filter_expr(pass_a_shapes, pages_path)
                if cfg.scan_pushdown
                else None
            )
            pages_a = _read(
                pages_path,
                columns=self.pass_a_columns(),
                num_blocks=nb,
                filter_expr=scan,
            )
            pages_links = (
                _read(pages_path, columns=["url", "html"], num_blocks=nb)
                if self.needs_links()
                else None
            )
            drift_cols = sorted(
                {"url"}
                | {
                    c.column
                    for s in shapes.values()
                    for c in s.constraints
                    if isinstance(c, DriftConstraint)
                }
            )
            pages_drift = (
                _read(pages_path, columns=drift_cols, num_blocks=nb)
                if drift_only
                else None
            )
        else:
            pages_a = pages_path
            pages_links = pages_path if self.needs_links() else None
            pages_drift = pages_path if drift_only else None

        # ---- pass A: fused column predicates ------------------------------
        mb_kwargs: dict[str, Any] = {}
        if cfg.batch_size is not None:
            mb_kwargs["batch_size"] = cfg.batch_size
        if cfg.concurrency is not None:
            events_a = pages_a.map_batches(
                ColumnShapeEvaluator,
                fn_constructor_args=(pass_a_shapes,),
                batch_format="pyarrow",
                zero_copy_batch=True,
                concurrency=cfg.concurrency,
                **mb_kwargs,
            )
        else:
            evaluator = ColumnShapeEvaluator(pass_a_shapes)
            events_a = pages_a.map_batches(
                evaluator,
                batch_format="pyarrow",
                zero_copy_batch=True,
                **mb_kwargs,
            )
        # event pieces accumulate per stage; unions over MATERIALIZED pieces
        # are zero-copy block-ref concatenations (no recompute, no copy)
        pieces: list[ray.data.Dataset] = [events_a.materialize()]
        injected_piece = None
        if extra_child_events is not None:
            injected_piece = extra_child_events.materialize()
            pieces.append(injected_piece)

        def all_events() -> ray.data.Dataset:
            return pieces[0] if len(pieces) == 1 else pieces[0].union(*pieces[1:])

        timings["pass_a_s"] = time.monotonic() - t0

        # ---- pass B: referential + global constraints in DAG order --------
        t1 = time.monotonic()
        links_ds = None
        non_fused_ref = sum(
            1
            for sid, s in shapes.items()
            if sid not in fused_sids
            for c in s.constraints
            if isinstance(c, RefConstraint)
        )
        if links_override is not None and non_fused_ref:
            links_ds = links_override
        elif pages_links is not None and non_fused_ref:
            links_ds = extract_links(pages_links, batch_size=cfg.batch_size)
            if non_fused_ref > 1:
                # reused by several constraints: pay one materialization
                links_ds = links_ds.materialize()

        pieces = self.run_pass_b(
            pieces, links_ds, pages_a, pages_drift, timings=timings
        )
        timings["pass_b_s"] = time.monotonic() - t1

        # drop consumed colpart rows; skipped when no shape emitted any
        # (all non-column shapes took the fused path) so events stays a
        # plain union of materialized pieces (count = metadata-only)
        emitted_colpart = any(
            sid not in drift_only
            and sid not in fused_sids
            and not shapes[sid].is_column_only()
            for sid in shapes
        )
        if injected_piece is not None:
            out_pieces = [p for p in pieces if p is not injected_piece]
            events = (
                out_pieces[0]
                if len(out_pieces) == 1
                else out_pieces[0].union(*out_pieces[1:])
            )
        else:
            events = all_events()
        if emitted_colpart:
            events = _filter_events_not_kind(events, "colpart")
        timings["total_s"] = time.monotonic() - t0
        return ValidationResult(
            events=events,
            dag=self.dag,
            target_shape=cfg.target_shape,
            order=self.order,
            timings=timings,
        )

    def run_pass_b(
        self,
        pieces: list[ray.data.Dataset],
        links_ds,
        pages_a,
        pages_drift,
        timings: dict | None = None,
    ) -> list[ray.data.Dataset]:
        """Referential + global constraint evaluation in DAG order over an
        existing events dataset (pieces[0] = pass A output or read-back
        checkpointed events). Children complete before parents consume
        them (barrier per DAG level). Returns the extended pieces list.

        ``timings`` (optional) accumulates sub-phase seconds:
        child_collect_s (child-valid hash-set builds), fused_eval_s
        (backend single-pass evaluations), combine_s (staged count +
        combine pipelines)."""
        timings = timings if timings is not None else {}
        cfg = self.config
        shapes = self.dag.shapes
        rows_hint = getattr(self, "_rows_hint", None)
        agg_mode = cfg.agg_mode
        if agg_mode == "auto" and rows_hint is not None:
            # pick by input size from parquet metadata: saves the extra
            # materialize+count execution inside the combine step
            from shaclapi_ray.stages.aggregates import DRIVER_MERGE_LIMIT

            agg_mode = "driver" if rows_hint <= DRIVER_MERGE_LIMIT else "shuffle"

        def all_events() -> ray.data.Dataset:
            return pieces[0] if len(pieces) == 1 else pieces[0].union(*pieces[1:])

        for sid in self.order:
            shape = shapes[sid]
            refs = [c for c in shape.constraints if isinstance(c, RefConstraint)]
            uniqs = [c for c in shape.constraints if isinstance(c, UniqueConstraint)]
            drifts = [c for c in shape.constraints if isinstance(c, DriftConstraint)]
            if drifts:
                if refs or uniqs:
                    raise ValueError(
                        f"shape {sid}: drift constraints cannot be mixed with "
                        "ref/unique constraints"
                    )
                drift_events = self._eval_drift(pages_drift, sid, drifts[0])
                pieces.append(drift_events)
                continue
            if not refs and not uniqs:
                continue  # column-only: final verdict already in events

            # backend-owned path: one pass over pages, no joins/shuffles;
            # the only global input is the broadcast child-valid hash set
            # (default evaluator: stages/referential.fused_ref_shape_eval)
            from shaclapi_ray.stages.referential import collect_child_hash_set

            pages_source = getattr(self, "_pages_source", None)
            if sid in getattr(self, "_fused_sids", set()):
                tc = time.monotonic()
                child_refs = {}
                for c in refs:
                    if c.shape:
                        child_refs[c.name] = collect_child_hash_set(
                            child_valid_urls(all_events(), c.shape)
                        )
                    else:
                        child_refs[c.name] = None
                timings["child_collect_s"] = timings.get(
                    "child_collect_s", 0.0
                ) + (time.monotonic() - tc)
                if isinstance(pages_source, str):
                    from shaclapi_ray.io import read_parquet as _read
                    from shaclapi_ray.io import target_blocks

                    from shaclapi_ray.shapes.ir import pred_columns

                    cols = {"url", "html"} | pred_columns(shape.target)
                    for c in shape.constraints:
                        if not isinstance(c, RefConstraint):
                            cols |= c.columns()
                    # per-shape scan pushdown: this read serves ONLY this
                    # shape's fused eval (verdicts are target-masked), so
                    # its own weakened target filter is always sound here
                    ref_scan = (
                        self._scan_filter_expr([shape], pages_source)
                        if cfg.scan_pushdown
                        else None
                    )
                    pages_ref = _read(
                        pages_source,
                        columns=sorted(cols),
                        num_blocks=target_blocks(
                            factor=1, rows=getattr(self, "_rows_hint", None)
                        ),
                        filter_expr=ref_scan,
                    )
                else:
                    pages_ref = pages_source
                backend = getattr(self, "_backend", None)
                if backend is None:
                    from shaclapi_ray.backends import get_backend

                    backend = get_backend(self.config.backend)
                tf = time.monotonic()
                pieces.append(
                    backend.eval_shape(pages_ref, shape, child_refs).materialize()
                )
                timings["fused_eval_s"] = timings.get("fused_eval_s", 0.0) + (
                    time.monotonic() - tf
                )
                continue

            tcomb = time.monotonic()
            colpart = _filter_events(all_events(), kind="colpart", shape_id=sid)
            counts_and_constraints = []
            for c in refs:
                from shaclapi_ray.stages.referential import swap_links

                c_links = swap_links(links_ds) if c.inverse else links_ds
                if c.shape is None:
                    counts = plain_link_counts(c_links, agg_mode=agg_mode)
                else:
                    child_urls = child_valid_urls(all_events(), c.shape)
                    counts = qualified_counts(
                        c_links,
                        child_urls,
                        strategy=cfg.ref_strategy,
                        num_partitions=cfg.num_partitions,
                        salt_k=cfg.salt_k,
                        bloom_prefilter=cfg.bloom_prefilter,
                        agg_mode=agg_mode,
                        size_hint=getattr(self, "_rows_hint", None),
                    )
                counts_and_constraints.append((counts, c))
            for c in uniqs:
                counts = self._column_value_counts(pages_a, c.column, agg_mode)
                counts_and_constraints.append(
                    (counts, RefConstraint(name=c.name, min=1, max=1, shape=None))
                )
            combined = combine_ref_verdicts(
                colpart,
                counts_and_constraints,
                sid,
                num_partitions=cfg.num_partitions,
                strategy=cfg.combine_strategy,
                size_hint=getattr(self, "_rows_hint", None),
            )
            pieces.append(combined.materialize())
            timings["combine_s"] = timings.get("combine_s", 0.0) + (
                time.monotonic() - tcomb
            )
        return pieces

    # -- helpers -------------------------------------------------------------
    def _column_value_counts(self, pages_ds, column: str, agg_mode: str = "auto"):
        """(url, qcount): for each page, the GLOBAL occurrence count of that
        page's value of ``column`` — partial per-batch counts, then combine
        (pre-aggregation before any shuffle, SURVEY.md §4).

        For ``column == 'url'`` the counted value IS the join key, so the
        grouped count is already keyed correctly. For any other column the
        per-value counts must be joined back onto (url, value) — broadcast
        hash-map lookup (stages/hashset.py, zero per-task setup) below
        SEMI_BROADCAST_LIMIT keys (sorted-hash map, zero per-task
        build), hash-partitioned Dataset.join above (exact at
        any scale)."""
        from shaclapi_ray.stages.aggregates import grouped_count

        if column == "url":
            keyed = pages_ds.map_batches(
                lambda batch: pa.table(
                    {"url": pc.fill_null(pc.cast(batch["url"], pa.string()), "null")}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            return grouped_count(keyed, "url", out_name="qcount", mode=agg_mode)

        from shaclapi_ray.stages.referential import (
            SEMI_BROADCAST_LIMIT,
            clamp_partitions,
        )

        def kv(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url": pc.fill_null(pc.cast(batch["url"], pa.string()), "null"),
                    "val": pc.fill_null(pc.cast(batch[column], pa.string()), "null"),
                }
            )

        keyed = pages_ds.map_batches(kv, batch_format="pyarrow", zero_copy_batch=True)
        counts = grouped_count(keyed, "val", out_name="qcount", mode=agg_mode)
        size_hint = getattr(self, "_rows_hint", None)
        if size_hint is not None:
            use_broadcast = size_hint <= SEMI_BROADCAST_LIMIT
        else:
            counts = counts.materialize()
            use_broadcast = counts.count() <= SEMI_BROADCAST_LIMIT
        if use_broadcast:
            import numpy as np

            from shaclapi_ray.stages import hashset

            tables = [t for t in (ray.get(r) for r in counts.to_arrow_refs()) if t.num_rows]
            if tables:
                tbl = pa.concat_tables(tables).combine_chunks()
                hmap = hashset.build_hash_map(tbl["val"], tbl["qcount"].to_numpy())
            else:
                hmap = (np.zeros(0, np.uint64), np.zeros(0, np.int64))
            hmap_ref = ray.put(hmap)

            def assign(batch: pa.Table) -> pa.Table:
                hm = ray.get(hmap_ref)
                q = hashset.lookup(hm, batch["val"], default=0)
                return pa.table(
                    {"url": batch["url"], "qcount": pa.array(q, type=pa.int64())}
                )

            return keyed.map_batches(
                assign,
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        from shaclapi_ray.stages.joins import drop_empty_blocks

        renamed = counts.map_batches(
            lambda t: pa.table({"j_val": t["val"], "qcount": t["qcount"]}),
            batch_format="pyarrow",
        )
        keyed_nb = drop_empty_blocks(keyed)
        renamed_nb = drop_empty_blocks(renamed)
        if keyed_nb is None or renamed_nb is None:
            import ray.data as _rd

            return _rd.from_arrow(
                pa.table(
                    {"url": pa.array([], pa.string()), "qcount": pa.array([], pa.int64())}
                )
            )
        joined = keyed_nb.join(
            renamed_nb,
            join_type="left_outer",
            num_partitions=clamp_partitions(self.config.num_partitions),
            on=("val",),
            right_on=("j_val",),
        )
        return joined.map_batches(
            lambda t: pa.table(
                {"url": t["url"], "qcount": pc.fill_null(t["qcount"], 0)}
            ),
            batch_format="pyarrow",
        )

    def _eval_drift(self, pages_drift, sid: str, c: DriftConstraint):
        """Per-host t-digest drift check -> partition-level verdict rows.

        Fully distributed merge (a web corpus has 10^6-10^7 hosts, so no
        driver-side per-host loops):
          1. partials: one serialized digest per (batch, host), computed
             data-parallel;
          2. per-host merge: groupby('host') + TDigest.merge_many (an
             ORDER-INSENSITIVE n-way merge, so the shuffle's row order
             inside a group cannot change the result);
          3. global digest: per-host digests fold into 64 content-keyed
             hash buckets (groupby('bucket') + merge_many), and only
             those <=64 bucket digests merge on the driver — sorted by
             bucket id, deterministic regardless of block layout;
          4. verdicts: KS per host vs the broadcast global digest, one
             streaming map_batches over the per-host digest table.
        Returns the events Dataset."""
        use_length = c.use_length
        pattern = c.partition_regex
        column = c.column

        def partial(batch: pa.Table) -> pa.Table:
            """One serialized t-digest per (batch, host) — host extraction
            and grouping fully vectorized (polars regex extract + group_by);
            only the per-HOST digest build is a loop (hosts are few)."""
            import polars as pl

            urls = batch["url"].combine_chunks() if isinstance(
                batch["url"], pa.ChunkedArray
            ) else batch["url"]
            if use_length:
                vals = pc.utf8_length(batch[column])
            else:
                vals = batch[column]
            vals = pc.cast(vals, pa.float64())
            h = pl.from_arrow(urls).fill_null("").str.extract(pattern, 1).fill_null("")
            v = pl.from_arrow(
                vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
            )
            df = pl.DataFrame({"h": h, "v": v}).drop_nulls("v")
            hosts, blobs = [], []
            for (host_key,), sub in df.group_by("h"):
                td = TDigest()
                td.add_array(sub["v"].to_numpy())
                hosts.append(host_key)
                blobs.append(td.to_bytes())
            return pa.table(
                {
                    "host": pa.array(hosts, type=pa.string()),
                    "digest": pa.array(blobs, type=pa.binary()),
                }
            )

        from shaclapi_ray.stages.hashset import hash_strings

        N_GLOBAL_BUCKETS = 64

        def merge_host(t: pa.Table) -> pa.Table:
            host = t["host"][0].as_py()
            td = TDigest.merge_many(
                TDigest.loads(raw) for raw in t["digest"].to_pylist()
            )
            bucket = int(hash_strings([host])[0] % N_GLOBAL_BUCKETS)
            return pa.table(
                {
                    "host": pa.array([host], pa.string()),
                    "digest": pa.array([td.to_bytes()], pa.binary()),
                    "bucket": pa.array([bucket], pa.int64()),
                }
            )

        def merge_bucket(t: pa.Table) -> pa.Table:
            td = TDigest.merge_many(
                TDigest.loads(raw) for raw in t["digest"].to_pylist()
            )
            return pa.table(
                {
                    "bucket": pa.array([int(t["bucket"][0].as_py())], pa.int64()),
                    "digest": pa.array([td.to_bytes()], pa.binary()),
                }
            )

        parts = pages_drift.map_batches(partial, batch_format="pyarrow")
        per_host = (
            parts.groupby("host")
            .map_groups(merge_host, batch_format="pyarrow")
            .materialize()
        )
        if per_host.count() == 0:
            return ray.data.from_arrow(
                pa.table({k: [] for k in EVENTS_SCHEMA.names}, schema=EVENTS_SCHEMA)
            )
        bucket_rows = (
            per_host.groupby("bucket")
            .map_groups(merge_bucket, batch_format="pyarrow")
            .take_all()
        )
        glob = TDigest.merge_many(
            TDigest.loads(r["digest"])
            for r in sorted(bucket_rows, key=lambda r: r["bucket"])
        )
        glob_ref = ray.put(glob.to_bytes())
        threshold, cname = c.threshold, c.name

        def verdicts(t: pa.Table) -> pa.Table:
            g = TDigest.loads(ray.get(glob_ref))
            rows = {k: [] for k in EVENTS_SCHEMA.names}
            for h, raw in zip(t["host"].to_pylist(), t["digest"].to_pylist()):
                ks = ks_statistic(TDigest.loads(raw), g)
                ok = ks <= threshold
                rows["url"].append(f"host:{h}")
                rows["shape_id"].append(sid)
                rows["kind"].append("verdict")
                rows["valid"].append(ok)
                rows["reason"].append(sid)
                rows["constraint"].append(None)
                rows["offending_value"].append(None)
                if not ok:
                    rows["url"].append(f"host:{h}")
                    rows["shape_id"].append(sid)
                    rows["kind"].append("violation")
                    rows["valid"].append(False)
                    rows["reason"].append(sid)
                    rows["constraint"].append(cname)
                    rows["offending_value"].append(f"{ks:.4f}")
            return pa.table(rows, schema=EVENTS_SCHEMA)

        return per_host.map_batches(verdicts, batch_format="pyarrow")


def _filter_events_not_kind(events: ray.data.Dataset, kind: str) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["kind"], kind))

    return events.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
