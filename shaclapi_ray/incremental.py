"""Incremental (cross-snapshot) validation: revalidate only the pages
that changed since the last run, reusing persisted verdicts for
everything else — the Common-Crawl monthly-snapshot scenario, where a
new crawl shares most of its rows with the previous one and a full
revalidation wastes the cluster on unchanged data. The data-side twin
is ``pipelines.dedup.dedup_incremental`` (same persisted bucketed-state
idea, applied to verdicts instead of content hashes); the QUERYABLE
per-url delta report between two snapshots (added/removed/changed/
unchanged rows, SQL-oracle-checked) is ``freshness.snapshot_delta``.

Correctness scope — exact for column-only AND (r5) REFERENTIAL shape
DAGs. Predicate/OR constraints are row-local, so an unchanged row's
verdict cannot change when other rows change. RefConstraints aggregate
over link targets/sources, so the revalidation set expands from the
fingerprint delta by the LINK BLAST RADIUS: parents whose links touch
changed/removed/added child urls, propagated to fixpoint up the
reference chains over the persisted narrow links table (the exactness
induction is in ``_ref_blast_radius``'s docstring); the subset engine
run injects reused verdicts into pass B so child-valid sets see the
full snapshot, and inverse (inbound) refs get the full-corpus merged
links table via ``links_override``. Above ``full_run_ratio`` the
operator falls back to one full run (same contract, fresh state).
Unique / Drift constraints aggregate over ALL rows (a new duplicate
flips an arbitrary old row's uniqueness; drift digests span the whole
partition), so no bounded revalidation set exists — those DAGs refuse
loudly, with the resumable full run
(`checkpoint.CheckpointedValidation`) named as the alternative.

State layout (``state_dir``): url-hash-bucketed parquet — the same
bucket is both the update and the lookup unit —

    fps/bucket=<b>/        (url, fp, hu)        row fingerprints + url hash (r5)
    verdicts/bucket=<b>/   (url, shape_id, valid, reason)
    violations/bucket=<b>/ (url, shape_id, constraint, offending_value)
    links/bucket=<b>/      (url, target_url)    ref DAGs only (r5)
    manifest.json          shape ids + columns + has_refs + counts

The manifest guards staleness: an incremental run against a state
written for different shapes or columns refuses (reuse would mix
semantics), mirroring ``preprocess._boundary``'s resume caveat.

Scale shape: delta detection is one streaming pass over the new corpus
against the old (url-hash -> fp) map — broadcast as sorted uint64
arrays below FP_BROADCAST_LIMIT (zero per-task build, stages/hashset
discipline), or ``strategy='join'`` keeps both fingerprint tables
Datasets and classifies via one hash-partitioned outer join (the
beyond-ceiling path, output-identical by test). Only delta rows enter
the validation engine; reused verdicts stream from the state buckets
through a membership filter and never touch the driver.

When it pays — measured honestly (BASELINE.md round 4): for CHEAP
column DAGs a full revalidation is usually FASTER on a wide node
(sf0.1/32cpu: full 14-regex pass 4.8 s vs incremental 20.9 s) because
the engine's predicate pass parallelizes across every core while delta
detection is a driver-bound stream. The operator's value at that end
is OPERATIONAL: verdict continuity across snapshots (stable rows for
unchanged pages, explicit removed handling), a queryable verdict
store, and the state/manifest machinery that an incremental
REFERENTIAL maintainer (per-target link-count deltas — where the real
compute savings live) would build on. Choose it for continuity, not
throughput.

Reference analog: none — shaclAPI validates one endpoint snapshot per
request (/root/reference/shaclapi/api.py); incrementality across
snapshots is part of this engine's 100-TB operating model.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from shaclapi_ray.engine import JobConfig, ValidationEngine, ValidationResult
from shaclapi_ray.shapes.ir import Shape, pred_columns

STATE_BUCKETS = 16
FP_BROADCAST_LIMIT = 50_000_000

VERDICT_COLS = ["url", "shape_id", "valid", "reason"]
VIOLATION_COLS = ["url", "shape_id", "constraint", "offending_value"]


def _fp_columns(dag) -> list[str]:
    """Every column any shape's target or constraint reads — the
    fingerprint domain (a change outside these columns cannot change
    any verdict, so it must NOT trigger revalidation)."""
    cols = {"url"}
    for s in dag.shapes.values():
        cols |= pred_columns(s.target)
        for c in s.constraints:
            cols |= c.columns()
    return sorted(cols)


def _ref_profile(dag) -> tuple[bool, bool, bool]:
    """(has_refs, has_forward, has_inverse) for an incremental-capable DAG; refuses
    Unique/Drift loudly (r5: referential DAGs ARE incremental-capable via
    the link blast radius — only truly global constraints remain out:
    a new duplicate flips an arbitrary old row's uniqueness and drift
    digests aggregate the whole partition, so no bounded revalidation
    set exists for either)."""
    from shaclapi_ray.shapes.ir import DriftConstraint, RefConstraint, UniqueConstraint

    has_refs = has_fwd = has_inv = False
    for sid, s in dag.shapes.items():
        for c in s.constraints:
            if isinstance(c, (UniqueConstraint, DriftConstraint)):
                raise ValueError(
                    f"shape {sid} carries a {type(c).__name__}, which "
                    "aggregates over ALL rows — no bounded revalidation "
                    "set exists, incremental verdict reuse would be "
                    "wrong. Run the full engine (resumable form: "
                    "checkpoint.CheckpointedValidation) for this schema."
                )
            if isinstance(c, RefConstraint):
                has_refs = True
                if c.inverse:
                    has_inv = True
                else:
                    has_fwd = True
            from shaclapi_ray.shapes.ir import OrConstraint, PredicateConstraint

            if isinstance(c, OrConstraint) and not all(
                isinstance(o, PredicateConstraint) for o in c.options
            ):
                raise ValueError(
                    f"shape {sid}: OR of non-predicate constraints is not "
                    "incremental-capable (blast radius undefined for "
                    "disjunctive refs) — run the full engine."
                )
    return has_refs, has_fwd, has_inv


def _ref_depth(dag) -> int:
    """Longest shape-reference chain (cycle-guarded) — the fixpoint
    iteration bound for the blast radius."""
    memo: dict[str, int] = {}

    def d(sid: str, stack: tuple = ()) -> int:
        if sid in memo:
            return memo[sid]
        if sid in stack:
            return 0
        deps = [
            r
            for r in dag.shapes[sid].referenced_shapes()
            if r in dag.shapes
        ]
        v = 1 + max((d(r, stack + (sid,)) for r in deps), default=0)
        memo[sid] = v
        return v

    return max((d(s) for s in dag.shapes), default=1)


def _url_key(col) -> pa.Array:
    """The engine's focus-node serialization: null urls render as the
    string 'null' in verdict/violation rows (stages/predicates.py:155),
    so every url-keyed structure here must use the same form or
    null-url pages would be revalidated AND reused simultaneously."""
    out = pc.fill_null(pc.cast(col, pa.string()), "null")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _with_fp(cols: list[str]):
    """map_batches fn: (url-key, fp uint64-as-int64, hu url-hash, bucket)
    per row — fp over the null-marked, unit-separated column concat; the
    url column is emitted in verdict serialization (see _url_key). ``hu``
    (r5) persists the url-key hash the workers already computed for
    bucketing, so the driver's classification pass consumes numpy
    columns directly instead of re-hashing every url string serially."""
    import polars as pl

    def fn(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(cols))
        joined = df.select(
            pl.concat_str(
                [pl.col(c).cast(pl.String).fill_null("\x00null\x00") for c in cols],
                separator="\x1f",
            ).alias("s")
        )["s"]
        fp = joined.hash(seed=7).to_numpy().astype(np.uint64)
        from shaclapi_ray.stages.hashset import hash_strings

        key = _url_key(batch["url"])
        h = hash_strings(key)
        bucket = (h % STATE_BUCKETS).astype(np.int64)
        return pa.table(
            {
                "url": key,
                "fp": pa.array(fp.view(np.int64)),
                "hu": pa.array(h.view(np.int64)),
                "bucket": pa.array(bucket),
            }
        )

    return fn


def _state_has_hu(state_dir: str) -> bool:
    """Whether the persisted fps table carries the r5 ``hu`` column
    (pre-r5 states lack it — the classifier falls back to driver-side
    hashing for those)."""
    import pyarrow.dataset as pads

    try:
        schema = pads.dataset(
            os.path.join(state_dir, "fps"), format="parquet", partitioning="hive"
        ).schema
    except Exception:
        return False
    return "hu" in schema.names


def _bucketed_links(links_ds):
    """(url-key, target_url, bucket) — the narrow persisted link table
    a referential incremental run computes its blast radius over."""
    from shaclapi_ray.stages.hashset import hash_strings

    def fn(batch: pa.Table) -> pa.Table:
        key = _url_key(batch["url"])
        b = (hash_strings(key) % STATE_BUCKETS).astype(np.int64)
        return pa.table(
            {
                "url": key,
                "target_url": batch["target_url"],
                "bucket": pa.array(b),
            }
        )

    return links_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def persist_validation_state(
    state_dir: str,
    pages_ds,
    result: ValidationResult,
) -> str:
    """Write the verdict/violation/fingerprint state for a completed
    validation — the baseline an incremental run diffs against.
    Referential DAGs (r5) additionally persist the narrow links table
    (url, target_url) the blast radius walks; Unique/Drift refuse."""
    dag = result.dag
    has_refs, _, _ = _ref_profile(dag)
    cols = _fp_columns(dag)
    from shaclapi_ray.stages.hashset import hash_strings

    pages_ds.map_batches(
        _with_fp(cols), batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(os.path.join(state_dir, "fps"), partition_cols=["bucket"])

    if has_refs:
        from shaclapi_ray.stages.links import extract_links

        _bucketed_links(extract_links(pages_ds)).write_parquet(
            os.path.join(state_dir, "links"), partition_cols=["bucket"]
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (hash_strings(batch["url"]) % STATE_BUCKETS).astype(np.int64)
        return batch.append_column("bucket", pa.array(b))

    n_verdicts = 0
    for name, ds in (
        ("verdicts", result.verdicts()),
        ("violations", result.violations()),
    ):
        out = ds.map_batches(
            add_bucket, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        out.write_parquet(os.path.join(state_dir, name), partition_cols=["bucket"])
        if name == "verdicts":
            n_verdicts = out.count()

    manifest = {
        "shape_ids": sorted(dag.shapes),
        "columns": cols,
        "has_refs": has_refs,
        "n_verdicts": n_verdicts,
        "n_buckets": STATE_BUCKETS,
    }
    with open(os.path.join(state_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    return state_dir


@dataclass
class IncrementalResult:
    verdicts: ray.data.Dataset
    violations: ray.data.Dataset
    delta_result: ValidationResult | None
    stats: dict = field(default_factory=dict)
    timings: dict = field(default_factory=dict)  # per-section wall s


def _collect_url_hashes(ds) -> np.ndarray:
    """Sorted uint64 url-hash array of a (url, ...) Dataset — driver
    collect of 8 bytes/row (used only on delta-bounded or
    ceiling-guarded inputs)."""
    from shaclapi_ray.stages.hashset import hash_strings

    parts = [
        hash_strings(_url_key(b["url"]))
        for b in ds.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)


def _read_state(state_dir: str, name: str, columns: list[str]):
    from shaclapi_ray.io import read_parquet

    return read_parquet(os.path.join(state_dir, name), columns=columns)


def _member_filter_fn(ref, keep_members: bool):
    """map_batches fn: keep (or drop) rows whose url-key hash is in the
    broadcast sorted uint64 set — one ray.put, zero per-task build."""

    def fn(batch: pa.Table) -> pa.Table:
        from shaclapi_ray.stages.hashset import hash_strings

        s = ray.get(ref)
        if not len(batch):
            return batch
        h = hash_strings(_url_key(batch["url"]))
        if s.size == 0:
            member = np.zeros(len(h), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(s, h), s.size - 1)
            member = s[pos] == h
        return batch.filter(pa.array(member if keep_members else ~member))

    return fn


def _verdicts_as_events(batch: pa.Table) -> pa.Table:
    """(url, shape_id, valid, reason) state rows -> EVENTS_SCHEMA
    kind='verdict' rows for injection into the engine's pass-B view."""
    from shaclapi_ray.stages.predicates import EVENTS_SCHEMA

    n = batch.num_rows
    return pa.table(
        {
            "url": batch["url"],
            "shape_id": batch["shape_id"],
            "kind": pa.array(["verdict"] * n, pa.string()),
            "valid": batch["valid"],
            "reason": batch["reason"],
            "constraint": pa.nulls(n, pa.string()),
            "offending_value": pa.nulls(n, pa.string()),
        },
        schema=EVENTS_SCHEMA,
    )


def _full_fallback(
    engine, pages_new, out_state_dir: str | None, stats: dict
) -> "IncrementalResult":
    """The above-ratio escape: one full engine run over the new corpus,
    state persisted for the next snapshot — the incremental contract
    (verdict continuity + fresh state) at full-run cost."""
    full = engine.run(pages_new)
    out = IncrementalResult(
        verdicts=full.verdicts().select_columns(VERDICT_COLS).materialize(),
        violations=full.violations().select_columns(VIOLATION_COLS).materialize(),
        delta_result=full,
        stats=stats,
    )
    if out_state_dir is not None:
        persist_validation_state(out_state_dir, pages_new, full)
    return out


def _edge_scan(links_ds, src_col: str, dst_col: str, member_ref) -> np.ndarray:
    """Stream a links Dataset; return the sorted unique url-key hashes of
    ``dst_col`` on rows whose ``src_col`` hash is in the broadcast sorted
    set (stages/hashset discipline: one ray.put, np.searchsorted per
    batch, no per-task build). Driver collects 8 B per MATCH — bounded
    by the true blast radius, i.e. exactly the revalidation work."""
    from shaclapi_ray.stages.hashset import hash_strings

    def fn(batch: pa.Table) -> pa.Table:
        s = ray.get(member_ref)
        if not batch.num_rows or s.size == 0:
            return pa.table({"h": pa.array([], type=pa.int64())})
        h = hash_strings(_url_key(batch[src_col]))
        pos = np.minimum(np.searchsorted(s, h), s.size - 1)
        m = s[pos] == h
        dst = _url_key(batch[dst_col].filter(pa.array(m)))
        out = np.unique(hash_strings(dst))
        return pa.table({"h": pa.array(out.view(np.int64))})

    parts = [
        b["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        for b in links_ds.map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)


def _ref_blast_radius(
    seed: np.ndarray,
    old_links,
    delta_links,
    has_fwd: bool,
    has_inv: bool,
    max_iters: int,
) -> np.ndarray:
    """Fixpoint expansion of the revalidation set over link edges.

    Soundness argument (the induction the equality tests pin): a page
    NOT in the returned set has (a) an unchanged fingerprint — its
    column parts and its own outgoing links are unchanged (html is a
    fingerprint column for ref DAGs) — and (b) no link edge touching any
    page in the set, in whichever directions the DAG's constraints read:
    forward refs count the page's OWN links against child-valid targets
    (targets all outside the set -> their child verdicts are unchanged
    by induction), inverse refs count INBOUND links from child-valid
    sources (sources all outside the set, and sources newly linking to
    it would have changed fingerprints -> in the seed; their links come
    from ``delta_links``). Hence its verdict under every shape is
    unchanged and reuse is exact. Iteration propagates verdict flips up
    reference chains; ``max_iters`` = the DAG's longest chain bounds the
    fixpoint."""
    blast = np.unique(seed)
    for _ in range(max_iters):
        ref = ray.put(blast)
        found_parts = []
        if has_fwd:
            found_parts.append(_edge_scan(old_links, "target_url", "url", ref))
        if has_inv:
            found_parts.append(_edge_scan(old_links, "url", "target_url", ref))
            if delta_links is not None:
                found_parts.append(
                    _edge_scan(delta_links, "url", "target_url", ref)
                )
        found = (
            np.unique(np.concatenate(found_parts))
            if found_parts
            else np.empty(0, np.uint64)
        )
        add = np.setdiff1d(found, blast)
        if add.size == 0:
            break
        blast = np.union1d(blast, add)
    return blast


def incremental_validate(
    shapes: list[Shape] | str,
    pages_new,
    state_dir: str,
    config: JobConfig | None = None,
    out_state_dir: str | None = None,
    strategy: str = "broadcast",
    full_run_ratio: float = 0.5,
) -> IncrementalResult:
    """Validate the new snapshot against persisted state: unchanged
    rows (same url, same fingerprint) reuse their stored verdicts and
    violations; changed + new rows run through the validation engine;
    removed rows' verdicts are dropped. ``out_state_dir`` persists the
    merged state for the next snapshot. ``strategy='join'`` replaces
    the broadcast fingerprint map with hash-partitioned joins (the
    beyond-FP_BROADCAST_LIMIT path).

    REFERENTIAL DAGs (r5, VERDICT r4 #1): the revalidation set expands
    from the fingerprint delta by the link blast radius — parents whose
    links touch changed/removed/added child urls, propagated up the
    reference chains to fixpoint over the persisted narrow links table
    (see ``_ref_blast_radius`` for the exactness argument). The subset
    run injects the reused verdicts into the engine's pass-B event view
    so child-valid sets see the FULL snapshot. When the revalidation
    set exceeds ``full_run_ratio`` of the new corpus, the engine falls
    back to a full run (stats['mode']='full_fallback') — at that delta
    size the blast bookkeeping costs more than it saves. Unique/Drift
    still refuse loudly (no bounded revalidation set exists).

    Contract-violation nuance (duplicate/null urls — the engine
    requires unique urls): both strategies stay output-correct, but on
    a colliding key whose duplicate rows all carry IDENTICAL
    fingerprints the broadcast path revalidates (deterministic dup
    flag) while the join path may reuse — equal verdicts either way,
    stats can differ by those pathological keys."""
    if strategy not in ("broadcast", "join"):
        raise ValueError(f"unknown strategy {strategy!r}")
    engine = ValidationEngine(shapes, config)
    dag = engine.dag
    has_refs, has_fwd, has_inv = _ref_profile(dag)
    cols = _fp_columns(dag)

    with open(os.path.join(state_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    if manifest["shape_ids"] != sorted(dag.shapes) or manifest["columns"] != cols:
        raise ValueError(
            "state is stale: it was written for shapes "
            f"{manifest['shape_ids']} over columns {manifest['columns']}, "
            f"but this run validates {sorted(dag.shapes)} over {cols}. "
            "Run a full validation and persist fresh state."
        )
    if bool(manifest.get("has_refs", False)) != has_refs:
        raise ValueError(
            "state is stale: its referential profile does not match this "
            "schema (links table present/absent) — run a full validation "
            "and persist fresh state."
        )

    import time as _time

    _timings: dict[str, float] = {}
    _t0 = _time.monotonic()
    new_fps = pages_new.map_batches(
        _with_fp(cols), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    _timings["fp_new_s"] = _time.monotonic() - _t0
    _t0 = _time.monotonic()
    old_has_hu = _state_has_hu(state_dir)
    # broadcast classification with hu needs NO url strings at all —
    # don't ship them to the driver; the join path keys on url
    if old_has_hu and strategy == "broadcast":
        old_fps = _read_state(state_dir, "fps", ["fp", "hu"])
    else:
        old_fps = _read_state(state_dir, "fps", ["url", "fp"])

    from shaclapi_ray.stages.hashset import build_hash_map, hash_strings

    if strategy == "broadcast":
        n_old = old_fps.count()
        if n_old > FP_BROADCAST_LIMIT:
            raise ValueError(
                f"state holds {n_old} fingerprints (> {FP_BROADCAST_LIMIT}); "
                "use strategy='join' at this scale"
            )
        if old_has_hu:
            # r5 fast path: hashes were computed data-parallel at persist
            # time; the driver only concatenates + sorts numpy columns
            hu_chunks, fp_chunks = [], []
            for b in old_fps.iter_batches(batch_format="pyarrow"):
                hu_chunks.append(
                    b["hu"].to_numpy(zero_copy_only=False).view(np.uint64)
                )
                fp_chunks.append(b["fp"].to_numpy(zero_copy_only=False))
            hus = (
                np.concatenate(hu_chunks)
                if hu_chunks
                else np.empty(0, np.uint64)
            )
            fps = (
                np.concatenate(fp_chunks)
                if fp_chunks
                else np.empty(0, dtype=np.int64)
            )
            order = np.argsort(hus)
            hk, hv = hus[order], fps[order]
        else:
            url_chunks, fp_chunks = [], []
            for b in old_fps.iter_batches(batch_format="pyarrow"):
                url_chunks.append(_url_key(b["url"]))
                fp_chunks.append(b["fp"].to_numpy(zero_copy_only=False))
            urls = (
                pa.concat_arrays(url_chunks)
                if url_chunks
                else pa.array([], type=pa.string())
            )
            fps = (
                np.concatenate(fp_chunks)
                if fp_chunks
                else np.empty(0, dtype=np.int64)
            )
            hk, hv = build_hash_map(urls, fps)
        # keys with multiple state rows (duplicate urls; all null urls
        # share the 'null' key) can't be tracked individually — flag
        # them so they classify changed DETERMINISTICALLY (revalidate),
        # never layout-dependently half-reused. The engine's data
        # contract makes these pathological anyway (url must be unique).
        dup = np.zeros(hk.size, dtype=bool)
        if hk.size > 1:
            eq = hk[1:] == hk[:-1]
            dup[1:] |= eq
            dup[:-1] |= eq

        # classification runs as ONE driver pass over the (already
        # materialized, narrow) fingerprint table: the broadcast path
        # holds the corpus-scale map driver-side anyway, and folding
        # classify + changed-collect + removed-collect into one stream
        # removes three Dataset executions of fixed overhead
        changed_parts: list[np.ndarray] = []
        all_parts: list[np.ndarray] = []
        n_new_corpus = 0
        for b in new_fps.select_columns(["hu", "fp"]).iter_batches(
            batch_format="pyarrow"
        ):
            # hu was computed in the parallel fp pass — no driver hashing,
            # and the projection keeps url strings off the driver stream
            h = b["hu"].to_numpy(zero_copy_only=False).view(np.uint64)
            fp = b["fp"].to_numpy(zero_copy_only=False)
            n_new_corpus += len(h)
            if hk.size:
                pos = np.minimum(np.searchsorted(hk, h), hk.size - 1)
                hit = hk[pos] == h
                unchanged = hit & (hv[pos] == fp) & ~dup[pos]
            else:
                unchanged = np.zeros(len(h), dtype=bool)
            changed_parts.append(h[~unchanged])
            all_parts.append(h)
        changed_hashes = np.unique(
            np.concatenate(changed_parts)
            if changed_parts
            else np.empty(0, np.uint64)
        )
        new_all = np.sort(
            np.concatenate(all_parts) if all_parts else np.empty(0, np.uint64)
        )
        removed_hashes = np.setdiff1d(hk, new_all)
    else:
        from shaclapi_ray.stages.referential import clamp_partitions

        nparts = clamp_partitions(None)
        renamed = old_fps.map_batches(
            # select THEN rename: r5 states carry an extra hu column
            lambda t: t.select(["url", "fp"]).rename_columns(
                ["j_url", "old_fp"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = new_fps.select_columns(["url", "fp"]).join(
            renamed,
            join_type="left_outer",
            num_partitions=nparts,
            on=("url",),
            right_on=("j_url",),
        )

        def finish(batch: pa.Table) -> pa.Table:
            fp = batch["fp"].to_numpy(zero_copy_only=False)
            old = batch["old_fp"]
            hit = pc.is_valid(old).to_numpy(zero_copy_only=False)
            # fill nulls BEFORE to_numpy: a nullable int64 would convert
            # to float64 and corrupt full-range hash equality
            oldv = pc.fill_null(old, 0).to_numpy(zero_copy_only=False)
            unchanged = hit & (oldv == fp)
            return pa.table(
                {"url": batch["url"], "unchanged": pa.array(unchanged)}
            )

        klass = joined.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        # removed via a second hash-partitioned anti-join (old \ new)
        new_urls = new_fps.map_batches(
            lambda t: pa.table(
                {
                    "j_url": t["url"],
                    "present": pa.array(
                        np.ones(t.num_rows, dtype=np.int8)
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        old_vs_new = old_fps.select_columns(["url"]).join(
            new_urls,
            join_type="left_outer",
            num_partitions=nparts,
            on=("url",),
            right_on=("j_url",),
        )

        # the match indicator is the null-ness of the right-side marker
        # after the left_outer join (the join drops the key column)
        def removed_filter(batch: pa.Table) -> pa.Table:
            miss = pc.is_null(batch["present"])
            return pa.table({"url": batch["url"]}).filter(miss)

        removed_hashes = np.unique(
            _collect_url_hashes(
                old_vs_new.map_batches(
                    removed_filter, batch_format="pyarrow", zero_copy_batch=True
                )
            )
        )

    if strategy == "join":
        n_new_corpus = new_fps.count()
        changed_hashes = np.unique(
            _collect_url_hashes(
                klass.map_batches(
                    lambda t: t.filter(
                        pc.invert(t["unchanged"])
                    ).select(["url"]),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
        )
    _timings["classify_s"] = _time.monotonic() - _t0
    _t0 = _time.monotonic()
    # ---- referential blast radius (r5) --------------------------------
    revalidate_hashes = changed_hashes
    delta_links = None
    n_blast_extra = 0
    if has_refs:
        from shaclapi_ray.stages.links import extract_links

        # materialized once: the blast fixpoint re-scans this table per
        # iteration (DAG-depth times) — object-store blocks beat
        # re-reading parquet each round; spillable at corpus scale
        old_links = _read_state(
            state_dir, "links", ["url", "target_url"]
        ).materialize()
        if has_inv or out_state_dir is not None:
            # links of CHANGED pages from the new corpus: inverse blast
            # needs new/changed sources' edges, and the out-state links
            # merge replaces exactly these urls' link rows
            ch_ref = ray.put(changed_hashes)
            delta_links = extract_links(
                pages_new.map_batches(
                    _member_filter_fn(ch_ref, True),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            ).materialize()
        revalidate_hashes = _ref_blast_radius(
            np.union1d(changed_hashes, removed_hashes),
            old_links,
            delta_links,
            has_fwd,
            has_inv,
            max_iters=_ref_depth(dag),
        )
        merged_links = None
        if has_inv:
            # inverse refs aggregate INBOUND links from other rows: the
            # subset run needs the FULL new-corpus links table. Merge =
            # old rows for urls with unchanged html + fresh delta rows
            # (== extract_links(pages_new), without re-reading unchanged
            # html); also reused verbatim by the out-state write below.
            links_drop = ray.put(np.union1d(changed_hashes, removed_hashes))
            merged_links = (
                old_links.map_batches(
                    _member_filter_fn(links_drop, False),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                .union(delta_links.select_columns(["url", "target_url"]))
                .materialize()
            )
        # keys to actually revalidate = blast ∩ new-corpus keys (the
        # seed holds removed urls too); count by streaming the narrow
        # materialized fingerprint table — 8 B per MATCH driver-side
        matched_parts = []
        for b in new_fps.select_columns(["hu"]).iter_batches(
            batch_format="pyarrow"
        ):
            h = b["hu"].to_numpy(zero_copy_only=False).view(np.uint64)
            if revalidate_hashes.size:
                pos = np.minimum(
                    np.searchsorted(revalidate_hashes, h),
                    revalidate_hashes.size - 1,
                )
                matched_parts.append(np.unique(h[revalidate_hashes[pos] == h]))
        present = (
            np.unique(np.concatenate(matched_parts))
            if matched_parts
            else np.empty(0, np.uint64)
        )
        n_delta = int(present.size)
        n_blast_extra = int(
            np.setdiff1d(present, changed_hashes).size
        )
        if n_new_corpus and n_delta / n_new_corpus > full_run_ratio:
            return _full_fallback(
                engine,
                pages_new,
                out_state_dir,
                stats={
                    "mode": "full_fallback",
                    "n_new_corpus": n_new_corpus,
                    "n_delta": n_delta,
                    "n_blast": n_blast_extra,
                    "n_removed": int(removed_hashes.size),
                    "full_run_ratio": full_run_ratio,
                },
            )
    else:
        # counted in KEYS: under the engine's unique-url contract keys ==
        # rows; with pathological duplicate/null urls every colliding key
        # deterministically revalidates (see the dup flag above), and the
        # join path may emit multiplied klass rows for them — unique keys
        # are the strategy-independent measure
        n_delta = int(changed_hashes.size)
    # reused rows = state rows NOT in (revalidate ∪ removed) — both sets
    # are DELTA-bounded (small between adjacent snapshots), so this is
    # the only broadcast the reuse path ships
    drop_ref = ray.put(np.union1d(revalidate_hashes, removed_hashes))
    changed_ref = ray.put(revalidate_hashes)

    _timings["blast_s"] = _time.monotonic() - _t0
    delta_pages = pages_new.map_batches(
        _member_filter_fn(changed_ref, True),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    reused_verdicts = _read_state(state_dir, "verdicts", VERDICT_COLS).map_batches(
        _member_filter_fn(drop_ref, False),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    reused_violations = _read_state(
        state_dir, "violations", VIOLATION_COLS
    ).map_batches(
        _member_filter_fn(drop_ref, False),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    extra_events = None
    if has_refs and n_delta:
        # the subset run's ref pass must see the FULL snapshot's child
        # verdicts: inject the reused rows as kind='verdict' events (the
        # engine excludes them from its returned result)
        extra_events = reused_verdicts.map_batches(
            _verdicts_as_events, batch_format="pyarrow", zero_copy_batch=True
        )
    _t0 = _time.monotonic()
    delta_result = (
        engine.run(
            delta_pages,
            extra_child_events=extra_events,
            links_override=(merged_links if has_refs else None),
        )
        if n_delta
        else None
    )
    _timings["delta_run_s"] = _time.monotonic() - _t0
    _t0 = _time.monotonic()

    if delta_result is not None:
        verdicts = reused_verdicts.union(
            delta_result.verdicts().select_columns(VERDICT_COLS)
        )
        violations = reused_violations.union(
            delta_result.violations().select_columns(VIOLATION_COLS)
        )
    else:
        verdicts, violations = reused_verdicts, reused_violations

    stats = {
        "mode": "incremental",
        "n_new_corpus": n_new_corpus,
        "n_unchanged": n_new_corpus - n_delta,
        "n_delta": n_delta,
        "n_blast": n_blast_extra,
        "n_removed": int(removed_hashes.size),
        "n_state_verdicts": manifest.get("n_verdicts", None),
    }

    out = IncrementalResult(
        verdicts=verdicts.materialize(),
        violations=violations.materialize(),
        delta_result=delta_result,
        stats=stats,
    )
    _timings["merge_s"] = _time.monotonic() - _t0
    _t0 = _time.monotonic()

    if out_state_dir is not None:
        from shaclapi_ray.stages.hashset import hash_strings as _hs

        def add_bucket(batch: pa.Table) -> pa.Table:
            b = (_hs(batch["url"]) % STATE_BUCKETS).astype(np.int64)
            return batch.append_column("bucket", pa.array(b))

        new_fps.select_columns(["url", "fp", "hu", "bucket"]).write_parquet(
            os.path.join(out_state_dir, "fps"), partition_cols=["bucket"]
        )
        if has_refs:
            # merged links = old rows for urls with unchanged html (a
            # blasted-but-unchanged page keeps its links) + fresh rows
            # for changed urls; removed urls drop. Equals
            # extract_links(pages_new) without re-reading unchanged html.
            if merged_links is not None:
                out_links = merged_links
            else:
                links_drop = ray.put(
                    np.union1d(changed_hashes, removed_hashes)
                )
                out_links = _read_state(
                    state_dir, "links", ["url", "target_url"]
                ).map_batches(
                    _member_filter_fn(links_drop, False),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                if delta_links is not None:
                    out_links = out_links.union(
                        delta_links.select_columns(["url", "target_url"])
                    )
            _bucketed_links(out_links).write_parquet(
                os.path.join(out_state_dir, "links"), partition_cols=["bucket"]
            )
        for name, ds in (("verdicts", out.verdicts), ("violations", out.violations)):
            ds.map_batches(
                add_bucket, batch_format="pyarrow", zero_copy_batch=True
            ).write_parquet(
                os.path.join(out_state_dir, name), partition_cols=["bucket"]
            )
        with open(os.path.join(out_state_dir, "manifest.json"), "w") as fh:
            json.dump(
                {
                    "shape_ids": sorted(dag.shapes),
                    "columns": cols,
                    "has_refs": has_refs,
                    "n_verdicts": out.verdicts.count(),
                    "n_buckets": STATE_BUCKETS,
                },
                fh,
            )

    _timings["out_state_s"] = _time.monotonic() - _t0
    # timings live OUTSIDE stats: stats is the semantic (comparable)
    # record — strategy-equality tests pin it — while wall times vary
    out.timings = {k: round(v, 3) for k, v in _timings.items()}
    return out
