"""Referential (inter-shape) constraint evaluation.

The Ray-Data recast of the reference's inter-shape validation: a parent
shape's verdict depends on how many of its links point at entities that
satisfy a child shape (qualified min/max cardinality — constraint fields
asserted at /root/reference/tests/test_main.py:311-328; valid/invalid
propagation per /root/reference/tests/tc4/docs/TC4_preparation.txt).

Pipeline per ref constraint (child verdicts COMPLETE before parents — the
barrier per DAG level, SURVEY.md §7.4):

1. child-valid urls  = verdicts[shape_id == child & valid].select(url)
2. qualified links   = links ⋉ child_valid on target_url
                       strategy 'broadcast': ray.put the child url set once
                         as a sorted uint64 hash array, filter inside
                         map_batches via np.searchsorted (no shuffle);
                       strategy 'bucket': hash-partitioned Dataset.join with
                         optional SALTING for skewed target hosts — links get
                         salt = hash(url) % k, the (small) child side is
                         replicated k times, join key = (target_url, salt);
                       optional broadcast Bloom pre-filter cuts dangling
                         links before the shuffle (north_star).
3. qcount per parent = qualified.groupby(url).aggregate(Count)
4. combine           = parent colpart verdicts ⟕ qcount on url (missing -> 0,
                       the tc5 "absent property" semantics), apply min/max,
                       emit final verdict + violation event rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from shaclapi_ray.shapes.ir import RefConstraint
from shaclapi_ray.stages.predicates import EVENTS_SCHEMA
from shaclapi_ray.state.sketches import BloomFilter

# legacy ceiling for any remaining per-batch pa.Table.join broadcast
# (none in the referential paths anymore — they broadcast sorted-hash
# structures; kept for callers that still do table-join broadcasts)
BROADCAST_LIMIT = 2_000_000
# sorted uint64 hash-array broadcasts (8B/key, zero per-task setup —
# stages/hashset.py) are memory-bound only: 50M keys = 400MB object,
# well within a worker heap. Used by the fused evaluator AND the staged
# semi-join filter (qualified_counts), which probe via np.searchsorted.
FUSED_BROADCAST_LIMIT = 50_000_000
SEMI_BROADCAST_LIMIT = FUSED_BROADCAST_LIMIT


def clamp_partitions(n: int | None) -> int:
    """Hash-join/shuffle partition count must not exceed cluster CPUs —
    each hash-shuffle aggregator is an actor; oversubscribing them on a
    small cluster deadlocks the streaming executor. None = one per CPU."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(n if n is not None else cpus, cpus))


def child_valid_urls(verdicts_ds, child_shape_id: str):
    """Dataset of urls valid under the child shape (one column: url).

    Only FINAL verdict rows (kind='verdict') qualify: a ref-bearing child
    shape also emits kind='colpart' rows (column-part-only validity) in
    pass A, and counting those as child-valid would let a url that passes
    the child's column constraints but fails its ref constraint leak into
    the parent's child-valid set (depth>=2 ref chains — the reference's
    tc4 valid/invalid propagation)."""

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.equal(batch["shape_id"], child_shape_id),
                pc.equal(batch["kind"], "verdict"),
            ),
            pc.fill_null(batch["valid"], False),
        )
        return batch.filter(mask).select(["url"])

    return verdicts_ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def _broadcast_semi_filter(hashes_ref):
    """Task body: keep links whose target_url is in the broadcast child
    set — probed as a SORTED uint64 hash array via np.searchsorted
    (stages/hashset.py): zero per-batch setup, unlike pc.is_in which
    rebuilds a string hash table on every call. ray.get on a plasma
    ObjectRef is zero-copy and cached per worker."""
    from shaclapi_ray.stages.hashset import contains

    def fn(batch: pa.Table) -> pa.Table:
        sorted_h = ray.get(hashes_ref)
        mask = contains(sorted_h, batch["target_url"])
        return batch.filter(pa.array(mask)).select(["url"])

    return fn


def _bloom_pre_filter(bloom_ref):
    def fn(batch: pa.Table) -> pa.Table:
        bloom: BloomFilter = ray.get(bloom_ref)
        mask = bloom.contains_array(batch["target_url"])
        return batch.filter(pa.array(mask))

    return fn


def qualified_counts(
    links_ds,
    child_urls_ds,
    strategy: str = "auto",
    num_partitions: int = 32,
    salt_k: int = 0,
    bloom_prefilter: bool = False,
    concurrency=(1, 8),
    agg_mode: str = "auto",
    size_hint: int | None = None,
):
    """links(url, target_url) ⋉ child_urls(url) -> (url, qcount).

    'auto' broadcasts when the child side is small enough, else bucket-joins.
    ``size_hint`` (an upper bound on the child-url count, e.g. the pages
    row count from parquet metadata) lets 'auto' decide without executing
    the child pipeline an extra time. Returns (url, qcount).
    """
    num_partitions = clamp_partitions(num_partitions)
    if strategy == "auto":
        if size_hint is not None:
            strategy = "broadcast" if size_hint <= SEMI_BROADCAST_LIMIT else "bucket"
        else:
            # materialize once: the count decides the strategy and the same
            # blocks feed whichever path wins (no recompute)
            child_urls_ds = child_urls_ds.materialize()
            n_child = child_urls_ds.count()
            strategy = "broadcast" if n_child <= SEMI_BROADCAST_LIMIT else "bucket"

    if strategy == "broadcast":
        # to_arrow_refs executes the (lazy) child pipeline exactly once
        from shaclapi_ray.stages.hashset import hash_strings

        refs = child_urls_ds.to_arrow_refs()
        chunks = [
            hash_strings(t["url"].combine_chunks())
            for r in refs
            if (t := ray.get(r)).num_rows
        ]
        sorted_h = (
            np.unique(np.concatenate(chunks))
            if chunks
            else np.empty(0, dtype=np.uint64)
        )
        urls_ref = ray.put(sorted_h)
        # no concurrency cap: searchsorted probes have zero per-task setup
        qualified = links_ds.map_batches(
            _broadcast_semi_filter(urls_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    elif strategy == "bucket":
        import ray.data as _rd

        from shaclapi_ray.stages.joins import drop_empty_blocks

        if bloom_prefilter:
            bloom = build_bloom(child_urls_ds)
            bloom_ref = ray.put(bloom)
            links_ds = links_ds.map_batches(
                _bloom_pre_filter(bloom_ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        child = child_urls_ds.map_batches(
            lambda t: pa.table({"c_url": pc.unique(t["url"].combine_chunks())}),
            batch_format="pyarrow",
        )
        # hash-join inputs must be sanitized (see stages/joins.py); an
        # empty side makes the inner semi-join trivially empty
        links_ds = drop_empty_blocks(links_ds)
        child = drop_empty_blocks(child)
        if links_ds is None or child is None:
            return _url_counts(
                _rd.from_arrow(pa.table({"url": pa.array([], pa.string())})),
                agg_mode,
            )
        if salt_k and salt_k > 1:
            links_ds = links_ds.map_batches(
                lambda t, k=salt_k: t.append_column(
                    "salt",
                    pa.array(
                        (_stable_hash_array(t["url"]) % k).astype(np.int64)
                    ),
                ),
                batch_format="pyarrow",
            )
            child = child.map_batches(
                lambda t, k=salt_k: _replicate_with_salt(t, k),
                batch_format="pyarrow",
            )
            joined = links_ds.join(
                child,
                join_type="inner",
                num_partitions=num_partitions,
                on=("target_url", "salt"),
                right_on=("c_url", "salt"),
            )
        else:
            joined = links_ds.join(
                child,
                join_type="inner",
                num_partitions=num_partitions,
                on=("target_url",),
                right_on=("c_url",),
            )
        qualified = joined.select_columns(["url"])
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    return _url_counts(qualified, agg_mode)


def _url_counts(urls_ds, agg_mode: str = "auto"):
    """(url, qcount): pre-aggregate per batch, then combine (driver-merge
    below DRIVER_MERGE_LIMIT partial rows, Ray shuffle groupby above)."""
    from shaclapi_ray.stages.aggregates import grouped_count

    return grouped_count(urls_ds, "url", out_name="qcount", mode=agg_mode)


def plain_link_counts(links_ds, agg_mode: str = "auto"):
    """(url, qcount) for un-qualified cardinality (no child filter)."""
    return _url_counts(links_ds.select_columns(["url"]), agg_mode)


def swap_links(links_ds):
    """(url, target_url) -> roles swapped: url=the link TARGET,
    target_url=the link SOURCE.

    Inverse (inbound) cardinality constraints — ``sh:inversePath``, the
    reference's tc4/tc6 usage — reuse the outgoing-count machinery
    verbatim after this swap: ``qualified_counts`` then semi-joins on the
    SOURCE url's child-validity and ``_url_counts`` groups by the TARGET
    url, i.e. the hash-partitioned groupby(target_url) the inbound check
    needs. Popular link targets (hot keys) are handled by the per-batch
    pre-aggregation inside ``_url_counts``; the semi-join key (source
    url) is near-uniform."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"url": t["target_url"], "target_url": t["url"]})

    return links_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _stable_hash_array(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit hash of a string column (polars' vectorized
    xxhash via stages/hashset.py, process-stable for a fixed seed) — used
    to derive the salt for skew-salted bucket joins."""
    from shaclapi_ray.stages.hashset import hash_strings

    return hash_strings(arr)


def _replicate_with_salt(t: pa.Table, k: int) -> pa.Table:
    n = t.num_rows
    idx = np.tile(np.arange(n, dtype=np.int64), k)
    salt = np.repeat(np.arange(k, dtype=np.int64), n)
    rep = t.take(pa.array(idx))
    return rep.append_column("salt", pa.array(salt))


def build_bloom(urls_ds, fp_rate: float = 0.01) -> BloomFilter:
    """Merge per-batch partial Blooms of a url Dataset (mergeable-sketch
    pattern: partials computed data-parallel, OR-merged on the driver)."""
    n = max(1024, urls_ds.count())
    bloom = BloomFilter.sized(n, fp_rate)

    def partial(batch: pa.Table, m=bloom.m, k=bloom.k):
        b = BloomFilter(m=m, k=k)
        b.add_array(batch["url"])
        return pa.table({"bits": pa.array([b.bits.tobytes()], type=pa.binary())})

    for part in urls_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in part["bits"].to_pylist():
            other = BloomFilter.from_bytes(raw, m=bloom.m, k=bloom.k)
            bloom.merge(other)
    return bloom


def combine_ref_verdicts(
    colpart_ds,
    counts_and_constraints: list[tuple[object, RefConstraint]],
    shape_id: str,
    num_partitions: int = 32,
    strategy: str = "auto",
    size_hint: int | None = None,
):
    """colpart(url, valid, reason) ⟕ each (url, qcount) -> final events.

    strategy 'broadcast': each counts table is collected once, ray.put, and
    left-joined per batch with pyarrow's C++ hash join — no shuffle; right
    for counts sides up to SEMI_BROADCAST_LIMIT url-hash keys (8 B/key
    sorted-map lookup, zero per-task build). strategy 'bucket': Ray
    hash-partitioned Dataset.join — the both-sides-large scale path.
    'auto' picks per counts table by size.

    Returns a Dataset in EVENTS_SCHEMA with kind='verdict' (one row per
    targeted url) and kind='violation' rows for failing ref constraints.
    """
    import ray.data as _rd

    from shaclapi_ray.stages.joins import drop_empty_blocks

    num_partitions = clamp_partitions(num_partitions)
    base = colpart_ds.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "cp_valid": t["valid"],
                "cp_reason": t["reason"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # sanitize the (narrow) base once: empty/stale-schema blocks would
    # poison the bucket joins below, and an empty base short-circuits to
    # an empty events table
    base = drop_empty_blocks(base)
    if base is None:
        return _rd.from_arrow(EVENTS_SCHEMA.empty_table())
    qcount_cols = []
    broadcast_refs = []  # (col, object_ref) pairs resolved inside the stage
    for i, (counts_ds, _c) in enumerate(counts_and_constraints):
        col = f"qcount_{i}"
        if strategy == "auto" and size_hint is not None:
            use_broadcast = size_hint <= SEMI_BROADCAST_LIMIT
        else:
            if strategy != "bucket":
                counts_ds = counts_ds.materialize()
            use_broadcast = strategy == "broadcast" or (
                strategy == "auto" and counts_ds.count() <= SEMI_BROADCAST_LIMIT
            )
        if use_broadcast:
            # broadcast a SORTED url-hash -> count map (stages/hashset.py):
            # per-batch np.searchsorted lookups with ZERO per-task build,
            # unlike pa.Table.join which rebuilds its hash table per batch
            from shaclapi_ray.stages.hashset import build_hash_map

            tables = [ray.get(r) for r in counts_ds.to_arrow_refs()]
            tables = [t for t in tables if t.num_rows]
            if tables:
                counts_tbl = pa.concat_tables(tables).combine_chunks()
                hmap = build_hash_map(
                    counts_tbl["url"],
                    pc.cast(counts_tbl["qcount"], pa.int64()).to_numpy(
                        zero_copy_only=False
                    ),
                )
            else:
                hmap = (np.zeros(0, np.uint64), np.zeros(0, np.int64))
            broadcast_refs.append((col, ray.put(hmap)))
        else:
            renamed = counts_ds.map_batches(
                lambda t, col=col: pa.table({"j_url": t["url"], col: t["qcount"]}),
                batch_format="pyarrow",
            )
            renamed = drop_empty_blocks(renamed)
            if renamed is None:
                # no counts at all: finalize treats the missing column as 0
                qcount_cols.append(col)
                continue
            base = base.join(
                renamed,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("url",),
                right_on=("j_url",),
            )
            base = base.select_columns(
                ["url", "cp_valid", "cp_reason", *[c for c, _ in broadcast_refs], col]
            )
        qcount_cols.append(col)

    if broadcast_refs:
        from shaclapi_ray.stages.hashset import lookup

        def broadcast_join(batch: pa.Table) -> pa.Table:
            for c, ref in broadcast_refs:
                counts = lookup(ray.get(ref), batch["url"], default=0)
                batch = batch.append_column(c, pa.array(counts, pa.int64()))
            return batch

        base = base.map_batches(
            broadcast_join, batch_format="pyarrow", zero_copy_batch=True
        )

    constraints = [c for (_ds, c) in counts_and_constraints]

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return EVENTS_SCHEMA.empty_table()
        out = []
        valid = pc.fill_null(batch["cp_valid"], False)
        reason = pc.if_else(
            pc.fill_null(batch["cp_valid"], False),
            pa.nulls(n, pa.string()),
            batch["cp_reason"],
        )
        for col, c in zip(qcount_cols, constraints):
            if col in batch.column_names:
                q = pc.fill_null(batch[col], 0)
            else:  # counts side had no rows at all
                q = pa.array([0] * n, type=pa.int64())
            ok = pa.array([True] * n, type=pa.bool_())
            if c.min is not None:
                ok = pc.and_(ok, pc.greater_equal(q, pa.scalar(c.min)))
            if c.max is not None:
                ok = pc.and_(ok, pc.less_equal(q, pa.scalar(c.max)))
            fail = pc.invert(ok)
            if pc.any(fail).as_py():
                vio_idx = pc.indices_nonzero(fail)
                inv_shape = c.shape if c.shape else shape_id
                out.append(
                    pa.table(
                        {
                            "url": pc.take(batch["url"], vio_idx),
                            "shape_id": pa.array([shape_id] * len(vio_idx)),
                            "kind": pa.array(["violation"] * len(vio_idx)),
                            "valid": pa.array([False] * len(vio_idx)),
                            "reason": pa.array([inv_shape] * len(vio_idx)),
                            "constraint": pa.array([c.name] * len(vio_idx)),
                            "offending_value": pc.cast(
                                pc.take(q, vio_idx), pa.string()
                            ),
                        },
                        schema=EVENTS_SCHEMA,
                    )
                )
                first_fail = pc.and_(fail, pc.is_null(reason))
                inv = c.shape if c.shape else shape_id
                reason = pc.if_else(first_fail, inv, reason)
                valid = pc.and_(valid, ok)
        final_reason = pc.fill_null(reason, shape_id)
        out.append(
            pa.table(
                {
                    "url": batch["url"],
                    "shape_id": pa.array([shape_id] * n),
                    "kind": pa.array(["verdict"] * n),
                    "valid": valid,
                    "reason": final_reason,
                    "constraint": pa.nulls(n, pa.string()),
                    "offending_value": pa.nulls(n, pa.string()),
                },
                schema=EVENTS_SCHEMA,
            )
        )
        return pa.concat_tables(out)

    return base.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# fused broadcast referential evaluation (the scaling path)
# ---------------------------------------------------------------------------


def fused_ref_shape_eval(
    pages_ds,
    shape,
    child_hash_refs: dict[str, object],
):
    """ONE map_batches pass evaluating a referential shape end-to-end:
    column constraints + link extraction + broadcast hash-set membership +
    per-row qualified counts -> final verdict/violation events.

    No joins and no shuffles: links for a page are extracted in the same
    batch as the page row, so the qualified count per row is complete
    within the batch; the only global input is the broadcast child-valid
    hash set (sorted uint64, O(1) per-task setup — stages/hashset.py).

    Semantics note: each page ROW is evaluated independently; rows sharing
    a url are not merged (they never are for well-formed inputs where url
    is unique per row).

    ``child_hash_refs`` maps constraint name -> ray ObjectRef of the
    sorted child-valid hash array (None entry => unqualified cardinality).
    """
    import re as _re

    from shaclapi_ray.shapes.ir import RefConstraint as _Ref
    from shaclapi_ray.stages import hashset
    from shaclapi_ray.stages.links import HREF_RE
    from shaclapi_ray.stages.predicates import (
        EVENTS_SCHEMA as _ES,
    )
    from shaclapi_ray.stages.predicates import (
        CompiledShape,
        eval_column_part,
    )
    from shaclapi_ray.shapes.ir import eval_pred

    href = _re.compile(HREF_RE)
    cs = CompiledShape(shape)
    refs = [c for c in shape.constraints if isinstance(c, _Ref)]

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _ES.empty_table()
        urls = pc.fill_null(pc.cast(batch["url"], pa.string()), "null")
        tmask = eval_pred(shape.target, batch)
        if not pc.any(tmask).as_py():
            return _ES.empty_table()
        valid, reason, out = eval_column_part(cs, batch, urls, tmask)

        if isinstance(valid, (pa.Array, pa.ChunkedArray)):
            valid_np = (
                pc.fill_null(valid, False)
                .to_numpy(zero_copy_only=False)
                .astype(bool, copy=False)
            )
        else:
            valid_np = np.asarray(valid, dtype=bool)
        reason_arr = (
            reason.combine_chunks() if isinstance(reason, pa.ChunkedArray) else reason
        )
        tmask_np = (
            pc.fill_null(tmask, False)
            .to_numpy(zero_copy_only=False)
            .astype(bool, copy=False)
        )

        # EARLY SHORT-CIRCUIT (the reference's inter-shape pruning recast
        # per batch): links matter only for TARGET rows — the html regex
        # scan, the dominant cost of this pass, runs over the target
        # slice only. With a selective target this is the single biggest
        # saving in the fused path; behavior is identical because
        # non-target rows never contribute events.
        from shaclapi_ray.stages.hashset import HASH_SEED
        from shaclapi_ray.stages.links import extract_targets_vectorized

        tgt_rows = np.flatnonzero(tmask_np)
        if tgt_rows.size == n:
            html_src = batch["html"]
            row_map = None
        else:
            html_src = pc.take(batch["html"], pa.array(tgt_rows))
            row_map = tgt_rows
        sub_rows, targets = extract_targets_vectorized(html_src)
        row_arr = row_map[sub_rows] if row_map is not None else sub_rows
        target_hashes = (
            targets.fill_null("\0null\0").hash(seed=HASH_SEED).to_numpy()
            if len(targets)
            else np.zeros(0, dtype=np.uint64)
        )

        for c in refs:
            ref = child_hash_refs.get(c.name)
            if ref is not None and len(target_hashes):
                child_hashes = ray.get(ref)
                if child_hashes.size:
                    pos = np.searchsorted(child_hashes, target_hashes)
                    pos = np.minimum(pos, child_hashes.size - 1)
                    member = child_hashes[pos] == target_hashes
                else:
                    member = np.zeros(len(target_hashes), dtype=bool)
            else:
                member = np.ones(len(target_hashes), dtype=bool)
            counts = (
                np.bincount(row_arr[member], minlength=n)
                if len(target_hashes)
                else np.zeros(n, dtype=np.int64)
            )
            ok = np.ones(n, dtype=bool)
            if c.min is not None:
                ok &= counts >= c.min
            if c.max is not None:
                ok &= counts <= c.max
            fail = tmask_np & ~ok
            if fail.any():
                inv = c.shape if c.shape else shape.shape_id
                vio_idx = np.nonzero(fail)[0]
                out.append(
                    pa.table(
                        {
                            "url": pc.take(urls, pa.array(vio_idx)),
                            "shape_id": pa.array([shape.shape_id] * len(vio_idx)),
                            "kind": pa.array(["violation"] * len(vio_idx)),
                            "valid": pa.array([False] * len(vio_idx)),
                            "reason": pa.array([inv] * len(vio_idx)),
                            "constraint": pa.array([c.name] * len(vio_idx)),
                            "offending_value": pc.cast(
                                pa.array(counts[vio_idx].astype(np.int64)), pa.string()
                            ),
                        },
                        schema=_ES,
                    )
                )
                reason_arr = pc.if_else(
                    pc.and_(pa.array(fail), pc.is_null(reason_arr)),
                    pa.scalar(inv, pa.string()),
                    reason_arr,
                )
                valid_np &= ok | ~tmask_np

        tgt_idx = np.nonzero(tmask_np)[0]
        out.append(
            pa.table(
                {
                    "url": pc.take(urls, pa.array(tgt_idx)),
                    "shape_id": pa.array([shape.shape_id] * len(tgt_idx)),
                    "kind": pa.array(["verdict"] * len(tgt_idx)),
                    "valid": pa.array(valid_np[tgt_idx]),
                    "reason": pc.fill_null(
                        pc.take(reason_arr, pa.array(tgt_idx)), shape.shape_id
                    ),
                    "constraint": pa.nulls(len(tgt_idx), pa.string()),
                    "offending_value": pa.nulls(len(tgt_idx), pa.string()),
                },
                schema=_ES,
            )
        )
        return pa.concat_tables(out)

    return pages_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def collect_child_hash_set(child_urls_ds):
    """Build the broadcast sorted-hash set of child-valid urls.

    The string hashing runs data-parallel inside the tasks (emitting
    uint64 columns, 8B/key); the driver only concatenates + sorts the
    hash arrays — the sole serial step of the fused referential path is
    an np.sort over 8-byte keys (~10ms per million)."""
    from shaclapi_ray.stages import hashset

    def to_hashes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"h": pa.array(hashset.hash_strings(batch["url"]), type=pa.uint64())}
        )

    hashed = child_urls_ds.map_batches(
        to_hashes, batch_format="pyarrow", zero_copy_batch=True
    )
    tables = [ray.get(r) for r in hashed.to_arrow_refs()]
    arrays = [t["h"].combine_chunks().to_numpy() for t in tables if t.num_rows]
    if not arrays:
        return ray.put(np.zeros(0, dtype=np.uint64))
    return ray.put(np.sort(np.concatenate(arrays)))
