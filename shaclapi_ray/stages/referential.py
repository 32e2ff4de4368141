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
                       strategy 'broadcast': ray.put the child url set once,
                         filter inside map_batches with pc.is_in (no shuffle);
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

BROADCAST_LIMIT = 2_000_000  # child-url sets up to this size are broadcast


def clamp_partitions(n: int) -> int:
    """Hash-join/shuffle partition count must not exceed cluster CPUs —
    each hash-shuffle aggregator is an actor; oversubscribing them on a
    small cluster deadlocks the streaming executor."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(n, cpus))


def child_valid_urls(verdicts_ds, child_shape_id: str):
    """Dataset of urls valid under the child shape (one column: url)."""

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["shape_id"], child_shape_id),
            pc.fill_null(batch["valid"], False),
        )
        return batch.filter(mask).select(["url"])

    return verdicts_ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def _broadcast_semi_filter(urls_ref):
    """Stateless-task body: keep links whose target_url is in the broadcast
    url set. ray.get on a plasma ObjectRef is zero-copy and cached per
    worker — no actor pool needed."""

    def fn(batch: pa.Table) -> pa.Table:
        value_set = ray.get(urls_ref)
        mask = pc.is_in(batch["target_url"], value_set=value_set)
        return batch.filter(pc.fill_null(mask, False)).select(["url"])

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
):
    """links(url, target_url) ⋉ child_urls(url) -> (url, qcount).

    'auto' broadcasts when the child side is small enough, else bucket-joins.
    Returns a Dataset with columns (url, qcount).
    """
    num_partitions = clamp_partitions(num_partitions)
    if strategy == "auto":
        # materialize once: the count decides the strategy and the same
        # blocks feed whichever path wins (no recompute)
        child_urls_ds = child_urls_ds.materialize()
        n_child = child_urls_ds.count()
        strategy = "broadcast" if n_child <= BROADCAST_LIMIT else "bucket"
    elif strategy == "broadcast":
        child_urls_ds = child_urls_ds.materialize()

    if strategy == "broadcast":
        refs = child_urls_ds.to_arrow_refs()
        tables = [ray.get(r) for r in refs]
        if tables:
            child_tbl = pa.concat_tables(tables)
            urls_arr = pc.unique(child_tbl["url"].combine_chunks())
        else:
            urls_arr = pa.array([], type=pa.string())
        urls_ref = ray.put(urls_arr)
        qualified = links_ds.map_batches(
            _broadcast_semi_filter(urls_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    elif strategy == "bucket":
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

    return _url_counts(qualified)


def _url_counts(urls_ds):
    """(url, qcount): pre-aggregate per batch, then combine (driver-merge
    below DRIVER_MERGE_LIMIT partial rows, Ray shuffle groupby above)."""
    from shaclapi_ray.stages.aggregates import grouped_count

    return grouped_count(urls_ds, "url", out_name="qcount", mode="auto")


def plain_link_counts(links_ds):
    """(url, qcount) for un-qualified cardinality (no child filter)."""
    return _url_counts(links_ds.select_columns(["url"]))


def _stable_hash_array(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit hash of a string column (FNV-1a over bytes),
    stable across processes (unlike Python's seeded hash())."""
    import zlib

    vals = arr.to_pylist() if isinstance(arr, (pa.ChunkedArray, pa.Array)) else arr
    return np.array(
        [zlib.crc32(v.encode() if v else b"") for v in vals], dtype=np.uint64
    )


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
):
    """colpart(url, valid, reason) ⟕ each (url, qcount) -> final events.

    strategy 'broadcast': each counts table is collected once, ray.put, and
    left-joined per batch with pyarrow's C++ hash join — no shuffle; right
    for counts sides up to BROADCAST_LIMIT rows. strategy 'bucket': Ray
    hash-partitioned Dataset.join — the both-sides-large scale path.
    'auto' picks per counts table by size.

    Returns a Dataset in EVENTS_SCHEMA with kind='verdict' (one row per
    targeted url) and kind='violation' rows for failing ref constraints.
    """
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
    qcount_cols = []
    broadcast_refs = []  # (col, object_ref) pairs resolved inside the stage
    for i, (counts_ds, _c) in enumerate(counts_and_constraints):
        col = f"qcount_{i}"
        if strategy != "bucket":
            counts_ds = counts_ds.materialize()
        use_broadcast = strategy == "broadcast" or (
            strategy == "auto" and counts_ds.count() <= BROADCAST_LIMIT
        )
        if use_broadcast:
            tables = [ray.get(r) for r in counts_ds.to_arrow_refs()]
            tables = [t for t in tables if t.num_rows] or [
                pa.table(
                    {"url": pa.array([], pa.string()), "qcount": pa.array([], pa.int64())}
                )
            ]
            counts_tbl = pa.concat_tables(tables).combine_chunks()
            counts_tbl = counts_tbl.rename_columns(["url", col])
            broadcast_refs.append((col, ray.put(counts_tbl)))
        else:
            renamed = counts_ds.map_batches(
                lambda t, col=col: pa.table({"j_url": t["url"], col: t["qcount"]}),
                batch_format="pyarrow",
            )
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

        def broadcast_join(batch: pa.Table) -> pa.Table:
            for _c, ref in broadcast_refs:
                tbl = ray.get(ref)
                batch = batch.join(tbl, keys=["url"], join_type="left outer")
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
            q = pc.fill_null(batch[col], 0)
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
