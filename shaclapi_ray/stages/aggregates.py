"""Keyed aggregation helpers with explicit small/large-scale paths.

`grouped_sum(ds, key, val)` implements the pre-aggregate-then-combine
pattern (SURVEY.md §4): a vectorized per-batch partial aggregation first,
so whatever combines afterwards sees one row per (key, batch) instead of
one per input row. The combine step has two modes:

- 'driver': collect the (small) partials and merge with pyarrow's C++
  group_by on the driver — no shuffle, no aggregator actors. Right when
  the distinct-key count fits driver memory (bench scales; dimension-like
  keys). This is NOT a per-row driver loop — partials are already
  pre-aggregated columnar blocks.
- 'shuffle': Ray hash groupby — the 10^12-row path where the key space
  itself is distributed.
- 'auto': picks by the materialized partials' row count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

DRIVER_MERGE_LIMIT = 5_000_000  # partial rows; above this, shuffle


def partial_counts(ds, key: str):
    """One (key, cnt) row per (key, batch): vectorized pa group_by."""

    def fn(batch: pa.Table) -> pa.Table:
        g = batch.select([key]).group_by(key).aggregate([(key, "count")])
        return pa.table(
            {key: g[key], "cnt": pc.cast(g[f"{key}_count"], pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def combine_partials(
    partials_ds, key: str, val: str, out_name: str, mode: str = "auto"
):
    """Merge (key, val) partial rows into one row per key (sum of val).

    Returns a Dataset with columns (key, out_name)."""
    if mode == "auto":
        partials_ds = partials_ds.materialize()
        mode = "driver" if partials_ds.count() <= DRIVER_MERGE_LIMIT else "shuffle"

    if mode == "driver":
        tables = [ray.get(r) for r in partials_ds.to_arrow_refs()]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            merged = pa.table(
                {key: pa.array([], pa.string()), out_name: pa.array([], pa.int64())}
            )
        else:
            cat = pa.concat_tables(tables)
            g = cat.group_by(key).aggregate([(val, "sum")])
            merged = pa.table(
                {key: g[key], out_name: pc.cast(g[f"{val}_sum"], pa.int64())}
            )
        return ray.data.from_arrow(merged)

    if mode == "shuffle":
        agg = partials_ds.groupby(key).aggregate(Sum(val, alias_name=out_name))
        return agg.map_batches(
            lambda t: pa.table(
                {key: t[key], out_name: pc.cast(t[out_name], pa.int64())}
            ),
            batch_format="pyarrow",
        )

    raise ValueError(f"unknown mode {mode!r}")


def grouped_count(ds, key: str, out_name: str = "qcount", mode: str = "auto"):
    """(key, out_name): occurrences of each key value."""
    return combine_partials(partial_counts(ds, key), key, "cnt", out_name, mode)


def combine_partials_multi(
    partials_ds,
    keys: list[str],
    sums: list[str] | dict[str, str],
    mode: str = "auto",
):
    """Multi-key generalization of combine_partials: one row per key
    TUPLE; ``sums`` is a list of columns to sum, or a {column: op} dict
    with op in {'sum', 'min', 'max'} (the merge op for partials that
    were pre-aggregated per batch). Output keeps the input column
    names/types (ints stay ints, floats stay floats). Same two paths:
    a driver-side pyarrow C++ group_by over pre-aggregated partials
    below DRIVER_MERGE_LIMIT rows, Ray's hash-shuffle groupby above."""
    aggs = {c: "sum" for c in sums} if not isinstance(sums, dict) else sums
    if mode == "auto":
        partials_ds = partials_ds.materialize()
        mode = "driver" if partials_ds.count() <= DRIVER_MERGE_LIMIT else "shuffle"

    if mode == "driver":
        tables = [t for r in partials_ds.to_arrow_refs() if (t := ray.get(r)).num_rows]
        if not tables:
            schema = partials_ds.schema()
            if schema is None:
                # a fully-empty upstream loses its schema entirely —
                # emit null-typed key/agg columns so callers can still
                # see num_rows == 0 instead of crashing here
                empty = pa.table(
                    {n: pa.array([], type=pa.null()) for n in (*keys, *aggs)}
                )
            else:
                empty = pa.table(
                    {
                        n: pa.array([], type=t)
                        for n, t in zip(schema.names, schema.types)
                        if n in keys or n in aggs
                    }
                )
            return ray.data.from_arrow(empty)
        cat = pa.concat_tables(tables)
        g = cat.group_by(keys).aggregate([(c, op) for c, op in aggs.items()])
        out = pa.table(
            {
                **{k: g[k] for k in keys},
                **{
                    c: pc.cast(g[f"{c}_{op}"], cat.schema.field(c).type)
                    for c, op in aggs.items()
                },
            }
        )
        return ray.data.from_arrow(out)

    if mode == "shuffle":
        from ray.data.aggregate import Max, Min

        ray_agg = {"sum": Sum, "min": Min, "max": Max}
        agg = partials_ds.groupby(keys).aggregate(
            *[ray_agg[op](c, alias_name=c) for c, op in aggs.items()]
        )
        return agg

    raise ValueError(f"unknown mode {mode!r}")
