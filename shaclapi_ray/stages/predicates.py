"""Fused column-predicate evaluation stage.

One ``map_batches(ColumnShapeEvaluator, batch_format='pyarrow',
zero_copy_batch=True)`` pass evaluates EVERY shape's column-level constraints
over zero-copy Arrow batches — the Ray-Data recast of the reference's
VALIDATION process streaming verdicts through ValidationResultTransmitter
(/root/reference/shaclapi/multiprocessing/functions.py:94-99,
/root/reference/shaclapi/reduction/ValidationResultTransmitter.py:18-25).

The stage is a callable CLASS so shape compilation (predicate closure over
pyarrow.compute kernels, regex setup) happens once per actor in ``__init__``,
mirroring the reference's warm rdflib parse in long-lived stage processes
(/root/reference/shaclapi/api.py:25-27).

Output: long-format event rows with a ``kind`` discriminator:

    kind='verdict'   final verdict for a column-only shape
    kind='colpart'   partial (column-constraints-only) verdict for a shape
                     that also has referential/global constraints — combined
                     with the ref-part downstream (barrier per DAG level)
    kind='violation' one row per (row, failed constraint)

Per-batch early short-circuit: a shape whose target predicate selects no row
in a batch is skipped entirely (``pc.any`` fast path) — the per-partition
pruning analog of the reference's shape-network reduction.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from shaclapi_ray.shapes.ir import (
    DriftConstraint,
    OrConstraint,
    PredicateConstraint,
    RefConstraint,
    Shape,
    UniqueConstraint,
    eval_pred,
)

EVENTS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("shape_id", pa.string()),
        ("kind", pa.string()),
        ("valid", pa.bool_()),
        ("reason", pa.string()),
        ("constraint", pa.string()),
        ("offending_value", pa.string()),
    ]
)

MAX_OFFENDING_LEN = 120


def _empty_events() -> pa.Table:
    return EVENTS_SCHEMA.empty_table()


def offending_values(batch: pa.Table, constraint: PredicateConstraint) -> pa.Array:
    """Stringified per-row offending values for a predicate constraint.

    Formatting contract (shared with the SQL oracles): ``len_range`` reports
    the utf8 length; everything else reports ``CAST(value AS VARCHAR)``
    truncated to MAX_OFFENDING_LEN; null -> 'null'.
    """
    col_name = constraint.offending_column
    if col_name is None:
        cols = sorted(constraint.columns())
        col_name = cols[0] if cols else None
    if col_name is None:
        return pa.nulls(batch.num_rows, pa.string())
    col = batch[col_name]
    op = constraint.pred.get("op") if constraint.pred else None
    if op == "len_range":
        vals = pc.cast(pc.utf8_length(col), pa.string())
    else:
        vals = pc.cast(col, pa.string())
        vals = pc.utf8_slice_codeunits(vals, 0, MAX_OFFENDING_LEN)
    return pc.fill_null(vals, "null")


class CompiledShape:
    """A shape split into its column part (evaluable per batch) and the
    names of its non-column constraints (evaluated by later stages)."""

    def __init__(self, shape: Shape):
        self.shape = shape
        self.shape_id = shape.shape_id
        self.column_constraints: list[PredicateConstraint | OrConstraint] = []
        self.ref_constraints: list[RefConstraint] = []
        self.global_constraints: list[UniqueConstraint | DriftConstraint] = []
        for c in shape.constraints:
            if isinstance(c, (PredicateConstraint, OrConstraint)):
                self.column_constraints.append(c)
            elif isinstance(c, RefConstraint):
                self.ref_constraints.append(c)
            else:
                self.global_constraints.append(c)
        self.final_in_pass_a = not self.ref_constraints and not self.global_constraints


def eval_column_part(cs: CompiledShape, batch: pa.Table, urls, tmask):
    """Evaluate a shape's column constraints on one batch.

    Returns (valid, reason, violation_tables): per-row masks plus one
    violation event table per failed constraint. ``reason`` records only
    the FIRST failing constraint's shape; every failed constraint still
    gets violation rows."""
    n = batch.num_rows
    out: list[pa.Table] = []
    valid = pa.array([True] * n, type=pa.bool_())
    reason = pa.nulls(n, pa.string())
    for c in cs.column_constraints:
        cmask = c.evaluate(batch)
        fail = pc.and_(tmask, pc.invert(cmask))
        if pc.any(fail).as_py():
            vio_idx = pc.indices_nonzero(fail)
            off_src = c.options[0] if isinstance(c, OrConstraint) else c
            off = offending_values(batch, off_src)
            out.append(
                pa.table(
                    {
                        "url": pc.take(urls, vio_idx),
                        "shape_id": pa.array([cs.shape_id] * len(vio_idx)),
                        "kind": pa.array(["violation"] * len(vio_idx)),
                        "valid": pa.array([False] * len(vio_idx)),
                        "reason": pa.array([cs.shape_id] * len(vio_idx)),
                        "constraint": pa.array([c.name] * len(vio_idx)),
                        "offending_value": pc.take(off, vio_idx),
                    },
                    schema=EVENTS_SCHEMA,
                )
            )
            first_fail = pc.and_(fail, pc.is_null(reason))
            reason = pc.if_else(first_fail, cs.shape_id, reason)
            valid = pc.and_(valid, pc.or_(cmask, pc.invert(tmask)))
    return valid, reason, out


class ColumnShapeEvaluator:
    """Actor-pool callable: evaluates all shapes' column constraints on one
    Arrow batch, emitting verdict / colpart / violation event rows."""

    def __init__(self, shapes: list[Shape]):
        self.compiled = [CompiledShape(s) for s in shapes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        n = batch.num_rows
        if n == 0:
            return _empty_events()
        urls = pc.fill_null(pc.cast(batch["url"], pa.string()), "null") if "url" in batch.column_names else pa.nulls(n, pa.string())
        for cs in self.compiled:
            shape = cs.shape
            tmask = eval_pred(shape.target, batch)
            if not pc.any(tmask).as_py():
                continue  # early short-circuit: no targeted rows in this batch
            valid, reason, vio = eval_column_part(cs, batch, urls, tmask)
            out.extend(vio)
            tgt_idx = pc.indices_nonzero(tmask)
            kind = "verdict" if cs.final_in_pass_a else "colpart"
            final_valid = pc.take(valid, tgt_idx)
            final_reason = pc.fill_null(pc.take(reason, tgt_idx), cs.shape_id)
            out.append(
                pa.table(
                    {
                        "url": pc.take(urls, tgt_idx),
                        "shape_id": pa.array([cs.shape_id] * len(tgt_idx)),
                        "kind": pa.array([kind] * len(tgt_idx)),
                        "valid": final_valid,
                        "reason": final_reason,
                        "constraint": pa.nulls(len(tgt_idx), pa.string()),
                        "offending_value": pa.nulls(len(tgt_idx), pa.string()),
                    },
                    schema=EVENTS_SCHEMA,
                )
            )
        if not out:
            return _empty_events()
        return pa.concat_tables(out)
