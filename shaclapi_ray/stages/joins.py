"""Hash-join input sanitation.

Ray 2.49's map operators SKIP the UDF on empty input blocks and forward
them unchanged (plan_udf_map_op.py: "For empty input blocks, we directly
output them without calling the UDF"). Any schema-CHANGING map_batches
therefore leaks empty blocks with a stale (or absent) schema downstream.
``Dataset.join``'s hash-shuffle aggregators resolve column references
from the blocks they receive, so a stale-schema empty block — or a side
with no rows at all — aborts the join with
``ArrowInvalid: No match ... for key field reference``.

``drop_empty_blocks`` materializes a join input and rebuilds it from the
non-empty block refs only (object refs move, no data touches the driver).
The materialization barrier is acceptable exactly here: a hash join
materializes its inputs into shuffle state anyway, and every join in this
engine is over narrow (url/key, count) tables — never the wide html rows.

Callers must handle the ``None`` return (side has no rows) explicitly,
which each join site can do better than a generic wrapper (e.g. an inner
semi-join with an empty side is just an empty result; a left-outer with
an empty right side means "no counts -> fill 0").
"""

from __future__ import annotations

import ray
import ray.data


def drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset | None:
    """Materialize ``ds`` and return a Dataset of its NON-EMPTY blocks,
    or None when every block is empty (caller supplies the semantics of
    an empty side)."""
    m = ds.materialize()
    refs = []
    for bundle in m.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)
