"""shaclapi_ray — a from-scratch Ray-Data-native constraint validation engine.

Re-expresses the capabilities of SDM-TIB/shaclAPI (reference at
/root/reference — shape-schema validation integrated with query execution,
shape-network reduction, early verdict streaming) as a constraint-DAG
evaluator over Parquet tables of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)``.

Architecture (Ray-Data-first, not a port):

- shapes compile to vectorized column predicates evaluated in ONE fused
  ``map_batches(batch_format='pyarrow', zero_copy_batch=True)`` pass
  (``shaclapi_ray.stages.predicates``);
- the shape dependency network is a driver-side ``ConstraintDAG`` with the
  reference's reductions (prune to reachable shapes, drop constraints not
  requested, target-predicate pushdown, target-first order) —
  ``shaclapi_ray.shapes.dag``;
- inter-shape referential constraints run as hash-partitioned, skew-salted
  bucket joins with broadcast Bloom pre-filters
  (``shaclapi_ray.stages.referential``);
- stateful actor pools maintain mergeable sketches (HyperLogLog, Bloom,
  t-digest) — ``shaclapi_ray.state.sketches``;
- outputs: VERDICTS ``(url, shape_id, valid, reason)`` and VIOLATIONS
  ``(url, shape_id, constraint, offending_value)`` datasets, plus the
  reference's test-format result dict (validTargets / invalidTargets /
  advancedValid / advancedInvalid).
"""

__version__ = "0.1.0"

from shaclapi_ray.schemas import PAGES_SCHEMA, VERDICTS_SCHEMA, VIOLATIONS_SCHEMA  # noqa: F401
