"""Pluggable evaluation backends.

Reference analog: shaclAPI dispatches validation to one of two engine
adapters selected by the config key ``backend`` (``'travshacl'`` default,
``'s2spy'``), raising ``NotImplementedError`` for unknown names
(/root/reference/shaclapi/reduction/__init__.py:14-21,
/root/reference/shaclapi/config.py:185-189). The recast keeps the same
surface — a named registry the engine consults at ``run()`` time — over
the two genuinely different Ray evaluators this engine owns:

- ``'fused'`` — single-pass broadcast evaluator: an eligible referential
  shape is evaluated in ONE ``map_batches`` pass over pages; the only
  global input is the broadcast child-valid hash set
  (stages/referential.fused_ref_shape_eval). No joins, no shuffles.
- ``'staged'`` — multi-pass evaluator: pass-A column-part events + link
  counts + keyed combine (hash-partitioned joins, salted for skew).
  Exact at any scale; the only evaluator for inverse (inbound) refs and
  shapes mixing unique/drift constraints, and the scale path once the
  child-valid set exceeds the broadcast ceiling.
- ``'auto'`` (default) — per-shape choice: fused where eligible, staged
  otherwise (as the reference defaults to travshacl).

``register_backend()`` plugs in a third evaluator (e.g. a sampling
approximate validator): subclass ``EvaluationBackend``, override
``select_fused`` (which shapes the backend takes over) and/or
``eval_shape`` (how a taken-over shape is evaluated into events rows).
"""

from __future__ import annotations

from shaclapi_ray.shapes.ir import (
    DriftConstraint,
    RefConstraint,
    UniqueConstraint,
)


class EvaluationBackend:
    """Base: staged-only (takes over no shapes — everything flows through
    the engine's pass-A + pass-B staged pipeline)."""

    name = "staged"

    def select_fused(self, shapes: dict, cfg, rows_hint: int | None) -> set[str]:
        """Shape ids this backend evaluates in its own single pass; all
        others take the staged pipeline. Called once per ``run()``."""
        return set()

    def eval_shape(self, pages_ref, shape, child_refs):
        """Evaluate one selected shape over its (column-pruned) pages
        Dataset into verdict/violation event rows. ``child_refs`` maps
        constraint name -> broadcast child-valid hash set (or None for
        unqualified link counts)."""
        from shaclapi_ray.stages.referential import fused_ref_shape_eval

        return fused_ref_shape_eval(pages_ref, shape, child_refs)


def _fusable(shape) -> bool:
    """A shape the fused evaluator CAN take: has outgoing (non-inverse)
    ref constraints and no unique/drift constraints (those need global
    counts a per-row pass cannot see)."""
    refs = [c for c in shape.constraints if isinstance(c, RefConstraint)]
    others = [
        c
        for c in shape.constraints
        if isinstance(c, (UniqueConstraint, DriftConstraint))
    ]
    return bool(refs) and not others and not any(c.inverse for c in refs)


class FusedBackend(EvaluationBackend):
    """Force the fused single-pass evaluator for every eligible shape
    regardless of input size (the ``ref_strategy='broadcast'`` analog)."""

    name = "fused"

    def select_fused(self, shapes, cfg, rows_hint):
        return {sid for sid, s in shapes.items() if _fusable(s)}


class AutoBackend(FusedBackend):
    """Default: fused where eligible AND the child-valid set is expected
    to fit the broadcast ceiling; staged otherwise. Honors
    ``cfg.ref_strategy``: 'bucket' pins everything to staged, 'broadcast'
    forces fused for eligible shapes."""

    name = "auto"

    def select_fused(self, shapes, cfg, rows_hint):
        if cfg.ref_strategy == "bucket":
            return set()
        from shaclapi_ray.stages.referential import FUSED_BROADCAST_LIMIT

        if cfg.ref_strategy != "broadcast" and (
            rows_hint or 0
        ) > FUSED_BROADCAST_LIMIT:
            return set()
        return super().select_fused(shapes, cfg, rows_hint)


class StagedBackend(EvaluationBackend):
    name = "staged"


BACKENDS: dict[str, EvaluationBackend] = {}


def register_backend(backend: EvaluationBackend) -> None:
    BACKENDS[backend.name] = backend


register_backend(AutoBackend())
register_backend(FusedBackend())
register_backend(StagedBackend())


def get_backend(name: str) -> EvaluationBackend:
    try:
        return BACKENDS[name]
    except KeyError:
        # same failure surface as the reference for an unknown backend
        # (/root/reference/shaclapi/reduction/__init__.py:20-21)
        raise NotImplementedError(
            f"The given backend {name} is not implemented; "
            f"known: {sorted(BACKENDS)}"
        ) from None
