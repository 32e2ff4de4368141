"""ConstraintDAG — the shape dependency network and the reference's
engine-agnostic reductions, recast driver-side (pure Python, no Ray):

- ``reduce(targets)``   ≙ prune network to shapes reachable from the target
  (/root/reference/shaclapi/reduction/Reduction.py:14-23 via graph traversal);
- ``project(columns)``  ≙ drop constraints whose columns are not requested,
  with the OR-option collapse rules of
  /root/reference/shaclapi/reduction/travshacl/ReducedShapeParser.py:78-110
  (all options removed => constraint vanishes; one option left => promoted to
  a plain constraint) — exercised by the tc6 unit tests
  (/root/reference/tests/test_main.py:286-403);
- ``node_order(targets)`` ≙ validation order starting at the target shape so
  first verdicts stream early
  (/root/reference/shaclapi/reduction/Reduction.py:66-78) — here: reverse
  topological order (children before parents) with target-reachable shapes
  only, ties broken by shape_id for determinism;
- ``overlap(other)``    ≙ |intersection| / |smaller| of two reduced schemas
  (/root/reference/shaclapi/api.py:286-321).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from shaclapi_ray.shapes.ir import Constraint, OrConstraint, Shape


@dataclass
class ConstraintDAG:
    shapes: dict[str, Shape]

    @classmethod
    def from_shapes(cls, shapes: list[Shape]) -> "ConstraintDAG":
        return cls(shapes={s.shape_id: s for s in shapes})

    def dependencies(self) -> dict[str, list[str]]:
        """shape_id -> child shape_ids it references."""
        return {
            sid: sorted(set(s.referenced_shapes())) for sid, s in self.shapes.items()
        }

    def reduce(self, targets: list[str] | None) -> "ConstraintDAG":
        """Keep only shapes reachable from the target shapes (DFS)."""
        if not targets:
            return ConstraintDAG(dict(self.shapes))
        deps = self.dependencies()
        keep: set[str] = set()
        stack = [t for t in targets if t in self.shapes]
        while stack:
            sid = stack.pop()
            if sid in keep:
                continue
            keep.add(sid)
            stack.extend(d for d in deps.get(sid, []) if d in self.shapes)
        return ConstraintDAG({sid: self.shapes[sid] for sid in sorted(keep)})

    def project(
        self, columns: set[str] | None, target_shapes: list[str] | None = None
    ) -> "ConstraintDAG":
        """Drop constraints (of the target shapes) reading columns outside
        ``columns``. Like the reference, removal applies to the *target*
        shape only (non-target shapes keep all constraints —
        ReducedShapeParser removes constraints based on the user query,
        which binds only the target shape's properties). OR collapse rules
        per ReducedShapeParser.parse_constraint:100-106."""
        if columns is None:
            return ConstraintDAG(dict(self.shapes))
        affected = set(target_shapes) if target_shapes else set(self.shapes)
        out: dict[str, Shape] = {}
        for sid, shape in self.shapes.items():
            if sid not in affected:
                out[sid] = shape
                continue
            kept: list[Constraint] = []
            for c in shape.constraints:
                if isinstance(c, OrConstraint):
                    opts = [o for o in c.options if o.columns() <= columns]
                    if not opts:
                        continue  # all options removed => constraint vanishes
                    if len(opts) == 1:
                        kept.append(opts[0])  # single option => plain constraint
                    else:
                        kept.append(OrConstraint(name=c.name, options=opts))
                elif c.columns() <= columns:
                    kept.append(c)
            out[sid] = replace(shape, constraints=kept)
        return ConstraintDAG(out)

    def node_order(
        self,
        targets: list[str] | None = None,
        size_estimates: dict[str, int] | None = None,
    ) -> list[str]:
        """Evaluation order: children strictly before parents (a referential
        constraint consumes *complete* child verdicts — the barrier-per-DAG-
        level of SURVEY.md §7.4); among independent shapes, the full
        'TARGET IN BIG' heuristic triple of the reference's default
        (/root/reference/shaclapi/config.py:205-209, Trav-SHACL order of
        application = the order of the words): TARGET shapes first (early
        verdict streaming), then higher IN-degree first (shapes whose
        verdicts are consumed by more dependents unblock more of the DAG
        per evaluation), then — when ``size_estimates`` (shape_id ->
        estimated target-set row count from Parquet column stats,
        io.estimate_rows_matching) is given — BIGger estimated target
        sets first (seed validation in the big shape so the bulk of
        verdicts streams earliest), then lexicographic."""
        deps = self.dependencies()
        target_set = set(targets or [])
        est = size_estimates or {}
        indeg: dict[str, int] = {}
        for ds in deps.values():
            for d in ds:
                if d in self.shapes:
                    indeg[d] = indeg.get(d, 0) + 1
        order: list[str] = []
        state: dict[str, int] = {}  # 0=unvisited 1=visiting 2=done

        def visit(sid: str) -> None:
            st = state.get(sid, 0)
            if st == 2:
                return
            if st == 1:
                raise ValueError(f"shape reference cycle at {sid!r}")
            state[sid] = 1
            for d in sorted(
                (d for d in deps.get(sid, []) if d in self.shapes),
                key=lambda s: (-indeg.get(s, 0), -est.get(s, 0), s),
            ):
                visit(d)
            state[sid] = 2
            order.append(sid)

        roots = sorted(
            self.shapes,
            key=lambda s: (
                0 if s in target_set else 1,
                -indeg.get(s, 0),
                -est.get(s, 0),
                s,
            ),
        )
        for sid in roots:
            visit(sid)
        return order

    def overlap(self, other: "ConstraintDAG") -> float:
        a, b = set(self.shapes), set(other.shapes)
        if not a or not b:
            return 0.0
        return len(a & b) / min(len(a), len(b))

    def columns(self) -> set[str]:
        out: set[str] = set()
        for s in self.shapes.values():
            out |= s.columns()
        return out

    def validate(self) -> None:
        """Sanity checks: referenced shapes exist, no cycles, drift shapes
        are drift-only (a DriftConstraint produces per-PARTITION verdicts,
        which cannot be combined row-wise with other constraint kinds —
        mixing would silently drop the non-drift constraints)."""
        from shaclapi_ray.shapes.ir import DriftConstraint

        for sid, s in self.shapes.items():
            for ref in s.referenced_shapes():
                if ref not in self.shapes:
                    raise ValueError(f"shape {sid!r} references unknown shape {ref!r}")
            n_drift = sum(isinstance(c, DriftConstraint) for c in s.constraints)
            if n_drift > 1:
                raise ValueError(
                    f"shape {sid!r} has {n_drift} drift constraints; at most "
                    "one is supported (split into one shape per drift check)"
                )
            if n_drift and len(s.constraints) > n_drift:
                raise ValueError(
                    f"shape {sid!r} mixes a drift constraint with other "
                    "constraints; drift verdicts are per-partition and "
                    "cannot be combined row-wise — declare the drift check "
                    "as its own shape"
                )
        self.node_order()

    def push_target_filter(self, shape_id: str, row_filter) -> "ConstraintDAG":
        """AND a job-level row filter onto one shape's target predicate —
        the reference's target-query replacement/intersection
        (/root/reference/shaclapi/reduction/Reduction.py:25-64,
        /root/reference/shaclapi/query.py:194-244), i.e. predicate pushdown."""
        if row_filter is None or shape_id not in self.shapes:
            return ConstraintDAG(dict(self.shapes))
        out = dict(self.shapes)
        s = out[shape_id]
        tgt = (
            row_filter
            if s.target is None
            else {"op": "and", "args": [s.target, row_filter]}
        )
        out[shape_id] = replace(s, target=tgt)
        return ConstraintDAG(out)
