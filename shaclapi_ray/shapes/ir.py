"""Shape IR: declarative row predicates + constraints, compiled to vectorized
pyarrow.compute evaluation.

Replaces the reference's SPARQL-query/shape-file machinery
(/root/reference/shaclapi/query.py:14-114, JSON shape format at
/root/reference/examples/lubm/shapes/FullProfessor.json) with a declarative
IR over the pages table. A shape has:

- ``shape_id``
- ``target``: a row predicate selecting the entities the shape applies to
  (≙ the shape's targetDef / target query; the engine ANDs a job-level row
  filter onto it — the reference's target-query intersection,
  /root/reference/shaclapi/query.py:194-244);
- ``constraints``: conjunction of Constraint objects (the reference's
  ``constraintDef.conjunctions`` outer list is a disjunction of
  conjunctions; we model a single conjunction whose members may be
  OrConstraints, which covers the reference's test corpus incl. tc6).

Predicates are JSON-able dicts, e.g.::

    {"op": "regex", "column": "url", "pattern": "^https?://"}
    {"op": "and", "args": [...]}, {"op": "in", "column": "lang", "values": [...]}

and evaluate to a null-free boolean mask over a pyarrow batch — null input
compares as False (matching SPARQL/SHACL semantics where an unbound value
fails a value constraint but satisfies a max-only cardinality).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

Pred = dict[str, Any]

# col_cmp comparators (shared by eval_pred; SQL/scan renderings mirror them)
_COL_CMP_FNS = {
    "lt": pc.less,
    "le": pc.less_equal,
    "gt": pc.greater,
    "ge": pc.greater_equal,
    "eq": pc.equal,
    "ne": pc.not_equal,
}
_COL_CMP_SQL = {"lt": "<", "le": "<=", "gt": ">", "ge": ">=", "eq": "=", "ne": "<>"}

# ---------------------------------------------------------------------------
# predicate evaluation
# ---------------------------------------------------------------------------


def _coerce_scalar(value: Any, typ: pa.DataType) -> pa.Scalar:
    if pa.types.is_timestamp(typ) and isinstance(value, str):
        value = datetime.fromisoformat(value.replace("Z", "+00:00")).replace(tzinfo=None)
    return pa.scalar(value, type=typ)


def eval_pred(pred: Pred | None, batch: pa.Table) -> pa.ChunkedArray | pa.Array:
    """Evaluate a predicate to a null-free boolean mask over ``batch``."""
    n = batch.num_rows
    if pred is None or pred.get("op") == "true":
        return pa.array([True] * n, type=pa.bool_())
    op = pred["op"]
    if op == "and":
        out = eval_pred(pred["args"][0], batch)
        for sub in pred["args"][1:]:
            out = pc.and_(out, eval_pred(sub, batch))
        return out
    if op == "or":
        out = eval_pred(pred["args"][0], batch)
        for sub in pred["args"][1:]:
            out = pc.or_(out, eval_pred(sub, batch))
        return out
    if op == "not":
        return pc.invert(eval_pred(pred["arg"], batch))

    col = batch[pred["column"]]
    if op == "not_null":
        return pc.is_valid(col)
    if op == "is_null":
        return pc.is_null(col)
    if op == "regex":
        m = pc.match_substring_regex(col, pred["pattern"])
    elif op == "col_cmp":
        # SHACL property-pair constraint components (sh:lessThan /
        # sh:lessThanOrEquals / sh:equals / sh:disjoint, T.81-agnostic
        # gt/ge for symmetry): compare TWO columns of the row; with
        # len=True compare their utf8/binary lengths instead of values.
        # Nulls on either side fail (fill_null(False) below), matching
        # SHACL's unbound-value semantics and SQL's NULL comparison.
        other = batch[pred["other"]]
        if pred.get("len"):

            def _ln(c):
                return (
                    pc.utf8_length(c)
                    if pa.types.is_string(c.type)
                    else pc.binary_length(c)
                )

            col, other = _ln(col), _ln(other)
        m = _COL_CMP_FNS[pred["cmp"]](col, other)
    elif op == "in":
        m = pc.is_in(col, value_set=pa.array(pred["values"], type=col.type))
    elif op in ("==", "eq"):
        m = pc.equal(col, _coerce_scalar(pred["value"], col.type))
    elif op in ("!=", "ne"):
        m = pc.not_equal(col, _coerce_scalar(pred["value"], col.type))
    elif op == "range":
        # min/max are inclusive (sh:minInclusive/sh:maxInclusive);
        # min_exclusive/max_exclusive are the SHACL exclusive variants
        m = None
        if pred.get("min") is not None:
            m = pc.greater_equal(col, _coerce_scalar(pred["min"], col.type))
        if pred.get("min_exclusive") is not None:
            lo = pc.greater(col, _coerce_scalar(pred["min_exclusive"], col.type))
            m = lo if m is None else pc.and_(m, lo)
        if pred.get("max") is not None:
            hi = pc.less_equal(col, _coerce_scalar(pred["max"], col.type))
            m = hi if m is None else pc.and_(m, hi)
        if pred.get("max_exclusive") is not None:
            hi = pc.less(col, _coerce_scalar(pred["max_exclusive"], col.type))
            m = hi if m is None else pc.and_(m, hi)
        if m is None:
            m = pa.array([True] * n, type=pa.bool_())
    elif op == "len_range":
        ln = pc.utf8_length(col) if pa.types.is_string(col.type) else pc.binary_length(col)
        m = None
        if pred.get("min") is not None:
            m = pc.greater_equal(ln, pa.scalar(pred["min"]))
        if pred.get("max") is not None:
            hi = pc.less_equal(ln, pa.scalar(pred["max"]))
            m = hi if m is None else pc.and_(m, hi)
        if m is None:
            m = pa.array([True] * n, type=pa.bool_())
    else:
        raise ValueError(f"unknown predicate op: {op!r}")
    return pc.fill_null(m, False)


def pred_columns(pred: Pred | None) -> set[str]:
    """Columns a predicate reads (for projection pushdown / constraint removal)."""
    if pred is None:
        return set()
    op = pred.get("op")
    if op in ("and", "or"):
        out: set[str] = set()
        for sub in pred["args"]:
            out |= pred_columns(sub)
        return out
    if op == "not":
        return pred_columns(pred["arg"])
    if op == "true":
        return set()
    if op == "col_cmp":
        return {pred["column"], pred["other"]}
    return {pred["column"]}


def pred_to_scan_expr(pred: Pred | None, schema: pa.Schema | None = None):
    """WEAKENED pyarrow.dataset filter expression for scan-level row-group
    pruning, or None when the predicate admits no sound restriction.

    Soundness contract: the returned expression selects a SUPERSET of the
    rows ``eval_pred`` would keep, so pushing it into
    ``read_parquet(filter=...)`` can only skip rows every consumer would
    drop anyway — the full predicate still runs post-read. Weakening
    rules: AND may drop untranslatable conjuncts; OR requires every
    branch translatable (an unbounded branch makes the whole OR
    unbounded); NOT is never pushed (negating a weakened inner would
    STRENGTHEN and could drop matching rows); regex / len_range are not
    stats-prunable. Null handling matches eval_pred (nulls fail value
    predicates; Arrow's filter drops null-valued comparisons the same
    way). ``schema`` coerces ISO timestamp strings like _coerce_scalar.

    This is the read-side half of the reference's target-query pushdown
    (/root/reference/shaclapi/query.py:194-244): the driver-side
    intersection narrows WHICH rows are targets, this narrows which row
    groups ever leave storage — the lever that matters at 10^12 rows
    when targets are a warc_ts window or a lang slice."""
    import pyarrow.compute as _pc
    import pyarrow.dataset  # noqa: F401  (registers Expression methods)

    if pred is None or pred.get("op") == "true":
        return None
    op = pred["op"]
    if op == "and":
        parts = [
            e
            for e in (pred_to_scan_expr(a, schema) for a in pred["args"])
            if e is not None
        ]
        if not parts:
            return None
        out = parts[0]
        for e in parts[1:]:
            out = out & e
        return out
    if op == "or":
        parts = [pred_to_scan_expr(a, schema) for a in pred["args"]]
        if any(e is None for e in parts) or not parts:
            return None
        out = parts[0]
        for e in parts[1:]:
            out = out | e
        return out
    if op in ("not", "regex", "len_range"):
        return None

    col = pred["column"]
    f = _pc.field(col)

    def coerce(v: Any):
        # python-value coercion (expressions take plain values; the only
        # lossy case is ISO timestamp strings, mirrored from _coerce_scalar)
        if schema is not None and col in schema.names:
            t = schema.field(col).type
            if pa.types.is_timestamp(t) and isinstance(v, str):
                return datetime.fromisoformat(v.replace("Z", "+00:00")).replace(
                    tzinfo=None
                )
        return v

    if op == "col_cmp":
        if pred.get("len"):
            return None  # length() isn't a dataset-expression function
        g = _pc.field(pred["other"])
        return {
            "lt": f < g,
            "le": f <= g,
            "gt": f > g,
            "ge": f >= g,
            "eq": f == g,
            "ne": f != g,
        }[pred["cmp"]]
    if op == "not_null":
        return f.is_valid()
    if op == "is_null":
        return f.is_null()
    if op == "in":
        return f.isin([coerce(v) for v in pred["values"]])
    if op in ("==", "eq"):
        return f == coerce(pred["value"])
    if op in ("!=", "ne"):
        return f != coerce(pred["value"])
    if op == "range":
        out = None
        if pred.get("min") is not None:
            out = f >= coerce(pred["min"])
        if pred.get("min_exclusive") is not None:
            lo = f > coerce(pred["min_exclusive"])
            out = lo if out is None else out & lo
        if pred.get("max") is not None:
            hi = f <= coerce(pred["max"])
            out = hi if out is None else out & hi
        if pred.get("max_exclusive") is not None:
            hi = f < coerce(pred["max_exclusive"])
            out = hi if out is None else out & hi
        return out
    return None


def pred_to_sql(
    pred: Pred | None, col_map: dict[str, str] | None = None
) -> str:
    """Render a predicate as an ANSI/DuckDB SQL boolean expression.

    Used by the oracle machinery so the Ray predicate and the SQL oracle
    derive from ONE definition and cannot drift. ``col_map`` rewrites
    column references (e.g. html -> decode(html) for regex over binary).
    """
    if pred is None or pred.get("op") == "true":
        return "TRUE"
    op = pred["op"]
    if op == "and":
        return "(" + " AND ".join(pred_to_sql(a, col_map) for a in pred["args"]) + ")"
    if op == "or":
        return "(" + " OR ".join(pred_to_sql(a, col_map) for a in pred["args"]) + ")"
    if op == "not":
        return f"(NOT {pred_to_sql(pred['arg'], col_map)})"
    c = pred["column"]
    c = (col_map or {}).get(c, c)
    if op == "not_null":
        return f"({c} IS NOT NULL)"
    if op == "is_null":
        return f"({c} IS NULL)"

    def lit(v: Any) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    if op == "col_cmp":
        d = pred["other"]
        d = (col_map or {}).get(d, d)
        a, b = (f"length({c})", f"length({d})") if pred.get("len") else (c, d)
        return f"COALESCE({a} {_COL_CMP_SQL[pred['cmp']]} {b}, FALSE)"
    if op == "regex":
        return f"COALESCE(regexp_matches({c}, {lit(pred['pattern'])}), FALSE)"
    if op == "in":
        vals = ", ".join(lit(v) for v in pred["values"])
        return f"COALESCE({c} IN ({vals}), FALSE)"
    if op in ("==", "eq"):
        return f"COALESCE({c} = {lit(pred['value'])}, FALSE)"
    if op in ("!=", "ne"):
        return f"COALESCE({c} <> {lit(pred['value'])}, FALSE)"
    if op == "range":
        parts = []
        bound = (
            pred.get("min")
            or pred.get("max")
            or pred.get("min_exclusive")
            or pred.get("max_exclusive")
        )
        is_ts = isinstance(bound, str) and "T" in str(bound)

        def rlit(v: Any) -> str:
            if is_ts:
                return f"TIMESTAMP '{str(v).replace('T', ' ').replace('Z', '')}'"
            return lit(v)

        if pred.get("min") is not None:
            parts.append(f"{c} >= {rlit(pred['min'])}")
        if pred.get("min_exclusive") is not None:
            parts.append(f"{c} > {rlit(pred['min_exclusive'])}")
        if pred.get("max") is not None:
            parts.append(f"{c} <= {rlit(pred['max'])}")
        if pred.get("max_exclusive") is not None:
            parts.append(f"{c} < {rlit(pred['max_exclusive'])}")
        return "COALESCE(" + " AND ".join(parts) + ", FALSE)" if parts else "TRUE"
    if op == "len_range":
        parts = []
        if pred.get("min") is not None:
            parts.append(f"length({c}) >= {pred['min']}")
        if pred.get("max") is not None:
            parts.append(f"length({c}) <= {pred['max']}")
        return "COALESCE(" + " AND ".join(parts) + ", FALSE)" if parts else "TRUE"
    raise ValueError(f"unknown predicate op: {op!r}")


# ---------------------------------------------------------------------------
# constraints
# ---------------------------------------------------------------------------


@dataclass
class Constraint:
    """Base class. ``name`` goes into violation rows' ``constraint`` column."""

    name: str

    def columns(self) -> set[str]:
        raise NotImplementedError

    def referenced_shapes(self) -> list[str]:
        return []


@dataclass
class PredicateConstraint(Constraint):
    """Row-level column predicate (≙ the reference backend's value/Datatype
    constraints; asserted shapes at /root/reference/tests/test_main.py:305-328).

    ``offending_column`` names the column whose value is reported in the
    violation row's ``offending_value``.
    """

    pred: Pred = field(default_factory=dict)
    offending_column: str | None = None

    def columns(self) -> set[str]:
        return pred_columns(self.pred)

    def evaluate(self, batch: pa.Table):
        return eval_pred(self.pred, batch)


@dataclass
class OrConstraint(Constraint):
    """Disjunction of predicate options (≙ ``sh:or`` / constraintDef
    ``options``; reduction semantics at
    /root/reference/shaclapi/reduction/travshacl/ReducedShapeParser.py:100-106:
    removing options collapses — all removed => constraint vanishes, one left
    => promoted to a plain constraint)."""

    options: list[Constraint] = field(default_factory=list)

    def columns(self) -> set[str]:
        out: set[str] = set()
        for o in self.options:
            out |= o.columns()
        return out

    def referenced_shapes(self) -> list[str]:
        out: list[str] = []
        for o in self.options:
            out.extend(o.referenced_shapes())
        return out

    def evaluate(self, batch: pa.Table):
        out = self.options[0].evaluate(batch)
        for o in self.options[1:]:
            out = pc.or_(out, o.evaluate(batch))
        return out


@dataclass
class RefConstraint(Constraint):
    """Qualified link-cardinality constraint (≙ min/max + ``shape`` ref in the
    reference's constraintDef; inter-shape dependency edges at
    /root/reference/shaclapi/reduction/travshacl/ReducedShapeParser.py:124-138).

    Counts links extracted from ``html`` whose target url (a) exists in the
    table and (b) satisfies the referenced child shape; valid iff
    ``min <= count <= max`` (either bound optional; max-only with zero links
    is valid — the tc5 semantics,
    /root/reference/tests/tc5/shapes/shapeA.ttl).

    ``shape=None`` means plain link cardinality (no child-shape filter, and
    existence in the table is not required).

    ``inverse=True`` counts INBOUND link edges instead: how many links
    from child-valid pages point AT this row's url (≙ ``sh:inversePath``,
    /root/reference/tests/tc4/shapes/shapeA.ttl:8,
    /root/reference/tests/tc6/shapes/shapeA.ttl:17). Evaluated via a
    groupby(target_url) over the links table — see
    engine.run_pass_b / stages/referential.inverse_qualified_counts.

    ``path`` carries the RDF property path for TTL-parsed shapes (e.g.
    '<http://example.org/testGraph6#property3>', '^<...>' when inverse);
    such shapes participate in parse/reduce/project but are not executable
    over the web-pages table unless the path is mapped onto it.
    """

    min: int | None = None
    max: int | None = None
    shape: str | None = None
    inverse: bool = False
    path: str | None = None

    def columns(self) -> set[str]:
        return {self.path} if self.path is not None else {"html"}

    def referenced_shapes(self) -> list[str]:
        return [self.shape] if self.shape else []


@dataclass
class UniqueConstraint(Constraint):
    """Global uniqueness of a column (url). Exact check via partial-count +
    groupby-sum; HLL sketch reported in metrics (north_star)."""

    column: str = "url"

    def columns(self) -> set[str]:
        return {self.column}


@dataclass
class DriftConstraint(Constraint):
    """Distribution-drift check: t-digest of ``length(column)`` (or the raw
    numeric value) per partition key, KS statistic vs the global merged
    digest. Verdict rows are keyed ``partition:<key>`` — the per-partition
    pass/fail of the north rule."""

    column: str = "text"
    partition_regex: str = r"https?://([^/]+)/"  # partition key = host(url)
    threshold: float = 0.25
    use_length: bool = True

    def columns(self) -> set[str]:
        return {self.column, "url"}


# ---------------------------------------------------------------------------
# shape + schema files
# ---------------------------------------------------------------------------


@dataclass
class Shape:
    shape_id: str
    target: Pred | None = None  # None => targets every row
    constraints: list[Constraint] = field(default_factory=list)
    # TTL/SHACL provenance (parse/reduce-level; not used in execution):
    target_class: str | None = None  # ≙ sh:targetClass (expanded IRI)
    target_query: str | None = None  # ≙ sh:targetQuery (raw SPARQL string)

    def referenced_shapes(self) -> list[str]:
        out: list[str] = []
        for c in self.constraints:
            out.extend(c.referenced_shapes())
        return out

    def columns(self) -> set[str]:
        out = pred_columns(self.target)
        for c in self.constraints:
            out |= c.columns()
        return out

    def is_column_only(self) -> bool:
        return all(
            isinstance(c, (PredicateConstraint, OrConstraint)) for c in self.constraints
        )


def _constraint_from_dict(d: dict[str, Any], idx: int, shape_id: str) -> Constraint:
    kind = d.get("constraint", "pred" if "pred" in d else None)
    name = d.get("name", f"{shape_id}_c{idx}")
    if "options" in d:
        opts = [
            PredicateConstraint(name=f"{name}_opt{i}", pred=o["pred"],
                                offending_column=o.get("offending_column"))
            for i, o in enumerate(d["options"])
        ]
        return OrConstraint(name=name, options=opts)
    if kind in (None, "pred") and "pred" in d:
        return PredicateConstraint(
            name=name, pred=d["pred"], offending_column=d.get("offending_column")
        )
    if kind == "ref" or "shape" in d or "min" in d or "max" in d:
        return RefConstraint(
            name=name,
            min=d.get("min"),
            max=d.get("max"),
            shape=d.get("shape"),
            inverse=bool(d.get("inverse", False)),
            path=d.get("path"),
        )
    if kind == "unique":
        return UniqueConstraint(name=name, column=d.get("column", "url"))
    if kind == "drift":
        return DriftConstraint(
            name=name,
            column=d.get("column", "text"),
            threshold=d.get("threshold", 0.25),
            use_length=d.get("use_length", True),
        )
    raise ValueError(f"cannot parse constraint dict: {d!r}")


def shape_from_dict(d: dict[str, Any]) -> Shape:
    """Parse the JSON shape format (mirrors the reference's
    name/targetDef/constraintDef layout,
    /root/reference/examples/lubm/shapes/FullProfessor.json:1-24).

    The outer ``conjunctions`` list is a DISJUNCTION of conjunctions (DNF,
    as in the reference's backend shape format). One conjunction maps
    directly to the Shape's constraint list; multiple conjunctions of
    predicate-only constraints collapse into a single OrConstraint whose
    options are the AND-ed conjunctions (ref/unique/drift constraints
    cannot appear under a disjunction)."""
    shape_id = d["name"]
    target = (d.get("targetDef") or {}).get("filter")
    conjs = (d.get("constraintDef") or {}).get("conjunctions") or [[]]
    if len(conjs) == 1:
        constraints = [
            _constraint_from_dict(c, i, shape_id) for i, c in enumerate(conjs[0])
        ]
        return Shape(shape_id=shape_id, target=target, constraints=constraints)

    options: list[PredicateConstraint] = []
    for gi, group in enumerate(conjs):
        parsed = [
            _constraint_from_dict(c, i, f"{shape_id}_g{gi}")
            for i, c in enumerate(group)
        ]
        if not all(isinstance(p, PredicateConstraint) for p in parsed):
            raise ValueError(
                "disjunctions of conjunctions support predicate constraints "
                "only (ref/unique/drift must live in a single conjunction)"
            )
        preds = [p.pred for p in parsed]
        combined = preds[0] if len(preds) == 1 else {"op": "and", "args": preds}
        options.append(
            PredicateConstraint(name=f"{shape_id}_conj{gi}", pred=combined)
        )
    return Shape(
        shape_id=shape_id,
        target=target,
        constraints=[OrConstraint(name=f"{shape_id}_dnf", options=options)],
    )


def constraint_to_dict(c: Constraint) -> dict[str, Any]:
    if isinstance(c, OrConstraint):
        return {
            "name": c.name,
            "options": [
                {"pred": o.pred, "offending_column": o.offending_column}
                for o in c.options
            ],
        }
    if isinstance(c, PredicateConstraint):
        return {"name": c.name, "pred": c.pred, "offending_column": c.offending_column}
    if isinstance(c, RefConstraint):
        d: dict[str, Any] = {"name": c.name, "constraint": "ref"}
        if c.min is not None:
            d["min"] = c.min
        if c.max is not None:
            d["max"] = c.max
        if c.shape:
            d["shape"] = c.shape
        if c.inverse:
            d["inverse"] = True
        if c.path is not None:
            d["path"] = c.path
        return d
    if isinstance(c, UniqueConstraint):
        return {"name": c.name, "constraint": "unique", "column": c.column}
    if isinstance(c, DriftConstraint):
        return {
            "name": c.name,
            "constraint": "drift",
            "column": c.column,
            "threshold": c.threshold,
            "use_length": c.use_length,
        }
    raise ValueError(f"cannot serialize {c!r}")


def shape_to_dict(shape: Shape) -> dict[str, Any]:
    """Inverse of shape_from_dict (reference JSON layout)."""
    return {
        "name": shape.shape_id,
        "targetDef": {"filter": shape.target},
        "constraintDef": {
            "conjunctions": [[constraint_to_dict(c) for c in shape.constraints]]
        },
    }


def load_schema_dir(schema_dir: str) -> list[Shape]:
    """Read every ``*.json`` shape file in a directory (≙ the backend's
    ``parse_shapes_from_dir`` driven at
    /root/reference/shaclapi/reduction/travshacl/ReducedShapeParser.py:28-36).
    ``*.ttl`` files raise (see shape_from_ttl)."""
    import json
    import os

    shapes = []
    for f in sorted(os.listdir(schema_dir)):
        path = os.path.join(schema_dir, f)
        if f.endswith(".json"):
            with open(path) as fh:
                shapes.append(shape_from_dict(json.load(fh)))
        elif f.endswith(".ttl"):
            shapes.append(shape_from_ttl(path))
    return shapes


def shape_from_ttl(path: str) -> Shape:
    """TTL/SHACL shape files (the reference's primary fixture format,
    e.g. /root/reference/tests/tc6/shapes/shapeA.ttl), parsed by the
    built-in Turtle-subset reader (shapes/ttl.py — no rdflib needed for
    the reference's regular SHACL subset: targetClass/targetQuery/
    property/min-maxCount/qualifiedValueShape/sh:or/sh:inversePath).

    The result participates in reduce/project/node_order; executing it
    over the web-pages table additionally requires mapping each RDF path
    onto a table column (RefConstraint.path)."""
    from shaclapi_ray.shapes.ttl import shape_from_ttl_file

    return shape_from_ttl_file(path)
