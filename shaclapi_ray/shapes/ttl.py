"""Turtle/SHACL shape parser for the reference's TTL subset — no rdflib.

Covers exactly the constructs the reference test corpus uses
(/root/reference/tests/tc*/shapes/*.ttl):

- ``@prefix`` declarations
- ``<iri>`` and ``prefix:local`` names
- ``:ShapeX a sh:NodeShape ; <pred> <obj> ; ... .`` statements
- ``sh:targetClass``, ``sh:targetQuery "..."``
- ``sh:property [ sh:path P ; sh:minCount n ; sh:maxCount n ;
  sh:qualifiedValueShape [ sh:node :ShapeB ] ;
  sh:qualifiedMinCount n ; sh:qualifiedMaxCount n ]``
- ``sh:path [ sh:inversePath P ]`` (rendered ``^<iri>`` like the
  reference backend)
- ``sh:or ( [block] [block] ... )`` of property blocks

Mapping onto the engine IR (shaclapi_ray.shapes.ir):

- each property block -> RefConstraint(path=..., min=..., max=...,
  shape=<sh:node iri or None>, inverse=<from inversePath>) — the same
  min/max/shapeRef fields the reference's MinOnly/MaxOnlyConstraint carry
  (asserted at /root/reference/tests/test_main.py:305-403)
- ``sh:or`` -> OrConstraint whose options are those RefConstraints (the
  reduction rules in ConstraintDAG.project collapse them exactly like
  ReducedShapeParser.parse_constraint:100-106)
- ``sh:targetClass`` -> Shape.target_class + a row predicate on an
  ``rdf_type`` column (evaluable if a table carries one)
- ``sh:targetQuery`` -> Shape.target_query (verbatim string)

TTL shapes are parse/reduce/project-level artifacts: executing them over
the web-pages table requires mapping each RDF path onto a table column
(RefConstraint.path). Constraint removal by query predicates =
``ConstraintDAG.project(paths)`` since ``RefConstraint.columns()``
returns ``{path}`` for path-bearing constraints.
"""

from __future__ import annotations

import re

from shaclapi_ray.shapes.ir import Constraint, OrConstraint, RefConstraint, Shape

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<iri><[^>]*>)
  | (?P<punct>[\[\]();,]|\.(?=\s|$))
  | (?P<name>[^\s\[\]();,"]+)
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[str]:
    out = []
    for m in _TOKEN_RE.finditer(text):
        if m.lastgroup == "comment":
            continue
        out.append(m.group())
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}

    # -- token helpers -------------------------------------------------------
    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t != tok:
            raise ValueError(f"expected {tok!r}, got {t!r} at token {self.i}")

    # -- names ---------------------------------------------------------------
    def expand(self, tok: str) -> str:
        """prefixed name / <iri> -> '<full-iri>' (the reference's wire
        form, e.g. '<http://example.org/testGraph6#property3>')."""
        if tok.startswith("<"):
            return tok
        if ":" in tok:
            pfx, local = tok.split(":", 1)
            if pfx in self.prefixes:
                return f"<{self.prefixes[pfx]}{local}>"
        return tok

    # -- objects -------------------------------------------------------------
    def parse_object(self):
        t = self.peek()
        if t == "[":
            return self.parse_bnode()
        if t == "(":
            return self.parse_list()
        tok = self.next()
        if tok.startswith('"'):
            return tok[1:-1].replace('\\"', '"')
        return self.expand(tok)

    def parse_bnode(self) -> dict:
        """[ pred obj ; pred obj ] -> {expanded pred: [objects]}"""
        self.expect("[")
        out: dict[str, list] = {}
        while self.peek() not in ("]", None):
            pred = self.expand(self.next())
            objs = [self.parse_object()]
            while self.peek() == ",":
                self.next()
                objs.append(self.parse_object())
            out.setdefault(pred, []).extend(objs)
            if self.peek() == ";":
                self.next()
        self.expect("]")
        return out

    def parse_list(self) -> list:
        self.expect("(")
        out = []
        while self.peek() not in (")", None):
            out.append(self.parse_object())
        self.expect(")")
        return out

    # -- statements ----------------------------------------------------------
    def parse(self) -> list[tuple[str, dict[str, list]]]:
        """[(subject, {pred: [objects]})] for every top-level statement."""
        subjects = []
        while self.peek() is not None:
            if self.peek() == "@prefix":
                self.next()
                name = self.next()  # 'pfx:' (possibly just ':')
                iri = self.next()
                self.expect(".")
                self.prefixes[name.rstrip(":")] = iri.strip("<>")
                continue
            subj = self.expand(self.next())
            body: dict[str, list] = {}
            while self.peek() not in (".", None):
                pred_tok = self.next()
                pred = "a" if pred_tok == "a" else self.expand(pred_tok)
                objs = [self.parse_object()]
                while self.peek() == ",":
                    self.next()
                    objs.append(self.parse_object())
                body.setdefault(pred, []).extend(objs)
                if self.peek() == ";":
                    self.next()
            if self.peek() == ".":
                self.next()
            subjects.append((subj, body))
        return subjects


SH = "<http://www.w3.org/ns/shacl#"


def _sh(local: str) -> str:
    return f"{SH}{local}>"


def _path_of(p: _Parser, obj) -> tuple[str, bool]:
    """sh:path object -> (rendered path, inverse?). Inverse paths render
    '^<iri>' exactly like the reference backend's constraint.path."""
    if isinstance(obj, dict):
        inv = obj.get(_sh("inversePath"))
        if inv:
            return "^" + p.expand(inv[0]), True
        raise ValueError(f"unsupported path object: {obj!r}")
    return p.expand(obj), False


def _int(objs) -> int | None:
    if not objs:
        return None
    v = objs[0]
    if isinstance(v, str) and v.strip('"').lstrip("-").isdigit():
        return int(v.strip('"'))
    return int(v)


def _property_constraint(p: _Parser, block: dict, name: str) -> RefConstraint:
    """One sh:property (or sh:or option) block -> RefConstraint with the
    reference's path/min/max/shapeRef fields."""
    path, inverse = _path_of(p, block[_sh("path")][0])
    min_ = _int(block.get(_sh("minCount")))
    max_ = _int(block.get(_sh("maxCount")))
    shape_ref = None
    qvs = block.get(_sh("qualifiedValueShape"))
    if qvs:
        node = qvs[0].get(_sh("node")) if isinstance(qvs[0], dict) else None
        if node:
            shape_ref = p.expand(node[0])
        qmin = _int(block.get(_sh("qualifiedMinCount")))
        qmax = _int(block.get(_sh("qualifiedMaxCount")))
        min_ = qmin if qmin is not None else min_
        max_ = qmax if qmax is not None else max_
    return RefConstraint(
        name=name, min=min_, max=max_, shape=shape_ref, inverse=inverse, path=path
    )


def shapes_from_ttl_text(text: str) -> list[Shape]:
    p = _Parser(_tokenize(text))
    statements = p.parse()
    shapes: list[Shape] = []
    for subj, body in statements:
        if _sh("NodeShape") not in body.get("a", []):
            continue
        shape_id = subj
        target_class = None
        target_query = None
        target = None
        constraints: list[Constraint] = []
        tc = body.get(_sh("targetClass"))
        if tc:
            target_class = p.expand(tc[0])
            target = {"op": "==", "column": "rdf_type", "value": target_class}
        tq = body.get(_sh("targetQuery"))
        if tq:
            target_query = tq[0]
        ci = 0
        for block in body.get(_sh("property"), []):
            constraints.append(_property_constraint(p, block, f"{shape_id}_c{ci}"))
            ci += 1
        for or_list in body.get(_sh("or"), []):
            options = [
                _property_constraint(p, blk, f"{shape_id}_or{ci}_{oi}")
                for oi, blk in enumerate(or_list)
            ]
            constraints.append(OrConstraint(name=f"{shape_id}_or{ci}", options=options))
            ci += 1
        shapes.append(
            Shape(
                shape_id=shape_id,
                target=target,
                constraints=constraints,
                target_class=target_class,
                target_query=target_query,
            )
        )
    return shapes


def shape_from_ttl_file(path: str) -> Shape:
    """Parse a single-shape TTL file (the reference's layout: one
    NodeShape per file)."""
    with open(path) as f:
        shapes = shapes_from_ttl_text(f.read())
    if len(shapes) != 1:
        raise ValueError(f"{path}: expected exactly one NodeShape, got {len(shapes)}")
    return shapes[0]
