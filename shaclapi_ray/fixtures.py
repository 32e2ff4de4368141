"""Built-in shape-schema fixtures (FIXTURES.md), the analog of the
reference's test corpus schemas (/root/reference/tests/tc1…tc6/shapes/).

Each family mirrors a reference test case:

- S1 UrlShape        ≙ tc1 (plain column constraints)
- S2 FreshPageShape  ≙ tc1/tc5 (range + max-only semantics)
- S3 LangShape       membership
- S4 LinkedPageShape ≙ tc2/tc4 (inter-shape ref + qualified cardinality)
- S5 TargetPageShape child shape of S4
- S6 OrShape         ≙ tc6 (OR constraints + reduction)
- S7 UniqueUrlShape  global uniqueness (sketch stage)
- S8 DriftShape      per-partition distribution drift (sketch stage)

``reduced`` variants (tc3 analog) drop one constraint and change verdicts.
"""

from __future__ import annotations

from shaclapi_ray.shapes.ir import (
    DriftConstraint,
    OrConstraint,
    PredicateConstraint,
    RefConstraint,
    Shape,
    UniqueConstraint,
)

TS_MIN = "2008-01-01T00:00:00"
TS_MAX = "2026-06-30T00:00:00"
LANG_SET = ["en", "de", "es", "fr", "pt"]


def url_shape() -> Shape:
    return Shape(
        shape_id="UrlShape",
        target=None,
        constraints=[
            PredicateConstraint(
                name="url_not_null", pred={"op": "not_null", "column": "url"}
            ),
            PredicateConstraint(
                name="url_scheme",
                pred={"op": "regex", "column": "url", "pattern": "^https?://"},
            ),
            PredicateConstraint(
                name="text_min_len",
                pred={"op": "len_range", "column": "text", "min": 10},
            ),
        ],
    )


def fresh_page_shape() -> Shape:
    return Shape(
        shape_id="FreshPageShape",
        target={"op": "==", "column": "lang", "value": "en"},
        constraints=[
            PredicateConstraint(
                name="ts_window",
                pred={"op": "range", "column": "warc_ts", "min": TS_MIN, "max": TS_MAX},
            ),
            PredicateConstraint(
                name="text_max_len",
                pred={"op": "len_range", "column": "text", "max": 100_000},
            ),
        ],
    )


def lang_shape() -> Shape:
    return Shape(
        shape_id="LangShape",
        target=None,
        constraints=[
            PredicateConstraint(
                name="lang_member",
                pred={"op": "in", "column": "lang", "values": LANG_SET},
            )
        ],
    )


def consistent_page_shape() -> Shape:
    """SHACL property-PAIR constraint components (sh:lessThanOrEquals /
    sh:disjoint between two properties of the same focus node —
    https://www.w3.org/TR/shacl/#core-components-property-pairs),
    recast as the IR's col_cmp op over two columns of the row: the
    extracted text must be at least as long as its url (len variant)
    and must not literally equal the url (value variant). Null on
    either side fails, per SHACL unbound-value semantics — the planted
    null url/text rows are the fixture violations (non-degenerate at
    sf0.001 AND sf0.01: 40/2000 and 20/2000 fail respectively)."""
    return Shape(
        shape_id="ConsistentPageShape",
        target=None,
        constraints=[
            PredicateConstraint(
                name="text_len_ge_url",
                pred={
                    "op": "col_cmp",
                    "column": "text",
                    "other": "url",
                    "cmp": "ge",
                    "len": True,
                },
                offending_column="text",
            ),
            PredicateConstraint(
                name="url_text_disjoint",
                pred={"op": "col_cmp", "column": "url", "other": "text", "cmp": "ne"},
                offending_column="url",
            ),
        ],
    )


def target_page_shape() -> Shape:
    return Shape(
        shape_id="TargetPageShape",
        target=None,
        constraints=[
            PredicateConstraint(
                name="tp_url_scheme",
                pred={"op": "regex", "column": "url", "pattern": "^https?://"},
            ),
            PredicateConstraint(
                name="tp_ts_window",
                pred={"op": "range", "column": "warc_ts", "min": TS_MIN, "max": TS_MAX},
            ),
        ],
    )


def linked_page_shape() -> Shape:
    return Shape(
        shape_id="LinkedPageShape",
        target={"op": "==", "column": "lang", "value": "en"},
        constraints=[
            RefConstraint(name="has_valid_link", min=1, shape="TargetPageShape")
        ],
    )


def popular_page_shape() -> Shape:
    """Inverse (inbound) referential shape — the tc4/tc6 sh:inversePath
    analog (/root/reference/tests/tc4/shapes/shapeA.ttl:8): a page is
    valid iff at least one link FROM a TargetPageShape-valid page points
    at it."""
    return Shape(
        shape_id="PopularPageShape",
        target=None,
        constraints=[
            RefConstraint(
                name="inbound_from_valid", min=1, shape="TargetPageShape", inverse=True
            )
        ],
    )


def inverse_schema() -> list[Shape]:
    return [target_page_shape(), popular_page_shape()]


def or_shape() -> Shape:
    # (len(text) >= 10) OR (lang == 'en') OR (no links in html)
    return Shape(
        shape_id="OrShape",
        target=None,
        constraints=[
            OrConstraint(
                name="or_quality",
                options=[
                    PredicateConstraint(
                        name="or_text_len",
                        pred={"op": "len_range", "column": "text", "min": 10},
                    ),
                    PredicateConstraint(
                        name="or_lang_en",
                        pred={"op": "==", "column": "lang", "value": "en"},
                    ),
                    PredicateConstraint(
                        name="or_no_links",
                        pred={
                            "op": "not",
                            "arg": {
                                "op": "regex",
                                "column": "html",
                                "pattern": 'href="',
                            },
                        },
                        offending_column="url",
                    ),
                ],
            )
        ],
    )


def unique_url_shape() -> Shape:
    return Shape(
        shape_id="UniqueUrlShape",
        target=None,
        constraints=[UniqueConstraint(name="url_unique", column="url")],
    )


def drift_shape(threshold: float = 0.25) -> Shape:
    return Shape(
        shape_id="DriftShape",
        target=None,
        constraints=[
            DriftConstraint(
                name="text_len_drift",
                column="text",
                threshold=threshold,
                use_length=True,
            )
        ],
    )


def full_schema() -> list[Shape]:
    return [
        url_shape(),
        fresh_page_shape(),
        lang_shape(),
        target_page_shape(),
        linked_page_shape(),
        or_shape(),
        unique_url_shape(),
    ]


def column_schema() -> list[Shape]:
    """Column-only shapes (no shuffle required)."""
    return [
        url_shape(),
        fresh_page_shape(),
        lang_shape(),
        target_page_shape(),
        consistent_page_shape(),
    ]


def referential_schema() -> list[Shape]:
    return [target_page_shape(), linked_page_shape()]
