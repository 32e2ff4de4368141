"""Doc-lint for CLAUDE.md's invariants ledger (VERDICT r4 #8).

The ledger names fixture-profile constants whose VALUES are load-bearing
(they keep the driver's correctness checks non-degenerate at sf0.001 and
sf0.01). The main regression risk is silent drift: a constant gets
renamed/removed in `__ray_entry__.py` while the ledger still prescribes
it, or loses its guard in the test suite. This lint pins three facts for
every underscore-ALL-CAPS token the ledger mentions:

  1. it still exists as a module-level assignment in `__ray_entry__.py`
     (or, for library-level names like TOKEN_RE, in the package source);
  2. at least one test file references it by name (the "guards in the
     test suite" half of the invariant);
  3. referenced artifacts (ZLIB_VERSION.txt) still exist on disk.

Purely textual — no Ray session, no imports of the entry module — so it
stays fast and can never be masked by an execution-path failure.
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CLAUDE = (REPO / "CLAUDE.md").read_text()
ENTRY = (REPO / "__ray_entry__.py").read_text()

# env vars / SQL functions the ledger mentions that are NOT repo constants
_NOT_CONSTANTS = {
    "GRAFT_PARITY_SF",  # pytest env knob (documented in Commands)
    "SCALING_ROWS",  # bench.py env knob
    "SCALING_ROUNDS",
    "SCALING_PIPELINE",
    "ROW_NUMBER",  # SQL window function
    "ZLIB_VERSION",  # fixtures/goldens/ZLIB_VERSION.txt (checked below)
}
# constants defined in the library rather than __ray_entry__.py
_LIBRARY_CONSTANTS = {"TOKEN_RE": "shaclapi_ray/pipelines/textstats.py"}

_TOKEN_RE = re.compile(r"\b[A-Z][A-Z0-9]*_[A-Z0-9_]+\b")


def _ledger_tokens() -> set[str]:
    toks = set(_TOKEN_RE.findall(CLAUDE))
    # "DELTA_DROP_OLD/NEW" names two constants; expand the shorthand
    if "DELTA_DROP_OLD" in toks:
        toks.add("DELTA_DROP_NEW")
    return toks - _NOT_CONSTANTS - set(_LIBRARY_CONSTANTS)


def test_ledger_names_resolve_to_entry_constants():
    missing = [
        t
        for t in sorted(_ledger_tokens())
        if not re.search(rf"^{t}\s*=", ENTRY, re.MULTILINE)
    ]
    assert not missing, (
        f"CLAUDE.md invariants name constants absent from __ray_entry__.py: "
        f"{missing} — update the ledger and the fixture profile together."
    )


def test_library_constants_still_exist():
    for name, rel in _LIBRARY_CONSTANTS.items():
        src = (REPO / rel).read_text()
        assert re.search(rf"^{name}\s*=", src, re.MULTILINE), (
            f"{name} no longer defined in {rel} but CLAUDE.md prescribes it"
        )


def test_every_ledger_constant_is_guarded_by_a_test():
    test_srcs = "\n".join(
        p.read_text() for p in (REPO / "tests").glob("test_*.py") if p.name != "test_invariants_lint.py"
    )
    unguarded = [t for t in sorted(_ledger_tokens()) if t not in test_srcs]
    assert not unguarded, (
        f"ledger constants with no reference anywhere in tests/: {unguarded} "
        f"— add a profile guard (see tests/test_profile_guard.py)."
    )


def test_referenced_artifacts_exist():
    assert (REPO / "fixtures/goldens/ZLIB_VERSION.txt").is_file()
    # the verify skill the ledger points at
    assert (REPO / ".claude/skills/verify/SKILL.md").is_file()


def test_ledger_extraction_is_not_degenerate():
    """If CLAUDE.md is rewritten and the regex stops matching anything,
    every other test here passes vacuously — pin the known core set."""
    toks = _ledger_tokens()
    for required in (
        "CLEAN_LINES_KW",
        "GOPHER_KW",
        "BLOOM_KW",
        "HOSTCURE_KW",
        "HOSTBP_KW",
        "URLQ_KW",
        "ROBOTS_RULES",
        "CAP_K",
        "DELTA_DROP_OLD",
        "DELTA_DROP_NEW",
        "DELTA_CHANGE",
    ):
        assert required in toks, f"{required} vanished from CLAUDE.md's ledger"
