"""Mechanical audit of the PARITY.md ledger (VERDICT r13 §Next-round #5).

PARITY.md maps every reference test function (tests/main.rs) to its
covering repo test or an adjudicated N/A. Rounds 9-13 ran this audit
by hand whenever the ledger or the reference changed (PARITY.md §Count
reconciliation describes the snippet); hand-written ledgers WILL
contain fabricated names otherwise — two separate hand audits each
caught some. This test IS that audit, in the suite, so the ledger can
never silently drift from the reference inventory again.

Name forms in the ledger (both mechanical):
- full tokens: ``test_json_get_union``
- suffix shorthand: ``test_json_get_array_elem, _basic_numbers, ...``
  — a ``_suffix`` token accounts for any reference test name ENDING
  with that suffix (the ledger's enumeration style for matrix rows).

Skipped when /root/reference is absent: the package must stay
installable and testable standalone (the reference tree exists only in
the build environment).
"""

from __future__ import annotations

import glob
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN_RS = "/root/reference/tests/main.rs"
PARITY = os.path.join(REPO, "PARITY.md")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(MAIN_RS),
    reason="reference tree not present (standalone install)",
)


def _reference_names():
    with open(MAIN_RS) as f:
        return set(re.findall(r"\bfn (test_[a-z0-9_]+)", f.read()))


def _ledger():
    with open(PARITY) as f:
        text = f.read()
    full = set(re.findall(r"\btest_[a-z0-9_]+\b", text))
    # suffix shorthand appears as ", _basic_numbers" / "( _object" —
    # an underscore-led token after list punctuation, never mid-word
    short = set(re.findall(r"(?<=[,(] )(_[a-z0-9_]+)\b", text))
    # citations EXPLICITLY in module form ("tests/test_column.py"):
    # only these may be satisfied by a module basename — a bare token
    # must name a real test FUNCTION, otherwise deleting the specific
    # covering function would leave a stale-but-passing ledger entry
    # (ADVICE r14: module acceptance for bare tokens loosened exactly
    # the staleness this audit exists to catch)
    module_form = set(re.findall(r"tests/(test_[a-z0-9_]+)\.py", text))
    return full, short, module_form


def _repo_test_names():
    functions, modules = set(), set()
    for p in glob.glob(os.path.join(REPO, "tests", "test_*.py")):
        modules.add(os.path.splitext(os.path.basename(p))[0])
        with open(p) as f:
            functions |= set(
                re.findall(r"\bdef (test_[a-z0-9_]+)", f.read())
            )
    return functions, modules


def test_every_reference_test_is_accounted():
    """Direction 1: no reference test name is unmapped by the ledger."""
    ref = _reference_names()
    full, short, _ = _ledger()
    unaccounted = sorted(
        r
        for r in ref
        if r not in full and not any(r.endswith(s) for s in short)
    )
    assert not unaccounted, (
        f"PARITY.md does not account for {len(unaccounted)} reference "
        f"tests: {unaccounted}"
    )


def test_no_fabricated_reference_names():
    """Direction 2: every test_* token in the ledger is either a real
    reference test name, a real repo test FUNCTION, or an explicitly
    module-form citation of a real test module — a token matching
    none is fabricated (or stale: the covering function was deleted
    while a same-prefix module kept the bare token alive)."""
    ref = _reference_names()
    full, short, module_form = _ledger()
    functions, modules = _repo_test_names()
    fabricated = sorted(full - ref - functions - (module_form & modules))
    assert not fabricated, f"PARITY.md names that exist nowhere: {fabricated}"
    dead_suffixes = sorted(
        s for s in short if not any(r.endswith(s) for r in ref)
    )
    assert not dead_suffixes, (
        f"PARITY.md shorthand suffixes matching no reference test: "
        f"{dead_suffixes}"
    )


def test_ledger_count_matches_reference():
    """The ledger's headline count ("164 functions") tracks the actual
    reference inventory — a reference update must bump the ledger."""
    ref = _reference_names()
    with open(PARITY) as f:
        text = f.read()
    m = re.search(r"\((\d+) functions\)", text)
    assert m, "PARITY.md no longer states its function count"
    assert int(m.group(1)) == len(ref), (
        f"PARITY.md claims {m.group(1)} reference tests; main.rs has "
        f"{len(ref)} — re-run the ledger audit"
    )
