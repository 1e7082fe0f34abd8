"""The certified-verdict ledger is a CI gate: every registered query
must have a fresh passing driver verdict OR a slot in the current
certification window that will earn one this round. Turns the
judge's manual CORRECTNESS_r*.json cross-referencing (VERDICT r4
"Next round" #7) into an automated check."""

from __future__ import annotations

import os
import sys

# Resolve tools/ relative to THIS checkout — a hardcoded path would
# import (and audit) a different repo when the tests run elsewhere.
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import ledger  # noqa: E402


def test_ledger_green_under_current_window():
    problems, rows = ledger.audit()
    assert rows, "ledger saw no queries — registry import broken?"
    assert not problems, "\n".join(problems)


def test_ledger_detects_a_hole():
    """Shrinking the window to 1 must surface the stale/never-
    certified queries the full window covers — i.e. the gate actually
    bites and GREEN is not vacuous."""
    problems, _rows = ledger.audit(window=1)
    assert problems, "gate did not fire with a 1-slot window"


def test_every_verdict_name_is_a_registered_query():
    """A CORRECTNESS entry for a name the registry no longer exports
    means a query was renamed/deleted after certification — its
    verdict silently vouches for nothing."""
    known = set(ledger.registry_order())
    seen = set(ledger.load_verdicts())
    orphans = seen - known
    assert not orphans, f"verdicts for unregistered queries: {sorted(orphans)}"
