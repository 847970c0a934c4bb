"""Pins for the stalest-first rotation invariant (r16, VERDICT r15 #1).

The ledger-rotation rule used to be prose in NOTES files and was
mis-applied for three rounds ("previous tail leads" starved a 35-query
block). These tests mechanize it: the committed registry must be in
canonical stalest-first order, and the canonical-order function itself
is pinned on a synthetic history. No Spark session needed.
"""

from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.rotation_check import (  # noqa: E402
    BUDGET,
    canonical_order,
    check,
    load_ledgers,
)

from mongo_polars_reconciliation_spark.harness.queries import QUERIES  # noqa: E402


def test_registry_honors_stalest_first():
    """The committed registry is canonical w.r.t. the ledger history —
    either including the newest CORRECTNESS file (right after a rotation
    commit) or excluding it (mid-cycle: the driver has written the
    round's ledger but the next session hasn't rotated yet). The OR
    keeps the suite green at every point of the round loop while still
    failing any rotation commit that violates stalest-first."""
    registry = list(QUERIES)
    ledgers = load_ledgers()
    ok_now, why_now = check(registry, ledgers)
    ok_prev, why_prev = check(registry, ledgers[:-1])
    assert ok_now or ok_prev, (why_now, why_prev)


def test_canonical_order_semantics():
    """Synthetic-history pin: staleness ascending, never-verified first
    (they must debut inside the budget), within one staleness class the
    class's OWN ledger order — not the registry order, not alphabetical."""
    registry = ["e", "a", "b", "c", "d", "f"]
    ledgers = [
        (1, ["c", "b", "a"]),      # b/c last seen r1 (a re-seen later)
        (2, ["a", "d"]),           # a/d last seen r2
    ]
    # f and e never verified -> first, in registry order (e before f);
    # then r1 class in r1-ledger order (c, b); then r2 class (a, d)
    assert canonical_order(registry, ledgers) == ["e", "f", "c", "b", "a", "d"]


def test_check_flags_violations():
    """check() rejects a never-verified face parked outside the top-50
    and a stale block that doesn't lead."""
    ledgers = [(1, ["a"]), (2, ["b"])]
    # 'new' outside the budget window
    registry = ["a", "b"] + [f"pad{i}" for i in range(BUDGET - 1)] + ["new"]
    ok, why = check(registry, ledgers)
    assert not ok and "never-verified" in why
    # fresher 'b' ahead of staler 'a'
    ok, why = check(["b", "a"], ledgers)
    assert not ok and "position" in why
    ok, _ = check(["a", "b"], ledgers)
    assert ok
