"""Stalest-first rotation checker (r16, VERDICT r15 #1).

From r16 onward the driver-verification ledger follows STRICT
stalest-first: the registry's check order is every query sorted by the
round it was last driver-verified (ascending — never-verified sorts
first), and within one staleness class in that round's OWN ledger order
(restricted to surviving registry members). This bounds worst-case
staleness at ceil(registry/50) rounds and is what VERDICT r15 #1
mandated after the "previous tail leads" convention starved a block for
three rounds.

Two entry points:

* ``canonical_order(registry, ledgers)`` — the full expected registry
  order for the NEXT rotation given ledger history.
* ``main()`` — prints the mandated next-round top-50 (the rotation
  lead) as JSON, so a future round's reorder is a mechanical copy
  instead of hand-derived block arithmetic.

The companion test (``tests/test_rotation.py``) pins the committed
registry to canonical order computed from the ledger history either
INCLUDING or EXCLUDING the newest CORRECTNESS file: mid-cycle (after
the driver writes the round's ledger but before the next session's
rotation commit) the registry still matches the excluding-latest view,
so the suite stays green at every point of the round loop.

New faces (in the registry but in no ledger yet) must sit INSIDE the
top-50 — they need a driver row in their debut round — but their exact
position among the first 50 is the builder's choice (r15 convention:
after the mandated stale block), so the checker only constrains the
relative order of already-verified queries.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BUDGET = 50  # driver rows per round, exact in r5-r16


def load_ledgers(repo: Path = REPO) -> list[tuple[int, list[str]]]:
    """(round, ledger-order query names) ascending by round."""
    out = []
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p.name)
        if m:
            out.append((int(m.group(1)), list(json.loads(p.read_text()))))
    out.sort(key=lambda t: t[0])
    return out


def canonical_order(
    registry: list[str], ledgers: list[tuple[int, list[str]]]
) -> list[str]:
    """Expected registry order: stalest first; within a staleness class,
    that class's own ledger order; never-verified queries first (they
    must debut inside the top-50)."""
    last_seen: dict[str, int] = {}
    ledger_pos: dict[str, tuple[int, int]] = {}
    for rnd, names in ledgers:
        for i, n in enumerate(names):
            last_seen[n] = rnd
            ledger_pos[n] = (rnd, i)
    reg_pos = {n: i for i, n in enumerate(registry)}
    return sorted(
        registry,
        key=lambda n: (
            last_seen.get(n, -1),
            ledger_pos.get(n, (0, 0))[1] if n in last_seen else reg_pos[n],
        ),
    )


def check(registry: list[str], ledgers) -> tuple[bool, str]:
    """True if the registry honors stalest-first (new faces may float
    anywhere inside the top-50)."""
    new = [n for n in registry if all(n not in ns for _, ns in ledgers)]
    late = [n for n in new if registry.index(n) >= BUDGET]
    if late:
        return False, f"never-verified faces outside the top-{BUDGET}: {late}"
    want = [n for n in canonical_order(registry, ledgers) if n not in new]
    got = [n for n in registry if n not in new]
    if got != want:
        for i, (g, w) in enumerate(zip(got, want)):
            if g != w:
                return False, f"position {i}: got {g!r}, want {w!r}"
    return True, "ok"


def main() -> None:
    from mongo_polars_reconciliation_spark.harness.queries import QUERIES

    registry = list(QUERIES)
    ledgers = load_ledgers()
    ok_now, why_now = check(registry, ledgers)
    nxt = canonical_order(registry, ledgers)[:BUDGET]
    print(json.dumps({
        "registry_honors_stalest_first": ok_now,
        "detail": why_now,
        "next_round_mandated_top50": nxt,
    }))


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    main()
