"""Cumulative-coverage tripwire (round-7 VERDICT ask #5).

Diffs the full query registry against
  (a) the union of driver rows across CORRECTNESS_r*.json, and
  (b) the union of bench timings across bench_full.json and
      bench_full_registry.json,
so a query that has gone rounds with no driver row or has never been
timed is surfaced loudly instead of silently accumulating as backlog
(the round-7 state: 52/184 never driver-sampled, 87/184 never benched).

Usage:  python tools/coverage_report.py [--json]
Exit status is always 0 (report, not gate) but the summary line is
asserted warning-level in tests/test_plans.py so regressions print red
in every pytest run.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def driver_seen() -> dict[str, list[int]]:
    """query name -> rounds in which the driver recorded a row for it."""
    seen: dict[str, list[int]] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(p.stem.split("_r")[1])
            rows = json.loads(p.read_text())
        except (ValueError, json.JSONDecodeError):
            continue
        for name in rows:
            seen.setdefault(name, []).append(rnd)
    return seen


def bench_seen() -> set[str]:
    """query names with at least one timing row at any scale."""
    timed: set[str] = set()
    for fname in ("bench_full.json", "bench_full_registry.json"):
        p = REPO / fname
        if not p.is_file():
            continue
        try:
            detail = json.loads(p.read_text())
        except json.JSONDecodeError:
            continue
        for key in ("queries", "queries_small"):
            timed.update(detail.get(key, {}))
    return timed


def latest_round() -> int:
    rounds = [
        int(p.stem.split("_r")[1])
        for p in REPO.glob("CORRECTNESS_r*.json")
        if p.stem.split("_r")[1].isdigit()
    ]
    return max(rounds) if rounds else 0


def edge_tested() -> set[str]:
    """Queries replayed on at least one adversarial edge/fuzz corpus
    (the lists in tests/test_differential_edges.py)."""
    import re

    names = set()
    for fname in ("test_differential_edges.py", "test_edge_relational.py"):
        p = REPO / "tests" / fname
        if not p.is_file():
            continue
        src = p.read_text()
        for m in re.finditer(r"\"([a-z]+[0-9]+[a-z0-9_]*)\"", src):
            names.add(m.group(1))
    return names


# Hard-fail staleness bound (round-8 VERDICT ask #7, escalated from a
# warning): a query whose last driver row is >= HARD_STALE rounds old
# and that is NOT scheduled in the current registry head fails pytest
# until the head rotates it in. 5, not 4: the 50-slot head cannot hold
# the 8 never-sampled entries plus all 43 queries that reached
# staleness 4 by round 9 (51 slots) — 5 is the tightest satisfiable
# bound, and it still forces oldest-first rotation every round.
HARD_STALE = 5


def report() -> dict:
    from customer_review__etl_spark.plans import PRIORITY, all_queries

    specs = all_queries()
    names = list(specs)
    seen = driver_seen()
    timed = bench_seen()
    edged = edge_tested()
    cur = latest_round()

    never_driver = [n for n in names if n not in seen]
    stale_driver = [
        n for n in names if n in seen and cur - max(seen[n]) >= 2
    ]
    head = set(PRIORITY[:50])
    overdue_hard = [
        n
        for n in names
        if n in seen and cur - max(seen[n]) >= HARD_STALE and n not in head
    ]
    never_benched = [n for n in names if n not in timed]
    # informational (not RED): oracle-backed queries with no adversarial
    # edge/fuzz replay — many are TPC-H-table ops fully covered by the
    # TPCH edge fixture lists; anything else is a verification gap worth
    # a look when adding fixtures.
    never_edge = [
        n for n in names if specs[n].oracle is not None and n not in edged
    ]
    return {
        "registry_total": len(names),
        "driver_covered": len(names) - len(never_driver),
        "latest_round": cur,
        "never_driver_sampled": never_driver,
        "stale_driver_ge2_rounds": stale_driver,
        "overdue_hard": overdue_hard,
        "never_benched": never_benched,
        "never_edge_tested": never_edge,
    }


def main() -> int:
    rep = report()
    if "--json" in sys.argv:
        print(json.dumps(rep, indent=1))
        return 0
    print(
        f"registry: {rep['registry_total']} queries | driver-covered: "
        f"{rep['driver_covered']} | latest driver round: r{rep['latest_round']}"
    )
    for key in ("never_driver_sampled", "stale_driver_ge2_rounds",
                "overdue_hard", "never_benched"):
        vals = rep[key]
        flag = "\033[91mRED\033[0m" if vals else "ok"
        print(f"{key}: {len(vals)} [{flag}]")
        if vals:
            print("  " + " ".join(vals))
    ne = rep["never_edge_tested"]
    print(f"never_edge_tested (informational): {len(ne)}")
    if ne:
        print("  " + " ".join(ne))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
