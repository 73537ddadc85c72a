"""Propose the NEXT round's PRIORITY head (rotation planner).

The external verifier samples only the registry head (~50 entries), so
every round rotates never-sampled and oldest-sampled queries in while
keeping one representative per gated family (the head-coverage test in
tests/test_plans.py). By round 14 the backlog arithmetic stopped being
trivial — 205 registered queries cycle through 50 slots, so each
round's plan is "never-sampled + oldest cohort + family top-ups, defer
the overflow" assembled by hand from coverage data. This tool makes
that assembly mechanical and auditable; it PROPOSES (prints Python
source for the PRIORITY tail and the deferral note) and never edits
anything.

Policy encoded (the same one the r8–r14 rotation log applied by hand):
1. never-driver-sampled queries first (oracle-backed before rows-only;
   rows-only entries are admitted only if already whitelisted in the
   head gate);
2. then strictly oldest-first by last driver round, tie-broken by
   registry order;
3. family coverage: if the proposal lacks a gated family, the
   oldest-sampled member of that family displaces the youngest
   proposal entry whose family keeps another representative;
4. whatever hits HARD_STALE next round but did not fit is listed as
   the pinned deferral set the next rotation MUST open with.

Usage: python tools/rotation_plan.py [--slots 50]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import coverage_report  # noqa: E402

FAMILIES = ("p", "a", "q", "j", "w", "g", "f", "u",
            "t0", "d0", "s0", "st", "ml", "mm", "io")

# rows-only entries the head gate whitelists (test_plans.py) — every
# other rows-only entry must not spend a head slot
ROWS_ONLY_WHITELIST = {
    "t02_stemmed_chain",
    "ml01_lda_themes",
    "ml02_topic_top_words",
    "ml04_classifier_metrics",
}


def _family_of(name: str) -> str | None:
    for fam in FAMILIES:
        if name.startswith(fam):
            return fam
    return None


def propose(slots: int = 50) -> dict:
    from customer_review__etl_spark.plans import all_queries

    specs = all_queries()
    names = list(specs)
    order = {n: i for i, n in enumerate(names)}
    seen = coverage_report.driver_seen()
    cur = coverage_report.latest_round()

    def eligible(n: str) -> bool:
        return specs[n].oracle is not None or n in ROWS_ONLY_WHITELIST

    never = [n for n in names if n not in seen and eligible(n)]
    # oracle-backed never-sampled first, then whitelisted rows-only
    never.sort(key=lambda n: (specs[n].oracle is None, order[n]))
    sampled = sorted(
        (n for n in names if n in seen and eligible(n)),
        key=lambda n: (max(seen[n]), order[n]),
    )
    ranked = never + sampled
    head = ranked[:slots]
    rest = ranked[slots:]

    # family top-ups: oldest member of a missing family displaces the
    # youngest head entry whose family keeps >=2 reps (scanned from the
    # stalest-last end so we evict the least-stale redundancy)
    for fam in FAMILIES:
        if any(n.startswith(fam) for n in head):
            continue
        cand = next((n for n in rest if n.startswith(fam)), None)
        if cand is None:
            continue
        fam_counts: dict[str | None, int] = {}
        for n in head:
            fam_counts[_family_of(n)] = fam_counts.get(_family_of(n), 0) + 1
        victim = next(
            (n for n in reversed(head)
             if n not in never and fam_counts.get(_family_of(n), 0) >= 2),
            None,
        )
        if victim is None:
            continue
        head[head.index(victim)] = cand
        rest.insert(0, victim)
        rest.remove(cand)

    # deferrals that go HARD next round: last sampled <= (cur+1) - HARD_STALE
    hard_next = [
        n for n in rest
        if n in seen and (cur + 1) - max(seen[n]) >= coverage_report.HARD_STALE
    ]
    missed_never = [n for n in names
                    if n not in seen and eligible(n) and n not in head]
    return {
        "next_round": cur + 1,
        "head": head,
        "hard_next_round_deferrals": hard_next,
        "never_sampled_not_fitting": missed_never,
    }


def main() -> int:
    slots = 50
    if "--slots" in sys.argv:
        slots = int(sys.argv[sys.argv.index("--slots") + 1])
    p = propose(slots)
    print(f"# proposed PRIORITY head for round r{p['next_round']} "
          f"({len(p['head'])} slots)")
    for n in p["head"]:
        print(f'    "{n}",')
    if p["never_sampled_not_fitting"]:
        print("# WARNING: never-sampled entries that did not fit "
              "(should be slot 1 next round):")
        print("#   " + " ".join(p["never_sampled_not_fitting"]))
    if p["hard_next_round_deferrals"]:
        print(f"# deferrals hitting HARD_STALE at r{p['next_round'] + 1} — "
              f"the r{p['next_round'] + 1} head MUST open with these:")
        print("#   " + " ".join(p["hard_next_round_deferrals"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
