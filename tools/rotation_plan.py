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
   proposal entry whose letter-prefix family keeps another
   representative AND whose removal keeps every gated family covered
   (letter-prefix, not gated-prefix: 'g' must not count gr06 as a
   second grouping rep — r14 review catch);
4. whatever becomes HARD_STALE one round after the proposed head (and
   so MUST open the round after's rotation) is printed as the pinned
   deferral note; anything already hard-stale at the proposed round
   but not fitting is a planning failure and prints as an ERROR.

Usage: python tools/rotation_plan.py [--slots 50]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import coverage_report  # noqa: E402

from customer_review__etl_spark.plans import (  # noqa: E402
    HEAD_FAMILIES,
    ROWS_ONLY_HEAD_WHITELIST,
)


def _letters(name: str) -> str:
    """Letter-prefix family for redundancy counting: g04→'g',
    gr06→'gr', t03/t23→'t', dc01→'dc' — finer than the gated
    startswith prefixes, so a graph query never masquerades as the
    grouping family's second representative."""
    m = re.match(r"[a-z]+", name)
    return m.group(0) if m else name


def propose(slots: int = 50) -> dict:
    from customer_review__etl_spark.plans import all_queries

    specs = all_queries()
    names = list(specs)
    order = {n: i for i, n in enumerate(names)}
    seen = coverage_report.driver_seen()
    cur = coverage_report.latest_round()

    def eligible(n: str) -> bool:
        return specs[n].oracle is not None or n in ROWS_ONLY_HEAD_WHITELIST

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

    def _gated_covered(candidate: list[str]) -> bool:
        return all(
            any(n.startswith(f) for n in candidate) for f in HEAD_FAMILIES
        )

    # family top-ups: oldest member of a missing gated family displaces
    # the youngest head entry whose letter-prefix family keeps >=2 reps
    # and whose removal keeps every gated family covered
    # families the top-up loop could not cover are surfaced to the
    # caller instead of silently returning a head the pytest family
    # gate will reject (r14 ADVICE #4)
    uncovered: list[str] = []
    for fam in HEAD_FAMILIES:
        if any(n.startswith(fam) for n in head):
            continue
        cand = next((n for n in rest if n.startswith(fam)), None)
        if cand is None:
            uncovered.append(fam)
            continue
        victim = None
        for n in reversed(head):
            if n in never:
                continue
            if sum(1 for m in head if _letters(m) == _letters(n)) < 2:
                continue
            trial = [x for x in head if x != n] + [cand]
            # the trial must not LOSE a family the head already covers
            # (and must gain `fam`); demanding full gated coverage here
            # deadlocked when >=2 families went missing in the same
            # round — no single-family swap can ever satisfy it
            kept = {
                f for f in HEAD_FAMILIES
                if any(m.startswith(f) for m in head)
            } | {fam}
            if all(any(m.startswith(f) for m in trial) for f in kept):
                victim = n
                break
        if victim is None:
            uncovered.append(fam)
            continue
        head[head.index(victim)] = cand
        rest.insert(0, victim)
        rest.remove(cand)

    # Deferral arithmetic (r14 review catch — this was off by one):
    # the proposed head lands as round cur+1's CORRECTNESS artifact.
    # - an entry with (cur+1) - last >= HARD_STALE *not in this head*
    #   fails the pytest gate the moment that artifact lands — if any
    #   such entry did not fit, the plan itself is infeasible: ERROR.
    # - an entry with (cur+2) - last >= HARD_STALE goes hard one round
    #   later — that is the "next head MUST open with these" pin the
    #   rotation log records.
    already_hard = [
        n for n in rest
        if n in seen
        and (cur + 1) - max(seen[n]) >= coverage_report.HARD_STALE
    ]
    hard_after_next = [
        n for n in rest
        if n in seen
        and (cur + 1) - max(seen[n]) < coverage_report.HARD_STALE
        and (cur + 2) - max(seen[n]) >= coverage_report.HARD_STALE
    ]
    missed_never = [n for n in names
                    if n not in seen and eligible(n) and n not in head]
    return {
        "next_round": cur + 1,
        "head": head,
        "infeasible_already_hard": already_hard,
        "hard_one_round_later": hard_after_next,
        "never_sampled_not_fitting": missed_never,
        "uncovered_families": uncovered,
    }


def main() -> int:
    slots = 50
    if "--slots" in sys.argv:
        slots = int(sys.argv[sys.argv.index("--slots") + 1])
    p = propose(slots)
    nxt = p["next_round"]
    print(f"# proposed PRIORITY head for round r{nxt} ({len(p['head'])} slots)")
    for n in p["head"]:
        print(f'    "{n}",')
    if p["never_sampled_not_fitting"]:
        print("# WARNING: never-sampled entries that did not fit "
              "(should be slot 1 next round):")
        print("#   " + " ".join(p["never_sampled_not_fitting"]))
    if p["uncovered_families"]:
        print("# ERROR: gated families left uncovered — the pytest "
              "head-coverage gate WILL reject this head as-is:")
        print("#   " + " ".join(p["uncovered_families"]))
    if p["infeasible_already_hard"]:
        print(f"# ERROR: already hard-stale at r{nxt} but NOT in this head "
              f"— the pytest gate fails the moment CORRECTNESS_r{nxt} lands:")
        print("#   " + " ".join(p["infeasible_already_hard"]))
    if p["hard_one_round_later"]:
        print(f"# deferrals hitting HARD_STALE at r{nxt + 1} — the "
              f"r{nxt + 1} head MUST open with these (pin in the "
              f"rotation log):")
        print("#   " + " ".join(p["hard_one_round_later"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
