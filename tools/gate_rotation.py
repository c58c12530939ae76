"""Gate-window rotation planner — computes, from the driver's own
CORRECTNESS_r*.json ledger, which `queries()` entries must lead the
NEXT round's ~50-entry verification window.

Policy (COVERAGE.md "Driver gate window"): the driver samples a ~50
query prefix of `queries()` each round, so ordering IS the rotation.
The standing invariant is a TWO-ROUND staleness bound: every
oracle-backed gate must have a green driver row from round N-2 or
newer. This script replaces the hand-recomputed round history notes:

1. entries with NO driver row yet (new gates) lead;
2. then oracle-backed entries ordered by latest-green round ASCENDING
   (stalest first — anything at the two-round bound must be inside
   the next window);
3. rows-only entries (no `oracle_sql()` — sketch/hash internals with
   sibling contract gates) trail, ordered the same way.

What it CANNOT see: gates whose code/schema changed AFTER their last
driver row (their green row attests the previous code). Those are a
git question — place them manually at the head alongside the new
gates; the round verdicts call them out explicitly.

Run:  python tools/gate_rotation.py [--window 50]
Prints the lead list + a per-round freshness table (markdown) for
COVERAGE.md, and exits 1 if the CURRENT queries() prefix of size
--window would leave a bound-stale gate outside the window (i.e. the
dict ordering was not rotated after the last driver round).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_ledger() -> tuple[dict[str, int], int]:
    """name -> latest round with a fully-green driver row; also the
    latest round number seen. A row counts as green when rows+schema
    match, the hash (when checked) matches, and no error."""
    latest: dict[str, int] = {}
    last_round = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        last_round = max(last_round, rnd)
        for name, row in json.load(open(path)).items():
            # rows-only entries (no oracle_sql) are recorded by the
            # driver as err="no_oracle" + a spark row count — that IS
            # their (weaker) green; null match fields mean "not
            # checked", not failure
            ok = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            ) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, last_round


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    import __spark_entry__ as entry

    names = list(entry.queries().keys())
    oracle_backed = set(entry.oracle_sql().keys())
    latest, last_round = load_ledger()
    # Two-round staleness bound: after round N+1 runs, every gate must
    # be green at N-1 or newer — so the N+1 window must refresh
    # anything whose latest green is N-2 or older.
    bound = last_round - 2

    def sort_key(n: str) -> tuple:
        has_oracle = n in oracle_backed
        return (not has_oracle, latest.get(n, -1), names.index(n))

    ordered = sorted(names, key=sort_key)
    never = [n for n in ordered if n not in latest and n in oracle_backed]
    print(f"# rounds seen: r01..r{last_round:02d}; "
          f"{len(names)} queries ({len(oracle_backed)} oracle-backed)")
    print(f"\n## r{last_round + 1} lead list (must sit inside the "
          f"first {args.window} queries() entries)\n")
    if never:
        print("new oracle-backed gates (no driver row yet):")
        for n in never:
            print(f"  - {n}")
    overdue = [
        n for n in names
        if n in oracle_backed and 0 < latest.get(n, 0) <= bound
    ]
    overdue.sort(key=lambda n: latest[n])
    print(f"oracle-backed gates at/over the two-round bound "
          f"(last green <= r{bound:02d}):")
    for n in overdue:
        print(f"  - {n} (r{latest[n]:02d})")

    print("\n## freshness table (markdown, for COVERAGE.md)\n")
    by_round: dict[int, list[str]] = {}
    for n in names:
        by_round.setdefault(latest.get(n, 0), []).append(n)
    print("| last green | n | entries |")
    print("|---|---|---|")
    for rnd in sorted(by_round):
        tag = f"r{rnd:02d}" if rnd else "never"
        ents = sorted(by_round[rnd])
        print(f"| {tag} | {len(ents)} | {', '.join(ents)} |")

    # Invariant check against the CURRENT dict ordering: every overdue
    # or row-less oracle-backed gate must already sit inside the window.
    window = set(names[: args.window])
    outside = [n for n in overdue + [x for x in never if x in oracle_backed]
               if n not in window]
    if outside:
        print(f"\nROTATION NEEDED: outside the {args.window}-entry window: "
              f"{', '.join(outside)}")
        return 1
    print(f"\nOK: current queries() prefix ({args.window}) covers every "
          f"bound-stale / new oracle-backed gate.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
