"""Gate-window rotation planner/applier — computes, from the driver's
own CORRECTNESS_r*.json ledger, the ordering of `queries()` entries
for the NEXT round's ~50-entry verification window, and (since r11)
REWRITES the generated `_GATE_ORDER` constant in __spark_entry__.py
so the whole rotation is one command.

Policy (COVERAGE.md "Driver gate window"): the driver samples a ~50
query prefix of `queries()` each round, so ordering IS the rotation.
The standing invariant is a TWO-ROUND staleness bound: every
oracle-backed gate must have a green driver row from round N-2 or
newer. Ordering rule (r11 — replaces the rows-only-always-trail rule,
so long-stale rows-only entries rotate through the window tail
instead of starving):

1. `--head` entries first (gates whose code/schema changed after
   their last driver row — a git question the ledger cannot see; the
   round verdicts call them out explicitly);
2. then ALL entries ordered by latest-green round ASCENDING (stalest
   first; never-verified counts as stalest), oracle-backed before
   rows-only within a round, current registry order as the final
   tie-break.

Run:
  python tools/gate_rotation.py [--window 50]        # check (exit 1
                                                     # if rotation due)
  python tools/gate_rotation.py --emit-order         # print ordering
  python tools/gate_rotation.py --apply [--head a,b] # rewrite
                                                     # _GATE_ORDER

Round-open procedure (COVERAGE.md): run --apply with --head set to
any gates this round has already edited, re-run the check mode, and
commit. The check is also pinned as tests/test_gate_rotation.py, so
a round that skips the rotation fails the suite loudly.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY_PATH = os.path.join(REPO, "__spark_entry__.py")
BEGIN = "# BEGIN GATE_ORDER"
END = "# END GATE_ORDER"
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


def compute_order(
    names: list[str],
    oracle_backed: set[str],
    latest: dict[str, int],
    head: list[str],
) -> list[str]:
    """The full recommended queries() ordering (see module docstring)."""
    unknown = [h for h in head if h not in names]
    if unknown:
        raise SystemExit(f"--head names not in queries(): {unknown}")
    rest = [n for n in names if n not in set(head)]
    rest.sort(
        key=lambda n: (
            latest.get(n, 0),
            n not in oracle_backed,
            names.index(n),
        )
    )
    return list(head) + rest


def apply_order(order: list[str]) -> None:
    """Rewrite the generated _GATE_ORDER block in __spark_entry__.py."""
    src = open(ENTRY_PATH).read()
    i, j = src.index(BEGIN), src.index(END)
    i = src.index("\n", i) + 1  # keep the BEGIN marker line itself
    body = "".join(f'    "{n}",\n' for n in order)
    open(ENTRY_PATH, "w").write(
        src[:i] + "_GATE_ORDER = [\n" + body + "]\n" + src[j:]
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument(
        "--emit-order", action="store_true",
        help="print the full recommended queries() ordering",
    )
    ap.add_argument(
        "--apply", action="store_true",
        help="rewrite __spark_entry__.py's generated _GATE_ORDER block",
    )
    ap.add_argument(
        "--head", default="",
        help="comma-separated gates to place at the very head (edited "
        "after their last driver row; the ledger cannot see these)",
    )
    args = ap.parse_args()
    head = [h.strip() for h in args.head.split(",") if h.strip()]

    import __spark_entry__ as entry

    # registry = the full name set (what to order); served = the
    # current _GATE_ORDER (what the driver actually samples). Reading
    # the registry directly avoids queries()'s own staleness assert —
    # this tool is exactly what fixes a stale order.
    names = list(entry._query_registry().keys())
    served = list(entry._GATE_ORDER)
    oracle_backed = set(entry.oracle_sql().keys())
    latest, last_round = load_ledger()
    order = compute_order(names, oracle_backed, latest, head)

    if args.emit_order or args.apply:
        for n in order:
            tag = f"r{latest[n]:02d}" if n in latest else "never"
            kind = "oracle" if n in oracle_backed else "rows-only"
            print(f"{n}  # {tag} {kind}")
        if args.apply:
            apply_order(order)
            print(f"\napplied: _GATE_ORDER rewritten ({len(order)} entries)")
        return 0

    # Two-round staleness bound: after round N+1 runs, every gate must
    # be green at N-1 or newer — so the N+1 window must refresh
    # anything whose latest green is N-2 or older.
    bound = last_round - 2
    never = [n for n in order if n not in latest and n in oracle_backed]
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

    # Invariant check against the SERVED ordering (_GATE_ORDER): every
    # overdue or row-less oracle-backed gate must sit inside the
    # window, and the order must cover the registry exactly.
    if set(served) != set(names):
        print(f"\nROTATION NEEDED: _GATE_ORDER out of sync with the "
              f"registry; diff: {sorted(set(served) ^ set(names))}")
        print("fix: python tools/gate_rotation.py --apply "
              "[--head <gates edited this round>]")
        return 1
    window = set(served[: args.window])
    outside = [n for n in overdue + never if n not in window]
    if outside:
        print(f"\nROTATION NEEDED: outside the {args.window}-entry window: "
              f"{', '.join(outside)}")
        print("fix: python tools/gate_rotation.py --apply "
              "[--head <gates edited this round>]")
        return 1
    print(f"\nOK: current queries() prefix ({args.window}) covers every "
          f"bound-stale / new oracle-backed gate.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
