"""Merge a subset scale_bench run (SPARK_GRAFT_ONLY=...) into
SCALING.json.

A full scale_bench sweep is ~50 min; when one new family is added, a
subset run measures just its rows and this tool folds them into the
official SCALING.json — per-query rows are independent measurements
(every timing starts from cold operator state), so a merge is sound.
The merged file records which rows came from which run in a
``subset_runs`` audit list.

Usage: SPARK_GRAFT_ONLY=a,b SPARK_GRAFT_SKIP_PREPARE=1 \
           python -u scale_bench.py | tee /tmp/subset.out
       python tools/merge_scaling.py /tmp/subset.out [SCALING.json]
       python tools/write_scaling_md.py SCALING.json
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    subset_path = sys.argv[1]
    target_path = sys.argv[2] if len(sys.argv) > 2 else "SCALING.json"

    subset = None
    with open(subset_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                subset = json.loads(line)
    if subset is None:
        print(f"no JSON result line in {subset_path}", file=sys.stderr)
        return 1

    with open(target_path) as f:
        full = json.load(f)

    merged = sorted(subset["queries"])
    for name, row in subset["queries"].items():
        full["queries"][name] = row
    full.setdefault("subset_runs", []).append(
        {"source": subset_path, "queries": merged}
    )

    # single line: tools/write_scaling_md.py keys on a line starting
    # with {"metric": "scaling
    with open(target_path, "w") as f:
        json.dump(full, f)
        f.write("\n")
    print(f"merged {merged} into {target_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
