"""Generate SCALING.md from scale_bench.py's JSON line.

Usage: python scale_bench.py | tee /tmp/scaling.out
       python tools/write_scaling_md.py /tmp/scaling.out
"""

from __future__ import annotations

import json
import sys

TARGET_RATIO = 12.0  # <= ~12x time at 10x data = near-linear
TARGET_SPEEDUP = 5.0  # incremental vs full recompute


def main(path: str) -> int:
    doc = None
    for line in open(path):
        if line.startswith('{"metric": "scaling'):
            doc = json.loads(line)
    if doc is None:
        print("no scaling JSON found in", path)
        return 1
    q = doc["queries"]
    lines = [
        "# SCALING — sf0.1 → sf1 (10× data), measured",
        "",
        f"Machine: local[{doc['cpus']}], same session/config as bench.py.",
        "sf1 synthesized by tools/make_scale_data.py (id-offset shards,",
        "token-suffixed documents / sign-flipped embeddings so workload",
        "density per shard is constant — join outputs scale linearly, as",
        "a real 10× corpus would). Timings are min-of-2 COLD runs",
        "(release_shared() before every run: each run pays its own",
        "shingle/signature/band work; the per-round bench deliberately",
        "shares those, which would fake this curve). Incremental paths",
        "read STORED signature/band tables (written once per sf, cost",
        "excluded — the resident corpus's standing asset), new batch =",
        "2% of corpus (a daily-ingest shape).",
        "",
        "| query | sf0.1 sec | sf1 sec | ratio @10× data | rows sf0.1→sf1 | verdict |",
        "|---|---|---|---|---|---|",
    ]
    ok_all = True
    for name, r in q.items():
        ratio = r["time_ratio_10x_data"]
        ok = ratio is not None and ratio <= TARGET_RATIO
        ok_all &= ok
        lines.append(
            f"| {name} | {r['sf0.1_sec']} | {r['sf1_sec']} | {ratio}× "
            f"| {r['sf0.1_rows']}→{r['sf1_rows']} "
            f"| {'near-linear ✓' if ok else 'SUPRALINEAR ✗'} |"
        )
    lines += [
        "",
        "## Incremental vs full recompute (sf1)",
        "",
        "| incremental path | full sf1 sec | incr sf1 sec | speedup | target |",
        "|---|---|---|---|---|",
    ]
    for name, r in q.items():
        sp = r.get("speedup_vs_full_recompute_sf1")
        if sp is None:
            continue
        full = name.replace("_incremental", "_full")
        ok = sp >= TARGET_SPEEDUP
        ok_all &= ok
        lines.append(
            f"| {name} | {q[full]['sf1_sec']} | {r['sf1_sec']} | {sp}× "
            f"| ≥{TARGET_SPEEDUP}× {'✓' if ok else '✗'} |"
        )
    lines += [
        "",
        f"Overall: {'ALL TARGETS MET' if ok_all else 'TARGETS MISSED — see ✗ rows'}"
        f" (near-linear = time ratio ≤ {TARGET_RATIO}× at 10× data;"
        " row-count growth shows the workload itself stayed"
        " density-constant, so the ratio measures the ENGINE, not a"
        " quadratically-inflated join output).",
        "",
        "Raw JSON: the `scaling_sf0.1_to_sf1` line in the scale_bench",
        "output this file was generated from (tools/write_scaling_md.py).",
    ]
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING.md", "(all targets met)" if ok_all else "(MISSES!)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
