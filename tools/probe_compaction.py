"""Scale probe for ``compact_curation_store`` (r12): what does
compacting a batch-accreted store cost at sf100, and does the next
ingest still pay the same batch-proportional price afterwards?

Method: symlink-overlay the pristine sf100 stream store
(``scale_bench._overlay_store`` — the pristine store is never
mutated), ingest three ~0.4% daily drops so every subdir has real
appended parts, then time (a) the compaction itself and (b) one more
daily ingest against the compacted store vs the same day against an
uncompacted control overlay. Expected shape: compaction cost is
store-size-proportional (it rewrites the store once — that is its
contract; run it at maintenance cadence, not per batch), post-
compaction ingest ≤ control (fewer files to list, a folded window
index to re-aggregate).

Usage: python tools/probe_compaction.py [sf_dir]
(default: the sf100 corpus). Single runs; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

import scale_bench as sb  # noqa: E402

from wroclaw_bike_stats_spark.session import get_spark  # noqa: E402
from wroclaw_bike_stats_spark.streaming.curate_stream import (  # noqa: E402
    compact_curation_store,
)

N_DAYS = 4  # 3 accreting drops + 1 measured post-compaction drop


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else sb.SF100

    spark = get_spark(
        app_name="probe-compaction",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # the gated day curve's exact workload parameterization — shared
    # (including the day-slicing formula) so this probe never
    # silently measures a different ingest
    pristine, subs, new, id_col, ingest, day_slice = sb.stream_setup(
        spark, sf_dir
    )

    def day(k):
        return day_slice(k, N_DAYS)

    # warmup overlay (JVM + Arrow workers)
    warm = sb._overlay_store(pristine, subs)
    ingest(new.limit(50), warm)

    out = {"metric": "compaction_probe", "sf_dir": sf_dir}
    # control arm: 3 accreting drops, then time day 4 uncompacted
    control = sb._overlay_store(pristine, subs)
    for k in range(3):
        ingest(day(k), control)
    sb._cold()
    t0 = time.perf_counter()
    ingest(day(3), control)
    out["day4_sec_uncompacted"] = round(time.perf_counter() - t0, 3)

    # compacted arm: same 3 drops, compact, then time day 4
    overlay = sb._overlay_store(pristine, subs)
    for k in range(3):
        ingest(day(k), overlay)
    sb._cold()
    t0 = time.perf_counter()
    report = compact_curation_store(spark, overlay)
    out["compact_sec"] = round(time.perf_counter() - t0, 3)
    out["compact_report"] = report
    sb._cold()
    t0 = time.perf_counter()
    ingest(day(3), overlay)
    out["day4_sec_compacted"] = round(time.perf_counter() - t0, 3)

    sb._sweep_own_overlays()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
