"""Isolate and time individual declared queries (guide §1).

Usage::

    python tools/time_query.py [-r REPS] [--noop] [--fresh] name [name...]

Times ``queries()[name](spark, sf_dir)`` end-to-end (builder + action),
the bench methodology. ``--noop`` uses the noop sink instead of
``collect()`` so the computation (not the driver transfer) is timed.
``--fresh`` calls ``release_shared()`` between reps so every rep pays
cold shared-intermediate cost (the bench's min-of-reps measures warm;
this flag shows the cold number).

Prints per-rep seconds and the min. Also reports the Spark job count
each rep triggered (``sc.statusTracker`` job ids delta) — a cheap
proxy for "how many actions does this query hide".
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from wroclaw_bike_stats_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="wbs-time-query",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    if not args.no_warmup:
        for wname in ("pricing_summary", "simhash_groups", "daily_event_metrics"):
            try:
                queries[wname](spark, args.sf_dir).collect()
            except Exception:  # noqa: BLE001
                pass

    tracker = spark.sparkContext.statusTracker()
    for name in args.names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        times = []
        for rep in range(args.reps):
            if args.fresh:
                entry_mod.release_shared()
            jobs_before = len(tracker.getJobIdsForGroup(None) or [])
            spark.sparkContext.setJobDescription(f"time_query:{name}:rep{rep}")
            start = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            elapsed = time.perf_counter() - start
            jobs_after = len(tracker.getJobIdsForGroup(None) or [])
            times.append(elapsed)
            print(
                f"{name} rep{rep}: {elapsed:.3f}s  jobs={jobs_after - jobs_before}"
            )
        spark.sparkContext.setJobDescription(None)
        print(f"{name} MIN: {min(times):.3f}s over {len(times)} reps")
    try:
        entry_mod.release_shared()
    except Exception:  # noqa: BLE001
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
