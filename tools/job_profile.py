"""Profile one declared query: run it with the Spark UI enabled and
dump every job (description, duration, stage/task counts) from the
REST API — the guide-§7.1 view, scriptable.

Usage::

    python tools/job_profile.py [--fresh] [--warm] name
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from wroclaw_bike_stats_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--warm", action="store_true",
                    help="run the query once before the profiled run")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="wbs-job-profile",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.port": "4051",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    fn = queries[args.name]

    for wname in ("pricing_summary", "simhash_groups"):
        try:
            queries[wname](spark, args.sf_dir).collect()
        except Exception:  # noqa: BLE001
            pass
    if args.warm:
        fn(spark, args.sf_dir).collect()

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4051/api/v1/applications/{app_id}"
    jobs_before = {
        j["jobId"]
        for j in json.load(urllib.request.urlopen(f"{base}/jobs"))
    }

    start = time.perf_counter()
    fn(spark, args.sf_dir).collect()
    total = time.perf_counter() - start

    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    new = sorted(
        (j for j in jobs if j["jobId"] not in jobs_before),
        key=lambda j: j["jobId"],
    )
    print(f"query={args.name} wall={total:.3f}s jobs={len(new)}")
    tsum = 0.0
    for j in new:
        t0 = j.get("submissionTime", "")
        t1 = j.get("completionTime", "")
        dur = ""
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            d = (
                datetime.strptime(t1, fmt) - datetime.strptime(t0, fmt)
            ).total_seconds()
            tsum += d
            dur = f"{d:7.3f}s"
        except Exception:  # noqa: BLE001
            pass
        desc = (j.get("description") or j.get("name") or "")[:110]
        print(
            f"  job {j['jobId']:>4} {dur} tasks={j.get('numTasks', '?'):>4} "
            f"stages={len(j.get('stageIds', [])):>2}  {desc}"
        )
    print(f"sum of job durations: {tsum:.3f}s (gaps = driver-side time)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
