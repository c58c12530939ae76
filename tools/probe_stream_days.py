"""Multi-day streaming-ingest cost curve probe — thin CLI over
``scale_bench.stream_day_curve`` (the gated measurement lives there
since r12; this wrapper keeps the quick single-run invocation for
iterating on the ingest path without the full bench sweep).

Usage: python tools/probe_stream_days.py [sf_dir] [n_days] [--emb]
(defaults: the sf100 corpus, 5 days; --emb runs the embedding twin).
Single curve pass per invocation (runs=1) — the curve's shape is the
signal; the official gated number is scale_bench's min-of-2.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

import scale_bench as sb  # noqa: E402

from wroclaw_bike_stats_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--emb"]
    emb_mode = "--emb" in sys.argv[1:]
    sf_dir = args[0] if args else sb.SF100
    n_days = int(args[1]) if len(args) > 1 else 5

    spark = get_spark(
        app_name="probe-stream-days",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    curve = sb.stream_day_curve(
        spark, sf_dir, emb_mode=emb_mode, n_days=n_days, runs=1
    )
    print(
        json.dumps(
            {
                "metric": "stream_ingest_day_curve"
                + ("_emb" if emb_mode else ""),
                "sf_dir": sf_dir,
                **curve,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
