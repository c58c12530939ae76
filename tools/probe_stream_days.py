"""Multi-day streaming-ingest cost curve: does day-k cost what day-1
cost?

The stream_ingest_day_n scale row measures ONE day against a fixed
resident store; this probe ingests N consecutive daily batches into
the SAME (overlaid) store and times each, so the claim "tomorrow's
ingest pays the same batch-proportional cost" (curate_stream module
docstring) is a measured curve instead of prose. Expected shape:
~flat per-day seconds — the resident side enters only through (a) the
stored band-table scan, (b) the window-index scan (both grow by one
batch-sized part per day, a ~2%/day drift at the sf100 split), and
(c) the docs/ text_orig lookup in the verify stage.

Usage: python tools/probe_stream_days.py [sf_dir] [n_days] [--emb]
(defaults: the sf100 corpus, 5 days; --emb runs the embedding twin —
ingest_embedding_batch over vector day-slices against the emb stream
store). Day k = the stored 2% ingest slice filtered to
(id // 50) % n_days == k — equal-sized, disjoint, ~0.4%-of-corpus
daily drops at the default. Appends go to a symlink overlay
(scale_bench._overlay_store); the pristine store is never mutated.
Document ids interleave with the resident corpus, so doc ingests run
with enforce_ascending_ids=False, same as the scale row.

Single runs per day (the curve's shape is the signal, not any one
point); prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

import scale_bench as sb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from wroclaw_bike_stats_spark.session import get_spark  # noqa: E402
from wroclaw_bike_stats_spark.streaming.curate_stream import (  # noqa: E402
    ingest_document_batch,
    ingest_embedding_batch,
)


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

    base = os.path.basename(sf_dir)
    if emb_mode:
        pristine = f"{sb.STORE}/{base}_emb_stream_store"
        subs = ("centroids", "assigned")
        new = spark.read.parquet(sb._p(sf_dir, "new_emb"))
        id_col = "vec_id"

        def ingest(batch, overlay):
            ingest_embedding_batch(batch, overlay, threshold=0.95)
    else:
        pristine = f"{sb.STORE}/{base}_stream_store"
        subs = ("docs", "bands", "winindex")
        new = spark.read.parquet(sb._p(sf_dir, "new_docs"))
        id_col = "doc_id"

        def ingest(batch, overlay):
            ingest_document_batch(
                batch, overlay, threshold=0.5, span_k=13,
                enforce_ascending_ids=False,
            )

    # warmup (JVM + Arrow workers) on a throwaway overlay; the
    # measured overlay is created AFTER it because _overlay_store
    # sweeps all existing overlays
    warm = sb._overlay_store(pristine, subs)
    ingest(new.limit(50), warm)
    overlay = sb._overlay_store(pristine, subs)

    days = []
    for k in range(n_days):
        batch = new.filter(
            (F.col(id_col) / 50).cast("long") % n_days == k
        )
        sb._cold()
        start = time.perf_counter()
        ingest(batch, overlay)
        sec = round(time.perf_counter() - start, 3)
        days.append(sec)
        print(f"# day {k + 1}: {sec}s", flush=True)

    print(
        json.dumps(
            {
                "metric": "stream_ingest_day_curve"
                + ("_emb" if emb_mode else ""),
                "sf_dir": sf_dir,
                "n_days": n_days,
                "day_sec": days,
                "dayN_over_day1": round(days[-1] / days[0], 2)
                if days[0]
                else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
