"""Stage decomposition of the composed streaming ingest at one sf:
time each component of ingest_document_batch separately (single
cold-state runs, one session) to attribute the stream_ingest_day_n
row's cost.

This probe drove the late-r11 optimization: at sf100 it showed the
stored window index being re-aggregated STORE-SIZED per ingest
(43 s over 197M distinct windows for a strip that consults ~4M of
them) and the batch being MinHash-hashed twice — fixed by
read_window_index_store(probe_hashes=...) and the batch-asset reuse
params; the composed row went 64.4 → 26.0 s. Keep the probe runnable
so a future regression can be re-attributed the same way.

Usage: python tools/probe_stream_stages.py [sf_dir]
(default: the sf100 scale corpus; needs prepare_stream_store's
pristine store and the new_docs split on disk — a scale_bench prepare
builds both)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

import scale_bench as sb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from wroclaw_bike_stats_spark.operators import dedup as D  # noqa: E402
from wroclaw_bike_stats_spark.operators import span_dedup as SD  # noqa: E402
from wroclaw_bike_stats_spark.session import get_spark  # noqa: E402
from wroclaw_bike_stats_spark.streaming.curate_stream import (  # noqa: E402
    read_window_index_store,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else sb.SF100
    spark = get_spark(
        app_name="probe-stream-stages",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    pristine = f"{sb.STORE}/{os.path.basename(sf_dir)}_stream_store"
    batch = spark.read.parquet(sb._p(sf_dir, "new_docs"))
    batch.count()  # warmup

    def t(label, fn):
        sb._cold()
        start = time.perf_counter()
        out = fn()
        print(
            f"{label}: {time.perf_counter() - start:.2f}s -> {out}",
            flush=True,
        )

    t("fp_aggregate", lambda: batch.agg(
        F.min("doc_id"), F.max("doc_id"), F.count(F.lit(1)),
        F.expr("bit_xor(xxhash64(`doc_id`))"),
        F.expr("bit_xor(xxhash64(`doc_id`, `text`))"),
    ).first() and "ok")

    old_docs = spark.read.parquet(os.path.join(pristine, "docs"))
    old_banded = spark.read.parquet(os.path.join(pristine, "bands"))
    t("incremental_pairs", lambda: D.minhash_incremental_pairs(
        batch,
        old_docs.select(F.col("doc_id"), F.col("text_orig").alias("text")),
        "text", "doc_id", threshold=0.5, old_banded=old_banded,
    ).count())

    t("winindex_reagg_full", lambda: read_window_index_store(
        spark, pristine
    ).count())
    # persist + materialize the probe OUTSIDE the timed sections —
    # the production ingest persists its batch_index for exactly this
    # reason; an unpersisted probe would lazily re-run the batch
    # tokenize+hash pass inside BOTH timed consumers below and
    # double-charge the batch_window_index cost to them
    probe = SD.window_index(batch, "text", "doc_id", k=13).persist()
    probe.count()
    t("winindex_reagg_probe_bounded", lambda: read_window_index_store(
        spark, pristine, probe_hashes=probe
    ).count())

    idx = read_window_index_store(spark, pristine, probe_hashes=probe)
    t("strip_incremental", lambda: SD.strip_duplicate_spans_incremental(
        batch, idx, "text", "doc_id", k=13, keep_all=True
    ).count())
    probe.unpersist()

    t("batch_band_table", lambda: D.minhash_band_table(
        D.minhash_signatures(batch, "text", "doc_id")
    ).count())
    t("batch_window_index", lambda: SD.window_index(
        batch, "text", "doc_id", k=13
    ).count())
    print("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
