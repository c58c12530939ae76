"""Streaming exact deduplication — the streaming face of the batch
``operators.dedup.exact_dedup``: drop events whose dedup key was
already seen, with BOUNDED state via a watermark.

``dropDuplicatesWithinWatermark`` keeps one state row per key only
until the watermark passes the event's time, so state is
O(keys-per-watermark-window), not O(all keys ever) — the only form
that survives an unbounded 100 TB/day stream. The trade is the
documented at-least-once window: a duplicate arriving later than the
watermark delay after the original is NOT suppressed (it is no longer
in state). Exactly-once dedup over all history requires a keyed
idempotent sink (MERGE on the key) instead — implemented in
``streaming/merge_sink.py``.

Batch parity: within one watermark window the streaming output is
row-identical to batch ``dropDuplicates`` on the same key (pinned in
tests/test_dedup_stream.py, including a cross-micro-batch duplicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 - parity helpers
from pyspark.sql.types import StructType


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keyed streaming dedup with watermark-bounded state."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def run_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    sink_dir: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drain ``source_dir`` (parquet file stream, oldest-first, one
    file per micro-batch so duplicates can straddle batches) through
    the watermarked dedup into an append-only sink; return the sink."""
    src = (
        spark.readStream.schema(schema)
        .option("latestFirst", False)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    deduped = dedup_within_watermark(src, keys or ["event_id"], watermark=watermark)
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink_dir)
