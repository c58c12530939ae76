"""Watermarked windowed aggregations over a streaming file source
(SURVEY.md §2.9 streaming track, generalized beyond the snapshot
differ: the hypertable-rollup / sessionization shapes as *continuous*
queries).

Batch and streaming share the exact same aggregation expressions —
``F.window`` / ``F.session_window`` are the one construct Spark
defines for both execution modes — so the parity tests can assert
set-equality between a drained stream and the batch plan over the
same files, rather than trusting two hand-kept implementations.

Late-data contract (append mode + watermark):

- a window/session is EMITTED (and its state evicted) at the end of
  the first micro-batch whose watermark — max event time through the
  *previous* batch minus the delay — passes its end; that batch's own
  input is folded in first, so a late row arriving in the same batch
  as the eviction still counts (verified against Spark 4.1 in
  tests/test_streaming_windows.py);
- a late row arriving after its window's state was evicted is DROPPED
  (``numRowsDroppedByWatermark``) — the documented trade: bounded
  state for bounded lateness;
- windows the final watermark never passes remain unemitted until
  more data (or a later drain) advances it. ``Trigger.AvailableNow``
  runs a final flush batch, so windows closed by the *last* file's
  timestamps do land in the sink.

Scale: windowed-agg state is O(open windows × group keys), bounded by
the watermark horizon — this is the standard Spark pattern for
unbounded streams and needs no custom state management. The shuffle
is keyed by (window, group key); skewed group keys respond to the
same salting strategy as batch (functions/salting.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def windowed_event_counts(df: DataFrame, window: str = "6 hours") -> DataFrame:
    """Tumbling-window per-type rollup, identical for batch/streaming
    inputs (same shape as ``q_tumbling_window_agg``, plus the group
    key)."""
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_stats(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions via native ``F.session_window``. The session
    END is last-event-ts + gap (Spark's definition) — the batch
    ``operators.sessionize`` equivalent closes at the last event, so
    ``session_end == last_ts + gap`` is the documented bridge between
    the two (asserted in tests)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def _file_stream(
    spark: SparkSession, source_dir: str, schema: StructType
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        # oldest-first, one file per micro-batch: watermark advances
        # between files exactly as it would between arrival times
        .option("latestFirst", False)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def _run(agg: DataFrame, sink_dir: str, checkpoint_dir: str) -> None:
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_tumbling_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drain ``source_dir`` through the watermarked tumbling rollup
    into an append-only parquet sink; return the sink. Idempotent
    across re-drains via the checkpoint (only new files process)."""
    src = _file_stream(spark, source_dir, schema).withWatermark("ts", watermark)
    _run(windowed_event_counts(src, window), sink_dir, checkpoint_dir)
    return spark.read.parquet(sink_dir)


def run_session_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    sink_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drain ``source_dir`` through watermarked session windows into an
    append-only parquet sink; return the sink."""
    src = _file_stream(spark, source_dir, schema).withWatermark("ts", watermark)
    _run(session_window_stats(src, gap), sink_dir, checkpoint_dir)
    return spark.read.parquet(sink_dir)
