"""Stream-stream inner join with watermark-bounded state (SURVEY.md
§2.9 streaming track — the join shape batch expresses as a range join,
run as a continuous query).

Use case shape: attribute each purchase to the views that preceded it
within an hour, as events arrive. Both sides are watermarked and the
join predicate carries an explicit event-time range — that pair is
what lets Spark BOUND the join state: a buffered view row can be
discarded once the watermark guarantees no future purchase can still
match it (view_ts + range + watermark delay), and vice versa.
Without the time bound the state would grow forever; Spark rejects
unbounded stream-stream joins in append mode for exactly that reason.

The join expression is built by ``purchase_view_join`` on a plain
DataFrame, so the SAME code runs in batch (where it compiles to the
bin-pruned range-join family, see operators/rangejoin.py for the
scale-optimized batch form) and in streaming — parity between the two
is asserted in tests/test_stream_join.py.

Emission semantics (inner join): a match emits as soon as both rows
have arrived — matches never wait for the watermark; the watermark
only drives state EVICTION. A row arriving after the other side's
matching rows were evicted simply finds no partner (at-most-once loss
on the late side, the documented lateness trade).

Operational note pinned in tests: the GLOBAL watermark is the MIN
over every watermarked input (``multipleWatermarkPolicy=min``
default) — a quiet side holds back eviction for the whole join. At
scale that is a feature (no loss while one feed lags) but means state
is bounded by the SLOWEST feed's progress; monitor both sides'
``eventTime.watermark`` in the streaming progress.

Scale: state is O(rows within the lateness+range horizon) per side,
sharded by the join key across executors; each micro-batch shuffles
only its own rows on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def purchase_view_join(
    events: DataFrame,
    range_: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Purchases joined to the views of the same user within
    ``range_`` before the purchase. Works on both batch and streaming
    inputs (watermarks are no-ops in batch)."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {range_}")),
        "inner",
    ).select("user_id", "purchase_id", "view_id", "purchase_ts", "view_ts")


def run_purchase_view_join(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    sink_dir: str,
    checkpoint_dir: str,
    range_: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drain ``source_dir`` through the stream-stream join into an
    append-only parquet sink; return the sink contents."""
    src = (
        spark.readStream.schema(schema)
        .option("latestFirst", False)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    q = (
        purchase_view_join(src, range_=range_, watermark=watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink_dir)
