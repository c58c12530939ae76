"""Gap-based sessionization — assign events to sessions that close
after ``gap`` seconds of inactivity per key.

Spark-first: two windows over ONE shuffle on the key —
``lag`` marks session starts (gap exceeded or first event), a running
``sum`` of start-markers numbers the sessions. No state machine, no
UDF; the same semantics as Structured Streaming's
``F.session_window`` for the batch path, but with an explicit
session_id usable in downstream joins.

Skew note: a single hyperactive key serializes into one partition's
window sort — that is inherent to per-key ordering; mitigate upstream
with key-splitting if one key dominates (see functions/salting.py for
the aggregation-side equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Add ``session_col``: 1-based session index per key, a new
    session starting when the gap since the previous event is strictly
    greater than ``gap_seconds`` (or at the key's first event)."""
    w = Window.partitionBy(by).orderBy(on)
    prev = F.lag(F.col(on)).over(w)
    is_start = F.when(
        prev.isNull()
        | (F.unix_timestamp(F.col(on)) - F.unix_timestamp(prev) > gap_seconds),
        1,
    ).otherwise(0)
    running = Window.partitionBy(by).orderBy(on).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(
        session_col, F.sum(is_start).over(running).cast("long")
    )


def session_stats(
    df: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: start/end timestamps, event count, duration
    seconds. One additional aggregation over the sessionized frame."""
    s = sessionize(df, on, by, gap_seconds)
    return s.groupBy(by, "session_id").agg(
        F.min(on).alias("session_start"),
        F.max(on).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max(on)) - F.unix_timestamp(F.min(on))).alias(
            "duration_s"
        ),
    )
