"""Watermarked streaming windows (streaming/windowed_agg.py):

- tumbling rollup: a drained stream over staged files equals the batch
  plan over the rows the watermark contract admits — late-but-open
  rows folded in, late-behind-watermark rows dropped, never-closed
  windows unemitted;
- session windows: native ``F.session_window`` (batch) bridges exactly
  to ``operators.sessionize`` (session_end == last_ts + gap), and the
  streaming drain emits the watermark-closed sessions.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wroclaw_bike_stats_spark.operators.sessionize import session_stats
from wroclaw_bike_stats_spark.streaming.windowed_agg import (
    run_session_stream,
    run_tumbling_stream,
    session_window_stats,
    windowed_event_counts,
)

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, h, m)


def _stage(spark, source_dir: str, *file_rows):
    """Write each row-group as one parquet file, oldest mtime first, so
    maxFilesPerTrigger=1 replays them as distinct micro-batches."""
    for rows in file_rows:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(source_dir)
        time.sleep(1.1)  # distinct mtimes → deterministic file order


FILE1 = [
    ("u1", "view", _ts(10, 0), 1.0),
    ("u2", "view", _ts(10, 30), 2.0),
    ("u1", "purchase", _ts(12, 5), 3.0),  # watermark → 11:05 after this batch
]
FILE2 = [
    # behind max-ts but window [11,12) still open → folded in
    ("u2", "purchase", _ts(11, 50), 4.0),
    # advances watermark to 13:00 → closes [11,12) and [12,13); the
    # [10,11) window is evicted+emitted at THIS batch's end (eviction
    # runs after the batch folds its input, using the 11:05 watermark)
    ("u1", "view", _ts(14, 0), 5.0),
]
FILE3 = [
    # [10,11) state was evicted at the end of the previous batch →
    # this row is DROPPED (numRowsDroppedByWatermark), not re-emitted
    ("u3", "view", _ts(10, 45), 9.9),
]


def test_tumbling_stream_late_data_contract(spark, tmp_path):
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    _stage(spark, src, FILE1, FILE2, FILE3)
    got = run_tumbling_stream(
        spark, src, SCHEMA, sink, ckpt, window="1 hour", watermark="1 hour"
    )
    rows = sorted(
        (r.bucket_start.hour, r.event_type, r.n_events, r.total_value)
        for r in got.collect()
    )
    assert rows == [
        (10, "view", 2, 3.0),  # u3's too-late row dropped, u1+u2 kept
        (11, "purchase", 1, 4.0),  # late-but-open row admitted
        (12, "purchase", 1, 3.0),
        # hour-14 window never closed by the final 13:00 watermark
    ]

    # Batch plan over the admitted rows == streaming emission for the
    # closed windows (shared expression, shared semantics).
    admitted = [r for r in FILE1 + FILE2 if r[2].hour < 14]
    batch = windowed_event_counts(
        spark.createDataFrame(admitted, SCHEMA), window="1 hour"
    )
    brows = sorted(
        (r.bucket_start.hour, r.event_type, r.n_events, r.total_value)
        for r in batch.collect()
    )
    assert brows == rows


def test_tumbling_stream_redrain_is_incremental(spark, tmp_path):
    """A second drain with no new files emits nothing new."""
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    _stage(spark, src, FILE1)
    first = run_tumbling_stream(
        spark, src, SCHEMA, sink, ckpt, window="1 hour", watermark="1 hour"
    ).count()
    again = run_tumbling_stream(
        spark, src, SCHEMA, sink, ckpt, window="1 hour", watermark="1 hour"
    ).count()
    assert again == first


SESS_ROWS = [
    # u1: two sessions (gap 30 min): [10:00, 10:20] and [11:30]
    ("u1", "view", _ts(10, 0), 1.0),
    ("u1", "view", _ts(10, 20), 2.0),
    ("u1", "purchase", _ts(11, 30), 3.0),
    # u2: one session
    ("u2", "view", _ts(10, 5), 4.0),
    ("u2", "view", _ts(10, 25), 5.0),
]


def test_session_window_bridges_to_sessionize(spark):
    """F.session_window (batch) ≡ operators.sessionize: same session
    boundaries, session_end shifted by exactly the gap."""
    df = spark.createDataFrame(SESS_ROWS, SCHEMA)
    native = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in session_window_stats(df, gap="30 minutes").collect()
    }
    ours = session_stats(df, gap_seconds=1800)
    assert len(native) == ours.count() == 3
    for r in ours.collect():
        end, n = native[(r.user_id, r.session_start)]
        assert n == r.n_events
        assert end == r.session_end + dt.timedelta(minutes=30)


def test_session_stream_emits_closed_sessions(spark, tmp_path):
    """Sessions whose (last_ts + gap) the final watermark passed are
    emitted; the still-open tail session is not."""
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    closer = [("u9", "view", _ts(15, 0), 0.0)]  # watermark → 14:00
    _stage(spark, src, SESS_ROWS, closer)
    got = run_session_stream(
        spark, src, SCHEMA, sink, ckpt, gap="30 minutes", watermark="1 hour"
    )
    rows = sorted(
        (r.user_id, r.session_start.strftime("%H:%M"), r.n_events)
        for r in got.collect()
    )
    # all three SESS_ROWS sessions end (+gap) before 14:00 → emitted;
    # u9's own session (open until 15:30+watermark) is not.
    assert rows == [("u1", "10:00", 2), ("u1", "11:30", 1), ("u2", "10:05", 2)]
