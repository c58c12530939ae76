"""Stream-stream join ≡ batch join over the same files, plus the
state-eviction contract (streaming/stream_join.py)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wroclaw_bike_stats_spark.streaming.stream_join import (
    purchase_view_join,
    run_purchase_view_join,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


# file1: u1 views at 10:00/10:40, purchase 10:50 (matches both);
#        u2 view 10:10 — its purchase comes in file2.
FILE1 = [
    (1, "u1", "view", _ts(10, 0)),
    (2, "u1", "view", _ts(10, 40)),
    (3, "u1", "purchase", _ts(10, 50)),
    (4, "u2", "view", _ts(10, 10)),
]
# file2: u2 purchase 10:55 — cross-batch match against the buffered
#        view; u1 purchase 12:00 — outside the 1h range of any view.
FILE2 = [
    (5, "u2", "purchase", _ts(10, 55)),
    (6, "u1", "purchase", _ts(12, 0)),
]


def _stage(spark, src, *files):
    for rows in files:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)


def test_stream_join_matches_batch(spark, tmp_path):
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    _stage(spark, src, FILE1, FILE2)
    got = run_purchase_view_join(spark, src, SCHEMA, sink, ckpt)
    got_rows = sorted((r.purchase_id, r.view_id) for r in got.collect())

    batch = purchase_view_join(spark.createDataFrame(FILE1 + FILE2, SCHEMA))
    expect = sorted((r.purchase_id, r.view_id) for r in batch.collect())

    assert got_rows == expect
    assert (5, 4) in got_rows  # cross-batch match via buffered state
    assert not any(p == 6 for p, _ in got_rows)  # out-of-range purchase
    assert len(got_rows) == 3  # (3,1), (3,2), (5,4)


def test_stream_join_evicts_expired_state(spark, tmp_path):
    """State eviction needs the GLOBAL watermark — the MIN over both
    watermarked sides — to pass a row's horizon. Advance BOTH sides
    far ahead, then deliver a purchase whose claimed ts is in range of
    the old view: the view state is gone and the late purchase is
    dropped, so no match may be emitted."""
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    f1 = [(1, "u1", "view", _ts(10, 0))]
    # advance BOTH per-side watermarks to 19:00 (distinct users — no
    # matches among themselves: u8 has no purchase, u9 no view)
    f2 = [(2, "u8", "view", _ts(20, 0)), (3, "u9", "purchase", _ts(20, 0))]
    # filler batch: eviction runs here (watermark updates lag a batch,
    # and matching-before-eviction means a late row in the eviction
    # batch itself would still match — pinned behavior)
    f3 = [(4, "u7", "view", _ts(20, 30))]
    # purchase CLAIMS ts 10:30 (in range of u1's view) but ARRIVES
    # after the eviction batch → the view is gone, no match
    f4 = [(5, "u1", "purchase", _ts(10, 30))]
    _stage(spark, src, f1, f2, f3, f4)
    got = run_purchase_view_join(spark, src, SCHEMA, sink, ckpt)
    assert got.count() == 0
