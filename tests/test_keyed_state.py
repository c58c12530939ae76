"""applyInPandasWithState change detector ≡ batch lag() diff, with
changes straddling micro-batch boundaries (streaming/keyed_state.py)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wroclaw_bike_stats_spark.streaming.keyed_state import stream_status_changes

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _ts(m):
    return dt.datetime(2024, 3, 1, 10, m)


# u1 changes inside file1, AND across the file boundary (purchase→view);
# u2 never changes; u3 exists only in file2 (first event → no emission).
FILE1 = [
    (1, "u1", "view", _ts(0)),
    (2, "u1", "purchase", _ts(5)),
    (3, "u2", "view", _ts(6)),
    (4, "u2", "view", _ts(8)),
]
FILE2 = [
    (5, "u1", "view", _ts(10)),
    (6, "u2", "view", _ts(11)),
    (7, "u3", "error", _ts(12)),
    (8, "u3", "view", _ts(13)),
]


def _batch_lag_diff(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        df.select(
            "event_id",
            "user_id",
            F.col("event_type").alias("curr_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull()
                & (F.col("prev_type") != F.col("curr_type")))
        .select("event_id", "user_id", "prev_type", "curr_type")
    )


def test_keyed_state_matches_batch_lag(spark, tmp_path):
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    for rows in (FILE1, FILE2):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    got = stream_status_changes(spark, src, SCHEMA, sink, ckpt)
    got_rows = sorted(
        (r.event_id, r.user_id, r.prev_type, r.curr_type) for r in got.collect()
    )
    expect = sorted(tuple(r) for r in _batch_lag_diff(spark, FILE1 + FILE2).collect())
    assert got_rows == expect
    # the boundary-straddling change is present: u1 purchase→view at id 5
    assert (5, "u1", "purchase", "view") in got_rows


def test_keyed_state_redrain_emits_nothing_new(spark, tmp_path):
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(FILE1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    n1 = stream_status_changes(spark, src, SCHEMA, sink, ckpt).count()
    n2 = stream_status_changes(spark, src, SCHEMA, sink, ckpt).count()
    assert n1 == n2 == 1  # u1 view→purchase only
