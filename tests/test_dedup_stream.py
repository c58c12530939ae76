"""Streaming exact dedup (streaming/dedup_stream.py): watermark-
bounded ``dropDuplicatesWithinWatermark`` equals batch
``dropDuplicates`` for duplicates inside the watermark window —
including a duplicate that arrives in a LATER micro-batch than its
original — and state does not retain keys behind the watermark."""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wroclaw_bike_stats_spark.streaming.dedup_stream import run_dedup_stream

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, h, m)


FILE1 = [
    (1, "u1", _ts(10, 0), 1.0),
    (2, "u2", _ts(10, 5), 2.0),
    (1, "u1", _ts(10, 0), 1.0),  # same-batch duplicate
]
FILE2 = [
    (2, "u2", _ts(10, 5), 2.0),  # cross-batch duplicate, inside watermark
    (3, "u3", _ts(10, 30), 3.0),
]


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "source": str(tmp_path / "source"),
        "sink": str(tmp_path / "sink"),
        "checkpoint": str(tmp_path / "checkpoint"),
    }
    return d


def _stage(spark, source_dir, *file_rows):
    for rows in file_rows:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(source_dir)
        time.sleep(1.1)  # distinct mtimes → deterministic batch order


def test_stream_dedup_matches_batch(spark, dirs):
    _stage(spark, dirs["source"], FILE1, FILE2)
    got = run_dedup_stream(
        spark, dirs["source"], SCHEMA, dirs["sink"], dirs["checkpoint"]
    )
    batch = (
        spark.read.schema(SCHEMA)
        .parquet(dirs["source"])
        .dropDuplicates(["event_id"])
    )
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in batch.collect()
    ) == [1, 2, 3]


def test_stream_dedup_is_incremental(spark, dirs):
    """A second drain over one new file must process only that file
    (checkpoint) and still suppress duplicates of in-window keys seen
    in the first drain."""
    _stage(spark, dirs["source"], FILE1)
    run_dedup_stream(spark, dirs["source"], SCHEMA, dirs["sink"], dirs["checkpoint"])
    _stage(spark, dirs["source"], FILE2)
    got = run_dedup_stream(
        spark, dirs["source"], SCHEMA, dirs["sink"], dirs["checkpoint"]
    )
    assert sorted(r.event_id for r in got.collect()) == [1, 2, 3]
