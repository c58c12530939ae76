"""Keyed idempotent merge sink (streaming/merge_sink.py): exactly-once
per key over all history (no watermark horizon), retry idempotence,
and bucket-pruned rewrites."""

from __future__ import annotations

import datetime as dt
import glob
import os
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

from wroclaw_bike_stats_spark.streaming import merge_sink as MS

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _ts(d: int, h: int) -> dt.datetime:
    return dt.datetime(2024, 3, d, h, 0)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "source": str(tmp_path / "source"),
        "store": str(tmp_path / "store"),
        "checkpoint": str(tmp_path / "ckpt"),
    }


def _stage(spark, source_dir, *file_rows):
    for rows in file_rows:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(source_dir)
        time.sleep(1.1)


def test_exactly_once_beyond_any_horizon(spark, dirs):
    """A duplicate arriving DAYS after the original (far past any
    practical watermark) is still suppressed — the property
    dropDuplicatesWithinWatermark cannot give."""
    _stage(
        spark,
        dirs["source"],
        [(1, "u1", _ts(1, 10), 1.0), (2, "u2", _ts(1, 11), 2.0)],
        [(1, "u1", _ts(9, 10), 99.0), (3, "u3", _ts(9, 11), 3.0)],
    )
    got = MS.run_merge_stream(
        spark, dirs["source"], SCHEMA, dirs["store"], dirs["checkpoint"]
    )
    rows = {r.event_id: r.value for r in got.collect()}
    # first-writer wins: event 1 keeps value 1.0 from day 1
    assert rows == {1: 1.0, 2: 2.0, 3: 3.0}


def test_merge_retry_is_idempotent(spark, dirs):
    batch = spark.createDataFrame(
        [(1, "u1", _ts(1, 10), 1.0), (2, "u2", _ts(1, 11), 2.0)], SCHEMA
    )
    MS.merge_upsert_batch(spark, dirs["store"], batch, ["event_id"])
    MS.merge_upsert_batch(spark, dirs["store"], batch, ["event_id"])  # retry
    got = MS.read_store(spark, dirs["store"])
    assert got.count() == 2
    assert sorted(r.event_id for r in got.collect()) == [1, 2]


def test_only_touched_buckets_rewritten(spark, dirs):
    b1 = spark.createDataFrame(
        [(i, f"u{i}", _ts(1, 10), float(i)) for i in range(40)], SCHEMA
    )
    MS.merge_upsert_batch(spark, dirs["store"], b1, ["event_id"], n_buckets=8)
    before = {
        d: sorted(os.listdir(d))
        for d in glob.glob(os.path.join(dirs["store"], "kb=*"))
    }
    assert len(before) > 1  # keys spread over several buckets

    # one new key -> exactly one bucket gains a version
    b2 = spark.createDataFrame([(1000, "x", _ts(2, 10), 0.5)], SCHEMA)
    MS.merge_upsert_batch(spark, dirs["store"], b2, ["event_id"], n_buckets=8)
    after = {
        d: sorted(os.listdir(d))
        for d in glob.glob(os.path.join(dirs["store"], "kb=*"))
    }
    changed = [d for d in before if before[d] != after.get(d)]
    assert len(changed) == 1
    assert MS.read_store(spark, dirs["store"]).count() == 41


def test_store_survives_partial_version(spark, dirs):
    """A version dir without _SUCCESS (crashed write) is invisible."""
    batch = spark.createDataFrame([(1, "u1", _ts(1, 10), 1.0)], SCHEMA)
    MS.merge_upsert_batch(spark, dirs["store"], batch, ["event_id"], n_buckets=2)
    store_before = {r.event_id for r in MS.read_store(spark, dirs["store"]).collect()}
    # simulate a crashed write: bogus v99 with no _SUCCESS
    bucket = glob.glob(os.path.join(dirs["store"], "kb=*"))[0]
    os.makedirs(os.path.join(bucket, "v99"))
    assert {
        r.event_id for r in MS.read_store(spark, dirs["store"]).collect()
    } == store_before
