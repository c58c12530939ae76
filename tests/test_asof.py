"""As-of join contracts: backward/forward nearest-event semantics,
equal-timestamp visibility, left-join nulls, single-shuffle plan."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators.asof import asof_join


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u1", _ts("2024-01-01 09:00:00")),  # before any right row
            (4, "u2", _ts("2024-01-01 11:00:00")),  # equal-ts match
            (5, "u3", _ts("2024-01-01 11:00:00")),  # key with no right rows
        ],
        "event_id bigint, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 100.0),
            ("u1", _ts("2024-01-01 11:30:00"), 200.0),
            ("u2", _ts("2024-01-01 11:00:00"), 300.0),
        ],
        "user_id string, ts timestamp, price double",
    )
    return left, right


def test_backward_asof(frames):
    left, right = frames
    got = {
        r["event_id"]: r["asof_price"]
        for r in asof_join(left, right, right_cols=["price"]).collect()
    }
    assert got == {
        1: 100.0,  # 10:00 → latest ≤ is 09:30
        2: 200.0,  # 12:00 → 11:30
        3: None,  # 09:00 precedes all right rows
        4: 300.0,  # equal timestamps match (>= semantics)
        5: None,  # no right rows for u3
    }


def test_forward_asof(frames):
    left, right = frames
    got = {
        r["event_id"]: r["asof_price"]
        for r in asof_join(
            left, right, right_cols=["price"], direction="forward"
        ).collect()
    }
    assert got == {
        1: 200.0,  # 10:00 → earliest ≥ is 11:30
        2: None,  # nothing after 12:00
        3: 100.0,  # 09:00 → 09:30
        4: 300.0,  # equal match
        5: None,
    }


def test_carry_matched_timestamp(frames):
    left, right = frames
    out = asof_join(left, right, right_cols=["ts"]).collect()
    got = {r["event_id"]: r["asof_ts"] for r in out}
    assert got[2] == _ts("2024-01-01 11:30:00")
    assert got[3] is None


def test_single_shuffle_no_inequality_join(frames):
    left, right = frames
    plan = (
        asof_join(left, right, right_cols=["price"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union + one window: exactly one exchange on the key
    assert plan.count("Exchange hashpartitioning") == 1
