"""Range-join contracts: exact containment, end-exclusivity, bin-width
independence, and the no-nested-loop plan guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 3600), (3, "a", 7200), (4, "b", 100), (5, "a", 99)],
        "pid bigint, k string, pt bigint",
    )
    intervals = spark.createDataFrame(
        [(10, "a", 100, 3600), (11, "a", 3600, 7300), (12, "b", 0, 50)],
        "iid bigint, k string, s bigint, e bigint",
    )
    return points, intervals


def _pairs(points, intervals, **kw):
    return {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "pt", "s", "e", **kw).collect()
    }


def test_containment_and_end_exclusive(frames):
    points, intervals = frames
    got = _pairs(points, intervals, by="k")
    assert got == {
        (1, 10),  # 100 ∈ [100, 3600)
        (2, 11),  # 3600 ∈ [3600, 7300) but NOT in [100, 3600) (end-exclusive)
        (3, 11),  # 7200 ∈ [3600, 7300)
        # 4: b@100 not in [0,50); 5: a@99 precedes every a-interval
    }


def test_bin_width_invariance(frames):
    points, intervals = frames
    for w in (10, 1000, 3600, 100000):
        assert _pairs(points, intervals, by="k", bin_width=w) == _pairs(
            points, intervals, by="k"
        )


def test_unkeyed_range_join(frames):
    points, intervals = frames
    got = _pairs(points, intervals)  # no key → pure containment
    assert (4, 10) in got  # b-point inside a-interval now matches


def test_no_nested_loop_join(frames):
    points, intervals = frames
    plan = (
        range_join(points, intervals, "pt", "s", "e", by="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
