"""S9: catalog tables with declared partitioning — and proof that the
day/year predicates actually prune partitions."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.catalog import (
    create_rides_table,
    table_exists,
)
from wroclaw_bike_stats_spark.schemas import RIDES_SCHEMA


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


FIXTURE = [
    (1, "100", _ts("2024-04-07 10:00:00"), _ts("2024-04-07 10:30:00"), "A", "B", 10, None, None, None, None, 1.2),
    (2, "101", _ts("2025-04-07 13:00:00"), _ts("2025-04-07 13:20:00"), "A", "B", 20, None, None, None, None, 2.5),
    (3, "102", _ts("2025-05-08 13:15:00"), _ts("2025-05-08 13:45:00"), "B", "A", 30, None, None, None, None, 3.0),
]


@pytest.fixture(scope="module")
def rides_table(spark, tmp_path_factory):
    name = "bike_rides_test"
    rides = spark.createDataFrame(FIXTURE, RIDES_SCHEMA)
    create_rides_table(spark, rides, name)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_table_exists_and_roundtrips(spark, rides_table):
    assert table_exists(spark, rides_table)
    df = spark.table(rides_table)
    assert df.count() == 3
    assert set(df.columns) >= set(RIDES_SCHEMA.fieldNames())


def test_year_predicate_prunes_partitions(spark, rides_table):
    """A year filter must hit the partition column, reading only that
    year's files."""
    df = spark.table(rides_table).filter(F.col("ride_year") == 2025)
    assert df.count() == 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pruned scan reads 2 of 3 rows without a post-scan filter on
    # the partition column
    assert "ride_year" in plan.split("PartitionFilters", 1)[1][:200]
