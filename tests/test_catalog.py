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


# --- bucketed co-located joins -------------------------------------------


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    from wroclaw_bike_stats_spark.catalog import create_bucketed_table

    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    create_bucketed_table(
        spark, orders, "orders_bkt", "o_custkey", 8,
        sort_cols=["o_custkey"], path=str(base / "orders"),
    )
    create_bucketed_table(
        spark, cust, "customer_bkt", "c_custkey", 8,
        sort_cols=["c_custkey"], path=str(base / "customer"),
    )
    yield "orders_bkt", "customer_bkt"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """Same key, same bucket count -> the join plan contains ZERO
    Exchange: each task zips matching bucket files. This is the layout
    that makes repeated 100 TB fact-fact joins affordable."""
    o_name, c_name = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(o_name).join(
            spark.table(c_name),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # correctness: same rows as the plain (shuffled) join
        plain = (
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .join(
                spark.read.parquet("/root/testdata/sf0.001/customer.parquet"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also rides the layout: partial
    and final agg collapse into one stage, no shuffle."""
    o_name, _ = bucketed_pair
    agg = spark.table(o_name).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
