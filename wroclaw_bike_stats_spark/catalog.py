"""Table DDL + partitioned-layout management (SURVEY.md §2.1 S9,
§4.3 physical design).

The reference's DDL is two CREATE TABLE statements plus a unique index
(reference: src/data_load_sqlite.py:190–215, src/bike_status_changes.py:
173–187). Spark-first, a "table" is a catalog entry over a partitioned
parquet (or Delta) layout:

- ``bike_rides``          partitioned by ``ride_year`` — the year and
  date predicates of every metrics query (O10/O11, A13/A14) prune
  partitions instead of scanning history; a single-day query touches
  one partition.
- ``bike_status_changes`` partitioned by ``event_date`` — the same
  pruning for the event-log range views.

The uid unique index has no Spark equivalent; its *semantics* (S8
first-writer-wins) live in ``operators.upsert`` and are enforced at
write time, not by the store. On Delta, add a MERGE and a constraint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RIDES_TABLE = "bike_rides"
EVENTS_TABLE = "bike_status_changes"


def create_rides_table(
    spark: SparkSession, rides: DataFrame, name: str = RIDES_TABLE
) -> None:
    """Materialize the rides table partitioned by ride year
    (SURVEY §4.3: the year/day filters of every metric query become
    partition pruning)."""
    (
        rides.withColumn("ride_year", F.year("start_time"))
        .write.mode("overwrite")
        .partitionBy("ride_year")
        .format("parquet")
        .saveAsTable(name)
    )


def create_events_table(
    spark: SparkSession, events: DataFrame, name: str = EVENTS_TABLE
) -> None:
    """Materialize the status-change event log partitioned by event
    date (append-mode friendly: each streaming batch adds files only
    to the dates it touches)."""
    (
        events.withColumn(
            "event_date", F.to_date(F.substring("timestamp", 1, 10))
        )
        .write.mode("append")
        .partitionBy("event_date")
        .format("parquet")
        .saveAsTable(name)
    )


def create_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Materialize ``df`` hash-bucketed (and optionally sorted) by the
    join key.

    This is the co-located-join layout for 100 TB fact tables: two
    tables bucketed by the same key into the same bucket count join
    with ZERO Exchange — each task reads matching bucket files from
    both sides. The shuffle is paid once at write time and amortized
    over every subsequent join/aggregation on that key; with
    ``sort_cols`` the merge-sort is pre-paid too. Spark's native
    parquet bucketing (hash(key) mod n file layout + catalog metadata)
    — no Hive dependency.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)
