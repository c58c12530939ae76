"""Table maintenance: small-file compaction for partitioned layouts.

Streaming sinks and incremental appends (streaming/status_stream.py,
plans/incremental.py) accrete files per micro-batch/refresh; at 100 TB
a date-partitioned events table quickly reaches millions of tiny
files, and scan planning + task scheduling start to dominate query
time. Compaction rewrites fragmented partitions into right-sized
files.

Scale shape — the two things that matter at 1000 executors:

- **Only fragmented partitions are rewritten.** The fragmentation scan
  is one metadata-cheap aggregation (input_file_name → per-partition
  file/row counts, a tiny result); partitions already at target are
  never read or written. Compaction cost is proportional to the
  fragmented fraction, not the table size.
- **Dynamic partition overwrite.** Rewrites replace only the selected
  partitions' files; concurrent readers of other partitions are
  untouched. The write is sized by ``maxRecordsPerFile`` +
  ``repartition(partition_col)`` so each partition lands as few,
  full files (AQE coalesces the shuffle to match).

No reference counterpart (the reference's SQLite store has no file
layout); this is engine-operational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_file_stats(
    spark: SparkSession, path: str, partition_col: str
) -> DataFrame:
    """Per-partition file and row counts — the fragmentation report.

    One scan that aggregates to one row per partition; with parquet
    this reads only the partition column (pruned schema) plus file
    provenance.
    """
    df = spark.read.parquet(path)
    return (
        df.select(partition_col, F.input_file_name().alias("_file"))
        .groupBy(partition_col)
        .agg(
            F.countDistinct("_file").cast("long").alias("n_files"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


def fragmented_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    target_rows_per_file: int,
) -> list:
    """Partition values whose file count exceeds what the row count
    justifies at ``target_rows_per_file`` (ceiling)."""
    stats = partition_file_stats(spark, path, partition_col)
    ideal = F.ceil(F.col("n_rows") / F.lit(target_rows_per_file))
    frag = stats.filter(F.col("n_files") > F.greatest(ideal, F.lit(1)))
    return [r[partition_col] for r in frag.collect()]


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_col: str,
    target_rows_per_file: int = 1_000_000,
) -> list:
    """Rewrite fragmented partitions of a partitioned parquet table
    into files of ~``target_rows_per_file`` rows. Returns the list of
    partition values rewritten (empty = nothing fragmented).

    Untouched partitions' files are left byte-identical (dynamic
    partition overwrite replaces only the rewritten partitions).
    """
    todo = fragmented_partitions(
        spark, path, partition_col, target_rows_per_file
    )
    if not todo:
        return []
    df = spark.read.parquet(path)
    # The IN-list is tiny (collected partition values) → partition
    # pruning on the read; repartition on the partition column so each
    # partition's rows converge to one task's writer (AQE may coalesce
    # further), maxRecordsPerFile caps file size from above.
    (
        df.filter(F.col(partition_col).isin(todo))
        .repartition(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )
    return sorted(str(v) for v in todo)
