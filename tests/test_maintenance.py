"""Small-file compaction (operators/maintenance.py): fragmented
partitions get rewritten to right-sized files, healthy partitions are
left byte-identical, and row content is preserved exactly."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import maintenance as M


def _files(path, part):
    return sorted(
        p for p in glob.glob(os.path.join(path, part, "*.parquet"))
    )


def _write_fixture(spark, path):
    # day=1: fragmented (8 files for 80 rows); day=2: healthy (1 file)
    d1 = spark.range(80).select(
        F.lit("2024-01-01").alias("day"),
        F.col("id").alias("v"),
    )
    d1.repartition(8).write.mode("append").partitionBy("day").parquet(path)
    d2 = spark.range(50).select(
        F.lit("2024-01-02").alias("day"),
        (F.col("id") + 1000).alias("v"),
    )
    d2.coalesce(1).write.mode("append").partitionBy("day").parquet(path)


def test_partition_file_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_fixture(spark, path)
    stats = {
        str(r.day): (r.n_files, r.n_rows)
        for r in M.partition_file_stats(spark, path, "day").collect()
    }
    assert stats["2024-01-01"] == (8, 80)
    assert stats["2024-01-02"] == (1, 50)


def test_compact_rewrites_only_fragmented(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_fixture(spark, path)
    before_rows = sorted(
        (r.day, r.v) for r in spark.read.parquet(path).collect()
    )
    healthy_before = _files(path, "day=2024-01-02")
    healthy_mtimes = [os.path.getmtime(f) for f in healthy_before]

    done = M.compact_partitioned(
        spark, path, "day", target_rows_per_file=100
    )
    assert done == ["2024-01-01"]

    # fragmented partition collapsed to a single file (80 rows < 100)
    assert len(_files(path, "day=2024-01-01")) == 1
    # healthy partition untouched: same files, same mtimes
    assert _files(path, "day=2024-01-02") == healthy_before
    assert [os.path.getmtime(f) for f in healthy_before] == healthy_mtimes
    # content identical
    after_rows = sorted(
        (r.day, r.v) for r in spark.read.parquet(path).collect()
    )
    assert after_rows == before_rows


def test_compact_noop_when_healthy(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_fixture(spark, path)
    M.compact_partitioned(spark, path, "day", target_rows_per_file=100)
    files = _files(path, "day=2024-01-01") + _files(path, "day=2024-01-02")
    mtimes = [os.path.getmtime(f) for f in files]
    assert (
        M.compact_partitioned(spark, path, "day", target_rows_per_file=100)
        == []
    )
    assert [os.path.getmtime(f) for f in files] == mtimes


def test_compact_splits_oversize(spark, tmp_path):
    """maxRecordsPerFile caps from above: 80 rows at target 30 ->
    ceil(80/30)=3 files."""
    path = str(tmp_path / "t")
    _write_fixture(spark, path)
    done = M.compact_partitioned(
        spark, path, "day", target_rows_per_file=30
    )
    assert "2024-01-01" in done
    n1 = len(_files(path, "day=2024-01-01"))
    assert 3 <= n1 <= 4  # ceil(80/30) with writer rounding
    rows = spark.read.parquet(path).filter("day = '2024-01-01'").count()
    assert rows == 80
