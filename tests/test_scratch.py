"""Scratch/checkpoint lifecycle: checkpoint_tracked must attribute
EXACTLY the checkpoint's own RDD — a concurrent query's cache that
happens to materialize around the checkpoint job must never land in
the returned id set and never be force-released (ADVICE r04 medium:
the old before/after getPersistentRDDs diff mis-attributed foreign
RDDs in the multi-query resident-service scenario)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import scratch


def _persistent_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_checkpoint_tracked_returns_only_own_rdd(spark):
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    # A "foreign" persisted frame registered but NOT yet materialized:
    # with the old diff, its cache RDD could register during the
    # checkpoint job and be mis-attributed.
    foreign = spark.range(500).withColumn("w", F.lit(1)).persist()
    try:
        ck, ids = scratch.checkpoint_tracked(df)
        assert len(ids) == 1, f"expected exactly the checkpoint id, got {ids}"
        # materialize the foreign cache AFTER the checkpoint — its RDD id
        # must not be in the tracked set
        foreign.count()
        foreign_ids = _persistent_ids(spark) - ids
        assert ids.isdisjoint(foreign_ids - ids)
        # releasing the tracked ids must not evict the foreign cache
        scratch.release_rdd_ids(spark, ids)
        remaining = _persistent_ids(spark)
        assert ids.isdisjoint(remaining), "checkpoint blocks not freed"
        assert foreign.count() == 500  # still usable
    finally:
        foreign.unpersist()


def test_checkpoint_tracked_ids_are_releasable(spark):
    df = spark.range(100).withColumn("v", F.col("id") + 1)
    ck, ids = scratch.checkpoint_tracked(df)
    assert ck.count() == 100
    before = _persistent_ids(spark)
    assert ids <= before
    scratch.release_rdd_ids(spark, ids)
    assert ids.isdisjoint(_persistent_ids(spark))


def test_checkpoint_tracked_concurrent_cache_materializing_in_flight(spark):
    """The sharpest form of the hazard: the foreign cache's FIRST
    action runs while the checkpoint job is in flight (simulated by
    materializing between the before-snapshot and the checkpoint via
    a second thread is inherently racy on local[N]; instead we pin the
    direct-tracking property — the returned set is exactly one id and
    it is the checkpoint's, independent of what else registered)."""
    a = spark.range(2000).withColumn("x", F.lit(1)).persist()
    b = spark.range(3000).withColumn("y", F.lit(2)).persist()
    try:
        a.count()  # a registered before
        ck, ids = scratch.checkpoint_tracked(
            spark.range(4000).withColumn("z", F.col("id") % 7)
        )
        b.count()  # b registered after
        assert len(ids) == 1
        scratch.release_rdd_ids(spark, ids)
        # both foreign caches survive a release of the tracked ids
        assert a.count() == 2000 and b.count() == 3000
        assert len(_persistent_ids(spark)) >= 2
    finally:
        a.unpersist()
        b.unpersist()
