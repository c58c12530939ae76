"""Session-scoped registry for scratch-persisted DataFrames.

Iterative and multi-consumer operators (shingle tables, LSH candidate
sets) persist intermediates that stay useful across REPEAT runs of
the same query (Spark's cache is plan-keyed, so a rebuilt identical
plan reuses them) but are dead weight once a session moves on.
Leaking one persist per call forever is the classic resident-service
failure mode — this registry gives them a lifecycle: each build
registers its persisted frames, and ``release()`` (invoked by a
harness at section boundaries — the bench calls it via
``release_shared()`` after its run; a resident service calls it when
a corpus version is retired) unpersists everything. Scratch growth
within a section is bounded by the number of DISTINCT query plans,
not by call count: re-persisting an identical plan shares the same
CacheManager entry.

Unpersisting is always safe for ``persist()`` frames (lineage
recomputes); checkpoint blocks need ``release_rdd_ids`` below and are
NOT safe to free while any consumer may still run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCRATCH: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed frame for release."""
    _SCRATCH.append(df)
    return df


def persist(df: DataFrame) -> DataFrame:
    """Persist a frame and register it for release."""
    return track(df.persist())


def release() -> None:
    """Unpersist every registered scratch frame."""
    while _SCRATCH:
        try:
            _SCRATCH.pop().unpersist()
        except Exception:  # noqa: BLE001 - session may already be gone
            pass


def _persistent_rdd_ids(spark) -> set:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def checkpoint_tracked(df: DataFrame) -> tuple[DataFrame, set]:
    """``localCheckpoint`` plus the ids of the RDD blocks it pinned.

    ``DataFrame.unpersist()`` is a NO-OP for checkpoint blocks (it
    only uncaches CacheManager entries, and a checkpoint is not one),
    so iterative operators that want to free superseded rounds must
    release at the RDD level — keep the returned ids and pass them to
    ``release_rdd_ids`` once nothing can reference the frame again.

    The id is read DIRECTLY off the checkpointed plan: a
    ``localCheckpoint`` Dataset is backed by a ``LogicalRDD`` whose
    ``rdd`` is exactly the one persisted block — so RDDs registered by
    CONCURRENT queries on the same session (e.g. another thread's
    cache materializing mid-job) are never mis-attributed and never
    force-released. A before/after diff of ``getPersistentRDDs`` is
    kept only as a fallback for plan shapes where the accessor is
    unavailable; only that fallback carries the old caveat that
    persisted inputs should be touched once before the first tracked
    checkpoint.
    """
    spark = df.sparkSession
    before = _persistent_rdd_ids(spark)
    ck = df.localCheckpoint()
    try:
        # LogicalRDD.rdd() — the one RDD localCheckpoint persisted.
        ids = {ck._jdf.queryExecution().analyzed().rdd().id()}
    except Exception:  # noqa: BLE001 - e.g. a future plan rewrite
        ids = _persistent_rdd_ids(spark) - before
    return ck, ids


def release_rdd_ids(spark, ids) -> None:
    """Truly free checkpoint blocks by JVM-level RDD unpersist.

    DANGER: a released checkpoint frame is unusable (its lineage was
    cut at checkpoint time) — only call for frames no consumer can
    still touch."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        r = m.get(i)
        if r is not None:
            try:
                r.unpersist()
            except Exception:  # noqa: BLE001
                pass
