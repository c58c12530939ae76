"""Effective-parallelism floor for heavy narrow stages.

A single-file (or single-row-group) input plans as ONE scan task, so
a narrow heavy stage — Arrow featurization, per-doc shingle hashing,
explode + partial aggregation — executes on one core regardless of
cluster size (guide §6: input split size; the r14 SCALING
re-attribution of the repetition filter found exactly this floor and
added ``min_parallelism`` there). ``ensure_parallelism`` generalizes
that fix: when the planned scan parallelism of ``df`` is below half
the session's default parallelism, round-robin repartition it up;
otherwise return it UNCHANGED — at production scale (many files /
row groups) this is a no-op, so it is a data-adaptive floor, not a
local-mode constant.

The probe (``df.rdd.getNumPartitions()``) is driver-side plan
compilation only — no job runs. The repartition is the classic
trade: one extra exchange of the (small, under-parallel) input buys
N-way parallelism for the expensive per-row work that follows. Apply
it ONLY where that work measurably dominates (the call sites cite
their numbers); for cheap narrow stages the exchange costs more than
it saves.

Only integer-count / per-row-deterministic paths may use this:
repartitioning changes float partial-aggregation order, so keep it
away from float-sum pipelines whose oracles compare rounded sums of
many terms (the embedding-moments family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_parallelism"]


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Return ``df`` repartitioned to ``min_parts`` (default: the
    session's ``defaultParallelism``) when its planned partitioning is
    below HALF that target; unchanged otherwise. See module docstring."""
    spark = df.sparkSession
    target = (
        min_parts
        if min_parts is not None
        else spark.sparkContext.defaultParallelism
    )
    if target <= 1:
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - never fail a plan for the probe
        return df
    if n >= max(1, target // 2):
        return df
    return df.repartition(target)
