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

The probe is two-step and JOB-FREE by construction. First, the
OPTIMIZED LOGICAL plan (driver-side Catalyst work, no execution) is
scanned for shuffle-inducing operators (join, aggregate, window,
repartition, sort, …): if one is present, the frame's parallelism is
already governed by shuffle partitions / AQE and the fan-out is
skipped — crucially, probing such a frame with
``df.rdd.getNumPartitions()`` would MATERIALIZE every upstream AQE
query stage (run real jobs) at plan-construction time, which broke
the curate plan's zero-jobs-until-action contract and silently
executed upstream pipelines twice (caught by
``test_curate_full_is_one_lazy_plan``). Only for narrow scan-rooted
plans — where ``.rdd`` compiles without running anything — is the
partition count probed. The repartition is the classic trade: one
extra exchange of the (small, under-parallel) input buys N-way
parallelism for the expensive per-row work that follows. Apply it
ONLY where that work measurably dominates (the call sites cite
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

# Optimized-logical-plan node names that put an exchange (or a
# broadcast/limit barrier) in the physical plan. Their presence means
# (a) parallelism downstream of the shuffle is already governed by
# spark.sql.shuffle.partitions / AQE, so the fan-out is unnecessary,
# and (b) an ``.rdd`` probe would eagerly materialize the AQE query
# stages — run real jobs — at plan-construction time. Substring match
# on the plan text is deliberately conservative: a false positive
# (e.g. a column literally named "JoinDate") only skips an optional
# optimization.
_WIDE_MARKERS = (
    "Join",
    "Aggregate",
    "Window",
    "Sort",
    "Repartition",
    "Deduplicate",
    "Except",
    "Intersect",
    "Limit",
    "CoGroup",
    "FlatMapGroups",
    "MapGroups",
    "Union",
)


def _is_narrow_scan_plan(df: DataFrame) -> bool:
    """True iff ``df``'s optimized logical plan contains no
    shuffle/barrier-inducing operator — i.e. it is a narrow chain
    (project/filter/generate/UDF) over its sources, for which an
    ``.rdd`` probe compiles but never runs a job."""
    try:
        text = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # noqa: BLE001 - never fail a plan for the probe
        return False
    return not any(m in text for m in _WIDE_MARKERS)


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Return ``df`` repartitioned to ``min_parts`` (default: the
    session's ``defaultParallelism``) when it is a narrow scan-rooted
    plan whose planned partitioning is below HALF that target;
    unchanged otherwise. Job-free. See module docstring."""
    spark = df.sparkSession
    target = (
        min_parts
        if min_parts is not None
        else spark.sparkContext.defaultParallelism
    )
    if target <= 1:
        return df
    if not _is_narrow_scan_plan(df):
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - never fail a plan for the probe
        return df
    if n >= max(1, target // 2):
        return df
    return df.repartition(target)
