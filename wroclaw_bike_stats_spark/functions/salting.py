"""Skew mitigation utilities.

What does NOT need salting: algebraic aggregates (count/sum/avg/min/
max) — Spark's map-side partial aggregation already reduces each
partition to one row per key before the shuffle, so a hot key costs
one merged row per upstream partition.

What does: (1) per-key DISTINCT counting, where the naive plan ships
every (key, value) occurrence of the hot key to one reducer, and
(2) skewed equi-joins when AQE's skew-join splitting can't apply
(e.g., the skewed side feeds a stream, or partitions are already
post-agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_distinct_skew_safe(
    df: DataFrame, key: str, col: str, out: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count in two well-distributed shuffles.

    Stage 1 groups on (key, col) — the hot key's rows spread across
    reducers by value, so no single reducer sees the whole key.
    Stage 2 counts the now-unique pairs per key (one row per distinct
    value — bounded). Equivalent to ``countDistinct`` with skew
    resilience; Catalyst's Expand-based plan achieves a similar shape
    for single distinct aggregates, but this form stays flat when
    combined with other aggregates or extreme key skew.

    NULL values are excluded, matching ``countDistinct`` (which never
    counts NULL) — without the filter the first groupBy would keep a
    null group and over-count by one.
    """
    return (
        df.select(key, col)
        .filter(F.col(col).isNotNull())
        .groupBy(key, col)
        .agg(F.lit(1))
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("long").alias(out))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join resilient to hot keys on the LEFT side.

    Left rows get a deterministic pseudo-random salt (xxhash64 of the
    whole row — no RNG state, stable across runs/retries); the right
    side is replicated ``n_salts`` times. The join key becomes
    (key, salt), spreading a hot left key over ``n_salts`` reducers at
    the cost of an n_salts× blow-up of the right side — appropriate
    when right is much smaller than the hot key's row count but too
    big (or too streaming) to broadcast.
    """
    l2 = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)),
    )
    r2 = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return l2.join(r2, [key, "_salt"]).drop("_salt")
