"""As-of (nearest-event) join — an operator Spark's DataFrame API
lacks, composed from built-ins (SURVEY §2.5's as-of lookup generalized
to a keyed join; charter-named custom operator).

``asof_join(left, right)`` attaches, to every left row, the value
columns of the LATEST right row of the same key whose ``on`` is
≤ the left row's ``on`` (direction='backward'; 'forward' = earliest
right row ≥). The classic use: join facts to the most recent state
snapshot/quote/price at event time.

Spark-first formulation — union + keyed window, NOT a row-at-a-time
UDF and NOT an inequality join:

1. Right rows become skeleton rows carrying their value columns;
   left rows carry nulls there.
2. One window per key ordered by (on, side) takes
   ``last(value, ignorenulls=True)`` over the unbounded-preceding
   frame — each left row sees exactly the latest right value at or
   before it (ties: right sorts before left, so an equal-timestamp
   right row IS visible, matching DuckDB ASOF JOIN's ``>=``).
3. Keep only left rows.

Cost: ONE shuffle on the key (same as any keyed join) + a sort within
partitions — no quadratic inequality join, no per-key driver loop.
Skewed keys behave like any window (AQE/salting applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join; see module docstring.

    ``right_cols`` — right columns to carry (default: all except
    ``on``/``by``; pass ``[on]`` to carry the matched timestamp).
    Unmatched left rows get nulls (left-join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]

    right_types = dict(right.dtypes)
    carried = [(c, f"{prefix}{c}") for c in right_cols]

    l2 = left.withColumn("_side", F.lit(1))
    for c, alias in carried:
        l2 = l2.withColumn(alias, F.lit(None).cast(right_types[c]))

    r2 = right.select(
        F.col(by),
        F.col(on),
        *[F.col(c).alias(alias) for c, alias in carried],
    ).withColumn("_side", F.lit(0))
    left_types = dict(left.dtypes)
    for c in left.columns:
        if c not in (by, on):
            r2 = r2.withColumn(c, F.lit(None).cast(left_types[c]))

    u = l2.unionByName(r2.select(*l2.columns))

    if direction == "backward":
        order = [F.col(on).asc(), F.col("_side").asc()]
    else:
        order = [F.col(on).desc(), F.col("_side").asc()]
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    out = u.select(
        *[c for c in left.columns],
        "_side",
        *[
            F.last(alias, ignorenulls=True).over(w).alias(alias)
            for _, alias in carried
        ],
    )
    return out.filter(F.col("_side") == 1).drop("_side")
