"""Range (interval-containment) join — the second charter-named
operator Spark's API lacks as a first-class join.

``range_join(points, intervals)`` matches every point row to every
interval row whose ``[start, end)`` contains the point (optionally
also keyed by an equality column). The naive formulation is an
inequality join, which Spark executes as BroadcastNestedLoopJoin —
quadratic and a 100 TB killer when neither side broadcasts.

Spark-first formulation — **bin pruning**:

1. Each point maps to bin ``floor(point / bin_width)`` (narrow).
2. Each interval explodes to the bins it spans (narrow; bounded by
   interval length / bin_width).
3. Equi-join on (key?, bin) — a plain shuffle join — then the exact
   containment filter. A point's bin is unique, so each true match
   appears exactly once: no dedup step.

Pick ``bin_width`` near the typical interval length: spans explode to
~1–2 bins and the equi-join prunes everything non-overlapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: str | None = None,
    bin_width: int = 3600,
) -> DataFrame:
    """Inner range join (end-exclusive); see module docstring.

    ``point_col``/``start_col``/``end_col`` must be numeric (e.g.
    epoch seconds) — cast timestamps with ``unix_timestamp`` first.
    Output: all columns of ``points`` + all of ``intervals``.
    """
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col) / bin_width).cast("long")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width).cast("long"),
                F.floor(F.col(end_col) / bin_width).cast("long"),
            )
        ),
    )
    keys = ["_bin"] if by is None else [by, "_bin"]
    return (
        p.join(iv, keys)
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_bin")
    )
