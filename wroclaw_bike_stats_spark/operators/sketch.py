"""Count-min sketch over a term stream as PURE DataFrame aggregation
(Cormode & Muthukrishnan 2005, "An improved data stream summary: the
count-min sketch and its applications").

Why a CMS when exact `term_document_frequency` exists: at 100 TB the
exact per-term count table is itself corpus-vocabulary-sized (billions
of rows through a shuffle); the CMS is a FIXED d×w cell table — the
shuffle reduces d·|tokens| cells into d·w rows with map-side partial
combine, so the result is a constant-size, mergeable summary (two
corpus shards' sketches add cell-wise — the same monoid pattern as the
bigram-LM count tables).

Guarantees (classic): estimate ≥ true count always (only collisions
inflate, never deflate); estimate ≤ true + (e/w)·N with probability
≥ 1−e^−d over the hash draw — with the seed fixed (xxhash64 row
seeds) the bound is a deterministic, machine-checkable property of
the corpus, which is exactly what the driver contract gate asserts.

Engine shapes: the build is one narrow token pass + ONE groupBy
shuffle of (row, bucket) cells; estimation joins the probe terms'
cells against the (tiny, broadcast) sketch and takes the per-term min
across rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators.text import tokens

__all__ = ["cms_build", "cms_estimate", "cms_upper_bound"]


def _term_stream(df: DataFrame, text_col: str):
    """One term per row: lowercased whitespace tokens; NULL/blank
    docs contribute nothing (a sketch of nothing is empty)."""
    return df.select(
        F.explode(
            F.when(
                F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "",
                F.array(),
            ).otherwise(tokens(F.lower(F.col(text_col))))
        ).alias("term")
    )


def _cells(term_col, depth: int, width: int):
    """array of `depth` bucket positions for a term — row i uses
    xxhash64(term, i) so rows are independent hash draws with a FIXED
    seed (deterministic reruns; the contract gate depends on it)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(term_col, F.lit(i)), F.lit(width))
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """The d×w count table as (row, bucket, cnt) — at most depth·width
    rows regardless of corpus size. Carries (depth, width) as column
    metadata so a stored sketch validates its own parameterization
    (the band-table convention, dedup.py)."""
    cells = (
        _term_stream(df, text_col)
        .select(F.posexplode(_cells(F.col("term"), depth, width)))
        .toDF("row", "bucket")
    )
    out = cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    return out.select(
        "row",
        "bucket",
        F.col("cnt").alias(
            "cnt", metadata={"cms_depth": depth, "cms_width": width}
        ),
    )


def cms_upper_bound(n_tokens: int, width: int) -> int:
    """The classic additive error bound: ⌈(e/w)·N⌉."""
    return math.ceil(math.e / width * n_tokens)


def cms_estimate(
    terms: DataFrame,
    sketch: DataFrame,
    term_col: str = "term",
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Point estimates for a probe-term frame: min over the term's
    depth cells. The sketch is d×w rows — always broadcast; a probe
    cell absent from the sketch means nothing ever hashed there, so
    its count is 0 (the term did not occur)."""
    meta = sketch.schema["cnt"].metadata or {}
    depth = depth or meta.get("cms_depth")
    width = width or meta.get("cms_width")
    if not depth or not width:
        raise ValueError(
            "pass depth/width or use a cms_build sketch (metadata)"
        )
    probe = terms.select(
        F.col(term_col).alias("term"),
        F.posexplode(_cells(F.col(term_col), depth, width)),
    ).toDF("term", "row", "bucket")
    return (
        probe.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )
