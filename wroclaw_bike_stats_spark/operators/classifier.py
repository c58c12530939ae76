"""Supervised hashed-feature document classifier — the quality/
domain-filter stage CCNet-class pipelines run with a fastText model
(Wenzek et al., LREC 2020 §4: a linear classifier over bag-of-n-gram
features, trained "good corpus vs crawl"; RefinedWeb and Dolma use
the same shape for domain and toxicity filters). The
aggregation-trainable analog of that linear model is multinomial
Naive Bayes over hashed unigram+bigram buckets: per-class weights
are ln P(bucket|class) — pure count aggregations with a closed form,
no gradient loop, so TRAINING is two shuffles on any corpus size and
two models merge by adding count tables (the same monoid story as
``train_bigram_lm``).

Spark-first shape, all lazy end to end:

- **Train**: explode grams → bucket (shared hashing with
  operators/dsir.py) → ``groupBy(class, bucket)`` count with
  map-side combine, completed over the full (class × bucket) domain
  so scoring never needs NULL/floor handling; add-α smoothing and
  per-class totals as lazy 1-row aggregates. The weight table is
  C×B rows, pivoted wide to one B-row frame — the standing model
  asset (provenance in column metadata).
- **Priors**: ln(n_class / n) as a 1-row lazy aggregate.
- **Predict**: gram stream ⋈ broadcast weight table → ONE
  ``groupBy(doc)`` summing every class column at once (C sums in a
  single aggregate pass) → + prior → argmax via ``greatest`` +
  ``CASE`` (ties break toward the FIRST class in ``classes`` —
  deterministic, oracle-exact).

``classes`` is an explicit caller-supplied list (the label set is
part of a classifier's contract) — that keeps the whole train +
predict composition a single lazy plan; no driver-side label
discovery job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import re

from wroclaw_bike_stats_spark.operators.dsir import (
    _bucket,
    _grams,
    _scheme,
)

#: Labels are interpolated into column names (pivot values, ``w_<c>``,
#: ``score_<c>``, the backtick-quoted ``F.col`` lookups) — a label
#: containing a backtick, dot, or other column-unsafe character would
#: break train/predict resolution, and the ``score_<c>`` names are
#: part of the output contract the SQL oracles hash. Reject anything
#: outside the safe set loudly at entry instead of failing deep in
#: Catalyst with an unresolved-column error.
_SAFE_LABEL = re.compile(r"^[A-Za-z0-9_-]+$")


def _check_labels(classes: list[str]) -> None:
    if not classes:
        raise ValueError("classes must be a non-empty label list")
    if len(set(classes)) != len(classes):
        raise ValueError(f"duplicate labels in classes={classes}")
    bad = [c for c in classes if not isinstance(c, str) or not _SAFE_LABEL.match(c)]
    if bad:
        raise ValueError(
            f"column-unsafe class labels {bad!r}: labels are embedded in "
            "column names (w_<label>, score_<label>) and must match "
            "[A-Za-z0-9_-]+ — rename the labels (e.g. map them to slugs) "
            "before training"
        )


def nb_train(
    labeled: DataFrame,
    classes: list[str],
    label_col: str = "label",
    text_col: str = "text",
    num_buckets: int = 4096,
    alpha: float = 0.5,
    portable_hash: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Fit the classifier: returns ``(weights, priors)`` where
    ``weights`` is one row per bucket with a ``w_<class>`` column
    holding ln P̂(bucket|class) (add-α smoothed over the full
    B-bucket domain) and ``priors`` is a 1-row frame of
    ``prior_<class>`` = ln(n_class / n). Rows whose label is not in
    ``classes`` are ignored. Both frames are lazy; write ``weights``
    to parquet and it is the standing model (scheme tag in column
    metadata, validated by ``nb_predict``)."""
    _check_labels(classes)
    # r16: the gram explode + hash + partial count is the fit's whole
    # corpus cost and runs at the scan's parallelism — one task on a
    # single-row-group input (profiled 0.4 s per aggregate consumer at
    # the bench sf). Fan the (label, text) projection up when
    # under-parallel (a no-op on parallel scans); counts are integers,
    # so partitioning cannot change results.
    from wroclaw_bike_stats_spark.operators.fanout import ensure_parallelism

    grams = ensure_parallelism(
        labeled.filter(F.col(label_col).isin(classes)).select(
            label_col, text_col
        )
    ).select(
        F.col(label_col).alias("_cls"),
        F.explode(_grams(F.col(text_col))).alias("_g"),
    ).select(
        "_cls", _bucket(F.col("_g"), num_buckets, portable_hash).alias("bucket")
    )
    counts = grams.groupBy("_cls", "bucket").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wide = counts.groupBy("bucket").pivot("_cls", classes).agg(F.first("_c"))
    domain = labeled.sparkSession.range(num_buckets).select(
        F.col("id").alias("bucket")
    )
    # per-class gram totals in ONE 1-row lazy aggregate
    totals = counts.agg(
        *[
            F.sum(F.when(F.col("_cls") == c, F.col("_c"))).alias(f"_t_{i}")
            for i, c in enumerate(classes)
        ]
    )
    ab = alpha * num_buckets
    scheme = _scheme(num_buckets, portable_hash)
    weights = (
        domain.join(F.broadcast(wide), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            *[
                F.log(
                    (F.coalesce(F.col(f"`{c}`"), F.lit(0)) + alpha)
                    / (F.coalesce(F.col(f"_t_{i}"), F.lit(0)) + ab)
                ).alias(f"w_{c}", metadata={"nb_scheme": scheme})
                for i, c in enumerate(classes)
            ],
        )
    )
    n_rows = labeled.filter(F.col(label_col).isin(classes))
    priors = n_rows.agg(
        *[
            F.log(
                F.sum(F.when(F.col(label_col) == c, 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias(f"prior_{c}")
            for c in classes
        ]
    )
    return weights, priors


def nb_predict(
    df: DataFrame,
    weights: DataFrame,
    priors: DataFrame,
    classes: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    portable_hash: bool = False,
) -> DataFrame:
    """Per-document class posterior scores and the argmax prediction:
    (``id_col``, ``score_<class>``... rounded 4 dp, ``pred``). Ties
    (vanishingly rare with double scores) break toward the first
    class in ``classes``. One corpus shuffle (the per-doc groupBy);
    the model joins broadcast."""
    _check_labels(classes)
    for c in classes:
        col = f"w_{c}"
        if col not in weights.columns:
            raise ValueError(
                f"weights frame lacks column {col!r} — was the model "
                f"trained with classes={classes}?"
            )
        meta = weights.schema[col].metadata
        stored = meta.get("nb_scheme")
        want = _scheme(num_buckets, portable_hash)
        if stored is not None and stored != want:
            raise ValueError(
                f"stored NB model was fit under scheme {stored!r} but "
                f"this run buckets with {want!r} — refit or pass "
                "matching num_buckets/portable_hash"
            )
    # r15: the gram explode + hash + per-doc sum is predict's whole
    # corpus cost and runs at the scan's parallelism — one task on a
    # single-file input (measured 1.07 s at the bench sf). Fan up when
    # under-parallel. Bit-identical under repartition: a doc's rows
    # move as a unit, so its grams stay contiguous in one partition
    # and the per-doc partial sums keep their sequential gram order.
    from wroclaw_bike_stats_spark.operators.fanout import ensure_parallelism

    grams = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(_grams(F.col(text_col))).alias("_g"),
    ).select(
        id_col, _bucket(F.col("_g"), num_buckets, portable_hash).alias("bucket")
    )
    summed = (
        grams.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(*[F.sum(f"w_{c}").alias(f"_s_{c}") for c in classes])
        .crossJoin(F.broadcast(priors))
    )
    # argmax over the ROUNDED scores: 4 dp is far coarser than any
    # cross-engine float-summation jitter, so the prediction (not
    # just the printed score) is bit-stable against the SQL oracle;
    # a 4 dp tie resolves to the FIRST class in `classes`
    scores = [
        F.round(F.col(f"_s_{c}") + F.col(f"prior_{c}"), 4).alias(
            f"score_{c}"
        )
        for c in classes
    ]
    scored = summed.select(id_col, *scores)
    best = F.greatest(*[F.col(f"score_{c}") for c in classes])
    pred = F.lit(None).cast("string")
    # reversed CASE chain: earlier classes overwrite later ones, so
    # a tie resolves to the FIRST class in `classes`
    for c in reversed(classes):
        pred = F.when(F.col(f"score_{c}") == best, F.lit(c)).otherwise(pred)
    return scored.select(id_col, *scored.columns[1:], pred.alias("pred"))
