"""Hashed-feature Naive Bayes classifier (operators/classifier.py):
learning semantics on a separable corpus, model monoid/guard
behavior, laziness, plan shape. End-to-end values are
oracle-verified in the driver gate (test_entry_oracle:
nb_lang_predict)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import classifier as NB

CLASSES = ["code", "prose"]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "def func return value loop index array " * 2, "code"))
        else:
            rows.append((i, "the quick brown fox jumps over lazy dog " * 2, "prose"))
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_learns_separable_classes(spark, labeled):
    """Held-out docs from each sub-language get the right argmax —
    the classifier actually classifies."""
    weights, priors = NB.nb_train(labeled, CLASSES)
    held = spark.createDataFrame(
        [
            (100, "func return index loop"),
            (101, "quick fox over dog jumps"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.pred
        for r in NB.nb_predict(held, weights, priors, CLASSES).collect()
    }
    assert got == {100: "code", 101: "prose"}


def test_unknown_labels_ignored_and_priors_reflect_counts(spark, labeled):
    """Rows outside `classes` don't leak into the fit; priors are
    ln(class share) of the KEPT rows."""
    import math

    with_junk = labeled.unionByName(
        labeled.sparkSession.createDataFrame(
            [(999, "x y z", "other")], labeled.schema
        )
    )
    _, priors = NB.nb_train(with_junk, CLASSES)
    row = priors.first()
    assert abs(row["prior_code"] - math.log(0.5)) < 1e-9
    assert abs(row["prior_prose"] - math.log(0.5)) < 1e-9


def test_scheme_guard_and_missing_class_column(spark, labeled):
    weights, priors = NB.nb_train(labeled, CLASSES, num_buckets=1024)
    with pytest.raises(ValueError, match="scheme"):
        NB.nb_predict(labeled, weights, priors, CLASSES, num_buckets=4096)
    with pytest.raises(ValueError, match="lacks column"):
        NB.nb_predict(
            labeled, weights, priors, ["code", "verse"], num_buckets=1024
        )


def test_model_survives_parquet(spark, labeled, tmp_path):
    weights, priors = NB.nb_train(labeled, CLASSES, num_buckets=1024)
    wp, pp = str(tmp_path / "w"), str(tmp_path / "p")
    weights.write.parquet(wp)
    priors.write.parquet(pp)
    w2, p2 = spark.read.parquet(wp), spark.read.parquet(pp)
    with pytest.raises(ValueError, match="scheme"):
        NB.nb_predict(labeled, w2, p2, CLASSES, num_buckets=4096)
    got = NB.nb_predict(labeled, w2, p2, CLASSES, num_buckets=1024)
    # the training set itself is perfectly separable — every doc
    # classified back to its own label through the stored model
    wrong = got.withColumn(
        "_want",
        F.when(F.col("doc_id") % 2 == 0, "code").otherwise("prose"),
    ).filter(F.col("pred") != F.col("_want"))
    assert wrong.count() == 0


def test_train_predict_is_one_lazy_plan(spark, labeled):
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    weights, priors = NB.nb_train(labeled, CLASSES)
    _ = NB.nb_predict(labeled, weights, priors, CLASSES)
    after = tracker.getJobIdsForGroup(None)
    assert before == after


def test_plan_is_python_free_single_doc_shuffle(spark, labeled):
    weights, priors = NB.nb_train(labeled, CLASSES)
    plan = (
        NB.nb_predict(labeled, weights, priors, CLASSES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_column_unsafe_labels_rejected(spark, labeled):
    """Labels are interpolated into column names (pivot values,
    w_<c>, score_<c>) — a backtick/dot/space label would break
    resolution deep in Catalyst, so entry validation must be loud."""
    for bad in (["co`de", "prose"], ["a.b", "c"], ["", "x"], ["a b", "c"]):
        with pytest.raises(ValueError, match="column-unsafe|non-empty"):
            NB.nb_train(labeled, bad)
    weights, priors = NB.nb_train(labeled, CLASSES)
    with pytest.raises(ValueError, match="column-unsafe"):
        NB.nb_predict(labeled, weights, priors, ["co`de", "prose"])
    with pytest.raises(ValueError, match="duplicate"):
        NB.nb_train(labeled, ["code", "code"])
    # hyphen/underscore labels are fine (backtick-quoted internally)
    w2, p2 = NB.nb_train(
        labeled.withColumn(
            "label", F.concat(F.col("label"), F.lit("-v2"))
        ),
        ["code-v2", "prose-v2"],
    )
    assert {"w_code-v2", "w_prose-v2"} <= set(w2.columns)
