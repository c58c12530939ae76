"""DSIR importance resampling (operators/dsir.py): selection
semantics, determinism, model scheme guard, plan shape. End-to-end
values are oracle-verified in the driver gates (test_entry_oracle:
dsir_scores / dsir_resample)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import dsir as DS


@pytest.fixture(scope="module")
def corpus(spark):
    # two sub-languages: "code-ish" docs (even ids) and "prose-ish"
    # docs (odd ids); the target is drawn from the code-ish side
    rows = []
    for i in range(60):
        if i % 2 == 0:
            rows.append((i, "def func return value loop index array " * 3))
        else:
            rows.append((i, "the quick brown fox jumps over lazy dog " * 3))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scores_separate_target_like_docs(spark, corpus):
    """Docs from the target's sub-language must out-score the rest —
    the paper's whole premise. Target = a few code-ish docs."""
    target = corpus.filter(F.col("doc_id").isin(0, 2, 4, 6))
    model = DS.dsir_logratio(target, corpus)
    scores = {
        r.doc_id: r.logw for r in DS.dsir_scores(corpus, model).collect()
    }
    code = [scores[i] for i in range(0, 60, 2)]
    prose = [scores[i] for i in range(1, 60, 2)]
    assert min(code) > max(prose)


def test_resample_prefers_high_weight_and_is_deterministic(spark, corpus):
    target = corpus.filter(F.col("doc_id").isin(0, 2, 4, 6))
    model = DS.dsir_logratio(target, corpus)
    a = sorted(
        r.doc_id for r in DS.importance_resample(corpus, model, k=20).collect()
    )
    b = sorted(
        r.doc_id
        for r in DS.importance_resample(
            corpus.repartition(7), model, k=20
        ).collect()
    )
    assert a == b  # id-seeded Gumbel: partitioning-invariant draw
    # with this separation the sample should be overwhelmingly code-ish
    assert sum(1 for i in a if i % 2 == 0) >= 15


def test_resample_precomputed_scores_hook_is_identical(spark, corpus):
    """r15 precomputed-stage hook: passing a materialized
    ``dsir_scores`` frame must reproduce the direct call row-for-row
    (the shared-persist route the entry gates use)."""
    target = corpus.filter(F.col("doc_id").isin(0, 2, 4, 6))
    model = DS.dsir_logratio(target, corpus)
    direct = sorted(
        map(tuple, DS.importance_resample(corpus, model, k=20).collect())
    )
    scores = DS.dsir_scores(corpus, model).persist()
    try:
        hooked = sorted(
            map(
                tuple,
                DS.importance_resample(
                    corpus, None, k=20, scores=scores
                ).collect(),
            )
        )
    finally:
        scores.unpersist()
    assert hooked == direct


def test_null_and_empty_text_still_score(spark, corpus):
    """NULL/empty text coalesces to the single empty-token gram —
    every doc gets a score row (the module's NULL contract; a NULL
    explode would silently drop the doc)."""
    weird = corpus.unionByName(
        corpus.sparkSession.createDataFrame(
            [(900, None), (901, ""), (902, "   ")],
            "doc_id long, text string",
        )
    )
    model = DS.dsir_logratio(weird.limit(5), weird)
    got = {r.doc_id: r.n_grams for r in DS.dsir_scores(weird, model).collect()}
    assert got[900] == got[901] == got[902] == 1
    assert len(got) == 63


def test_model_scheme_guard(spark, corpus):
    target = corpus.filter(F.col("doc_id") < 8)
    model = DS.dsir_logratio(target, corpus, num_buckets=1024)
    with pytest.raises(ValueError, match="scheme"):
        DS.dsir_scores(corpus, model, num_buckets=4096)
    with pytest.raises(ValueError, match="scheme"):
        DS.dsir_scores(corpus, model, num_buckets=1024, portable_hash=True)


def test_model_metadata_survives_parquet(spark, corpus, tmp_path):
    """The model is the standing selection asset: its bucket scheme
    rides the parquet footer, so a stored model fit under different
    parameters fails loud instead of scoring garbage."""
    target = corpus.filter(F.col("doc_id") < 8)
    path = str(tmp_path / "model")
    DS.dsir_logratio(target, corpus, num_buckets=1024).write.parquet(path)
    stored = spark.read.parquet(path)
    with pytest.raises(ValueError, match="scheme"):
        DS.dsir_scores(corpus, stored, num_buckets=4096)
    got = DS.dsir_scores(corpus, stored, num_buckets=1024).count()
    assert got == 60


def test_fit_and_score_is_one_lazy_plan(spark, corpus):
    """Zero eager jobs: totals are lazy 1-row cross-joined
    aggregates, the domain is a range, counts broadcast."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    model = DS.dsir_logratio(corpus.limit(5), corpus)
    _ = DS.importance_resample(corpus, model, k=10)
    after = tracker.getJobIdsForGroup(None)
    assert before == after


def test_plan_is_python_free_and_broadcast(spark, corpus):
    model = DS.dsir_logratio(corpus.limit(5), corpus)
    plan = (
        DS.dsir_scores(corpus, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan
    # the B-row model side joins broadcast into the gram stream
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_snowflake_ids_sample_without_loss(spark, corpus):
    """Gumbel noise must survive ids >= 2^32 (snowflake-style, the
    hash_bucket contract): the naive `id * KNUTH` int64 multiply
    overflows there — ANSI mode throws, legacy wraps negative and
    log(u) NULLs the doc silently out of the sample. The split-multiply
    route must keep every doc eligible."""
    base = 1 << 40
    big = corpus.withColumn("doc_id", F.col("doc_id") + F.lit(base))
    target = big.filter((F.col("doc_id") - base).isin(0, 2, 4, 6))
    model = DS.dsir_logratio(target, big)
    picked = DS.importance_resample(big, model, k=60)
    rows = picked.collect()
    # every doc scored and carries a finite key — none NULLed out
    assert len(rows) == 60
    assert all(r.key is not None and r.logw is not None for r in rows)
    # determinism holds at large ids too
    again = {r.doc_id for r in DS.importance_resample(big, model, k=10).collect()}
    assert again == {
        r.doc_id
        for r in DS.importance_resample(big.repartition(7), model, k=10).collect()
    }


def test_gumbel_matches_portable_hash_arithmetic(spark):
    """The split-multiply u must equal the full-width
    (id*K) mod 2^32 arithmetic the SQL oracle computes (congruence
    claim of pipeline.hash_bucket) — checked for small AND huge ids."""
    import math

    ids = [0, 1, 7, 123456, (1 << 33) + 5, (1 << 41) + 99]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.g
        for r in df.select("doc_id", DS._gumbel("doc_id").alias("g")).collect()
    }
    for i in ids:
        u = ((i * 2654435761) % (1 << 32) + 0.5) / float(1 << 32)
        want = -math.log(-math.log(u))
        assert abs(got[i] - want) < 1e-9, i
