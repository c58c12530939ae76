"""Fuzzy (Jaccard) decontamination (operators/pipeline.py
``fuzzy_contaminated_pairs`` / ``decontaminate_fuzzy``): near-dup
eval overlap drops a doc; single-phrase overlap does not.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import pipeline as P


def _frames(spark):
    corpus = spark.createDataFrame(
        [
            # near-verbatim copy of eval 100 (one word changed)
            (1, "the quick brown fox jumps over the lazy sleeping dog today"),
            # shares only one 3-gram phrase with eval 100
            (2, "a story where the quick brown fox is a minor character in town"),
            # unrelated
            (3, "completely different text about spark shuffle partitions"),
            # verbatim copy of eval 101
            (4, "benchmark question text that must never leak into training"),
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy sleeping cat today"),
            (101, "benchmark question text that must never leak into training"),
        ],
        "doc_id long, text string",
    )
    return corpus, eval_set


def test_fuzzy_drops_near_dup_keeps_phrase_overlap(spark):
    corpus, eval_set = _frames(spark)
    kept = {
        r.doc_id
        for r in P.decontaminate_fuzzy(
            corpus, eval_set, n=3, threshold=0.5
        ).collect()
    }
    assert kept == {2, 3}
    # the stricter any-shared-gram rule also kills doc 2
    strict = {
        r.doc_id
        for r in P.decontaminate_ngram(corpus, eval_set, n=3).collect()
    }
    assert strict == {3}


def test_pairs_report_values(spark):
    corpus, eval_set = _frames(spark)
    rows = {
        (r.doc_id, r.eval_id): r.jaccard
        for r in P.fuzzy_contaminated_pairs(
            corpus, eval_set, n=3, threshold=0.5
        ).collect()
    }
    assert rows[(4, 101)] == 1.0
    assert 0.5 <= rows[(1, 100)] < 1.0
    assert set(rows) == {(1, 100), (4, 101)}


def test_decontaminate_precomputed_pairs_hook_is_identical(spark):
    """r15 precomputed-stage hook: passing the materialized pair
    report must reproduce the direct call row-for-row (the
    shared-persist route the entry gates use)."""
    corpus, eval_set = _frames(spark)
    direct = {
        r.doc_id
        for r in P.decontaminate_fuzzy(
            corpus, eval_set, n=3, threshold=0.5
        ).collect()
    }
    pairs = P.fuzzy_contaminated_pairs(
        corpus, eval_set, n=3, threshold=0.5
    ).persist()
    try:
        hooked = {
            r.doc_id
            for r in P.decontaminate_fuzzy(
                corpus, eval_set, n=3, threshold=0.5, pairs=pairs
            ).collect()
        }
    finally:
        pairs.unpersist()
    assert hooked == direct == {2, 3}


def test_minhash_route_matches_exact_here(spark):
    """At 128 hashes / 16 bands a >=0.5-Jaccard pair collides in some
    band with probability ~1 for these near-verbatim docs — the
    prefiltered result equals the exact one on this fixture (general
    recall < 1 is the route's documented contract)."""
    corpus, eval_set = _frames(spark)
    exact = {
        r.doc_id
        for r in P.decontaminate_fuzzy(corpus, eval_set, n=3).collect()
    }
    mh = {
        r.doc_id
        for r in P.decontaminate_fuzzy(
            corpus, eval_set, n=3, method="minhash"
        ).collect()
    }
    assert mh == exact


def test_null_text_and_distinct_id_cols(spark):
    corpus = spark.createDataFrame(
        [(1, None), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(7, "alpha beta gamma delta")], "eid long, text string"
    )
    kept = {
        r.doc_id
        for r in P.decontaminate_fuzzy(
            corpus, eval_set, eval_id_col="eid", n=3
        ).collect()
    }
    assert kept == {1}
