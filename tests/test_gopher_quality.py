"""Gopher quality rules (operators/text.py gopher_quality_stats /
gopher_quality_filter; Rae et al. 2021 §A1.1): hand-computed signal
values on crafted docs, and the filter = inline conjunction of the
same signals (no join in the plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: clean English prose — passes everything (with low word floor)
        (0, "the cat and the dog have fun with all of that stuff"),
        # 1: symbol-heavy
        (1, "## tags # here # everywhere # ok"),
        # 2: numeric gibberish (no alpha words, no stopwords)
        (2, "12345 67890 11111 22222 33333"),
        # 3: bullets + ellipsis lines
        (3, "- item one\n- item two\nconclusion follows..."),
        # 4: NULL
        (4, None),
        # 5: unicode ellipsis at line end
        (5, "first line…\nsecond line fine"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stats_hand_computed(spark, docs):
    got = {r.doc_id: r for r in T.gopher_quality_stats(docs).collect()}
    r0 = got[0]
    assert r0.word_count == 12
    # stopword hits in doc 0: the, and, the, have, with, of, that = 7
    assert r0.n_stopwords == 7
    assert r0.alpha_word_frac == 1.0
    assert r0.symbol_word_ratio == 0.0
    r1 = got[1]
    assert r1.word_count == 8  # ## tags # here # everywhere # ok
    assert r1.symbol_word_ratio == pytest.approx(round(5 / 8, 6))
    r2 = got[2]
    assert (r2.alpha_word_frac, r2.n_stopwords) == (0.0, 0)
    r3 = got[3]
    assert r3.bullet_line_frac == pytest.approx(round(2 / 3, 6))
    assert r3.ellipsis_line_frac == pytest.approx(round(1 / 3, 6))
    r4 = got[4]
    assert (r4.word_count, r4.mean_word_len, r4.alpha_word_frac) == (0, 0.0, 0.0)
    assert got[5].ellipsis_line_frac == 0.5


def test_filter_applies_all_rules(spark, docs):
    kept = {
        r.doc_id
        for r in T.gopher_quality_filter(
            docs, min_words=5, min_mean_word_len=1.0
        ).collect()
    }
    # 1: symbol ratio; 2: alpha+stopwords; 3: too few words after the
    # floor? (7 words, passes floor; fails stopwords=0... '-' items) —
    # verify precisely below instead of hand-waving:
    stats = {r.doc_id: r for r in T.gopher_quality_stats(docs).collect()}
    expect = {
        d
        for d, s in stats.items()
        if 5 <= s.word_count <= 100_000
        and 1.0 <= s.mean_word_len <= 10.0
        and s.symbol_word_ratio <= 0.1
        and s.alpha_word_frac >= 0.8
        and s.n_stopwords >= 2
        and s.bullet_line_frac <= 0.9
        and s.ellipsis_line_frac <= 0.3
    }
    assert kept == expect
    assert 0 in kept and 1 not in kept and 2 not in kept and 4 not in kept


def test_filter_is_narrow_no_join(spark, docs):
    plan = (
        T.gopher_quality_filter(docs, min_words=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_arrow_impl_matches_native(spark, docs):
    """impl='arrow' (the measured 3.4x HOF escape at sf100) must keep
    rule-for-rule parity with the native expressions, including the
    NULL/blank and unicode-ellipsis edges."""
    kw = dict(min_words=1, min_mean_word_len=1.0, min_stopwords=0)
    nat = {r.doc_id for r in T.gopher_quality_filter(docs, **kw).collect()}
    arr = {
        r.doc_id
        for r in T.gopher_quality_filter(docs, impl="arrow", **kw).collect()
    }
    assert arr == nat
    kw2 = dict(min_words=5, min_mean_word_len=1.0)
    nat2 = {r.doc_id for r in T.gopher_quality_filter(docs, **kw2).collect()}
    arr2 = {
        r.doc_id
        for r in T.gopher_quality_filter(docs, impl="arrow", **kw2).collect()
    }
    assert arr2 == nat2


def test_arrow_impl_matches_native_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = dict(min_words=5, min_mean_word_len=1.0)
    nat = {r.doc_id for r in T.gopher_quality_filter(docs, **kw).collect()}
    arr = {
        r.doc_id
        for r in T.gopher_quality_filter(docs, impl="arrow", **kw).collect()
    }
    assert arr == nat and len(nat) > 0
