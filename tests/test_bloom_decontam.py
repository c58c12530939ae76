"""Bloom-prefilter n-gram decontamination (operators/pipeline.py
``decontaminate_ngram_bloom``): the verified route must EQUAL the
exact ``decontaminate_ngram`` result (bloom false negatives are
impossible — a string match implies a hash match implies set bits);
the unverified route may only over-drop.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import pipeline as P


def _corpus(spark, n_docs=60, seed=3):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(50)]
    rows = [
        (i, " ".join(rng.choice(words, size=rng.integers(3, 25)).tolist()))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("n", [3, 13])
def test_verified_bloom_equals_exact(spark, n):
    corpus = _corpus(spark)
    # eval set: verbatim slices of some corpus docs + fresh text
    texts = {r.doc_id: r.text for r in corpus.collect()}
    eval_rows = [
        (100, texts[5]),
        (101, " ".join(texts[17].split()[:6])),
        (102, "totally fresh eval only content"),
    ]
    eval_set = spark.createDataFrame(eval_rows, "doc_id long, text string")
    exact = {
        r.doc_id for r in P.decontaminate_ngram(corpus, eval_set, n=n).collect()
    }
    bloom = {
        r.doc_id
        for r in P.decontaminate_ngram_bloom(corpus, eval_set, n=n).collect()
    }
    assert bloom == exact
    assert len(exact) < corpus.count()  # something was actually dropped


def test_unverified_bloom_only_overdrops(spark):
    corpus = _corpus(spark, n_docs=120, seed=4)
    eval_set = _corpus(spark, n_docs=5, seed=4)  # same seed -> overlap
    exact = {
        r.doc_id for r in P.decontaminate_ngram(corpus, eval_set, n=3).collect()
    }
    loose = {
        r.doc_id
        for r in P.decontaminate_ngram_bloom(
            corpus, eval_set, n=3, verify=False
        ).collect()
    }
    assert loose <= exact  # may drop extra docs, never keep a contaminated one


def test_short_docs_whole_doc_shingle_contract(spark):
    """Docs shorter than n tokens emit one whole-doc shingle: a short
    doc is dropped iff the eval set contains that exact short text."""
    corpus = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other tiny"), (3, None)],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(9, "tiny doc")], "doc_id long, text string"
    )
    kept = {
        r.doc_id
        for r in P.decontaminate_ngram_bloom(
            corpus, eval_set, n=13
        ).collect()
    }
    assert kept == {2, 3}


def test_bloom_sizing_params():
    m, k = P._bloom_bitset_params(1000, 16)
    assert m >= 16000 and (m & (m - 1)) == 0  # power of two
    assert 1 <= k <= 30
    m1, k1 = P._bloom_bitset_params(0, 16)
    assert m1 >= 64 and k1 >= 1


def test_precomputed_bloom_hook_equals_internal_build(spark):
    """r15 ``bloom=`` hook: a bitset prebuilt by ``build_ngram_bloom``
    over the operator's own hashed-shingle gram table (the standing-
    asset shape) must give the same result as the internal build —
    both as the raw uint64 array and as its ``tobytes()`` form."""
    from wroclaw_bike_stats_spark.operators.dedup import _shingle_table

    corpus = _corpus(spark)
    texts = {r.doc_id: r.text for r in corpus.collect()}
    eval_set = spark.createDataFrame(
        [(100, texts[5]), (102, "totally fresh eval only content")],
        "doc_id long, text string",
    )
    internal = {
        r.doc_id
        for r in P.decontaminate_ngram_bloom(corpus, eval_set, n=3).collect()
    }
    ev = (
        _shingle_table(eval_set, "text", "doc_id", 3, hashed=True)
        .select("shingle")
        .distinct()
    )
    bitset, m, k = P.build_ngram_bloom(None, "text", 3, grams=ev)
    for asset in ((bitset, m, k), (bitset.tobytes(), m, k)):
        hooked = {
            r.doc_id
            for r in P.decontaminate_ngram_bloom(
                corpus, eval_set, n=3, bloom=asset
            ).collect()
        }
        assert hooked == internal
