"""Temperature-scaled source mixing (operators/pipeline.py
``temperature_mix_rates`` / ``temperature_mix_apply``): the XLM-R/mT5
rebalancing rule — α<1 shrinks head sources and grows tail sources,
deterministically (hash-accept + whole-copy repeats, no RNG).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import pipeline as P


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "head") for i in range(900)] + [
        (i, "tail") for i in range(900, 1000)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string").cache()


def test_rates_match_closed_form(spark, corpus):
    alpha = 0.3
    rates = {
        r.source: r.rate
        for r in P.temperature_mix_rates(corpus, "source", alpha).collect()
    }
    sp = 900**alpha + 100**alpha
    assert rates["head"] == pytest.approx(
        round(900**alpha / sp * 1000 / 900, 6), abs=1e-9
    )
    assert rates["tail"] == pytest.approx(
        round(100**alpha / sp * 1000 / 100, 6), abs=1e-9
    )
    assert rates["head"] < 1 < rates["tail"]  # flattening direction


def test_apply_realizes_target_shares(spark, corpus):
    alpha = 0.3
    out = P.temperature_mix_apply(corpus, "source", alpha).cache()
    got = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rates = {
        r.source: r.rate
        for r in P.temperature_mix_rates(corpus, "source", alpha).collect()
    }
    # realized counts within hash noise of n_i * rate_i
    assert abs(got["head"] - 900 * rates["head"]) <= 30
    assert abs(got["tail"] - 100 * rates["tail"]) <= 15
    # upsampled tail rows must carry distinct copy indices
    mx = out.filter(F.col("source") == "tail").groupBy("doc_id").count()
    ks = {r["count"] for r in mx.collect()}
    assert ks <= {math.floor(rates["tail"]), math.ceil(rates["tail"])}
    # determinism
    again = P.temperature_mix_apply(corpus, "source", alpha)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_alpha_one_is_identity(spark, corpus):
    out = P.temperature_mix_apply(corpus, "source", alpha=1.0)
    assert out.count() == corpus.count()
    assert out.filter(F.col("copy") != 0).count() == 0


def test_apply_is_lazy_and_accepts_precomputed_rates(spark, corpus):
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    rates = P.temperature_mix_rates(corpus, "source", 0.5)
    _ = P.temperature_mix_apply(corpus, "source", rates=rates)
    assert tracker.getJobIdsForGroup(None) == before


def test_null_source_rows_are_kept_and_rated(spark):
    """NULL-source rows form their own rate group (groupBy keeps the
    NULL group; the rate join is null-safe) — they must not silently
    vanish from the mix."""
    rows = [(i, "head") for i in range(90)] + [(i, None) for i in range(90, 100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {
        r.source: r.rate
        for r in P.temperature_mix_rates(df, "source", 0.3).collect()
    }
    assert None in rates and rates[None] > 1  # tail group upsampled
    out = P.temperature_mix_apply(df, "source", 0.3)
    got = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got.get(None, 0) >= 10  # kept, and upsampled (rate > 1)
    assert abs(got[None] - 10 * rates[None]) <= 6
