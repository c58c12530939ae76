"""Sessionization boundaries and skew-mitigation equivalences."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.functions.salting import (
    count_distinct_skew_safe,
    salted_join,
)
from wroclaw_bike_stats_spark.operators.sessionize import (
    session_stats,
    sessionize,
)


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_sessionize_boundaries(spark):
    """Gap strictly greater than the threshold opens a session; an
    exact-gap event does not."""
    rows = [
        ("u1", _ts("2024-01-01 10:00:00")),
        ("u1", _ts("2024-01-01 10:30:00")),  # gap = 1800 exactly → same
        ("u1", _ts("2024-01-01 11:00:01")),  # gap = 1801 → new session
        ("u2", _ts("2024-01-01 10:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        (r["user_id"], r["ts"]): r["session_id"]
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert got[("u1", _ts("2024-01-01 10:00:00"))] == 1
    assert got[("u1", _ts("2024-01-01 10:30:00"))] == 1
    assert got[("u1", _ts("2024-01-01 11:00:01"))] == 2
    assert got[("u2", _ts("2024-01-01 10:00:00"))] == 1

    stats = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_s"])
        for r in session_stats(df, gap_seconds=1800).collect()
    }
    assert stats[("u1", 1)] == (2, 1800)
    assert stats[("u1", 2)] == (1, 0)
    assert stats[("u2", 1)] == (1, 0)


def test_count_distinct_skew_safe_matches_exact(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    safe = {
        r["user_id"]: r["n_distinct"]
        for r in count_distinct_skew_safe(ev, "user_id", "event_type").collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    assert safe == exact


def test_hll_sketch_error_bound(spark):
    """The approx-distinct sketch query must stay within 5% relative
    error of the exact count (rsd=0.02 configured; 5% leaves margin)."""
    import __spark_entry__ as entry_mod

    approx = {
        r["event_type"]: r["approx_users"]
        for r in entry_mod.q_user_count_hll(spark, "/root/testdata/sf0.001").collect()
    }
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] <= 0.05


def test_approx_quantiles_error_bound(spark):
    """percentile_approx (accuracy 10000) must land within 1% of the
    value range of the exact interpolated percentiles."""
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    approx = entry_mod.q_value_quantiles_approx(spark, sf).collect()[0]
    ev = entry_mod._t(spark, sf, "events")
    exact = ev.agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
        (F.max("value") - F.min("value")).alias("rng"),
    ).collect()[0]
    for k in ("p50", "p90", "p99"):
        assert abs(approx[k] - exact[k]) <= 0.01 * exact["rng"], k


def test_salted_join_matches_plain_join(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id"
    )
    users = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id")
        .distinct()
        .withColumn("flag", F.lit("x"))
    )
    plain = {
        (r["event_id"], r["flag"]) for r in ev.join(users, "user_id").collect()
    }
    salted = {
        (r["event_id"], r["flag"])
        for r in salted_join(ev, users, "user_id", n_salts=8).collect()
    }
    assert salted == plain


def test_count_distinct_skew_safe_ignores_nulls(spark):
    """countDistinct never counts NULL; the two-stage skew-safe form
    must agree when the counted column contains nulls."""
    df = spark.createDataFrame(
        [("k1", "a"), ("k1", "a"), ("k1", None), ("k2", None), ("k3", "x")],
        ["k", "v"],
    )
    safe = {
        r["k"]: r["n_distinct"]
        for r in count_distinct_skew_safe(df, "k", "v").collect()
    }
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    # k2 has only NULL values → not present in either result with n>0
    assert safe == {k: n for k, n in exact.items() if n > 0}
