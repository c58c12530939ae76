"""Column profiling (operators/profile.py)."""

from __future__ import annotations

from wroclaw_bike_stats_spark.operators.profile import profile_columns


def test_profile_nulls_distincts_and_native_minmax(spark):
    df = spark.createDataFrame(
        [(1, 9.5, "b"), (2, None, "a"), (3, 10.0, None), (3, 2.5, "a")],
        ["k", "v", "s"],
    )
    prof = {r["column"]: r.asDict() for r in profile_columns(df).collect()}
    assert prof["k"]["n_rows"] == 4
    assert prof["k"]["n_null"] == 0 and prof["k"]["n_distinct"] == 3
    assert prof["v"]["n_null"] == 1 and prof["v"]["n_distinct"] == 3
    # numeric min, not lexicographic: 2.5 < 9.5 though "10.0" < "2.5"
    assert prof["v"]["min_value"] == "2.5" and prof["v"]["max_value"] == "10.0"
    assert prof["s"]["n_null"] == 1 and prof["s"]["min_value"] == "a"


def test_profile_subset_and_approx(spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(1000)], ["a", "b"])
    prof = {
        r["column"]: r.asDict()
        for r in profile_columns(df, cols=["b"], exact=False).collect()
    }
    assert list(prof) == ["b"]
    # approx sketch on 7 distincts is exact in practice; allow slack
    assert abs(prof["b"]["n_distinct"] - 7) <= 1
