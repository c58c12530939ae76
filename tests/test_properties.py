"""Property-based tests (hypothesis) for engine invariants that
golden values can't cover exhaustively. Each example batches its
generated rows into ONE DataFrame so a property costs a handful of
Spark jobs, not hundreds."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.functions.distance import haversine_km
from wroclaw_bike_stats_spark.operators.dedup import exact_dedup
from wroclaw_bike_stats_spark.operators.text import lang_id

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

lat = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lon = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
coord_pair = st.tuples(lat, lon, lat, lon)

# max great-circle distance = π · R
MAX_KM = math.pi * 6371.0088


@SLOW
@given(st.lists(coord_pair, min_size=1, max_size=40))
def test_haversine_symmetry_identity_bounds(spark, pairs):
    df = spark.createDataFrame(
        pairs, ["lat1", "lon1", "lat2", "lon2"]
    ).select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"), 6).alias("fwd"),
        haversine_km(F.col("lat2"), F.col("lon2"), F.col("lat1"), F.col("lon1"), 6).alias("rev"),
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat1"), F.col("lon1"), 6).alias("self"),
    )
    for r in df.collect():
        assert r["fwd"] == pytest.approx(r["rev"], abs=1e-6)  # symmetry
        assert r["self"] == 0.0  # identity
        assert 0.0 <= r["fwd"] <= MAX_KM + 1e-6  # bounds


texts = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
    max_size=200,
)


@SLOW
@given(st.lists(texts, min_size=1, max_size=30))
def test_exact_dedup_partitions_the_corpus(spark, docs):
    """n_copies across fingerprint groups sums to the corpus size, and
    every keep_id is a real doc id."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = exact_dedup(df).collect()
    assert sum(r["n_copies"] for r in out) == len(docs)
    ids = set(range(len(docs)))
    assert all(r["keep_id"] in ids for r in out)


@SLOW
@given(st.lists(texts, min_size=1, max_size=30))
def test_lang_id_total_and_closed(spark, docs):
    """lang_id always returns a value from the closed label set."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {r["g"] for r in df.select(lang_id(F.col("text")).alias("g")).collect()}
    assert got <= {"de", "en", "es", "fr", "und"}


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), texts),
        min_size=1,
        max_size=30,
    )
)
def test_dedupe_by_uid_unique_and_stable(spark, rows):
    """After dedup, non-null uids are unique; the pick is identical
    under repartitioning."""
    from wroclaw_bike_stats_spark.operators.upsert import dedupe_batch_by_uid

    df = spark.createDataFrame(
        [(uid, t, None) for uid, t in rows],
        "uid bigint, text string, extra string",
    )
    out1 = sorted(map(tuple, dedupe_batch_by_uid(df).collect()))
    out2 = sorted(map(tuple, dedupe_batch_by_uid(df.repartition(5)).collect()))
    assert out1 == out2
    uids = [r[0] for r in out1 if r[0] is not None]
    assert len(uids) == len(set(uids))
