"""Training-data curation operators (operators/pipeline.py):
decontamination, quota capping, deterministic splits and mixes.
The end-to-end values are oracle-verified in the driver gate
(test_entry_oracle); these pin the operator contracts and plan
shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import pipeline as P

SF = "/root/testdata/sf0.001"


def test_decontaminate_removes_exact_and_reformatted(spark):
    corpus = spark.createDataFrame(
        [(1, "Hello  World"), (2, "unrelated text"), (3, "hello world")],
        ["doc_id", "text"],
    )
    eval_set = spark.createDataFrame([(99, "hello   world")], ["doc_id", "text"])
    kept = sorted(
        r.doc_id for r in P.decontaminate(corpus, eval_set).collect()
    )
    # both formatting variants of the eval doc are gone
    assert kept == [2]


def test_decontaminate_is_broadcast_anti_join(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    plan = (
        P.decontaminate(docs, eval_set)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cap_per_group_deterministic(spark):
    df = spark.createDataFrame(
        [("a", i, f"r{i}") for i in range(10)] + [("b", 0, "x")],
        ["grp", "ord", "payload"],
    )
    capped = P.cap_per_group(df, "grp", ["ord"], 3)
    got = sorted((r.grp, r.ord) for r in capped.collect())
    assert got == [("a", 0), ("a", 1), ("a", 2), ("b", 0)]


def test_hash_split_stable_and_partitioning_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {
        r.doc_id: r.split for r in P.hash_split_assign(docs).collect()
    }
    b = {
        r.doc_id: r.split
        for r in P.hash_split_assign(docs.repartition(13)).collect()
    }
    assert a == b  # membership depends on the id alone
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.6 * n <= train <= 0.95 * n  # roughly 80%, small-N tolerance


def test_weighted_mix_subset_and_weights(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.lit("web")).otherwise(F.lit("books")),
    )
    mixed = P.weighted_mix_assign(docs, "source", {"web": 1.0, "books": 0.0})
    got = {r.doc_id for r in mixed.collect()}
    web = {r.doc_id for r in docs.filter("source = 'web'").collect()}
    assert got == web  # weight 1.0 keeps all, 0.0 drops all
