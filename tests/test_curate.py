"""End-to-end curation plan (plans/curate.py): stage composition,
determinism, and the CLI surface."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators import text as T
from wroclaw_bike_stats_spark.plans.curate import (
    curate_corpus,
    curation_report,
    write_curated,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_curate_removes_eval_and_duplicates(spark, docs):
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    # plant an exact duplicate pair (reformatted) that must collapse
    extra = spark.createDataFrame(
        [
            (100001, "planted duplicate body of text here ok fine yes ten", "en", "web", 50),
            (100002, "planted  duplicate body of text  here ok fine yes ten", "en", "web", 50),
        ],
        docs.schema,
    )
    curated = curate_corpus(docs.unionByName(extra), eval_set, min_tokens=5)
    out = curated.select("doc_id", "text", "split").cache()

    # eval fingerprints gone
    eval_fps = {
        r.fp
        for r in eval_set.select(
            T.fingerprint_md5(F.col("text")).alias("fp")
        ).collect()
    }
    out_fps = {
        r.fp
        for r in out.select(T.fingerprint_md5(F.col("text")).alias("fp")).collect()
    }
    assert not (eval_fps & out_fps)
    # no duplicate fingerprints survive; first-writer (smaller id) kept
    assert len(out_fps) == out.count()
    kept = sorted(
        r.doc_id for r in out.filter(F.col("doc_id") > 100000).collect()
    )
    assert kept == [100001]
    # every row has a split
    assert out.filter(~F.col("split").isin("train", "val", "test")).count() == 0


def test_curate_deterministic(spark, docs):
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    a = sorted(
        (r.doc_id, r.split)
        for r in curate_corpus(docs, eval_set).select("doc_id", "split").collect()
    )
    b = sorted(
        (r.doc_id, r.split)
        for r in curate_corpus(
            docs.repartition(13), eval_set
        ).select("doc_id", "split").collect()
    )
    assert a == b


def test_curate_is_one_lazy_plan(spark, docs):
    """Composition must not hide eager actions: building the plan
    triggers no jobs (status poll of the sc should show no change)."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    _ = curate_corpus(docs, docs.limit(5))
    after = tracker.getJobIdsForGroup(None)
    assert before == after


def test_write_and_report(spark, docs, tmp_path):
    out_dir = str(tmp_path / "curated")
    curated = curate_corpus(docs, None, min_tokens=5)
    write_curated(curated, out_dir)
    back = spark.read.parquet(out_dir)
    rep = curation_report(back, docs)
    assert rep["rows_out"] == back.count() > 0
    assert rep["rows_in"] == docs.count()
    assert set(rep["splits"]) <= {"train", "val", "test"}
    # PII scrub ran on the output text
    assert back.filter(F.col("text").rlike("@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).count() == 0


def test_cli_curate(spark, tmp_path, capsys):
    from wroclaw_bike_stats_spark.cli import main

    out_dir = str(tmp_path / "cli_out")
    main(
        [
            "curate",
            "--docs", f"{SF}/documents.parquet",
            "--out", out_dir,
            "--min-tokens", "5",
        ]
    )
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(line)
    assert rep["rows_in"] == 500 and rep["rows_out"] > 0
    assert spark.read.parquet(out_dir).count() == rep["rows_out"]


def test_curation_stages_run_in_streaming(spark, docs, tmp_path):
    """The stateless curation stages (quality predicates, PII scrub,
    split assignment) are plain column expressions, so the SAME code
    runs under Structured Streaming — batch/stream outputs are
    row-identical. (The dedup/repetition stages need state and live in
    streaming/dedup_stream.py / merge_sink.py instead.)"""
    from wroclaw_bike_stats_spark.operators import pipeline as P

    src_dir = str(tmp_path / "src")
    sink_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    docs.limit(50).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def stages(df):
        out = df.filter(T.token_count_ws(F.col("text")) >= 5)
        out = out.withColumn("text", P.scrub_pii(F.col("text")))
        return P.hash_split_assign(out)

    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        stages(stream)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_rows = sorted(
        (r.doc_id, r.split, r.text)
        for r in stages(spark.read.parquet(src_dir)).collect()
    )
    stream_rows = sorted(
        (r.doc_id, r.split, r.text)
        for r in spark.read.parquet(sink_dir).collect()
    )
    assert stream_rows == batch_rows and len(batch_rows) > 0
