"""Streaming/batch equivalence: the Structured Streaming snapshot
differ must emit the same event multiset as the batch series diff over
the reference's real snapA/snapB (SURVEY.md §2.9; reference cadence
src/pipeline.py:13–33)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from wroclaw_bike_stats_spark.operators.snapshot_diff import diff_snapshot_series
from wroclaw_bike_stats_spark.sources.snapshots import (
    flatten_snapshots,
    read_snapshots,
)
from wroclaw_bike_stats_spark.streaming.status_stream import run_available_now

SNAP_A = "/root/reference/data/sample/snapA.json"
SNAP_B = "/root/reference/data/sample/snapB.json"

EVENT_KEY = ["timestamp", "bike_id", "event_type", "station_name", "station_id"]


def _multiset(df):
    return sorted(tuple(r) for r in df.select(*EVENT_KEY).collect())


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "landing": str(tmp_path / "landing"),
        "events": str(tmp_path / "events"),
        "state": str(tmp_path / "state"),
        "checkpoint": str(tmp_path / "checkpoint"),
    }
    (tmp_path / "landing").mkdir()
    return d


def test_streaming_matches_batch_diff(spark, dirs):
    """Both snapshots land before the first run: the stream (one file
    per micro-batch, state carried between batches) must emit exactly
    the batch series-diff events."""
    shutil.copy2(SNAP_A, f"{dirs['landing']}/bike_rides_a.json")
    shutil.copy2(SNAP_B, f"{dirs['landing']}/bike_rides_b.json")
    got = run_available_now(
        spark, dirs["landing"], dirs["events"], dirs["state"], dirs["checkpoint"]
    )
    expected = diff_snapshot_series(
        flatten_snapshots(read_snapshots(spark, [SNAP_A, SNAP_B]))
    )
    assert _multiset(got) == _multiset(expected)
    assert got.count() == 24


def test_streaming_three_snapshots_incremental(spark, dirs, tmp_path):
    """Three snapshots across two runs: run 1 sees A+B, run 2 sees a
    synthetic C where bike 590066 vanishes — the union of both runs'
    events must equal the batch series diff over all three."""
    import json

    shutil.copy2(SNAP_A, f"{dirs['landing']}/bike_rides_a.json")
    shutil.copy2(SNAP_B, f"{dirs['landing']}/bike_rides_b.json")
    run_available_now(
        spark, dirs["landing"], dirs["events"], dirs["state"], dirs["checkpoint"]
    )

    # snapC = snapB minus bike 590066's place, newer timestamp
    doc = json.loads(open(SNAP_B, encoding="utf-8").read())
    doc["_fetched_at"] = "2025-08-21T15:07:02+02:00"
    for city in doc["data"][0]["cities"]:
        city["places"] = [
            p
            for p in city.get("places", [])
            if 590066 not in [b.get("number") for b in (p.get("bikes") or [])]
        ]
    snap_c = tmp_path / "snapC.json"
    snap_c.write_text(json.dumps(doc), encoding="utf-8")
    shutil.copy2(snap_c, f"{dirs['landing']}/bike_rides_c.json")

    got = run_available_now(
        spark, dirs["landing"], dirs["events"], dirs["state"], dirs["checkpoint"]
    )
    expected = diff_snapshot_series(
        flatten_snapshots(read_snapshots(spark, [SNAP_A, SNAP_B, str(snap_c)]))
    )
    assert _multiset(got) == _multiset(expected)
    # the C-run must contain 590066's departure stamped with C's ts
    dep = got.filter(
        (F.col("bike_id") == "590066")
        & (F.col("event_type") == "departed")
        & (F.col("timestamp") == "2025-08-21T15:07:02+02:00")
    )
    assert dep.count() == 1


def test_streaming_incremental_runs(spark, dirs):
    """Cron parity: snapA processed in run 1, snapB lands later and is
    processed by run 2 against the durable state — the union of both
    runs' events equals the batch diff; run 2 reprocesses nothing."""
    shutil.copy2(SNAP_A, f"{dirs['landing']}/bike_rides_a.json")
    first = run_available_now(
        spark, dirs["landing"], dirs["events"], dirs["state"], dirs["checkpoint"]
    )
    assert first.count() == 0  # single snapshot → no pairs → no events

    shutil.copy2(SNAP_B, f"{dirs['landing']}/bike_rides_b.json")
    got = run_available_now(
        spark, dirs["landing"], dirs["events"], dirs["state"], dirs["checkpoint"]
    )
    expected = diff_snapshot_series(
        flatten_snapshots(read_snapshots(spark, [SNAP_A, SNAP_B]))
    )
    assert _multiset(got) == _multiset(expected)
    ev590066 = got.filter(F.col("bike_id") == "590066")
    assert {r["event_type"] for r in ev590066.collect()} == {"departed", "arrived"}


def test_state_versions_are_pruned(spark, dirs, tmp_path):
    """Long-running streams must not accumulate one state dir per
    micro-batch: after N batches at most 2 versions remain (newest +
    its predecessor for retry safety)."""
    import json
    import os

    shutil.copy2(SNAP_A, f"{dirs['landing']}/bike_rides_a.json")
    shutil.copy2(SNAP_B, f"{dirs['landing']}/bike_rides_b.json")
    run_available_now(
        spark, dirs["landing"], dirs["events"], dirs["state"], dirs["checkpoint"]
    )
    # third batch: synthetic snapshot C (copy of B with a bumped ts)
    snap = json.load(open(SNAP_B))
    snap["_fetched_at"] = "2025-08-21T15:07:02+02:00"
    with open(f"{dirs['landing']}/bike_rides_c.json", "w") as f:
        json.dump(snap, f)
    run_available_now(
        spark, dirs["landing"], dirs["events"], dirs["state"], dirs["checkpoint"]
    )
    versions = [n for n in os.listdir(dirs["state"]) if n.startswith("v")]
    assert len(versions) <= 2, versions
