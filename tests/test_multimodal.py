"""Multimodal binary-column plumbing: Arrow-batched feature
extraction, resize, and video frame sampling — decode steps are
deterministic fakes (no media libs in this runtime), the Spark-side
schema/batch/fan-out shapes are real."""

from __future__ import annotations

import pytest

from wroclaw_bike_stats_spark.operators.multimodal import (
    ASSET_SCHEMA,
    asset_metadata_stats,
    decode_image_real,
    extract_features,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", b"imagebytes-1", "image/png", 640, 480, None),
        (2, "image", b"imagebytes-2", "image/jpeg", 1920, 1080, None),
        (3, "audio", b"audiobytes-3", "audio/wav", None, None, 12.5),
        (4, "video", b"videobytes-4", "video/mp4", 1280, 720, 3.0),
        (5, "video", b"videobytes-5", "video/mp4", 1280, 720, 0.0),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA).cache()


def test_extract_features_deterministic(assets):
    a = {r["asset_id"]: r["feature"] for r in extract_features(assets).collect()}
    b = {r["asset_id"]: r["feature"] for r in extract_features(assets).collect()}
    assert a == b
    assert len(a) == 5
    assert all(len(v) == 8 for v in a.values())
    # different payloads → different fake features
    assert a[1] != a[2]


def test_resize_only_touches_images(assets):
    out = {r["asset_id"]: r for r in resize_images(assets, 64, 64).collect()}
    assert out[1]["width"] == 64 and out[1]["height"] == 64
    assert out[2]["width"] == 64 and out[2]["height"] == 64
    assert out[1]["payload"] != out[2]["payload"]  # digest-derived
    # non-images pass through untouched
    assert out[3]["payload"] == b"audiobytes-3"
    assert out[4]["width"] == 1280


def test_sample_frames_fanout(assets):
    frames = sample_frames(assets, fps=2.0).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # 3.0s at 2fps → int(6)+1 = 7 frames; 0.0s → 1 frame; non-video none
    assert len(by_asset[4]) == 7
    assert len(by_asset[5]) == 1
    assert set(by_asset) == {4, 5}
    f = sorted(by_asset[4], key=lambda r: r["frame_idx"])
    assert [r["ts_s"] for r in f] == [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0]
    # distinct timestamps → distinct fake frames
    assert len({bytes(r["frame"]) for r in f}) == 7


def test_metadata_stats_never_reads_payload(spark, assets, tmp_path):
    """Column pruning must reach the parquet scan: the metadata-only
    aggregate's ReadSchema excludes the binary payload column."""
    path = str(tmp_path / "assets.parquet")
    assets.write.parquet(path)
    on_disk = spark.read.parquet(path)
    plan = (
        asset_metadata_stats(on_disk)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("payload" not in ln for ln in read_schema)
    rows = {r["media_type"]: r for r in asset_metadata_stats(assets).collect()}
    assert rows["image"]["n_assets"] == 2
    assert rows["video"]["avg_duration_s"] == pytest.approx(1.5)


def test_real_decoder_is_an_honest_stub():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"bytes")
