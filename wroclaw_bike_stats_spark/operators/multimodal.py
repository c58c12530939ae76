"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side design is real and tested — schemas, Arrow-batched
``mapInPandas`` plumbing, partitioning — while the actual media
decoding is STUBBED (image/audio libraries are not in this runtime
image): ``decode_fn=None`` uses a deterministic fake that derives
"features" from the bytes so the pipeline shape is exercisable
end-to-end; passing a real decoder later changes no plumbing.

Scale notes:
- binary payloads ride in the same parquet row groups as metadata;
  at 100 TB keep payloads in their own column (column pruning means
  metadata-only queries never read the bytes).
- ``mapInPandas`` streams Arrow record batches — per-batch Python cost
  is amortized over thousands of rows, and batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  is independent of corpus size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# A multimodal asset row: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # 'image' | 'audio' | 'video'
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),  # image/video
        StructField("height", LongType()),
        StructField("duration_s", DoubleType()),  # audio/video
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode→embed step: features
    derived from the payload digest. NOT a real decoder — replace via
    ``decode_fn`` when media libs are available."""
    digest = hashlib.sha256(payload or b"").digest()
    return [digest[i] / 255.0 for i in range(dim)]


def extract_features(
    assets: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_feature_dim: int = 8,
) -> DataFrame:
    """Decode/feature-extract every asset via Arrow-batched
    ``mapInPandas``.

    ``decode_fn`` maps raw bytes → feature vector. None → the
    deterministic fake (see module docstring). A real image decode
    (resize, frame-sample, …) plugs in here unchanged.
    """
    fn = decode_fn or (lambda b: _fake_decode_features(b, batch_feature_dim))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: fn(b or b"")),
                }
            )

    return assets.mapInPandas(_batches, FEATURES_SCHEMA)


def decode_image_real(payload: bytes) -> list[float]:  # pragma: no cover
    """Real image decode entry point — requires PIL/cv2, which this
    runtime image does not ship."""
    raise NotImplementedError(
        "image decoding libraries are not available in this environment; "
        "pass a decode_fn backed by PIL/cv2/ffmpeg in a full deployment"
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_s", DoubleType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real image resize: output bytes
    derived from (payload digest, target dims) with size proportional
    to the target area — preserves the real operator's shape (bytes →
    smaller bytes) without a decoder."""
    seed = hashlib.sha256(
        (payload or b"") + f":{width}x{height}".encode()
    ).digest()
    out_len = max(width * height // 64, 1)
    return (seed * (out_len // len(seed) + 1))[:out_len]


def resize_images(
    assets: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize every image asset via Arrow-batched ``mapInPandas``;
    non-image rows pass through untouched. ``resize_fn=None`` uses the
    deterministic fake (no decoder in this runtime); a PIL/cv2-backed
    function plugs in unchanged."""
    fn = resize_fn or _fake_resize

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            is_img = pdf["media_type"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(
                lambda b: fn(b or b"", width, height)
            )
            pdf.loc[is_img, "width"] = width
            pdf.loc[is_img, "height"] = height
            yield pdf[[f.name for f in RESIZED_SCHEMA.fields]]

    return assets.mapInPandas(_batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ts_s", DoubleType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    assets: DataFrame,
    fps: float = 1.0,
    max_frames: int = 32,
    extract_fn: Callable[[bytes, float], bytes] | None = None,
) -> DataFrame:
    """Sample frames from video assets at ``fps`` — the fan-out shape
    (1 input row → N frame rows) of a real ffmpeg frame extractor,
    expressed as ``mapInPandas`` yielding multiple output rows per
    input. Frame count derives from the ``duration_s`` metadata;
    ``extract_fn(payload, ts) -> frame_bytes`` is stubbed with a
    deterministic fake when no decoder is available."""
    fn = extract_fn or (
        lambda b, ts: hashlib.sha256(
            (b or b"") + f"@{ts:.3f}".encode()
        ).digest()
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"asset_id": [], "frame_idx": [], "ts_s": [], "frame": []}
            for _, r in pdf[pdf["media_type"] == "video"].iterrows():
                duration = r["duration_s"] or 0.0
                n = min(int(duration * fps) + 1, max_frames)
                for i in range(n):
                    ts = i / fps
                    rows["asset_id"].append(r["asset_id"])
                    rows["frame_idx"].append(i)
                    rows["ts_s"].append(ts)
                    rows["frame"].append(fn(r["payload"], ts))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(_batches, FRAME_SCHEMA)


def decode_audio_real(payload: bytes) -> list[float]:  # pragma: no cover
    """Real audio decode entry point — requires soundfile/librosa,
    which this runtime image does not ship."""
    raise NotImplementedError(
        "audio decoding libraries are not available in this environment; "
        "pass a decode_fn backed by soundfile/librosa in a full deployment"
    )


def asset_metadata_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never touches the payload column
    (column pruning keeps the binary bytes unread on disk)."""
    return assets.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.avg("duration_s").alias("avg_duration_s"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )
