"""Multimodal columns (north-star extension).

Images/audio/video are opaque ``binary`` columns + typed metadata; the
heavy decode/feature steps are Arrow-batched mapInPandas UDFs. The decode
libraries are not in this container, so decoding is STUBBED behind a
deterministic fake (clearly marked); the Spark-side plumbing — schema,
size-balanced partitioning, UDF signature, batch shape — is real and
tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int, list[float]]:
    """DETERMINISTIC FAKE decode (no image libs in container): pretends the
    binary is an image, derives (width, height, 8-d feature) from its md5.
    Replace body with PIL/torchvision when available — the UDF signature,
    Arrow batching, and schema do not change."""
    digest = hashlib.md5(content or b"").digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feature = [b / 255.0 for b in digest[2:10]]
    return width, height, feature


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + featurize image rows. One worker-side model instance per
    task in the real implementation; Arrow batches bound memory."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "feature": []}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                w, h, feat = _fake_decode(
                    bytes(content) if content is not None else b""
                )
                rows["media_id"].append(media_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["feature"].append(feat)
            yield pd.DataFrame(rows)

    return media.mapInPandas(_extract, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame. STUB decode —
    frame count is derived deterministically from content size (a real
    implementation reads container metadata via pyav)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame_time_s", T.DoubleType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_index": [], "frame_time_s": []}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                fake_duration = (len(content or b"") % 10) + 1
                for i in range(int(fake_duration / every_n_seconds)):
                    rows["media_id"].append(media_id)
                    rows["frame_index"].append(i)
                    rows["frame_time_s"].append(i * every_n_seconds)
            yield pd.DataFrame(rows)

    return media.mapInPandas(_sample, schema=schema)
