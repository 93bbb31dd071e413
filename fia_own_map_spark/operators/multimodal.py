"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata. The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas partition flow — is real
and tested; the actual codec work is STUBBED (no image/audio libraries in
this container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (parses the header
of the synthetic blob format) stands in so the pipeline shape is exercised
end-to-end.

Synthetic blob format (deterministic): b"IMG|<width>|<height>|<channel-bytes>".
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def make_fake_image(media_id: str, width: int, height: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return b"IMG|%d|%d|" % (width, height) + payload


def _decode_fake(blob: bytes) -> tuple[int, int, np.ndarray]:
    head, w, h, payload = blob.split(b"|", 3)
    if head != b"IMG":
        raise ValueError("not a fake IMG blob")
    return int(w), int(h), np.frombuffer(payload, dtype=np.uint8)


def decode_and_featurize(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    fake: bool = False,
) -> DataFrame:
    """mapInPandas decode + feature extraction (mean/std/min/max of pixels).

    With ``fake=False`` this raises NotImplementedError at execution time —
    a real deployment drops in PIL/ffmpeg here; the Spark plumbing (Arrow
    batches, schema, per-partition flow) is identical either way.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                if not fake:
                    raise NotImplementedError(
                        "real image decoding requires PIL/ffmpeg — not in this container; "
                        "pass fake=True for the deterministic stub decoder"
                    )
                w, h, px = _decode_fake(bytes(blob))
                feats = [
                    float(px.mean()),
                    float(px.std()),
                    float(px.min()),
                    float(px.max()),
                ]
                rows.append((mid, w, h, len(blob), feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "features"]
            )

    return df.mapInPandas(_batches, IMAGE_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* shape: explode frame indices from metadata
    (n_frames column), real decode stubbed as above."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
    )
