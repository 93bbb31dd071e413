"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns with typed metadata; all operators run
as Arrow-batched ``mapInPandas`` over the blob column (the Spark-side shape
— schema, batching, per-partition flow — is identical for any codec).

Codecs in this container:
  * ``bmp``  — REAL decoder/encoder for 24-bit uncompressed BMP (pure byte
    parsing, no external libs): decode -> numpy (h, w, 3), nearest-neighbor
    resize, channel statistics. This is the tested real path.
  * ``fake`` — deterministic synthetic blob (``b"IMG|w|h|payload"``) for
    plumbing tests.
  * PNG/JPEG/audio/video bitstreams — STUBBED with NotImplementedError: real
    deployments drop PIL/ffmpeg into ``_decode``; nothing else changes.

Blob auto-detection by magic bytes (``codec="auto"``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
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


# ---------------------------------------------------------------------------
# real codec: 24-bit uncompressed BMP (public format, pure byte parsing)
# ---------------------------------------------------------------------------
def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BMP bytes (BITMAPINFOHEADER, bottom-up,
    4-byte-padded rows)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    # pixel rows bottom-up, channels BGR, rows padded
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(blob: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB. Handles
    bottom-up (positive height) and top-down (negative height) files."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP blob")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    header_size = struct.unpack_from("<I", blob, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    px = np.frombuffer(blob, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = px.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (pixel-center sampling)."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# fake codec (plumbing tests)
# ---------------------------------------------------------------------------
def make_fake_image(media_id: str, width: int, height: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return b"IMG|%d|%d|" % (width, height) + payload


def _decode_fake(blob: bytes) -> tuple[int, int, np.ndarray]:
    head, w, h, payload = blob.split(b"|", 3)
    if head != b"IMG":
        raise ValueError("not a fake IMG blob")
    return int(w), int(h), np.frombuffer(payload, dtype=np.uint8)


# ---------------------------------------------------------------------------
# decode dispatch
# ---------------------------------------------------------------------------
def _decode(blob: bytes, codec: str) -> tuple[int, int, np.ndarray]:
    """-> (width, height, flat pixel array). codec='auto' sniffs magic bytes."""
    if codec == "auto":
        if blob[:2] == b"BM":
            codec = "bmp"
        elif blob[:4] == b"IMG|":
            codec = "fake"
        elif blob[:8] == b"\x89PNG\r\n\x1a\n" or blob[:3] == b"\xff\xd8\xff":
            raise NotImplementedError(
                "PNG/JPEG decoding requires PIL — not in this container; "
                "drop a real decoder into multimodal._decode in deployment"
            )
        else:
            raise ValueError("unrecognized media blob")
    if codec == "bmp":
        img = decode_bmp(blob)
        return img.shape[1], img.shape[0], img.reshape(-1)
    if codec == "fake":
        return _decode_fake(blob)
    raise NotImplementedError(f"codec {codec!r}")


def decode_and_featurize(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    fake: bool = False,
    codec: str = "auto",
) -> DataFrame:
    """mapInPandas decode + feature extraction (mean/std/min/max of pixels).

    ``codec='auto'`` dispatches per blob by magic bytes: BMP decodes for
    real; the synthetic IMG format uses the fake decoder; PNG/JPEG raise
    NotImplementedError (library codecs). ``fake=True`` forces the fake
    decoder (back-compat for plumbing tests)."""
    forced = "fake" if fake else codec

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                w, h, px = _decode(b, forced)
                feats = [
                    float(px.mean()),
                    float(px.std()),
                    float(px.min()),
                    float(px.max()),
                ]
                rows.append((mid, w, h, len(b), feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "features"]
            )

    return df.mapInPandas(_batches, IMAGE_META_SCHEMA)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """mapInPandas BMP resize: decode -> nearest-neighbor resize -> re-encode.
    (id, blob) -> (media_id, width, height, blob) with the resized BMP."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("blob", BinaryType()),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                img = decode_bmp(bytes(blob))
                out = resize_nearest(img, out_w, out_h)
                rows.append((mid, out_w, out_h, encode_bmp(out)))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "blob"])

    return df.mapInPandas(_batches, schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* shape: explode frame indices from metadata
    (n_frames column), real decode stubbed as above."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
    )
