"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The codec libraries are not in this
container, so the decode kernels are STUBBED with a deterministic fake
(clearly marked) — the Spark-side plumbing (schema, batching, partition
behavior, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),          # image | audio | video
        StructField("payload", BinaryType()),        # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),         # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode: real image/audio decoding needs codec libraries not
    present in this container. Deterministic fake: the 'decoded tensor'
    is a fixed-length float vector derived from the payload digest, so
    downstream plumbing (batching, schema, feature math) is exercised
    honestly and reproducibly. Replace with PIL/av/soundfile in prod."""
    digest = hashlib.sha256(payload if payload is not None else b"").digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def extract_features(media: DataFrame, feature_dim: int = 32) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one feature
    vector per media row out. Narrow (no shuffle); scales with input
    partitioning."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k)[:feature_dim].tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp —
    pure relational explode on the metadata (no decode needed), so the
    expensive decode can be partitioned per-frame downstream."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_ms", F.explode(frames))
        .select("media_id", "mime", "frame_ms")
    )


def decode_raw_gray(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake codec: interpret the payload as raw uint8
    grayscale pixels of (height, width), wrap-padded/truncated to size.
    This makes the resize pipeline's pixel math REAL numpy (batching,
    binary round-trip, metadata update all exercised end-to-end) while
    staying honest that actual PNG/JPEG decoding needs codec libraries
    absent from this container."""
    need = int(width) * int(height)
    buf = np.frombuffer(payload or b"", dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(need, dtype=np.uint8)
    elif buf.size < need:
        buf = np.tile(buf, need // buf.size + 1)
    return buf[:need].reshape(int(height), int(width))


def resize_images(
    media: DataFrame, width: int, height: int, codec: str = "raw-gray"
) -> DataFrame:
    """mapInPandas pixel resize (nearest-neighbor) over the binary
    column: decode via the deterministic raw-grayscale codec, index-map
    resample, re-encode bytes, update metadata. Narrow stage — scales
    with input partitioning, no shuffle. Any real mime codec raises
    NotImplementedError at the decode boundary (PIL/opencv not in this
    container) — swap ``decode_raw_gray`` for the real decoder in prod.
    """
    if codec != "raw-gray":
        raise NotImplementedError(
            f"codec {codec!r}: real image decoding requires PIL/opencv, "
            "not present in this container; 'raw-gray' exercises the "
            "full pipeline with a deterministic fake codec"
        )
    w2, h2 = int(width), int(height)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for p, w1, h1, kind in zip(
                pdf["payload"], pdf["width"], pdf["height"], pdf["kind"]
            ):
                # pass through non-images AND degenerate metadata (0/neg
                # dims from corrupt rows would index an empty axis)
                if (
                    kind != "image"
                    or pd.isna(w1)
                    or pd.isna(h1)
                    or int(w1) <= 0
                    or int(h1) <= 0
                ):
                    payloads.append(p)
                    widths.append(None if pd.isna(w1) else int(w1))
                    heights.append(None if pd.isna(h1) else int(h1))
                    continue
                img = decode_raw_gray(p, int(w1), int(h1))
                rows = (np.arange(h2) * img.shape[0]) // h2
                cols = (np.arange(w2) * img.shape[1]) // w2
                resized = img[rows][:, cols]
                payloads.append(resized.tobytes())
                widths.append(w2)
                heights.append(h2)
            out = pdf.copy()
            out["payload"] = payloads
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            yield out

    return media.mapInPandas(_resize, MEDIA_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Back-compat alias for :func:`resize_images` (raw-gray codec)."""
    return resize_images(media, width, height)


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload = seeded bytes."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(128 + i % 64))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32 if kind != "audio" else None,
                48 + i % 16 if kind != "audio" else None,
                (i % 10) * 1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
