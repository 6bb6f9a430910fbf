"""Multimodal asset handling — binary payload columns + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata;
all Spark-side plumbing (schema, batched mapInPandas, partition-size
control) is real, while the actual media decode is stubbed:
the decode libs (PIL/ffmpeg/torchaudio) are not in this container, so
``decode_payload`` raises ``NotImplementedError`` unless
``fake_decode=True``, which produces a *deterministic* fake decode
(seeded by the payload hash) with the same shapes a real decoder would
emit.  Tests pin the plumbing: schema, batch shapes, determinism.

Design notes for 100 TB: assets flow through ``mapInPandas`` so one
task streams many Arrow batches without materializing the partition;
``spark.sql.files.maxPartitionBytes`` + the Arrow batch cap bound
worker memory, and feature extraction emits fixed-width vectors so
downstream tables stay columnar.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["ASSET_SCHEMA", "FEATURE_SCHEMA", "documents_to_assets", "extract_features"]

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", StringType()),  # placeholder; real col is binary
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def documents_to_assets(docs: DataFrame) -> DataFrame:
    """Synthesize an asset table from documents: payload = utf-8 bytes of
    text, kind assigned deterministically.  Stands in for a real
    (path, bytes) scan of an object store."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("asset-"), F.col("doc_id")).alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def decode_payload(payload: bytes, kind: str, fake_decode: bool) -> dict:
    """Decode one asset.  REAL decode is stubbed (no media libs in this
    environment); the fake path is deterministic in the payload bytes."""
    if not fake_decode:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg, not available here; "
            "pass fake_decode=True for the deterministic test double"
        )
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    seed = int.from_bytes(digest, "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    if kind == "image":
        w, h, frames = int(rng.integers(16, 257)), int(rng.integers(16, 257)), 1
    elif kind == "audio":
        w, h, frames = 0, 0, int(rng.integers(1000, 48001))
    else:  # video
        w, h, frames = int(rng.integers(16, 129)), int(rng.integers(16, 129)), int(
            rng.integers(8, 65)
        )
    feat = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "n_frames": frames,
        "feature": feat,
    }


def extract_features(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                d = decode_payload(bytes(payload), kind, fake_decode)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "kind": kind,
                        "n_bytes": d["n_bytes"],
                        "width": d["width"],
                        "height": d["height"],
                        "n_frames": d["n_frames"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)
