"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with a metadata struct; the
Spark-side machinery (schemas, partition-friendly batch shapes, Arrow
UDF signatures, feature tables) is real and tested, while the actual
codec work is stubbed: the container has no image/audio libraries, so
``decode_asset`` raises NotImplementedError by contract and
``extract_features`` computes a deterministic fake feature vector from
the payload bytes (hash-derived), exercising the full distributed path.

At deployment you swap ``_decode_stub``/``_feature_kernel`` for real
Pillow/torchaudio kernels — signatures and schemas stay unchanged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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

from ..kernels.hashing import hash64, splitmix64

ASSETS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FEATURE_DIM = 16
_KINDS = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]


def make_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table (payload = seeded bytes)."""
    rows = []
    state = seed
    for i in range(n):
        kind, mime = _KINDS[i % len(_KINDS)]
        state = splitmix64(state)
        payload = state.to_bytes(8, "little") * (4 + i % 7)
        rows.append(
            (
                i,
                kind,
                payload,
                mime,
                64 + i % 128 if kind == "image" else None,
                64 + (i * 3) % 128 if kind == "image" else None,
                1000 + i % 9000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=ASSETS_SCHEMA)


def _feature_kernel(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake feature extractor (stands in for a real
    decoder+model); derived purely from payload bytes."""
    h = hash64(kind) ^ hash64(payload.hex())
    out = np.empty(FEATURE_DIM, dtype=np.float32)
    state = h
    for j in range(FEATURE_DIM):
        state = splitmix64(state)
        out[j] = (state % 10_000) / 10_000.0
    return out


def decode_asset(payload: bytes, kind: str):
    """REAL-decoder slot.  The sandbox has no codec libraries; the
    deployment build replaces this body (signature is the contract)."""
    raise NotImplementedError(
        f"no codec library available for kind={kind}; "
        "swap in Pillow/torchaudio/pyav at deployment"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """assets -> fixed-dim feature table via Arrow-batched mapInPandas.

    Batch shape contract: input batches carry (asset_id, kind, payload)
    only (html-sized payloads never join the shuffle); output is one
    row per asset with a FEATURE_DIM float vector.
    """
    src = assets.select("asset_id", "kind", "payload")

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                vec = _feature_kernel(bytes(payload), kind)
                rows.append((aid, kind, len(payload), vec.tolist()))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "n_bytes", "feature"]
            ).astype({"n_bytes": "int32"} if rows else {})

    return src.mapInPandas(feat_batches, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("t_ms", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)

FRAME_BYTES = 16


def _frame_kernel(payload: bytes, duration_ms: int, every_ms: int):
    """Deterministic frame sampler stand-in: one fixed-size byte window
    per sample instant, stride derived from the sample time's relative
    position in the payload.  A real build replaces this with the codec
    (pyav keyframe seek / torchaudio slice); the (asset, t_ms) ->
    fixed-size frame row contract is what the pipeline depends on."""
    n = len(payload)
    out = []
    for idx, t in enumerate(range(0, max(duration_ms, 1), every_ms)):
        off = (t * max(n - FRAME_BYTES, 1)) // max(duration_ms, 1)
        chunk = payload[off : off + FRAME_BYTES]
        out.append((idx, t, chunk.ljust(FRAME_BYTES, b"\0")))
    return out


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Timed assets (audio/video) -> one row per sampled frame.

    Batch shape contract: input (asset_id, kind, payload, duration_ms);
    output fan-out rows with fixed-size frame payloads — the shape a
    frame-level feature extractor (extract_features over frames) or a
    frame dedup consumes.  Image assets (duration NULL) sample exactly
    one frame at t=0.  Narrow plan: fan-out happens inside the Arrow
    batch, no shuffle; downstream per-frame work partitions on
    (asset_id, frame_idx) without ever shuffling whole payloads.
    """
    src = assets.select("asset_id", "kind", "payload", "duration_ms")

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload, dur in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                dur_ms = 1 if (dur is None or pd.isna(dur)) else int(dur)
                for idx, t, frame in _frame_kernel(
                    bytes(payload), dur_ms, every_ms
                ):
                    rows.append((aid, idx, t, frame))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "t_ms", "frame"]
            ).astype({"frame_idx": "int32", "t_ms": "int32"} if rows else {})

    return src.mapInPandas(frame_batches, schema=FRAMES_SCHEMA)


def asset_stats(assets: DataFrame) -> DataFrame:
    """Relational metadata rollup (JVM-side): per kind, payload sizes
    and dimension stats — the oracle-able face of the modality table."""
    return (
        assets.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("duration_ms"), 4).alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
