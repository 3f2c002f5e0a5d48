"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata. The Spark-side contract (schemas, partition shape,
Arrow batch flow through mapInPandas) is real and tested; the actual
codec work is stubbed behind deterministic fakes / NotImplementedError
because no image/audio libraries ship in this container (task brief).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes (ASCII hex
    so the DuckDB oracle can replay the feature hash with its
    VARCHAR-only sha256; the column is still opaque binary)."""
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = (hashlib.sha256(f"media{i}".encode()).hexdigest() * 4).encode()
        meta = (
            (64 + i % 128, 64 + (i * 7) % 128, None)
            if kind == "image"
            else (None, None, 1000 + i * 33)
        )
        rows.append((i, kind, mimes[kind], bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(payload: bytes, kind: str):  # pragma: no cover - stub
    """REAL CODECS GO HERE. Container has no PIL/ffmpeg; the pipeline
    plumbing uses `fake_feature` below (deterministic) instead."""
    raise NotImplementedError(
        f"no codec for {kind} in this environment; install pillow/ffmpeg "
        "and swap into extract_features"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode→embed: hash-derived floats."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8, use_real_codecs: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. Batch shape
    and schema are production-real; the decode call is the only stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if use_real_codecs:
                    decode_media(bytes(payload), kind)  # raises: stub
                feats.append(_fake_feature(bytes(payload), dim))
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: explode sample timestamps from the
    metadata duration (JVM-side); the decoder would map each (media_id,
    ts) to a frame. Demonstrates the fan-out shape without codecs."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_ms"),
        )
    )
