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


def synthesize_wav_media(spark: SparkSession, n: int = 32) -> DataFrame:
    """Audio media table with REAL (stdlib-`wave`) PCM16 WAV payloads:
    deterministic sine per media_id (freq 220 + 55*(i%16) Hz, amplitude
    6000, 8 kHz, 1600 samples, mono). Samples use trunc(6000*sin(...)),
    which DuckDB reproduces bit-for-bit (trunc + libm sin), so decoded-
    feature oracles are exact."""
    import io
    import math
    import wave as _wave

    rows = []
    for i in range(n):
        freq = 220.0 + 55.0 * (i % 16)
        samples = [
            int(6000 * math.sin(2 * math.pi * freq * k / 8000.0))
            for k in range(1600)
        ]
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(b"".join(s.to_bytes(2, "little", signed=True) for s in samples))
        rows.append((i, "audio", "audio/wav", bytearray(buf.getvalue()), (None, None, 200)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(payload: bytes, kind: str):
    """Real decode where a codec exists in this environment:

    - audio: stdlib `wave` (PCM WAV) → {sample_rate, n_channels,
      samples: list[int]} — fully functional, no third-party deps;
    - image: Pillow when importable (optional-import branch), else
      NotImplementedError;
    - video: NotImplementedError (no ffmpeg in this container).

    The import-gated branches are the documented codec boundary; the
    pipeline plumbing itself (schemas, Arrow batches, partitioning) is
    identical for real and stubbed decodes."""
    if kind == "audio":
        import io
        import wave as _wave

        with _wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            sr = w.getframerate()
            nch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width != 2:
            raise NotImplementedError(f"only PCM16 supported, got width={width}")
        samples = [
            int.from_bytes(raw[i : i + 2], "little", signed=True)
            for i in range(0, len(raw), 2)
        ]
        return {"sample_rate": sr, "n_channels": nch, "samples": samples}
    if kind == "image":
        try:
            import io

            from PIL import Image  # noqa: F401 — optional dependency
        except ImportError as ex:
            raise NotImplementedError(
                "image decode needs pillow (not in this container); "
                "audio decodes for real via stdlib wave"
            ) from ex
        return Image.open(io.BytesIO(bytes(payload)))
    raise NotImplementedError(
        f"no codec for {kind} in this environment; install ffmpeg "
        "and swap into extract_features"
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), False),
        T.StructField("max_abs", T.LongType(), False),
        T.StructField("sum_abs", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction: Arrow-batched mapInPandas decoding
    each WAV payload with the stdlib codec and emitting integer-exact
    features (n_samples, rate, max|s|, Σ|s|, zero crossings — sign
    change on a >=0 basis). All values are integers, so the DuckDB
    oracle regenerating the waveform analytically matches exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURE_SCHEMA.fields}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                dec = decode_media(bytes(payload), "audio")
                s = np.asarray(dec["samples"], dtype=np.int64)
                nonneg = s >= 0
                out["media_id"].append(int(media_id))
                out["n_samples"].append(int(s.size))
                out["sample_rate"].append(int(dec["sample_rate"]))
                out["max_abs"].append(int(np.abs(s).max()) if s.size else 0)
                out["sum_abs"].append(int(np.abs(s).sum()))
                out["zero_crossings"].append(int((nonneg[1:] != nonneg[:-1]).sum()))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA
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
