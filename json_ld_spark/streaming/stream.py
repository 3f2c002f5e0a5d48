"""Structured-streaming ingest variant of the triple pipeline.

The reference is a pure batch library (SURVEY.md §2-I: no incremental
API), so streaming here is OUR scale feature, not parity: a transcripts
stream (files/kafka) flows through the same JVM-native triple projection
— mapInPandas and pure projections are both streaming-safe — with
watermarked per-conversation progress metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.native import transcript_triples_native
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_triples(stream: DataFrame) -> DataFrame:
    """Same triple extraction as batch — stateless projection, append-mode
    safe."""
    return transcript_triples_native(stream)


def streaming_turn_counts(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Windowed per-conversation turn counts with late-data watermark —
    the monitoring side channel (north_rule metrics)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
    )


def run_stream_to_memory(
    spark: SparkSession, path: str, query_name: str = "triples_stream"
) -> DataFrame:
    """Drive the stream to completion over existing files (test/smoke
    harness; production uses a real sink + checkpointLocation)."""
    stream = read_transcript_stream(spark, path)
    q = (
        streaming_triples(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
