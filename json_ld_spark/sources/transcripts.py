"""Transcripts input table (BASELINE.json input_hint):
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp) — synthesized deterministically, either from spark.range
(unit tests; unicode/quote/newline coverage) or from the driver's
documents.parquet (bench at sf scale). No external data.

All generation is DataFrame-native (JVM expressions, no Python UDF), so
it scales to any SF and any cluster size; zipf-ish conversation sizes
exercise skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.window import Window

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "python", "browser"]

TRANSCRIPT_VOCAB = "https://example.org/transcript#"
CONV_BASE = "https://example.org/conv/"

# The fixed transcript @context (driver-side processed once, broadcast).
TRANSCRIPT_CONTEXT = {
    "@vocab": TRANSCRIPT_VOCAB,
    "@base": CONV_BASE,
    "conv": {"@id": TRANSCRIPT_VOCAB + "conversation", "@type": "@id"},
    "role": TRANSCRIPT_VOCAB + "role",
    "text": TRANSCRIPT_VOCAB + "text",
    "tool": TRANSCRIPT_VOCAB + "tool",
    "ts": {
        "@id": TRANSCRIPT_VOCAB + "timestamp",
        "@type": "http://www.w3.org/2001/XMLSchema#dateTime",
    },
    "turn": TRANSCRIPT_VOCAB + "turnIndex",
    "mentions": {"@id": TRANSCRIPT_VOCAB + "mentions", "@type": "@id"},
}

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_UNICODE_SNIPPETS = [
    "héllo wörld",
    "数据处理 pipeline",
    'quote "inside" text',
    "line\nbreak\tand tab",
    "emoji 🚀 test",
    "plain ascii turn",
    "русский текст",
    "mixed 123 numbers",
]


def synthesize_transcripts(
    spark: SparkSession, n_convs: int = 50, avg_turns: int = 8, seed: int = 42
) -> DataFrame:
    """Deterministic synthetic transcripts with zipf-skewed conversation
    sizes: conversation c gets (c % (2*avg_turns)) + 1 turns plus one hot
    conversation with 10x turns (skew exercise). Pure column exprs."""
    # turn counts per conversation (deterministic)
    sizes = spark.range(n_convs).select(
        F.col("id").alias("conv_no"),
        F.when(F.col("id") == 0, avg_turns * 10)
        .otherwise((F.col("id") % (2 * avg_turns)) + 1)
        .cast("int")
        .alias("n_turns"),
    )
    turns = sizes.select(
        "conv_no", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx")
    )
    snippet_arr = F.array(*[F.lit(s) for s in _UNICODE_SNIPPETS])
    role_arr = F.array(*[F.lit(r) for r in ROLES])
    tool_arr = F.array(*[F.lit(t) for t in TOOLS])
    h = F.abs(F.xxhash64("conv_no", "turn_idx", F.lit(seed)))
    return turns.select(
        F.concat(F.lit("conv-"), F.col("conv_no").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(role_arr, (F.col("turn_idx") % 4 + 1).cast("int")).alias("role"),
        F.concat(
            F.element_at(snippet_arr, (h % 8 + 1).cast("int")),
            F.lit(" #"),
            F.col("conv_no").cast("string"),
            F.lit("/"),
            F.col("turn_idx").cast("string"),
        ).alias("text"),
        F.when(
            F.col("turn_idx") % 5 == 3,
            F.element_at(tool_arr, (h % 3 + 1).cast("int")),
        ).alias("tool"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=F.col("conv_no") * 10000 + F.col("turn_idx") * 7)
        ).alias("ts"),
    )


def transcripts_from_documents(
    spark: SparkSession, sf_dir: str, turns_per_conv: int = 16, amplify: int = 1
) -> DataFrame:
    """Bench-scale transcripts: one turn per documents.parquet row, text
    carried through byte-identical (the per-turn text equality invariant
    applies to this column). Deterministic: ordering key is doc_id.

    amplify>1 replicates every document into `amplify` distinct
    conversations (throughput/scaling benchmarks only — correctness
    queries use amplify=1 to stay oracle-comparable). Replication is an
    explode of a literal sequence: pure JVM, no data skew introduced.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if amplify > 1:
        docs = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1)))
        ).withColumn(
            "doc_id",
            F.col("doc_id") + F.col("rep").cast("long") * F.lit(100_000_000).cast("long"),
        )
    role_arr = F.array(*[F.lit(r) for r in ROLES])
    conv_no = (F.col("doc_id") / turns_per_conv).cast("long")
    turn_idx = (F.col("doc_id") % turns_per_conv).cast("int")
    return docs.select(
        F.concat(F.lit("conv-"), conv_no.cast("string")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.element_at(role_arr, (F.col("doc_id") % 4 + 1).cast("int")).alias("role"),
        F.col("text").alias("text"),
        F.when(F.col("doc_id") % 7 == 3, F.lit("search")).alias("tool"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id").cast("long"))
        ).alias("ts"),
    )


def turns_to_jsonld(transcripts: DataFrame) -> DataFrame:
    """Build one JSON-LD document per turn — entirely JVM-side
    (to_json(struct(...)); no Python). The @context is NOT inlined: the
    expansion stage receives it pre-processed + broadcast (SURVEY.md §1.3
    'Active Context' row), so executors never re-parse it.

    Output: (doc_id string, conv_id, turn_idx, doc string).
    """
    doc_struct = F.struct(
        F.concat(F.col("conv_id"), F.lit("/turn/"), F.col("turn_idx").cast("string")).alias("@id"),
        F.lit("Turn").alias("@type"),
        F.col("role").alias("role"),
        F.col("text").alias("text"),
        F.col("tool").alias("tool"),
        F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.col("conv_id").alias("conv"),
        F.col("turn_idx").alias("turn"),
    )
    return transcripts.select(
        F.concat(F.col("conv_id"), F.lit("#"), F.col("turn_idx").cast("string")).alias("doc_id"),
        "conv_id",
        "turn_idx",
        F.to_json(doc_struct, {"ignoreNullFields": "true"}).alias("doc"),
    )
