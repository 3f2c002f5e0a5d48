"""Headline benchmark. Runs the flagship KG pipeline + the heavy
operator families at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], printing ONE JSON line:

  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "derived": {"triples_per_sec_native": ..., "triples_per_sec_generic": ...}}

Scaling evidence (N vs 4N cores) is produced by scripts/scaling_bench.py
and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F, types as T

from json_ld_spark.operators import dedup as dd
from json_ld_spark.operators import linking as lk
from json_ld_spark.operators import similarity as sim
from json_ld_spark.operators import textops as tx
from json_ld_spark.operators.jsonld import dedup_triples, node_table, triples_stage
from json_ld_spark.operators.native import transcript_triples_native
from json_ld_spark.options import JsonLdOptions
from json_ld_spark.plans.kg import build_kg
from json_ld_spark.session import get_spark
from json_ld_spark.sources.transcripts import (
    TRANSCRIPT_CONTEXT,
    transcripts_from_documents,
    turns_to_jsonld,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "40"))
    spark = get_spark("bench", cores=cores)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    transcripts = (
        transcripts_from_documents(spark, sf_dir, amplify=amplify)
        .repartition(max(cores * 2, 16), "conv_id")
        .cache()
    )
    n_turns = transcripts.count()  # warm the cache outside the timers
    # small parquet files arrive as one partition — spread them so the
    # per-row-heavy operators (minhash, simhash, cosine) use every core,
    # exactly as a real 100 TB scan would arrive pre-partitioned
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cores * 2).cache()
    docs.count()
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast(T.ArrayType(T.DoubleType())).alias("embedding"))
        .repartition(cores * 2)
        .cache()
    )
    dim = len(emb.first()[1])

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name: str, thunk, warm=None):
        if warm is not None:
            warm()  # compile codegen + spin python workers outside the timer
        best = float("inf")
        for _ in range(2):  # best-of-2: the host shows episodic CPU steal
            t0 = time.time()
            counts[name] = thunk()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # warmup slices spread over every core: limit() alone collapses to a
    # single partition and would warm exactly one python worker
    small_t = transcripts.limit(2048).repartition(cores).cache()
    small_t.count()
    small_d = docs.limit(512).repartition(cores).cache()
    small_d.count()

    # flagship: Catalyst-native triple extraction → dedup → node merge
    run(
        "kg_native_e2e",
        lambda: node_table(dedup_triples(transcript_triples_native(transcripts))).count(),
        warm=lambda: node_table(dedup_triples(transcript_triples_native(small_t))).count(),
    )
    n_triples = transcript_triples_native(transcripts).count()

    # full JSON-LD engine (context → expand → node map → toRdf) via Arrow UDF
    run(
        "kg_generic_triples",
        lambda: triples_stage(
            turns_to_jsonld(transcripts),
            context=TRANSCRIPT_CONTEXT,
            options=JsonLdOptions(),
        ).count(),
        warm=lambda: triples_stage(
            turns_to_jsonld(small_t),
            context=TRANSCRIPT_CONTEXT,
            options=JsonLdOptions(),
        ).count(),
    )

    # entity linking (mentions → broadcast dict join → scored top-1)
    dictionary = lk.synthesize_entity_dictionary(spark, sf_dir, max_entities=2000).cache()
    dictionary.count()
    run(
        "kg_linked_pipeline",
        lambda: build_kg(transcripts, entity_dictionary=dictionary, engine="native")[
            "triples"
        ].count(),
        warm=lambda: build_kg(small_t, entity_dictionary=dictionary, engine="native")[
            "triples"
        ].count(),
    )

    run("dedup_minhash_lsh", lambda: dd.jaccard_pairs(
        docs, dd.minhash_lsh_candidates(docs), threshold=0.7).count(),
        warm=lambda: dd.jaccard_pairs(
            small_d, dd.minhash_lsh_candidates(small_d), threshold=0.7).count())
    run("dedup_simhash", lambda: dd.simhash_near_duplicates(docs).count(),
        warm=lambda: dd.simhash_near_duplicates(small_d).count())
    run(
        "ann_lsh_topk",
        lambda: sim.lsh_topk(
            emb.filter(F.col("vec_id") % 100 == 0), emb, dim=dim, k=5
        ).count(),
    )
    run("text_stats", lambda: tx.analyze_documents(docs).count())

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    run(
        "rel_agg_pricing",
        lambda: li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.count(F.lit(1)))
        .count(),
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    run(
        "rel_join_topnations",
        lambda: orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)))
        .count(),
    )

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "kg_headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cores,
        "amplify": amplify,
        "derived": {
            "n_turns": n_turns,
            "n_triples_native": n_triples,
            "triples_per_sec_native": round(n_triples / max(timings["kg_native_e2e"], 1e-9), 1),
            "triples_per_sec_generic": round(n_triples / max(timings["kg_generic_triples"], 1e-9), 1),
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
