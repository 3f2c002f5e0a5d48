"""End-to-end KG construction pipeline (BASELINE.json north_star):

transcripts → per-turn JSON-LD → triple extraction → entity linking →
dedup/merge → triple + node tables → write-audit-publish materialize.

Stage boundaries and shuffle plan (SURVEY.md §3.3):
  scan (pruned columns) → triple emission (codegen or Arrow UDF; NO
  shuffle) → mention/link broadcast join (NO shuffle) → dedup + node
  merge (the two key'd shuffles) → bucketed WAP write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..options import JsonLdOptions
from ..sources.transcripts import TRANSCRIPT_CONTEXT, TRANSCRIPT_VOCAB, turns_to_jsonld
from ..operators.jsonld import dedup_triples, node_table, triples_stage
from ..operators.native import transcript_triples_native
from ..operators.linking import extract_mentions, link_entities, mention_triples
from ..operators import checkpoint as cp

TEXT_PRED = TRANSCRIPT_VOCAB + "text"


def transcript_triples(
    transcripts: DataFrame, engine: str = "native"
) -> DataFrame:
    """Triple extraction over the transcript table.

    engine='native': pure Catalyst projection (the scale path).
    engine='generic': the full JSON-LD engine via Arrow UDF batches —
    same output, used for parity checks and for any schema the native
    partial evaluation doesn't cover.
    """
    if engine == "native":
        return transcript_triples_native(transcripts)
    docs = turns_to_jsonld(transcripts)
    return triples_stage(docs, context=TRANSCRIPT_CONTEXT, options=JsonLdOptions())


def build_kg(
    transcripts: DataFrame,
    entity_dictionary: DataFrame | None = None,
    engine: str = "native",
    link_strategy: str = "broadcast",
) -> dict[str, DataFrame]:
    """Compose the full pipeline; returns {'triples', 'nodes', 'links'}.

    Shuffle plan: ONE repartition by subj right after extraction — the
    subj hash-partitioning satisfies the clustering requirements of both
    the quad dedup (subset of its 7 keys) and the node merge
    ((graph, subj) keys), so neither adds an Exchange. Verified:
    3 shuffles → 1 for the extract→dedup→merge path.
    """
    raw = transcript_triples(transcripts, engine=engine)
    triples = raw.repartition("subj")
    # dedup BEFORE the mention union: runs exchange-free on the subj
    # partitioning; the mention side is deduped separately (it is tiny
    # and its predicate — transcript#mentions — is disjoint from the
    # extraction predicates, so no cross-side duplicates exist and
    # dedup(a ∪ b) = dedup(a) ∪ dedup(b)). Saves re-shuffling the whole
    # corpus after the union (measured 27.6s → ~3s at 5.7M quads).
    triples = dedup_triples(triples)

    links = None
    if entity_dictionary is not None:
        # mention source branches off the PRE-shuffle extraction, not the
        # deduped table: text rows are 1/7 of the quads and one-per-turn,
        # so a dropDuplicates on (subj, text) gives the same rows the
        # deduped table would — without making the mention path a second
        # consumer of the corpus-wide repartition+dedup agg (measured
        # 8.9s → 6.0s at 1.2M quads; at scale the branch is a
        # column-pruned scan + a 1/7-size shuffle instead of a second
        # full-corpus aggregation)
        text_rows = (
            raw.filter(F.col("pred") == TEXT_PRED)
            .select("subj", F.col("obj").alias("text"))
            .dropDuplicates(["subj", "text"])
        )
        mentions = extract_mentions(text_rows, text_col="text", subject_col="subj")
        links = link_entities(mentions, entity_dictionary, strategy=link_strategy)
        mention_tr = dedup_triples(
            mention_triples(links).withColumn("doc_id", F.col("subj"))
        )
        triples = triples.select(
            "graph", "subj", "pred", "obj_kind", "obj", "datatype", "lang", "doc_id"
        ).unionByName(mention_tr.select(
            "graph", "subj", "pred", "obj_kind", "obj", "datatype", "lang", "doc_id"
        ))

    nodes = node_table(triples)
    return {"triples": triples, "nodes": nodes, "links": links}


def materialize_kg(
    transcripts: DataFrame,
    out_dir: str,
    entity_dictionary: DataFrame | None = None,
    n_buckets: int = 32,
    engine: str = "native",
    bucketed_table: str | None = None,
) -> dict:
    """Resumable materialization: only not-yet-committed conversation
    buckets are processed (operators/checkpoint.py).

    ``bucketed_table``: additionally publish the triple table as a
    subj-bucketed (sorted) managed table — the triple-store layout.
    The bucketing shuffle is paid ONCE here; every later subj-keyed
    join or aggregation over the table (node merge, BGP star joins,
    point lookups) plans with ZERO Exchange and bucket pruning
    (SelectedBucketsCount) — see PLANS.md §19/§25. Refreshed from the
    published data even when the WAP resume finds nothing new to
    process, so the table always exists in the current catalog."""

    todo = cp.remaining_buckets(transcripts, out_dir, n_buckets, "conv_id")
    if not todo.take(1):
        result = {"run_id": None, "published_buckets": [], "total_rows": 0}
    else:
        parts = build_kg(
            todo.drop(cp.BUCKET_COL), entity_dictionary, engine=engine
        )
        # every subject in this pipeline is a turn IRI
        # (https://…/conv/<conv_id>/turn/<i>), so the bucket derives from
        # the same conv_id key the resume filter uses
        out = parts["triples"].withColumn(
            cp.BUCKET_COL,
            F.pmod(
                F.xxhash64(F.regexp_extract("subj", r"/conv/([^/]+)/turn/", 1)),
                F.lit(n_buckets),
            ).cast("int"),
        )
        result = cp.write_audit_publish(out, out_dir, n_buckets, key_col="conv_id")
    if bucketed_table is not None:
        spark = transcripts.sparkSession
        # refresh only when the published data changed or this session's
        # catalog does not have the table yet (the catalog dies with the
        # session; the data is WAP-committed and deterministic, so an
        # existing same-session table is already current)
        if result["run_id"] is not None or not spark.catalog.tableExists(
            bucketed_table
        ):
            published = cp.read_published(spark, out_dir).drop(cp.BUCKET_COL)
            cp.write_bucketed_table(
                published, bucketed_table, ["subj"], n_buckets=n_buckets
            )
        result["bucketed_table"] = bucketed_table
    return result
