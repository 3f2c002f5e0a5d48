"""RDF → labeled-property-graph projection.

The reference emits an RDF quad view of the data (toRdf,
crates/core/src/rdf/mod.rs); downstream graph consumers — Cypher/
Gremlin engines, GNN feature pipelines, visualization — want the LPG
shape instead: nodes with label sets and key/value properties, plus a
relationship table. The standard projection (every IRI/bnode term is a
node; rdf:type objects become labels; literal-object triples become
node properties; node-object triples become relationships) is pure
DataFrame algebra:

- one subject-keyed aggregation for the label sets (`array_sort ∘
  collect_set` — bounded by a node's type count, not its degree);
- properties and relationships are plain filtered projections of the
  quad table (predicate filters push to the parquet scan);
- the node id universe is the union of subjects and relationship
  objects — one dedup on the node id.

Nothing here shuffles the corpus more than once per output table, and
the three outputs are independent plans (materialize only what the
consumer reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def to_property_graph(
    triples: DataFrame, rdf_type: str = RDF_TYPE
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Project a quad table into the LPG triple of tables:

    - ``nodes (id, labels)`` — every IRI/blank subject plus every
      relationship target; ``labels`` = sorted array of the node's
      rdf:type objects (empty array when untyped);
    - ``edges (src, rel, dst)`` — node-object triples, rdf:type
      excluded;
    - ``props (id, key, value, datatype, lang)`` — literal-object
      triples, one row per value (multi-valued properties stay
      multi-row; no map-typed columns, so every output is hashable
      and join-friendly).

    Graph names are intentionally dropped — the projection is over the
    merged view, matching how LPG engines ingest a single graph.
    """
    typed = triples.filter(F.col("pred") == rdf_type)
    labels = (
        typed.groupBy(F.col("subj").alias("id"))
        .agg(F.array_sort(F.collect_set("obj")).alias("labels"))
    )
    edges = (
        triples.filter(
            (F.col("pred") != rdf_type)
            & F.col("obj_kind").isin("iri", "bnode")
        )
        .select(
            F.col("subj").alias("src"),
            F.col("pred").alias("rel"),
            F.col("obj").alias("dst"),
        )
    )
    props = (
        triples.filter(F.col("obj_kind") == "literal")
        .select(
            F.col("subj").alias("id"),
            F.col("pred").alias("key"),
            F.col("obj").alias("value"),
            "datatype",
            "lang",
        )
    )
    ids = (
        triples.select(F.col("subj").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    nodes = ids.join(labels, "id", "left").select(
        "id",
        F.coalesce(
            "labels", F.array().cast("array<string>")
        ).alias("labels"),
    )
    return nodes, edges, props
