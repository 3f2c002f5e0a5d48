"""RDFS entailment materialization (the ρdf fragment).

Beyond-reference, like framing: the reference workspace stops at toRdf
(crates/core/src/rdf/mod.rs — no inference crate), but a KG built from
100 TB of transcripts is queried through its ontology, so the engine
materializes the minimal-RDFS closure (rules rdfs2/3/5/7/9/11 of RDF
Schema 1.1; the ρdf deductive system of Muñoz, Pérez & Gutierrez,
"Minimal deductive systems for RDF").

Scale shape — the asymmetry is the whole design:

- the SCHEMA (subClassOf / subPropertyOf / domain / range triples) is
  ontology-sized (KBs), so its transitive closures run as the same
  semi-naive delta loop paths.py uses, each round a join on a tiny
  DataFrame;
- the INSTANCE side (everything else, ~100 TB) is touched only by
  **broadcast joins against those closed schema tables** — rdfs7
  (subPropertyOf propagation), rdfs2/3 (domain/range typing), rdfs9
  (subClassOf typing) are each one broadcast hash join + projection,
  so the corpus never shuffles until the single final dedup
  (`dropDuplicates` over the quad key), and even that is skippable
  via ``deduplicate=False`` when the consumer dedups anyway.

Rule application order is the classical stratification (spo closure →
rdfs7 → rdfs2/3 → sco closure → rdfs9), complete for ρdf in ONE pass —
no instance-level fixpoint is needed because derived triples only ever
add rdf:type facts or re-predicate existing facts, neither of which
feeds back into the schema. (Ontologies that derive NEW schema triples
through subPropertyOf-of-rdfs-vocabulary are out of fragment,
documented.)

Derived triples inherit the graph of the instance triple that fired
the rule; schema-closure triples (rdfs5/11) carry a NULL graph (the
closure is computed over the merged schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SUB_CLASS = RDFS + "subClassOf"
SUB_PROP = RDFS + "subPropertyOf"
DOMAIN = RDFS + "domain"
RANGE = RDFS + "range"

QUAD_COLS = ["graph", "subj", "pred", "obj_kind", "obj", "datatype", "lang"]


def _pairs(triples: DataFrame, pred: str) -> DataFrame:
    """(sub, sup) pairs of one schema predicate, merged across graphs.
    Predicate-equality filter pushes to the scan when triples come
    straight off parquet."""
    return (
        triples.filter(
            (F.col("pred") == pred) & F.col("obj_kind").isin("iri", "bnode")
        )
        .select(F.col("subj").alias("sub"), F.col("obj").alias("sup"))
        .dropDuplicates()
    )


def _transitive(pairs: DataFrame, max_iter: int) -> DataFrame:
    """Strict transitive closure of an ontology-sized pair relation —
    semi-naive delta loop (paths.py `_closure` shape): each round joins
    only the previous round's new pairs; lineage stays depth-1 via
    per-delta localCheckpoint."""
    known = pairs.dropDuplicates().localCheckpoint(eager=True)
    delta = known
    for _ in range(max_iter):
        delta = (
            delta.select("sub", F.col("sup").alias("m"))
            .join(known.select(F.col("sub").alias("m"), "sup"), "m")
            .select("sub", "sup")
            .dropDuplicates()
            .join(known, ["sub", "sup"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if delta.isEmpty():
            break
        known = known.unionByName(delta)
    return known


def _as_schema_triples(pairs: DataFrame, pred: str) -> DataFrame:
    return pairs.select(
        F.lit(None).cast("string").alias("graph"),
        F.col("sub").alias("subj"),
        F.lit(pred).alias("pred"),
        F.lit("iri").alias("obj_kind"),
        F.col("sup").alias("obj"),
        F.lit(None).cast("string").alias("datatype"),
        F.lit(None).cast("string").alias("lang"),
    )


def rdfs_closure(
    triples: DataFrame,
    schema: DataFrame | None = None,
    max_iter: int = 20,
    deduplicate: bool = True,
) -> DataFrame:
    """Materialize the RDFS (ρdf) closure of a quad table.

    ``schema``: optional separate ontology quad table; defaults to the
    schema triples found inside ``triples`` itself. ``max_iter`` bounds
    the schema-closure rounds (ontology hierarchy depth; same bounded-
    diameter contract as paths/canonicalize).
    """
    src = schema if schema is not None else triples
    sco = _transitive(_pairs(src, SUB_CLASS), max_iter)
    spo = _transitive(_pairs(src, SUB_PROP), max_iter)
    dom = _pairs(src, DOMAIN)
    rng = _pairs(src, RANGE)

    # rdfs7: (s p o) & p ⊑q q  =>  (s q o) — keeps kind/datatype/lang
    d7 = (
        triples.join(
            F.broadcast(spo), triples["pred"] == spo["sub"], "inner"
        )
        .select(
            "graph", "subj", F.col("sup").alias("pred"),
            "obj_kind", "obj", "datatype", "lang",
        )
    )
    props = triples.select(*QUAD_COLS).unionByName(d7)

    # rdfs2: (s p o) & p domain C => (s a C)
    d2 = (
        props.join(F.broadcast(dom), props["pred"] == dom["sub"], "inner")
        .select(
            "graph", "subj", F.lit(RDF_TYPE).alias("pred"),
            F.lit("iri").alias("obj_kind"), F.col("sup").alias("obj"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("lang"),
        )
    )
    # rdfs3: (s p o) & p range C & o is a node => (o a C)
    d3 = (
        props.filter(F.col("obj_kind").isin("iri", "bnode"))
        .join(F.broadcast(rng), props["pred"] == rng["sub"], "inner")
        .select(
            "graph", F.col("obj").alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            F.lit("iri").alias("obj_kind"), F.col("sup").alias("obj"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("lang"),
        )
    )

    typed = props.unionByName(d2).unionByName(d3)
    # rdfs9/11: type propagation up the closed class hierarchy
    d9 = (
        typed.filter(F.col("pred") == RDF_TYPE)
        .join(F.broadcast(sco), typed["obj"] == sco["sub"], "inner")
        .select(
            "graph", "subj", F.lit(RDF_TYPE).alias("pred"),
            F.lit("iri").alias("obj_kind"), F.col("sup").alias("obj"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("lang"),
        )
    )

    out = (
        typed.unionByName(d9)
        .unionByName(_as_schema_triples(sco, SUB_CLASS))
        .unionByName(_as_schema_triples(spo, SUB_PROP))
    )
    if deduplicate:
        out = out.dropDuplicates(QUAD_COLS)
    return out
