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

Rule COMPOSITION happens on the schema side, not the corpus side:
instead of chaining corpus-level derivations (rdfs7 then rdfs2 on its
output then rdfs9 on that — each stage a new consumer that re-runs the
corpus lineage, since Spark has no cross-consumer CSE), the schema
tables are pre-composed — effective-domain = spo⁺ ∘ domain ∘ sco*,
effective-range likewise — so every instance-level consequence falls
out of exactly TWO corpus passes: one pred-keyed broadcast join
emitting rdfs7 + rdfs2 + rdfs3 consequences in a single projection,
and one obj-keyed broadcast join on the (filter-pushed) rdf:type
subset for rdfs9. This is complete for ρdf — derived triples only add
rdf:type facts or re-predicate existing facts, and both feedbacks are
absorbed by the pre-composition (proven against an unstratified naive
fixpoint in tests). Ontologies that derive NEW schema triples through
subPropertyOf-of-rdfs-vocabulary are out of fragment, documented.

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
    # each schema-pair extraction is a corpus scan when schema comes
    # from the corpus itself — materialize each ONCE (ontology-sized,
    # so the checkpoint is bytes, not a data copy); every downstream
    # consumer then reads the flat block instead of re-scanning
    sco = _transitive(_pairs(src, SUB_CLASS), max_iter)
    spo = _transitive(_pairs(src, SUB_PROP), max_iter)
    dom = _pairs(src, DOMAIN).localCheckpoint(eager=True)
    rng = _pairs(src, RANGE).localCheckpoint(eager=True)

    def compose(ab: DataFrame, bc: DataFrame) -> DataFrame:
        return (
            ab.select(F.col("sub"), F.col("sup").alias("m"))
            .join(F.broadcast(bc.select(F.col("sub").alias("m"), "sup")), "m")
            .select("sub", "sup")
        )

    # effective domain/range: p ⊑+ q & q domain C & C ⊑* D  =>  p ↦ D.
    # Pre-composing here is what keeps the corpus passes at two: the
    # d7→d2→d9 feedback chains collapse into these tiny-table joins.
    dom1 = dom.unionByName(compose(spo, dom)).dropDuplicates()
    dom_f = dom1.unionByName(compose(dom1, sco)).dropDuplicates()
    rng1 = rng.unionByName(compose(spo, rng)).dropDuplicates()
    rng_f = rng1.unionByName(compose(rng1, sco)).dropDuplicates()

    # one pred-keyed rule table: mode selects the consequence shape
    rules = (
        spo.select("sub", F.col("sup").alias("out"), F.lit("reprop").alias("mode"))
        .unionByName(
            dom_f.select("sub", F.col("sup").alias("out"), F.lit("dom").alias("mode"))
        )
        .unionByName(
            rng_f.select("sub", F.col("sup").alias("out"), F.lit("rng").alias("mode"))
        )
        .localCheckpoint(eager=True)
    )

    # corpus pass 1: rdfs7 + rdfs2 + rdfs3 in a single broadcast join
    # + projection (rng consequences only fire on node objects)
    joined = triples.join(
        F.broadcast(rules), triples["pred"] == rules["sub"], "inner"
    ).filter(
        ~((F.col("mode") == "rng") & (F.col("obj_kind") == "literal"))
    )
    d_pred = joined.select(
        "graph",
        F.when(F.col("mode") == "rng", F.col("obj"))
        .otherwise(F.col("subj"))
        .alias("subj"),
        F.when(F.col("mode") == "reprop", F.col("out"))
        .otherwise(F.lit(RDF_TYPE))
        .alias("pred"),
        F.when(F.col("mode") == "reprop", F.col("obj_kind"))
        .otherwise(F.lit("iri"))
        .alias("obj_kind"),
        F.when(F.col("mode") == "reprop", F.col("obj"))
        .otherwise(F.col("out"))
        .alias("obj"),
        F.when(F.col("mode") == "reprop", F.col("datatype"))
        .cast("string")
        .alias("datatype"),
        F.when(F.col("mode") == "reprop", F.col("lang"))
        .cast("string")
        .alias("lang"),
    )

    # corpus pass 2 (filter-pushed to the rdf:type subset): rdfs9 over
    # the closed hierarchy; dom/rng-derived types were already lifted
    # through sco in dom_f/rng_f above
    typed_in = triples.filter(F.col("pred") == RDF_TYPE)
    d9 = (
        typed_in.join(F.broadcast(sco), typed_in["obj"] == sco["sub"], "inner")
        .select(
            "graph", "subj", F.lit(RDF_TYPE).alias("pred"),
            F.lit("iri").alias("obj_kind"), F.col("sup").alias("obj"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("lang"),
        )
    )

    out = (
        triples.select(*QUAD_COLS)
        .unionByName(d_pred)
        .unionByName(d9)
        .unionByName(_as_schema_triples(sco, SUB_CLASS))
        .unionByName(_as_schema_triples(spo, SUB_PROP))
    )
    if deduplicate:
        out = out.dropDuplicates(QUAD_COLS)
    return out


def rdfs_closure_delta(
    base_closed: DataFrame,
    delta: DataFrame,
    schema: DataFrame,
    max_iter: int = 20,
    deduplicate: bool = True,
) -> DataFrame:
    """Incremental maintenance: with a FIXED schema, every instance
    rule (rdfs7/2/3/9) has a single instance-triple premise, so the
    closure is a per-triple map and distributes over union:
    closure(base ∪ delta) = closure(base) ∪ closure(delta). A day's
    transcript delta therefore entails at delta cost — the already-
    closed base is only touched by the final dedup (skippable when the
    sink dedups, e.g. merge_triples). Asserted equal to the full
    recompute in tests. Only schema CHANGES require a full re-run
    (rules are monotone; retraction likewise falls back to
    maintenance.merge_triples + re-closure of affected docs)."""
    inc = rdfs_closure(delta, schema=schema, max_iter=max_iter,
                       deduplicate=False)
    out = base_closed.unionByName(inc)
    if deduplicate:
        out = out.dropDuplicates(QUAD_COLS)
    return out
