"""KG lifecycle maintenance: batch delta merge, document retraction,
incremental node-table refresh, and SPARQL-1.1-style DELETE/INSERT
WHERE updates.

The reference processes documents one at a time — re-running it IS its
maintenance story (crates/core/src/document/expanded.rs). At 100 TB
the KG must instead absorb a day's transcripts without rebuilding the
world; these operators keep every corpus-sized input on one side of a
delta-sized join:

- ``merge_triples``: (base − deletes) ∪ adds. Deletes resolve through
  a LEFT ANTI join on the quad key — when the delta is small it
  broadcasts (AQE decides), so the base table is one scan, no shuffle;
  adds union in follow-up.
- ``retract_documents``: everything a set of doc_ids contributed,
  via broadcast anti join on the lineage column the triple tables
  already carry.
- ``refresh_node_table``: splice-update — node rows whose subject is
  touched by the delta are recomputed from the merged triple table
  (semi-join restricted, i.e. delta-sized work when the base is
  bucketed by subj), everything else passes through untouched. The
  refreshed table is exactly ``node_table(merged)`` (asserted in
  tests), at delta cost instead of corpus cost.
- ``update_where``: SPARQL UPDATE's ``DELETE {…} INSERT {…} WHERE
  {…}`` over a (subj, pred, obj) triple table — the WHERE block is
  evaluated ONCE (bindings optionally localCheckpoint'ed: with no
  cross-consumer CSE, two template instantiations would otherwise
  re-run the whole BGP join chain), both templates instantiate as
  projections of the same solution set, then delete-before-insert per
  spec semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .jsonld import node_table

QUAD_KEY = ["graph", "subj", "pred", "obj_kind", "obj", "datatype", "lang"]
TRIPLE_KEY = ["subj", "pred", "obj"]


def _key_of(df: DataFrame) -> list[str]:
    cols = set(df.columns)
    return QUAD_KEY if set(QUAD_KEY) <= cols else TRIPLE_KEY


def merge_triples(
    base: DataFrame,
    adds: DataFrame | None = None,
    deletes: DataFrame | None = None,
    deduplicate: bool = True,
) -> DataFrame:
    """(base − deletes) ∪ adds over the quad (or 3-col triple) key.
    Anti join is null-safe on the nullable quad columns so a delete of
    a NULL-datatype quad actually lands."""
    key = _key_of(base)
    out = base
    if deletes is not None:
        # rename the delete side before joining: deletes are routinely
        # DERIVED from base (a filter), and a self-join on same-named
        # columns risks Spark resolving both sides of the condition to
        # one lineage (the "trivially true" ambiguity)
        dels = deletes.select(
            *(F.col(k).alias(f"__del_{k}") for k in key)
        ).dropDuplicates()
        cond = [out[k].eqNullSafe(dels[f"__del_{k}"]) for k in key]
        out = out.join(dels, cond, "left_anti")
    if adds is not None:
        out = out.unionByName(
            adds.select(*base.columns), allowMissingColumns=False
        )
        if deduplicate:
            out = out.dropDuplicates(key)
    return out


OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def merge_same_as(
    triples: DataFrame,
    same_as_pred: str = OWL_SAMEAS,
    max_iter: int = 25,
) -> DataFrame:
    """owl:sameAs entity-merge closure — the multi-source KG fusion
    step: when several ingestion sources emit different IRIs for the
    same entity and assert ``owl:sameAs`` links between them, collapse
    every alias onto one canonical representative.

    The reference emits each document's triples independently
    (crates/core/src/rdf/mod.rs) and has no cross-document identity
    resolution; at corpus scale fusing sources is unavoidable, so this
    is a first-class operator:

    1. alias edges = sameAs assertions between IRIs (blank nodes and
       literals are excluded — sameAs over bnodes is not stable across
       documents, and sameAs to a literal is malformed);
    2. alias groups via :func:`graphops.connected_components`
       (Large-Star/Small-Star — O(log^2 n) rounds independent of alias
       chain length, so A→B→C→… chains across many sources converge);
    3. representative = lexicographic MIN IRI of the group
       (deterministic and identical in any engine, hence oracle-exact);
    4. every subject and every IRI object is rewritten to its
       representative; the sameAs assertions themselves are dropped
       (fully absorbed into the identity mapping); an exact
       quad-key dedup removes rows that became identical after the
       rewrite (the common case: N sources asserting the same fact
       about the same entity under different names).

    Scale shape: the alias mapping is |entities-with-aliases| rows —
    tiny next to the corpus — so both rewrite joins broadcast under
    AQE; the only corpus-sized shuffle is the final dedup on the quad
    key. Output carries exactly the quad-key columns (per-source
    lineage does not survive a merge of identical facts — retraction
    should run before fusion, not after).
    """
    from .graphops import connected_components

    key = _key_of(triples)
    has_kind = "obj_kind" in triples.columns
    is_sameas = F.col("pred") == same_as_pred
    iri_side = (
        (F.col("obj_kind") == "iri") if has_kind else F.lit(True)
    ) & ~F.col("subj").startswith("_:") & ~F.col("obj").startswith("_:")

    edges = triples.filter(is_sameas & iri_side).select("subj", "obj")
    mapping = connected_components(edges, src="subj", dst="obj", max_iter=max_iter)

    out = triples.filter(~is_sameas).select(*key)
    m_s = mapping.select(
        F.col("node").alias("__s_node"), F.col("component").alias("__s_rep")
    )
    out = (
        out.join(m_s, out["subj"] == m_s["__s_node"], "left")
        .withColumn("subj", F.coalesce("__s_rep", "subj"))
        .drop("__s_node", "__s_rep")
    )
    m_o = mapping.select(
        F.col("node").alias("__o_node"), F.col("component").alias("__o_rep")
    )
    obj_cond = out["obj"] == m_o["__o_node"]
    if has_kind:
        obj_cond = obj_cond & (out["obj_kind"] == F.lit("iri"))
    out = (
        out.join(m_o, obj_cond, "left")
        .withColumn("obj", F.coalesce("__o_rep", "obj"))
        .drop("__o_node", "__o_rep")
    )
    return out.dropDuplicates(key)


def retract_documents(
    base: DataFrame, doc_ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Remove every triple contributed by the given documents (lineage
    anti join; doc_ids is retraction-sized, so it broadcasts)."""
    return base.join(
        F.broadcast(doc_ids.select(id_col).dropDuplicates()), id_col, "left_anti"
    )


def affected_subjects(
    adds: DataFrame | None = None, deletes: DataFrame | None = None
) -> DataFrame:
    parts = [d.select("subj") for d in (adds, deletes) if d is not None]
    if not parts:
        raise ValueError("need at least one of adds/deletes")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates()


def incremental_canonicalize(
    base_canonical: DataFrame,
    upserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
    id_col: str = "doc_id",
    **stage_kwargs,
) -> DataFrame:
    """Splice-update a CANONICAL triple table for a document delta:
    re-expand + re-canonicalize ONLY the upserted documents (the same
    per-document content-hash canonicalization the full build uses,
    ``triples_stage(..., canonical_bnodes=True)``), drop rows
    contributed by deleted or replaced documents, pass everything else
    through untouched.

    Exactness invariant (tested): the result equals a full
    ``triples_stage(merged_docs, canonical_bnodes=True)`` rebuild —
    at delta cost. This holds because canonical labels are PURE
    PER-DOCUMENT content functions: blank nodes are document-scoped by
    construction (JSON-LD blank labels cannot cross documents; the
    corpus graph joins on IRIs), so an untouched document's labels
    cannot change, no matter what the delta does. At 100 TB this is
    the difference between re-canonicalizing the world per ingest
    batch and touching only the day's documents: the retraction is a
    broadcast anti join on the lineage doc_id the canonical table
    already carries, the recompute is one Arrow pass over delta-sized
    input, and the kept rows are never reshuffled (pure union).

    ``upserts``: (doc_id, doc) rows — new or replaced documents.
    ``deletes``: doc_id rows to retract. ``stage_kwargs`` forward to
    ``triples_stage`` (context, options, context_registry, ...).
    """
    from .jsonld import triples_stage

    gone = []
    if deletes is not None:
        gone.append(deletes.select(id_col))
    if upserts is not None:
        gone.append(upserts.select(id_col))
    if not gone:
        raise ValueError("need at least one of upserts/deletes")
    out_ids = gone[0]
    for g in gone[1:]:
        out_ids = out_ids.unionByName(g)
    kept = retract_documents(base_canonical, out_ids, id_col=id_col)
    if upserts is None:
        return kept
    fresh = triples_stage(
        upserts, id_col=id_col, canonical_bnodes=True, **stage_kwargs
    ).select(*base_canonical.columns)
    return kept.unionByName(fresh)


def refresh_node_table(
    old_nodes: DataFrame,
    merged_triples: DataFrame,
    subjects: DataFrame,
    node_id_col: str = "node_id",
) -> DataFrame:
    """Splice-update the node table: recompute rows for `subjects`
    from the merged triple table, keep the rest. Invariant (tested):
    result == node_table(merged_triples), at delta cost."""
    subs = subjects.select(F.col("subj")).dropDuplicates()
    keep = old_nodes.join(
        F.broadcast(subs), old_nodes[node_id_col] == subs["subj"], "left_anti"
    )
    recomputed = node_table(
        merged_triples.join(F.broadcast(subs), "subj", "left_semi")
    )
    return keep.unionByName(recomputed)


def update_where(
    triples: DataFrame,
    where: list[tuple[str, str, str]],
    insert: list[tuple[str, str, str]] | None = None,
    delete: list[tuple[str, str, str]] | None = None,
    materialize_bindings: bool = True,
    **kw,
) -> DataFrame:
    """SPARQL 1.1 ``DELETE {delete} INSERT {insert} WHERE {where}``
    applied to a (subj, pred, obj) triple table; returns the updated
    graph. Solutions with an unbound template variable drop that
    template triple (CONSTRUCT rule); deletes apply before inserts so
    an insert of a deleted triple survives, per UPDATE semantics."""
    from .bgp import bgp_query, instantiate_template

    if insert is None and delete is None:
        raise ValueError("update_where needs insert and/or delete templates")
    bindings = bgp_query(triples, where, **kw)
    if materialize_bindings and insert is not None and delete is not None:
        # two template consumers would re-run the BGP join chain
        bindings = bindings.localCheckpoint(eager=True)
    dels = instantiate_template(bindings, delete) if delete else None
    ins = instantiate_template(bindings, insert) if insert else None
    return merge_triples(triples, adds=ins, deletes=dels)


def as_of(
    changelog: DataFrame,
    ts: int,
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Time-travel reconstruction of the triple graph at changelog
    position ``ts``: given an append-only changelog of
    ``(key..., op in {'assert','retract'}, ts, seq)`` rows, return the
    triples whose LATEST entry at or before ``ts`` is an assert — the
    same snapshot-at-T semantics Iceberg exposes per table, applied at
    the TRIPLE grain so a KG can answer "what did the graph say last
    Tuesday" without storing one full copy per day.

    ``seq`` is the total order within the changelog (Iceberg commit
    sequence number / Kafka offset); ties on ``ts`` resolve by the
    larger ``seq`` so replays are exactly deterministic.

    Plan shape: one filter (``ts <= T`` — partition-prunable when the
    changelog is written ts-partitioned, which is how a 100 TB
    changelog should be laid out) + ONE key-grouped ``max_by``
    aggregation. max_by is map-side combinable, so the shuffle carries
    one candidate row per key per input partition, not the history;
    no window, no self-join, no driver state. The reference has no
    maintenance story (it reprocesses documents — see module
    docstring); this is the delta-native replacement.
    """
    key = _key_of(changelog)
    snap = changelog.filter(F.col(ts_col) <= F.lit(ts))
    return (
        snap.groupBy(*key)
        .agg(F.max_by(F.col(op_col), F.col(seq_col)).alias("__last_op"))
        .filter(F.col("__last_op") == F.lit("assert"))
        .drop("__last_op")
    )
