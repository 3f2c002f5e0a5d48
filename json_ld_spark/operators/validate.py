"""SHACL-style shape validation over the triple table — the KG quality
gate that runs between construction and publication.

The reference validates documents syntactically (expansion raises
spec error codes, crates/core/src/expansion/error.rs) but has no
graph-level constraint language; a production KG pipeline needs one:
before a day's fused triples are merged into the serving tables, every
focus node must satisfy its shape (cardinality, node kind, datatype,
lexical pattern) and violations must land in a quarantine table with
enough detail to route back to the offending source. This module
implements the SHACL core constraint subset that covers that gate
(W3C SHACL: sh:targetClass, sh:path, sh:minCount, sh:maxCount,
sh:nodeKind, sh:datatype, sh:pattern, sh:class, sh:in, sh:hasValue,
sh:minLength, sh:maxLength, sh:minInclusive, sh:maxInclusive,
sh:uniqueLang) as pure DataFrame algebra.

Scale shape: the shapes table is human-authored (tens of rows) and
always broadcasts. Work on the corpus side is two focus-keyed hash
joins — one groupBy (focus, shape) for the cardinality counts (partial
map-side aggregation, one shuffle), one value-level join for the
per-value checks — so the whole gate is ~2 shuffles keyed on subject,
no matter how many shapes are registered. Per-value predicates
(kind/datatype/pattern) are JVM expressions inside whole-stage codegen;
``regexp_like`` accepts the per-shape pattern column directly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_SHAPE_SCHEMA = (
    "shape_id string, target_class string, path string, "
    "min_count int, max_count int, want_kind string, "
    "want_datatype string, want_pattern string, "
    "want_class string, want_in array<string>, want_has string, "
    "min_len int, max_len int, min_incl double, max_incl double, "
    "uniq_lang boolean"
)


@dataclass(frozen=True)
class Shape:
    """One property constraint of a node shape (SHACL core subset)."""

    shape_id: str
    target_class: str
    path: str
    min_count: int = 0
    max_count: int | None = None
    node_kind: str | None = None  # 'iri' | 'literal' | 'bnode'
    datatype: str | None = None   # required literal datatype IRI
    pattern: str | None = None    # regex the lexical form must match
    cls: str | None = None        # sh:class — value must be typed as this
    in_values: tuple[str, ...] | None = None  # sh:in — allowed lexical forms
    has_value: str | None = None  # sh:hasValue — some value must equal this
    min_length: int | None = None   # sh:minLength (literals)
    max_length: int | None = None   # sh:maxLength (literals)
    min_inclusive: float | None = None  # sh:minInclusive (numeric literals)
    max_inclusive: float | None = None  # sh:maxInclusive (numeric literals)
    unique_lang: bool = False     # sh:uniqueLang — one value per lang tag


def validate_shapes(
    triples: DataFrame,
    shapes: list[Shape],
    rdf_type: str = RDF_TYPE,
) -> DataFrame:
    """Validate `triples` against `shapes`; return the violation table
    ``(focus, shape_id, constraint_kind, value, n)``.

    - focus nodes of a shape = subjects with ``rdf:type target_class``;
    - ``minCount`` / ``maxCount`` rows carry the offending cardinality
      in ``n`` (``value`` NULL) — a focus with NO value for the path
      still violates minCount (left join, count coalesced to 0);
    - ``nodeKind`` / ``datatype`` / ``pattern`` rows carry the
      offending value (``n`` NULL). datatype compares null-safely (a
      literal with no recorded datatype violates an explicit datatype
      constraint); datatype and pattern apply to literal values only,
      nodeKind to every value.

    An empty result means the graph conforms.
    """
    spark = triples.sparkSession
    if "lang" not in triples.columns:  # quad tables without a lang col
        triples = triples.withColumn("lang", F.lit(None).cast("string"))
    sh = spark.createDataFrame(
        [
            (
                s.shape_id, s.target_class, s.path, s.min_count,
                s.max_count, s.node_kind, s.datatype, s.pattern,
                s.cls,
                list(s.in_values) if s.in_values is not None else None,
                s.has_value, s.min_length, s.max_length,
                s.min_inclusive, s.max_inclusive, s.unique_lang,
            )
            for s in shapes
        ],
        _SHAPE_SCHEMA,
    )

    # The 14 violation branches below all union into one result, and
    # Spark has NO cross-consumer CSE: without materialization every
    # branch re-derives its inputs all the way to the corpus scan
    # (measured 28-41 s at sf0.01, dominated by re-parsing the input
    # lineage ~12x). `focus`/`vals` are the SHAPE-CONSTRAINED slices —
    # type rows and constrained-predicate rows, the data a validator
    # must touch by definition — so lazily checkpointing them (and the
    # two derived join tables fc/fv) pays one bounded materialization
    # for k=14 readers. Measured: 28-41 s -> ~4 s, same rows.
    focus = (
        triples.filter(F.col("pred") == rdf_type)
        .select(F.col("subj").alias("focus"), F.col("obj").alias("target_class"))
        .join(F.broadcast(sh), "target_class")
        .drop("target_class", "path")
    ).localCheckpoint(eager=False)
    vals = (
        triples.select("subj", "pred", "obj_kind", "obj", "datatype", "lang")
        .join(
            F.broadcast(sh.select("shape_id", "path")),
            F.col("pred") == F.col("path"),
        )
        .select(
            F.col("subj").alias("focus"), "shape_id",
            "obj_kind", "obj", "datatype", "lang",
        )
    ).localCheckpoint(eager=False)

    def out(df: DataFrame, kind: str, value, n) -> DataFrame:
        return df.select(
            "focus", "shape_id",
            F.lit(kind).alias("constraint_kind"),
            value.cast("string").alias("value"),
            n.cast("long").alias("n"),
        )

    counts = vals.groupBy("focus", "shape_id").agg(F.count("*").alias("n_vals"))
    fc = (
        focus.join(counts, ["focus", "shape_id"], "left")
        .withColumn("n_vals", F.coalesce("n_vals", F.lit(0)))
    ).localCheckpoint(eager=False)
    null_s = F.lit(None).cast("string")
    null_n = F.lit(None).cast("long")
    min_v = out(
        fc.filter(F.col("n_vals") < F.col("min_count")),
        "minCount", null_s, F.col("n_vals"),
    )
    max_v = out(
        fc.filter(
            F.col("max_count").isNotNull()
            & (F.col("n_vals") > F.col("max_count"))
        ),
        "maxCount", null_s, F.col("n_vals"),
    )

    fv = focus.join(vals, ["focus", "shape_id"]).localCheckpoint(eager=False)
    kind_v = out(
        fv.filter(
            F.col("want_kind").isNotNull()
            & (F.col("obj_kind") != F.col("want_kind"))
        ),
        "nodeKind", F.col("obj"), null_n,
    )
    dt_v = out(
        fv.filter(
            F.col("want_datatype").isNotNull()
            & (F.col("obj_kind") == "literal")
            & ~F.col("datatype").eqNullSafe(F.col("want_datatype"))
        ),
        "datatype", F.col("obj"), null_n,
    )
    pat_v = out(
        fv.filter(
            F.col("want_pattern").isNotNull()
            & (F.col("obj_kind") == "literal")
            & ~F.regexp_like(F.col("obj"), F.col("want_pattern"))
        ),
        "pattern", F.col("obj"), null_n,
    )

    # sh:class — the value node must carry rdf:type want_class; a
    # literal can never satisfy it. One equi-join of the constrained
    # value slice against the (instance, type) pairs, keyed on the
    # value — the only check that shuffles on the OBJECT side.
    types = (
        triples.filter(F.col("pred") == rdf_type)
        .select(
            F.col("subj").alias("__vnode"), F.col("obj").alias("__vclass")
        )
        .dropDuplicates()
    )
    cls_rows = fv.filter(F.col("want_class").isNotNull())
    cls_j = cls_rows.join(
        types,
        (cls_rows["obj"] == types["__vnode"])
        & (cls_rows["want_class"] == types["__vclass"]),
        "left",
    )
    cls_v = out(
        cls_j.filter(
            F.col("__vnode").isNull() | (F.col("obj_kind") == "literal")
        ),
        "class", F.col("obj"), null_n,
    )

    # sh:in — lexical/IRI form must be one of the allowed values
    in_v = out(
        fv.filter(
            F.col("want_in").isNotNull()
            & ~F.array_contains(F.col("want_in"), F.col("obj"))
        ),
        "in", F.col("obj"), null_n,
    )

    # sh:hasValue — per focus, SOME value equals the constant; foci
    # with no such value (including no value at all) violate
    hv_focus = focus.filter(F.col("want_has").isNotNull())
    hv_match = (
        fv.filter(F.col("obj") == F.col("want_has"))
        .select("focus", "shape_id")
        .dropDuplicates()
    )
    hv_v = out(
        hv_focus.join(hv_match, ["focus", "shape_id"], "left_anti"),
        "hasValue", F.col("want_has"), null_n,
    )

    # sh:minLength / sh:maxLength over the literal lexical form; the
    # offending length rides in n
    lit = F.col("obj_kind") == "literal"
    length = F.length("obj")
    minlen_v = out(
        fv.filter(F.col("min_len").isNotNull() & lit & (length < F.col("min_len"))),
        "minLength", F.col("obj"), length,
    )
    maxlen_v = out(
        fv.filter(F.col("max_len").isNotNull() & lit & (length > F.col("max_len"))),
        "maxLength", F.col("obj"), length,
    )

    # sh:minInclusive / sh:maxInclusive on numeric literals; a value
    # that does not parse as a number violates with kind 'numeric'
    num = F.expr("try_cast(obj AS double)")
    ranged = F.col("min_incl").isNotNull() | F.col("max_incl").isNotNull()
    rng_rows = fv.filter(ranged & lit)
    numeric_v = out(rng_rows.filter(num.isNull()), "numeric", F.col("obj"), null_n)
    min_incl_v = out(
        rng_rows.filter(num.isNotNull() & F.col("min_incl").isNotNull()
                        & (num < F.col("min_incl"))),
        "minInclusive", F.col("obj"), null_n,
    )
    max_incl_v = out(
        rng_rows.filter(num.isNotNull() & F.col("max_incl").isNotNull()
                        & (num > F.col("max_incl"))),
        "maxInclusive", F.col("obj"), null_n,
    )

    # sh:uniqueLang — no two values of the path may share a language
    # tag; the duplicated tag rides in value, its multiplicity in n
    ul = (
        fv.filter(F.col("uniq_lang") & F.col("lang").isNotNull())
        .groupBy("focus", "shape_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_lang"))
        .filter(F.col("n_lang") > 1)
    )
    ul_v = out(ul, "uniqueLang", F.col("lang"), F.col("n_lang"))

    res = min_v
    for part in (
        max_v, kind_v, dt_v, pat_v, cls_v, in_v, hv_v,
        minlen_v, maxlen_v, numeric_v, min_incl_v, max_incl_v, ul_v,
    ):
        res = res.unionByName(part)
    return res
