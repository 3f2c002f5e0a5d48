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
sh:nodeKind, sh:datatype, sh:pattern) as pure DataFrame algebra.

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
    "want_datatype string, want_pattern string"
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
    sh = spark.createDataFrame(
        [
            (
                s.shape_id, s.target_class, s.path, s.min_count,
                s.max_count, s.node_kind, s.datatype, s.pattern,
            )
            for s in shapes
        ],
        _SHAPE_SCHEMA,
    )

    focus = (
        triples.filter(F.col("pred") == rdf_type)
        .select(F.col("subj").alias("focus"), F.col("obj").alias("target_class"))
        .join(F.broadcast(sh), "target_class")
        .drop("target_class", "path")
    )
    vals = (
        triples.select("subj", "pred", "obj_kind", "obj", "datatype")
        .join(
            F.broadcast(sh.select("shape_id", "path")),
            F.col("pred") == F.col("path"),
        )
        .select(
            F.col("subj").alias("focus"), "shape_id",
            "obj_kind", "obj", "datatype",
        )
    )

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
    )
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

    fv = focus.join(vals, ["focus", "shape_id"])
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

    res = min_v
    for part in (max_v, kind_v, dt_v, pat_v):
        res = res.unionByName(part)
    return res
