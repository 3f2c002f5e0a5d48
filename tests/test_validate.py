"""SHACL-lite shape validation (operators/validate.py)."""

from __future__ import annotations

from json_ld_spark.operators.validate import RDF_TYPE, Shape, validate_shapes

XS = "http://www.w3.org/2001/XMLSchema#string"
XI = "http://www.w3.org/2001/XMLSchema#integer"

SCHEMA = "subj string, pred string, obj_kind string, obj string, datatype string"


def _t(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _set(df):
    return {tuple(r) for r in df.collect()}


def _graph(spark):
    return _t(spark, [
        ("n1", RDF_TYPE, "iri", "T", None),
        ("n1", "name", "literal", "alice", XS),
        ("n1", "age", "literal", "30", XI),
        ("n1", "knows", "iri", "n2", None),
        # n2: missing name (minCount), two ages (maxCount), literal knows
        ("n2", RDF_TYPE, "iri", "T", None),
        ("n2", "age", "literal", "40", XI),
        ("n2", "age", "literal", "41", XI),
        ("n2", "knows", "literal", "n1", None),
        # n3: wrong datatype + pattern miss; not typed T for shape s4
        ("n3", RDF_TYPE, "iri", "T", None),
        ("n3", "name", "literal", "bob!", None),
        ("n3", "age", "literal", "x9", XI),
        # u1 is a U, not a T: T-shapes must ignore it
        ("u1", RDF_TYPE, "iri", "U", None),
        ("u1", "age", "literal", "nonsense", None),
    ])


def test_validate_each_constraint_kind(spark):
    shapes = [
        Shape("s_name", "T", "name", min_count=1, max_count=1,
              node_kind="literal", datatype=XS, pattern="^[a-z]+$"),
        Shape("s_age", "T", "age", min_count=1, max_count=1,
              datatype=XI, pattern="^[0-9]+$"),
        Shape("s_knows", "T", "knows", node_kind="iri"),
    ]
    got = _set(validate_shapes(_graph(spark), shapes))
    assert got == {
        ("n2", "s_name", "minCount", None, 0),
        ("n2", "s_age", "maxCount", None, 2),
        ("n2", "s_knows", "nodeKind", "n1", None),
        ("n3", "s_name", "datatype", "bob!", None),  # NULL datatype violates
        ("n3", "s_name", "pattern", "bob!", None),
        ("n3", "s_age", "pattern", "x9", None),
    }


def test_validate_conforming_graph_is_empty(spark):
    shapes = [Shape("s", "T", "age", min_count=1, max_count=2, datatype=XI)]
    g = _t(spark, [
        ("n1", RDF_TYPE, "iri", "T", None),
        ("n1", "age", "literal", "30", XI),
    ])
    assert validate_shapes(g, shapes).count() == 0


def test_validate_node_kind_skips_pattern_on_iri_values(spark):
    # pattern/datatype apply to literals only; an IRI value can only
    # trip nodeKind, never pattern
    shapes = [Shape("s", "T", "p", node_kind="literal", pattern="^z$")]
    g = _t(spark, [
        ("n1", RDF_TYPE, "iri", "T", None),
        ("n1", "p", "iri", "http://x", None),
    ])
    got = _set(validate_shapes(g, shapes))
    assert got == {("n1", "s", "nodeKind", "http://x", None)}
