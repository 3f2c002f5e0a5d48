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


SCHEMA_L = SCHEMA + ", lang string"


def _tl(spark, rows):
    return spark.createDataFrame(rows, SCHEMA_L)


def test_validate_class_in_hasvalue(spark):
    g = _t(spark, [
        ("n1", RDF_TYPE, "iri", "T", None),
        ("n1", "ref", "iri", "c1", None),     # c1 typed C: conforms
        ("n1", "role", "literal", "user", XS),
        ("n2", RDF_TYPE, "iri", "T", None),
        ("n2", "ref", "iri", "c2", None),     # c2 untyped: class violation
        ("n2", "ref", "literal", "c1", XS),   # literal: class violation
        ("n2", "role", "literal", "auditor", XS),  # not in allowed set
        ("c1", RDF_TYPE, "iri", "C", None),
    ])
    shapes = [
        Shape("s_ref", "T", "ref", cls="C"),
        Shape("s_role", "T", "role", in_values=("user", "assistant")),
        Shape("s_flag", "T", "flag", has_value="v2"),
    ]
    got = _set(validate_shapes(g, shapes))
    assert got == {
        ("n2", "s_ref", "class", "c2", None),
        ("n2", "s_ref", "class", "c1", None),
        ("n2", "s_role", "in", "auditor", None),
        # hasValue fires for BOTH foci: neither has flag = v2
        ("n1", "s_flag", "hasValue", "v2", None),
        ("n2", "s_flag", "hasValue", "v2", None),
    }


def test_validate_length_and_range(spark):
    g = _t(spark, [
        ("n1", RDF_TYPE, "iri", "T", None),
        ("n1", "name", "literal", "", XS),        # minLength
        ("n1", "bio", "literal", "abcdef", XS),   # maxLength 4
        ("n1", "age", "literal", "-3", XI),       # < 0
        ("n1", "age", "literal", "120", XI),      # > 99
        ("n1", "age", "literal", "x7", XI),       # not numeric
        ("n1", "age", "literal", "50", XI),       # conforms
    ])
    shapes = [
        Shape("s_name", "T", "name", min_length=1),
        Shape("s_bio", "T", "bio", max_length=4),
        Shape("s_age", "T", "age", min_inclusive=0.0, max_inclusive=99.0),
    ]
    got = _set(validate_shapes(g, shapes))
    assert got == {
        ("n1", "s_name", "minLength", "", 0),
        ("n1", "s_bio", "maxLength", "abcdef", 6),
        ("n1", "s_age", "minInclusive", "-3", None),
        ("n1", "s_age", "maxInclusive", "120", None),
        ("n1", "s_age", "numeric", "x7", None),
    }


def test_validate_unique_lang(spark):
    g = _tl(spark, [
        ("n1", RDF_TYPE, "iri", "T", None, None),
        ("n1", "label", "literal", "hello", None, "en"),
        ("n1", "label", "literal", "hi", None, "en"),     # dup en
        ("n1", "label", "literal", "salut", None, "fr"),  # unique fr: ok
        ("n1", "note", "literal", "a", None, "en"),
        ("n1", "note", "literal", "b", None, "en"),       # no uniqueLang shape
        ("n2", RDF_TYPE, "iri", "T", None, None),
        ("n2", "label", "literal", "plain", XS, None),    # untagged: ignored
    ])
    shapes = [
        Shape("s_label", "T", "label", unique_lang=True),
        Shape("s_note", "T", "note"),
    ]
    got = _set(validate_shapes(g, shapes))
    assert got == {("n1", "s_label", "uniqueLang", "en", 2)}
