"""RDF → labeled-property-graph projection (operators/lpg.py)."""

from __future__ import annotations

from json_ld_spark.operators.lpg import RDF_TYPE, to_property_graph

QSCHEMA = ("graph string, subj string, pred string, obj_kind string, "
           "obj string, datatype string, lang string")
XS = "http://www.w3.org/2001/XMLSchema#string"


def _t(s, p, o, kind="iri", dt=None, lang=None, g=None):
    return (g, s, p, kind, o, dt, lang)


def _run(spark, quads):
    df = spark.createDataFrame(quads, QSCHEMA)
    nodes, edges, props = to_property_graph(df)
    return (
        {(r.id, tuple(r.labels)) for r in nodes.collect()},
        {tuple(r) for r in edges.collect()},
        {tuple(r) for r in props.collect()},
    )


def test_projection_shape(spark):
    quads = [
        _t("a", RDF_TYPE, "Person"),
        _t("a", RDF_TYPE, "Agent"),
        _t("a", "name", "Ada", kind="literal", dt=XS),
        _t("a", "name", "Countess", kind="literal", dt=XS),
        _t("a", "knows", "b"),
        _t("a", "knows", "_:c", kind="bnode"),
        _t("b", "age", "7", kind="literal",
           dt="http://www.w3.org/2001/XMLSchema#integer"),
        _t("b", "note", "hi", kind="literal", lang="en"),
    ]
    nodes, edges, props = _run(spark, quads)
    # labels sorted; untyped nodes (b, _:c) get empty label arrays;
    # relationship targets become nodes even if never subjects (_:c)
    assert nodes == {
        ("a", ("Agent", "Person")), ("b", ()), ("_:c", ()),
    }
    assert edges == {("a", "knows", "b"), ("a", "knows", "_:c")}
    assert props == {
        ("a", "name", "Ada", XS, None),
        ("a", "name", "Countess", XS, None),
        ("b", "age", "7", "http://www.w3.org/2001/XMLSchema#integer", None),
        ("b", "note", "hi", None, "en"),
    }


def test_type_objects_are_labels_not_edges_or_nodes(spark):
    quads = [_t("x", RDF_TYPE, "T"), _t("x", "p", "y")]
    nodes, edges, props = _run(spark, quads)
    # the class IRI T is a label, not a node or an edge target
    assert {n for (n, _) in nodes} == {"x", "y"}
    assert edges == {("x", "p", "y")}
    assert props == set()


def test_graph_column_is_merged_and_deduped(spark):
    quads = [
        _t("x", "p", "y", g="g1"),
        _t("x", "p", "y", g="g2"),
        _t("x", RDF_TYPE, "T", g="g1"),
        _t("x", RDF_TYPE, "T", g="g2"),
    ]
    nodes, edges, props = _run(spark, quads)
    assert nodes == {("x", ("T",)), ("y", ())}
    # per-graph duplicates collapse in labels but edges keep one row
    # per distinct (src, rel, dst, source-row); consumers dedup as
    # needed — assert the distinct set here
    assert edges == {("x", "p", "y")}
