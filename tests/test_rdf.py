"""toRdf tests (reference tests/to_rdf.rs harness model; literal lowering
from crates/core/src/rdf/mod.rs). Quad comparison is exact after
hash-canonical relabeling (replaces bnode-bijection isomorphism,
to_rdf.rs:166-170)."""

from json_ld_spark import JsonLdOptions, to_rdf
from json_ld_spark.canonicalize import canonicalize_quads, quad_set_prf
from json_ld_spark.rdf import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    to_nquads,
)


def quads(doc, **opts):
    return to_rdf(doc, JsonLdOptions(**opts) if opts else None)


def test_literal_lowering():
    q = quads(
        {
            "@id": "http://n/1",
            "http://ex/s": "str",
            "http://ex/b": True,
            "http://ex/i": 42,
            "http://ex/d": 1.5,
            "http://ex/whole": 1.0,
            "http://ex/lang": {"@value": "bonjour", "@language": "fr"},
        }
    )
    by_pred = {p: (k, o, dt, lg) for (_, _, p, k, o, dt, lg) in q}
    assert by_pred["http://ex/s"] == ("literal", "str", XSD_STRING, None)
    assert by_pred["http://ex/b"] == ("literal", "true", XSD_BOOLEAN, None)
    assert by_pred["http://ex/i"] == ("literal", "42", XSD_INTEGER, None)
    assert by_pred["http://ex/d"] == ("literal", "1.5E0", XSD_DOUBLE, None)
    # JSON 1.0 parses as float -> not i64-representable text -> double
    # (reference rdf/mod.rs:246-260 NumberBuf::is_i64 on the "1.0" text)
    assert by_pred["http://ex/whole"] == ("literal", "1.0E0", XSD_DOUBLE, None)
    assert by_pred["http://ex/lang"] == ("literal", "bonjour", None, "fr")


def test_huge_int_becomes_double():
    q = quads({"@id": "http://n/1", "http://ex/p": 10**30})
    (_, _, _, k, o, dt, lg) = q[0]
    assert (k, o, dt) == ("literal", "1.0E30", XSD_DOUBLE)


def test_type_quads_and_named_graph():
    q = quads(
        {
            "@id": "http://g/1",
            "@graph": [{"@id": "http://n/a", "@type": "http://t/T"}],
        }
    )
    assert ("http://g/1", "http://n/a", RDF_TYPE, "iri", "http://t/T", None, None) in q


def test_list_chain():
    q = quads({"@id": "http://n/1", "http://ex/p": {"@list": ["a", "b"]}})
    firsts = [x for x in q if x[2] == RDF_FIRST]
    rests = [x for x in q if x[2] == RDF_REST]
    assert len(firsts) == 2 and len(rests) == 2
    # chain terminates in rdf:nil
    assert any(x[4] == RDF_NIL and x[3] == "iri" for x in rests)
    # head referenced from subject
    head = [x for x in q if x[2] == "http://ex/p"]
    assert head[0][3] == "bnode"


def test_empty_list_is_nil():
    q = quads({"@id": "http://n/1", "http://ex/p": {"@list": []}})
    assert q == [(None, "http://n/1", "http://ex/p", "iri", RDF_NIL, None, None)]


def test_json_literal_canonical():
    q = quads(
        {
            "@context": {"p": {"@id": "http://ex/p", "@type": "@json"}},
            "@id": "http://n/1",
            "p": {"b": 1.0, "a": "x"},
        }
    )
    (_, _, _, k, o, dt, _) = q[0]
    assert o == '{"a":"x","b":1}'
    assert dt.endswith("JSON")


def test_i18n_direction():
    q = quads(
        {
            "@id": "http://n/1",
            "http://ex/p": {"@value": "x", "@language": "ar-EG", "@direction": "rtl"},
            "http://ex/q": {"@value": "y", "@direction": "ltr"},
        },
        rdf_direction="i18n-datatype",
    )
    by_pred = {p: (o, dt) for (_, _, p, _, o, dt, _) in q}
    assert by_pred["http://ex/p"] == ("x", "https://www.w3.org/ns/i18n#ar-EG_rtl")
    # no language -> i18n#<dir> (reference rdf/mod.rs:628-635)
    assert by_pred["http://ex/q"] == ("y", "https://www.w3.org/ns/i18n#ltr")


def test_compound_literal_direction():
    q = quads(
        {
            "@id": "http://n/1",
            "http://ex/p": {"@value": "x", "@language": "ar", "@direction": "rtl"},
        },
        rdf_direction="compound-literal",
    )
    preds = sorted(x[2] for x in q)
    assert preds == [
        "http://ex/p",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#direction",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#language",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#value",
    ]


def test_no_direction_mode_keeps_langstring():
    q = quads(
        {
            "@id": "http://n/1",
            "http://ex/p": {"@value": "x", "@language": "ar", "@direction": "rtl"},
        }
    )
    assert q == [(None, "http://n/1", "http://ex/p", "literal", "x", None, "ar")]


def test_blank_predicate_gated():
    doc = {"@id": "http://n/1", "_:p": {"@id": "http://n/2"}}
    # expansion keeps _:p as a property (blank node property warning)
    assert quads(doc) == []
    gq = quads(doc, produce_generalized_rdf=True)
    assert len(gq) == 1 and gq[0][2] == "_:b0"


def test_invalid_ids_dropped():
    q = quads(
        {
            "@id": "relative-subject",
            "http://ex/p": {"@id": "http://n/ok"},
        }
    )
    # relative (invalid, unresolvable without base) subject -> all dropped
    assert q == []


def test_canonicalization_isomorphism():
    doc_a = [{"http://ex/p": [{"http://ex/q": [{"@value": "x"}]}]}]
    doc_b = [{"http://ex/p": [{"http://ex/q": [{"@value": "x"}]}]}]
    from json_ld_spark.nodemap import BlankGen
    from json_ld_spark.rdf import expanded_to_quads

    qa = expanded_to_quads(doc_a, gen=BlankGen(prefix="x"))
    qb = expanded_to_quads(doc_b, gen=BlankGen(prefix="y"))
    assert set(canonicalize_quads(qa)) == set(canonicalize_quads(qb))
    p, r, f = quad_set_prf(qa, qb)
    assert (p, r, f) == (1.0, 1.0, 1.0)


def test_canonicalization_distinguishes():
    from json_ld_spark.nodemap import BlankGen
    from json_ld_spark.rdf import expanded_to_quads

    qa = expanded_to_quads([{"http://ex/p": [{"@value": "x"}]}], gen=BlankGen())
    qb = expanded_to_quads([{"http://ex/p": [{"@value": "y"}]}], gen=BlankGen())
    assert set(canonicalize_quads(qa)) != set(canonicalize_quads(qb))


def test_nquads_output():
    nq = to_nquads(
        quads({"@id": "http://n/1", "http://ex/p": 'say "hi"\n'})
    )
    assert nq == '<http://n/1> <http://ex/p> "say \\"hi\\"\\n" .\n'
