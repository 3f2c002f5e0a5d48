"""fromRdf (§8.2, reference serialization.rs:238-392) tests: direct
cases, quad-level roundtrip over the golden suite, the Spark inverse
stage, and the CLI + fs_loader surfaces."""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

import pytest

from json_ld_spark.api import expand, to_rdf
from json_ld_spark.fromrdf import from_rdf
from json_ld_spark.canonicalize import canonicalize_quads
from json_ld_spark.options import JsonLdOptions

REPO = pathlib.Path(__file__).parent.parent
SUITE = json.loads((REPO / "tests/fixtures/golden_suite.json").read_text())

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_fromrdf_basic_literals():
    quads = [
        (None, "http://n/1", "http://ex/s", "literal", "hi", XSD + "string", None),
        (None, "http://n/1", "http://ex/i", "literal", "42", XSD + "integer", None),
        (None, "http://n/1", "http://ex/b", "literal", "true", XSD + "boolean", None),
        (None, "http://n/1", "http://ex/d", "literal", "1.5E0", XSD + "double", None),
        (None, "http://n/1", "http://ex/l", "literal", "bonjour", None, "fr"),
        (None, "http://n/1", RDF + "type", "iri", "http://ex/T", None, None),
    ]
    (node,) = from_rdf(quads)
    assert node["@id"] == "http://n/1"
    assert node["@type"] == ["http://ex/T"]
    assert node["http://ex/s"] == [{"@value": "hi"}]
    assert node["http://ex/i"] == [{"@value": 42}]
    assert node["http://ex/b"] == [{"@value": True}]
    assert node["http://ex/d"] == [{"@value": 1.5}]
    assert node["http://ex/l"] == [{"@value": "bonjour", "@language": "fr"}]


def test_fromrdf_no_native_types():
    quads = [(None, "http://n/1", "http://ex/i", "literal", "42", XSD + "integer", None)]
    (node,) = from_rdf(quads, use_native_types=False)
    assert node["http://ex/i"] == [{"@value": "42", "@type": XSD + "integer"}]


def test_fromrdf_list_folding():
    quads = [
        (None, "http://n/1", "http://ex/items", "bnode", "_:l1", None, None),
        (None, "_:l1", RDF + "first", "literal", "a", XSD + "string", None),
        (None, "_:l1", RDF + "rest", "bnode", "_:l2", None, None),
        (None, "_:l2", RDF + "first", "literal", "b", XSD + "string", None),
        (None, "_:l2", RDF + "rest", "iri", RDF + "nil", None, None),
    ]
    (node,) = from_rdf(quads)
    assert node["http://ex/items"] == [
        {"@list": [{"@value": "a"}, {"@value": "b"}]}
    ]


def test_fromrdf_shared_list_not_folded():
    # the chain head is referenced twice → not a well-formed list
    quads = [
        (None, "http://n/1", "http://ex/p", "bnode", "_:l1", None, None),
        (None, "http://n/2", "http://ex/p", "bnode", "_:l1", None, None),
        (None, "_:l1", RDF + "first", "literal", "a", XSD + "string", None),
        (None, "_:l1", RDF + "rest", "iri", RDF + "nil", None, None),
    ]
    nodes = from_rdf(quads)
    by_id = {n["@id"]: n for n in nodes}
    assert by_id["http://n/1"]["http://ex/p"] == [{"@id": "_:l1"}]
    # _:l1 survives as a node with the folded tail only at its own level
    assert RDF + "first" in by_id["_:l1"]


def test_fromrdf_empty_list():
    quads = [(None, "http://n/1", "http://ex/p", "iri", RDF + "nil", None, None)]
    (node,) = from_rdf(quads)
    assert node["http://ex/p"] == [{"@list": []}]


def test_fromrdf_named_graph():
    quads = [
        ("http://g/1", "http://n/1", "http://ex/p", "literal", "v", XSD + "string", None)
    ]
    (node,) = from_rdf(quads)
    assert node["@id"] == "http://g/1"
    assert node["@graph"][0]["@id"] == "http://n/1"


def test_fromrdf_i18n_direction():
    quads = [
        (None, "http://n/1", "http://ex/t", "literal", "x",
         "https://www.w3.org/ns/i18n#ar_rtl", None)
    ]
    (node,) = from_rdf(quads, rdf_direction="i18n-datatype")
    assert node["http://ex/t"] == [
        {"@value": "x", "@language": "ar", "@direction": "rtl"}
    ]


def test_fromrdf_compound_literal():
    quads = [
        (None, "http://n/1", "http://ex/t", "bnode", "_:cl", None, None),
        (None, "_:cl", RDF + "value", "literal", "x", XSD + "string", None),
        (None, "_:cl", RDF + "language", "literal", "ar", XSD + "string", None),
        (None, "_:cl", RDF + "direction", "literal", "rtl", XSD + "string", None),
    ]
    (node,) = from_rdf(quads, rdf_direction="compound-literal")
    assert node["http://ex/t"] == [
        {"@value": "x", "@language": "ar", "@direction": "rtl"}
    ]


def _case_opts(case):
    return JsonLdOptions(
        base=case.get("base"),
        rdf_direction=case.get("rdf_direction"),
        produce_generalized_rdf=case.get("produce_generalized_rdf", False),
    )


def test_quad_roundtrip_over_golden_suite():
    """to_rdf → from_rdf → to_rdf must reproduce the same canonical quad
    set for every positive golden case (the quad-level fixpoint the
    reference's fromRdf/toRdf pair guarantees)."""
    for case in SUITE["cases"]:
        if "quads" not in case:
            continue
        opts = _case_opts(case)
        quads1 = to_rdf(case["input"], options=opts)
        doc2 = from_rdf(quads1, rdf_direction=opts.rdf_direction)
        quads2 = to_rdf({"@graph": doc2} if len(doc2) != 1 else doc2[0],
                        options=opts)
        a = set(canonicalize_quads(quads1))
        b = set(canonicalize_quads(quads2))
        assert a == b, (
            f"{case['name']}: roundtrip mismatch\n only-1: {sorted(a-b)}\n"
            f" only-2: {sorted(b-a)}"
        )


def test_from_rdf_stage_spark(spark):
    """Distributed inverse: triples_stage → from_rdf_stage reconstructs
    per-document expanded docs (quad-level fixpoint per doc)."""
    from json_ld_spark.operators.jsonld import from_rdf_stage, triples_stage

    docs = [
        ("d1", json.dumps({"@context": {"@vocab": "http://ex/"},
                           "@id": "http://n/1", "p": ["a", "b"],
                           "items": {"@list": [1, 2, 3]}})),
        ("d2", json.dumps({"@context": {"@vocab": "http://ex/"},
                           "@id": "http://n/2", "q": {"name": "inner"}})),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "doc"])
    triples = triples_stage(df)
    back = from_rdf_stage(triples).toPandas()
    assert set(back["doc_id"]) == {"d1", "d2"}
    for _, row in back.iterrows():
        doc = json.loads(row["expanded"])
        orig = json.loads(dict(docs)[row["doc_id"]])
        q1 = set(canonicalize_quads(to_rdf(orig)))
        q2 = set(canonicalize_quads(
            to_rdf({"@graph": doc} if len(doc) != 1 else doc[0])))
        assert q1 == q2, row["doc_id"]


def test_fs_loader(tmp_path):
    from json_ld_spark.context import fs_loader

    (tmp_path / "ctx.jsonld").write_text(
        json.dumps({"@context": {"@vocab": "http://ex/"}})
    )
    loader = fs_loader({"http://mounted/": str(tmp_path)})
    doc = {"@context": "http://mounted/ctx.jsonld", "name": "x"}
    out = expand(doc, options=JsonLdOptions(loader=loader))
    assert out == [{"http://ex/name": [{"@value": "x"}]}]


def test_cli_expand_and_tordf(tmp_path):
    doc = {"@context": {"@vocab": "http://ex/"}, "@id": "http://n/1", "p": "v"}
    f = tmp_path / "doc.json"
    f.write_text(json.dumps(doc))
    out = subprocess.run(
        [sys.executable, "-m", "json_ld_spark", "expand", str(f)],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr
    assert json.loads(out.stdout) == [
        {"@id": "http://n/1", "http://ex/p": [{"@value": "v"}]}
    ]
    out = subprocess.run(
        [sys.executable, "-m", "json_ld_spark", "tordf", str(f)],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr
    assert '<http://n/1> <http://ex/p> "v" .' in out.stdout


# ---------------------------------------------------------------------------
# quad-level fuzz: adversarial rdf:first/rest structures through the
# from_rdf → to_rdf dataset fixpoint
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_BN = ["_:a", "_:b", "_:c", "_:d"]
_CHAIN_BN = ["_:l1", "_:l2", "_:l3"]  # never used in named graphs
_IRIS = ["http://n/1", "http://n/2", "http://n/3"]
_PREDS = ["http://ex/p", "http://ex/q", RDF + "type"]

_lit = st.sampled_from([
    ("literal", "hello", XSD + "string", None),
    ("literal", "42", XSD + "integer", None),
    ("literal", "true", XSD + "boolean", None),
    ("literal", "1.5E0", XSD + "double", None),
    ("literal", "bonjour", None, "fr"),
    ("literal", "x", "http://ex/Custom", None),
])
_node = st.sampled_from(
    [("iri", i, None, None) for i in _IRIS] + [("bnode", b, None, None) for b in _BN]
)


@st.composite
def _quad_sets(draw):
    """Random datasets incl. malformed/shared/cyclic rdf:first/rest
    fragments, constrained to JSON-LD's round-trippable fragment: chain
    bnodes live only in the default graph (a bnode that is a list cell
    in one graph and a node in another cannot be expressed in JSON-LD —
    the spec's own fromRdf loses that link)."""
    out = []
    for _ in range(draw(st.integers(min_value=1, max_value=8))):
        subj = draw(st.sampled_from(_IRIS + _BN))
        pred = draw(st.sampled_from(_PREDS))
        if pred == RDF + "type":
            kind, obj, dt, lg = draw(_node)
        else:
            kind, obj, dt, lg = draw(st.one_of(_lit, _node))
        graph = draw(st.sampled_from([None, None, "http://g/1", "_:gb"]))
        out.append((graph, subj, pred, kind, obj, dt, lg))
    for _ in range(draw(st.integers(min_value=0, max_value=5))):
        b = draw(st.sampled_from(_CHAIN_BN))
        if draw(st.booleans()):
            kind, obj, dt, lg = draw(st.one_of(_lit, _node))
            out.append((None, b, RDF + "first", kind, obj, dt, lg))
        else:
            tk, tv = draw(st.sampled_from(
                [("bnode", x) for x in _CHAIN_BN]
                + [("iri", RDF + "nil"), ("iri", "http://n/1")]
            ))
            out.append((None, b, RDF + "rest", tk, tv, None, None))
    # attach some chains to regular nodes
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        subj = draw(st.sampled_from(_IRIS))
        b = draw(st.sampled_from(_CHAIN_BN))
        out.append((None, subj, "http://ex/p", "bnode", b, None, None))
    return list(dict.fromkeys(out))


@given(_quad_sets())
@settings(max_examples=150, deadline=None)
def test_quad_fuzz_fixpoint(q):
    back = from_rdf(q)
    q2 = to_rdf({"@graph": back} if len(back) != 1 else (back[0] if back else {"@graph": []}))
    a = set(canonicalize_quads(q))
    b = set(canonicalize_quads(q2))
    assert a == b, (
        f"\n only-in : {sorted(a - b, key=str)}\n only-out: {sorted(b - a, key=str)}"
    )
