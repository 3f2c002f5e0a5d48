"""RDFS (ρdf) entailment materialization — operators/entailment.py.

Verified two ways: hand-built hierarchy cases, and equivalence with a
naive Python fixpoint rule engine on randomized ontology+instance
graphs (the brute-force applies rdfs2/3/5/7/9/11 until nothing new,
with no stratification assumption — so it also certifies that the
operator's single stratified pass is complete on these inputs)."""

from __future__ import annotations

import random

import pytest

from json_ld_spark.operators.entailment import (
    DOMAIN,
    RANGE,
    RDF_TYPE,
    SUB_CLASS,
    SUB_PROP,
    rdfs_closure,
)

QSCHEMA = ("graph string, subj string, pred string, obj_kind string, "
           "obj string, datatype string, lang string")
XS = "http://www.w3.org/2001/XMLSchema#string"


def _t(s, p, o, kind="iri", dt=None, lang=None, g=None):
    return (g, s, p, kind, o, dt, lang)


def _naive_closure(quads):
    """Brute-force fixpoint over the six ρdf rules."""
    got = set(quads)
    while True:
        new = set()
        sco = {(s, o) for (_, s, p, k, o, _, _) in got
               if p == SUB_CLASS and k in ("iri", "bnode")}
        spo = {(s, o) for (_, s, p, k, o, _, _) in got
               if p == SUB_PROP and k in ("iri", "bnode")}
        dom = {(s, o) for (_, s, p, k, o, _, _) in got
               if p == DOMAIN and k in ("iri", "bnode")}
        rng = {(s, o) for (_, s, p, k, o, _, _) in got
               if p == RANGE and k in ("iri", "bnode")}
        for (g, s, p, k, o, dt, lg) in list(got):
            for (a, b) in spo:
                if p == a:
                    new.add((g, s, b, k, o, dt, lg))  # rdfs7
            for (a, b) in dom:
                if p == a:
                    new.add((g, s, RDF_TYPE, "iri", b, None, None))  # rdfs2
            for (a, b) in rng:
                if p == a and k in ("iri", "bnode"):
                    new.add((g, o, RDF_TYPE, "iri", b, None, None))  # rdfs3
            if p == RDF_TYPE:
                for (a, b) in sco:
                    if o == a:
                        new.add((g, s, RDF_TYPE, "iri", b, None, None))  # rdfs9
        for (a, b) in sco:  # rdfs11
            for (c, d) in sco:
                if b == c:
                    new.add((None, a, SUB_CLASS, "iri", d, None, None))
        for (a, b) in spo:  # rdfs5
            for (c, d) in spo:
                if b == c:
                    new.add((None, a, SUB_PROP, "iri", d, None, None))
        if new <= got:
            return got
        got |= new


def _norm(rows):
    # graph of sub*-closure triples is NULL by contract on both sides;
    # the naive engine can rederive an existing schema pair with NULL
    # graph — normalize by erasing graph on schema predicates
    out = set()
    for (g, s, p, k, o, dt, lg) in rows:
        if p in (SUB_CLASS, SUB_PROP):
            g = None
        out.add((g, s, p, k, o, dt, lg))
    return out


def _run(spark, quads):
    df = spark.createDataFrame(quads, QSCHEMA)
    return {tuple(r) for r in rdfs_closure(df).collect()}


def test_class_chain_and_domain_range(spark):
    quads = [
        _t("C1", SUB_CLASS, "C2"),
        _t("C2", SUB_CLASS, "C3"),
        _t("p", DOMAIN, "C1"),
        _t("p", RANGE, "C3"),
        _t("x", "p", "y"),
    ]
    got = _run(spark, quads)
    assert _t("C1", SUB_CLASS, "C3") in got          # rdfs11
    assert _t("x", RDF_TYPE, "C1") in got            # rdfs2
    assert _t("x", RDF_TYPE, "C2") in got            # rdfs9 over derived
    assert _t("x", RDF_TYPE, "C3") in got
    assert _t("y", RDF_TYPE, "C3") in got            # rdfs3
    assert got == _norm(_naive_closure(quads))


def test_subproperty_keeps_literal_shape(spark):
    quads = [
        _t("p", SUB_PROP, "q"),
        _t("q", SUB_PROP, "r"),
        _t("x", "p", "hello", kind="literal", dt=XS),
        _t("x", "p", "bonjour", kind="literal", lang="fr"),
    ]
    got = _run(spark, quads)
    assert _t("x", "r", "hello", kind="literal", dt=XS) in got   # rdfs5+7
    assert _t("x", "q", "bonjour", kind="literal", lang="fr") in got
    assert _t("p", SUB_PROP, "r") in got
    # literals never gain rdf:type via range on a literal object
    assert got == _norm(_naive_closure(quads))


def test_range_skips_literal_objects(spark):
    quads = [
        _t("p", RANGE, "C"),
        _t("x", "p", "lit", kind="literal", dt=XS),
        _t("x", "p", "n"),
    ]
    got = _run(spark, quads)
    assert _t("n", RDF_TYPE, "C") in got
    assert _t("lit", RDF_TYPE, "C") not in got
    assert got == _norm(_naive_closure(quads))


def test_graph_inheritance(spark):
    quads = [
        _t("p", DOMAIN, "C"),
        _t("x", "p", "y", g="http://ex/g"),
    ]
    got = _run(spark, quads)
    assert _t("x", RDF_TYPE, "C", g="http://ex/g") in got


def test_separate_schema_argument(spark):
    onto = [_t("C1", SUB_CLASS, "C2")]
    inst = [_t("x", RDF_TYPE, "C1")]
    import pyspark.sql.functions as F  # noqa: F401

    df_i = spark.createDataFrame(inst, QSCHEMA)
    df_o = spark.createDataFrame(onto, QSCHEMA)
    got = {tuple(r) for r in rdfs_closure(df_i, schema=df_o).collect()}
    assert _t("x", RDF_TYPE, "C2") in got
    # schema triples themselves surface through the closure output
    assert _t("C1", SUB_CLASS, "C2") in got


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_randomized_vs_naive_fixpoint(spark, seed):
    rnd = random.Random(seed)
    classes = [f"C{i}" for i in range(5)]
    props = [f"p{i}" for i in range(4)]
    nodes = [f"n{i}" for i in range(6)]
    quads = set()
    for _ in range(4):
        quads.add(_t(rnd.choice(classes), SUB_CLASS, rnd.choice(classes)))
    for _ in range(3):
        quads.add(_t(rnd.choice(props), SUB_PROP, rnd.choice(props)))
    for _ in range(2):
        quads.add(_t(rnd.choice(props), DOMAIN, rnd.choice(classes)))
        quads.add(_t(rnd.choice(props), RANGE, rnd.choice(classes)))
    for _ in range(8):
        if rnd.random() < 0.3:
            quads.add(_t(rnd.choice(nodes), RDF_TYPE, rnd.choice(classes)))
        elif rnd.random() < 0.3:
            quads.add(_t(rnd.choice(nodes), rnd.choice(props),
                         f"v{rnd.randrange(3)}", kind="literal", dt=XS))
        else:
            quads.add(_t(rnd.choice(nodes), rnd.choice(props),
                         rnd.choice(nodes)))
    got = _run(spark, sorted(quads))
    want = _norm(_naive_closure(quads))
    assert got == want


def test_delta_closure_equals_full_recompute(spark):
    from json_ld_spark.operators.entailment import rdfs_closure, rdfs_closure_delta

    onto = [
        _t("C1", SUB_CLASS, "C2"), _t("C2", SUB_CLASS, "C3"),
        _t("p", SUB_PROP, "q"), _t("p", DOMAIN, "C1"), _t("q", RANGE, "C3"),
    ]
    base = [_t("x", "p", "y"), _t("x", RDF_TYPE, "C1")]
    delta = [_t("z", "p", "w"), _t("w", RDF_TYPE, "C2")]
    df = lambda rows: spark.createDataFrame(rows, QSCHEMA)

    schema = df(onto)
    base_closed = rdfs_closure(df(base), schema=schema)
    incremental = rdfs_closure_delta(base_closed, df(delta), schema)
    full = rdfs_closure(df(base + delta), schema=schema)
    assert {tuple(r) for r in incremental.collect()} == \
        {tuple(r) for r in full.collect()}


# --------------------------------------------------------------------------
# OWL property axioms (owl_property_closure / functional_conflicts)
# --------------------------------------------------------------------------

from json_ld_spark.operators.entailment import (  # noqa: E402
    FUNCTIONAL_PROP,
    INVERSE_OF,
    SYMMETRIC_PROP,
    TRANSITIVE_PROP,
    functional_conflicts,
    owl_property_closure,
)


def _kind(term):
    return "bnode" if term.startswith("_:") else "iri"


def _naive_owl_closure(quads):
    """Brute-force fixpoint over rdfp3 (symmetric), rdfp4 (transitive)
    and rdfp8 (inverseOf), applying single-generator rules repeatedly
    (so rule COMPOSITIONS — copies via inverse∘inverse, induced
    symmetry — emerge naturally rather than from a pre-closed table).
    Contract mirrored from the operator: relabel derivations inherit
    the premise graph; transitive derivations carry NULL graph and
    only fire for pairs not derivable WITHOUT transitivity (the
    suppression set is the relabel-only fixpoint — deterministic,
    unlike a suppress-if-currently-present heuristic, which would be
    iteration-order-dependent)."""
    flips = {(s, o) for (_, s, p, k, o, _, _) in quads
             if p == INVERSE_OF and k in ("iri", "bnode")}
    flips |= {(o, s) for (s, o) in flips}
    flips |= {(s, s) for (_, s, p, _, o, _, _) in quads
              if p == RDF_TYPE and o == SYMMETRIC_PROP}
    trans = {s for (_, s, p, _, o, _, _) in quads
             if p == RDF_TYPE and o == TRANSITIVE_PROP}

    def relabel_step(got):
        new = set()
        for (g, s, p, k, o, dt, lg) in got:
            if k not in ("iri", "bnode"):
                continue
            for (a, b) in flips:
                if p == a:
                    new.add((g, o, b, _kind(s), s, None, None))
        return new

    # phase 1: relabel-only fixpoint -> suppression set of known pairs
    got = set(quads)
    while True:
        new = relabel_step(got)
        if new <= got:
            break
        got |= new
    suppressed = {(s, p, o) for (_, s, p, _, o, _, _) in got}

    # phase 2: full fixpoint with transitivity
    while True:
        new = relabel_step(got)
        for (g, s, p, k, o, dt, lg) in list(got):
            if k not in ("iri", "bnode") or p not in trans:
                continue
            for (g2, s2, p2, k2, o2, _, _) in got:
                if p2 == p and s2 == o and k2 in ("iri", "bnode"):
                    if (s, p, o2) not in suppressed:
                        new.add((None, s, p, _kind(o2), o2, None, None))
        if new <= got:
            return got
        got |= new


def _run_owl(spark, quads, **kw):
    df = spark.createDataFrame(list(quads), QSCHEMA)
    return {tuple(r) for r in owl_property_closure(df, **kw).collect()}


def test_owl_inverse_and_symmetric(spark):
    quads = {
        _t("next", INVERSE_OF, "prev"),
        _t("knows", RDF_TYPE, SYMMETRIC_PROP),
        _t("a", "next", "b", g="g1"),
        _t("x", "knows", "_:y", kind="bnode", g="g2"),
        _t("x", "name", "Ada", kind="literal", dt=XS),  # literal: no flip
    }
    got = _run_owl(spark, quads)
    assert _t("b", "prev", "a", g="g1") in got
    assert ("g2", "_:y", "knows", "iri", "x", None, None) in got
    # inverse declared one way works both ways
    quads2 = {_t("next", INVERSE_OF, "prev"), _t("b", "prev", "a")}
    assert _t("a", "next", "b") in _run_owl(spark, quads2)
    assert got == _naive_owl_closure(quads)


def test_owl_transitive_chain(spark):
    quads = {_t("part", RDF_TYPE, TRANSITIVE_PROP)}
    for i in range(9):
        quads.add(_t(f"n{i}", "part", f"n{i+1}", g="gx"))
    got = _run_owl(spark, quads)
    # all 45 closure pairs present; derived ones carry NULL graph
    assert (None, "n0", "part", "iri", "n9", None, None) in got
    assert sum(1 for r in got if r[2] == "part") == 45
    # base edges keep their graph and get no NULL-graph duplicate
    assert ("gx", "n0", "part", "iri", "n1", None, None) in got
    assert (None, "n0", "part", "iri", "n1", None, None) not in got
    assert got == _naive_owl_closure(quads)


def test_owl_transitive_with_inverse_interplay(spark):
    # p transitive, q = p⁻ (q not declared transitive): the q closure
    # must still fully materialize via flip-after-closure
    quads = {
        _t("p", RDF_TYPE, TRANSITIVE_PROP),
        _t("p", INVERSE_OF, "q"),
        _t("a", "p", "b"), _t("b", "p", "c"), _t("c", "p", "d"),
    }
    got = _run_owl(spark, quads)
    assert (None, "d", "q", "iri", "a", None, None) in got
    assert got == _naive_owl_closure(quads)


def test_owl_symmetric_transitive_component(spark):
    # symmetric + transitive = full connectivity within the chain
    quads = {
        _t("r", RDF_TYPE, SYMMETRIC_PROP),
        _t("r", RDF_TYPE, TRANSITIVE_PROP),
        _t("a", "r", "b"), _t("b", "r", "c"),
    }
    got = _run_owl(spark, quads)
    rpairs = {(r[1], r[4]) for r in got if r[2] == "r"}
    assert rpairs == {(x, y) for x in "abc" for y in "abc"}
    assert got == _naive_owl_closure(quads)


@pytest.mark.parametrize("seed", [5, 42, 123])
def test_owl_randomized_vs_naive_fixpoint(spark, seed):
    rnd = random.Random(seed)
    props = [f"p{i}" for i in range(4)]
    nodes = [f"n{i}" for i in range(7)]
    quads = set()
    quads.add(_t(rnd.choice(props), INVERSE_OF, rnd.choice(props)))
    quads.add(_t(rnd.choice(props), RDF_TYPE, SYMMETRIC_PROP))
    quads.add(_t(rnd.choice(props), RDF_TYPE, TRANSITIVE_PROP))
    quads.add(_t(rnd.choice(props), RDF_TYPE, TRANSITIVE_PROP))
    for _ in range(12):
        if rnd.random() < 0.15:
            quads.add(_t(rnd.choice(nodes), rnd.choice(props),
                         f"v{rnd.randrange(3)}", kind="literal", dt=XS))
        else:
            quads.add(_t(rnd.choice(nodes), rnd.choice(props),
                         rnd.choice(nodes), g=rnd.choice([None, "g1", "g2"])))
    got = _run_owl(spark, quads)
    want = _naive_owl_closure(quads)
    assert got == want


def test_owl_separate_schema_argument(spark):
    onto = [_t("next", INVERSE_OF, "prev")]
    inst = [_t("a", "next", "b")]
    df = lambda rows: spark.createDataFrame(rows, QSCHEMA)  # noqa: E731
    got = {tuple(r)
           for r in owl_property_closure(df(inst), schema=df(onto)).collect()}
    assert _t("b", "prev", "a") in got
    # the schema axioms themselves are not injected into the output
    assert _t("next", INVERSE_OF, "prev") not in got


def test_functional_conflicts(spark):
    quads = [
        _t("author", RDF_TYPE, FUNCTIONAL_PROP),
        _t("d1", "author", "alice"),
        _t("d1", "author", "bob"),
        _t("d1", "author", "alice"),   # duplicate value: not a conflict alone
        _t("d2", "author", "alice"),
        _t("d3", "title", "x", kind="literal", dt=XS),
        _t("d3", "title", "y", kind="literal", dt=XS),  # not functional
    ]
    df = spark.createDataFrame(quads, QSCHEMA)
    got = {(r.subj, r.pred, r.n_values)
           for r in functional_conflicts(df).collect()}
    assert got == {("d1", "author", 2)}
