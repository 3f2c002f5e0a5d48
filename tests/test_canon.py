from json_ld_spark.canon import (
    canonical_json,
    ecmascript_number,
    xsd_canonical_double,
)


def test_xsd_canonical_double():
    assert xsd_canonical_double(1.0) == "1.0E0"
    assert xsd_canonical_double(110.0) == "1.1E2"
    assert xsd_canonical_double(0.5) == "5.0E-1"
    assert xsd_canonical_double(-0.5) == "-5.0E-1"
    assert xsd_canonical_double(1e21) == "1.0E21"
    assert xsd_canonical_double(1.111) == "1.111E0"
    assert xsd_canonical_double(0.0) == "0.0E0"
    assert xsd_canonical_double(-0.0) == "-0.0E0"
    assert xsd_canonical_double(123456789.123) == "1.23456789123E8"
    assert xsd_canonical_double(5.3) == "5.3E0"
    assert xsd_canonical_double(1e-7) == "1.0E-7"


def test_ecmascript_number():
    assert ecmascript_number(1.0) == "1"
    assert ecmascript_number(-1.0) == "-1"
    assert ecmascript_number(1.5) == "1.5"
    assert ecmascript_number(0.0) == "0"
    assert ecmascript_number(100.0) == "100"
    assert ecmascript_number(1e21) == "1e+21"
    assert ecmascript_number(1e-7) == "1e-7"
    assert ecmascript_number(0.000001) == "0.000001"
    assert ecmascript_number(1.1e22) == "1.1e+22"
    assert ecmascript_number(5.3) == "5.3"


def test_canonical_json_sorted_compact():
    assert canonical_json({"b": 1, "a": [True, None, "x"]}) == '{"a":[true,null,"x"],"b":1}'
    assert canonical_json({"n": 1.0}) == '{"n":1}'
    assert canonical_json("a\"b\n") == '"a\\"b\\n"'


def test_canonical_json_stable():
    a = {"x": {"b": 2, "a": 1}, "y": [1, 2]}
    b = {"y": [1, 2], "x": {"a": 1, "b": 2}}
    assert canonical_json(a) == canonical_json(b)


def test_canonicalize_cyclic_bnode_graphs_isomorphic():
    """Bnode rings: two label-permuted isomorphic cycles canonicalize to
    the same quad set; a structurally different ring does not."""
    from json_ld_spark.canonicalize import canonicalize_quads

    P = "http://ex/next"

    def ring(labels, mark=None):
        quads = [
            (None, f"_:{a}", P, "bnode", f"_:{b}", None, None)
            for a, b in zip(labels, labels[1:] + labels[:1])
        ]
        if mark:
            quads.append((None, f"_:{mark}", "http://ex/flag", "literal", "y",
                          "http://www.w3.org/2001/XMLSchema#string", None))
        return quads

    a = set(canonicalize_quads(ring(["x", "y", "z"])))
    b = set(canonicalize_quads(ring(["q", "r", "s"])))
    assert a == b  # pure automorphic ring: label choice free, set equal
    c = set(canonicalize_quads(ring(["x", "y", "z"], mark="x")))
    d = set(canonicalize_quads(ring(["q", "r", "s"], mark="r")))
    assert c == d  # marked ring: marking breaks symmetry identically
    assert a != c


def test_canonicalize_refinement_equivalent_non_automorphic():
    """Round-2 advice regression: 1-WL color refinement cannot separate
    directed cycles of different lengths (every node has one same-class
    predecessor/successor), so a 2-cycle ⊔ 4-cycle dataset has ONE
    6-member ambiguous group whose members are NOT all automorphic. The
    old min(original-id) orbit pick leaked input labels (marking a
    2-cycle node vs a 4-cycle node yields different outputs); the
    URDNA-style least-resulting-labeling exploration must make the
    output independent of input labels."""
    import itertools

    from json_ld_spark.canonicalize import canonicalize_quads

    P = "http://ex/next"

    def cycles(two, four):
        quads = [
            (None, f"_:{a}", P, "bnode", f"_:{b}", None, None)
            for a, b in zip(two, two[1:] + two[:1])
        ]
        quads += [
            (None, f"_:{a}", P, "bnode", f"_:{b}", None, None)
            for a, b in zip(four, four[1:] + four[:1])
        ]
        return quads

    # min-label in the 2-cycle vs in the 4-cycle vs interleaved —
    # the exact configurations that flipped the old tie-break
    variants = [
        cycles(["a1", "a2"], ["b1", "b2", "b3", "b4"]),
        cycles(["z8", "z9"], ["a1", "a2", "a3", "a4"]),
        cycles(["m1", "q7"], ["b2", "n1", "x5", "c3"]),
    ]
    outs = [set(canonicalize_quads(v)) for v in variants]
    assert outs[0] == outs[1] == outs[2]
    # sanity: 6 distinct labels, edges preserved (2+4 quads)
    labels = {s for _, s, _, _, _, _, _ in outs[0]}
    assert len(labels) == 6 and len(outs[0]) == 6
    # and a permutation fuzz over one variant
    base = variants[0]
    names = ["a1", "a2", "b1", "b2", "b3", "b4"]
    for perm in itertools.islice(itertools.permutations(
            ["p1", "p2", "p3", "p4", "p5", "p6"]), 0, 24, 5):
        ren = dict(zip(names, perm))
        permuted = [
            (g, f"_:{ren[s[2:]]}", p, k, f"_:{ren[o[2:]]}", d, l)
            for g, s, p, k, o, d, l in base
        ]
        assert set(canonicalize_quads(permuted)) == outs[0]


def test_canonicalize_twin_components():
    """Two disconnected identical components (true automorphism) get
    distinct disambiguated labels but a stable overall quad set."""
    from json_ld_spark.canonicalize import canonicalize_quads

    q = [
        (None, "_:a1", "http://ex/p", "literal", "v",
         "http://www.w3.org/2001/XMLSchema#string", None),
        (None, "_:b1", "http://ex/p", "literal", "v",
         "http://www.w3.org/2001/XMLSchema#string", None),
    ]
    out1 = set(canonicalize_quads(q))
    q2 = [
        (None, "_:zz", "http://ex/p", "literal", "v",
         "http://www.w3.org/2001/XMLSchema#string", None),
        (None, "_:aa", "http://ex/p", "literal", "v",
         "http://www.w3.org/2001/XMLSchema#string", None),
    ]
    out2 = set(canonicalize_quads(q2))
    assert out1 == out2
    assert len(out1) == 2  # twins keep distinct labels (no merge)


def test_canonicalize_long_chain_label_independent():
    """A 30-element rdf:first/rest chain (30-diameter bnode path) must
    canonicalize identically under different original labelings — this
    requires refinement to run to partition stability, not a fixed
    round count."""
    from json_ld_spark.canonicalize import canonicalize_quads

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    XS = "http://www.w3.org/2001/XMLSchema#string"

    def chain(mk):
        n = 30
        quads = [(None, "http://n/1", "http://ex/p", "bnode", mk(0), None, None)]
        for i in range(n):
            quads.append((None, mk(i), RDF + "first", "literal", str(i), XS, None))
            nxt = ("bnode", mk(i + 1)) if i + 1 < n else ("iri", RDF + "nil")
            quads.append((None, mk(i), RDF + "rest", nxt[0], nxt[1], None, None))
        return quads

    a = set(canonicalize_quads(chain(lambda i: f"_:b{i}")))
    b = set(canonicalize_quads(chain(lambda i: f"_:zz{97 - i}")))
    assert a == b


def test_canonicalize_long_uniform_chain():
    """Chain whose cells are indistinguishable except by position (all
    firsts identical): positional separation must come from refinement
    depth alone."""
    from json_ld_spark.canonicalize import canonicalize_quads

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    XS = "http://www.w3.org/2001/XMLSchema#string"

    def chain(mk, n=20):
        quads = [(None, "http://n/1", "http://ex/p", "bnode", mk(0), None, None)]
        for i in range(n):
            quads.append((None, mk(i), RDF + "first", "literal", "same", XS, None))
            nxt = ("bnode", mk(i + 1)) if i + 1 < n else ("iri", RDF + "nil")
            quads.append((None, mk(i), RDF + "rest", nxt[0], nxt[1], None, None))
        return quads

    a = set(canonicalize_quads(chain(lambda i: f"_:b{i}")))
    b = set(canonicalize_quads(chain(lambda i: f"_:w{1000 - i}")))
    assert a == b
    assert len(a) == len(set(chain(lambda i: f"_:b{i}", 20)))


def test_relabel_expanded_reference_semantics():
    """relabel/relabel_and_canonicalize parity
    (document/expanded.rs:99-157)."""
    from json_ld_spark.api import expand
    from json_ld_spark.canonicalize import (
        canonicalize_expanded, relabel_expanded,
    )

    doc = {"@context": {"@vocab": "http://v/"},
           "@graph": [
               {"name": "anon", "child": {"@id": "_:x", "n": 2.0}},
               {"@id": "_:x", "age": 2.5},
               {"@id": "http://n/1", "ref": {"@id": "_:x"}},
           ]}
    e = expand(doc, None)
    r = relabel_expanded(e, canonicalize=True)
    # every node identified; _:x consistently remapped; 2.0 -> 2
    assert r[0]["@id"] == "_:b0"
    child = r[0]["http://v/child"][0]
    assert child["@id"] == r[1]["@id"] == r[2]["http://v/ref"][0]["@id"]
    assert child["http://v/n"][0]["@value"] == 2
    assert isinstance(child["http://v/n"][0]["@value"], int)
    assert r[1]["http://v/age"][0]["@value"] == 2.5  # non-integral kept
    # relabel only: numbers untouched
    r2 = relabel_expanded(e)
    assert r2[0]["http://v/child"][0]["http://v/n"][0]["@value"] == 2.0
    # canonicalize only: ids untouched, numbers canonical
    c = canonicalize_expanded(e)
    assert "@id" not in c[0] or c[0].get("@id") != "_:b0"
    assert c[0]["http://v/child"][0]["http://v/n"][0]["@value"] == 2


def test_cli_expand_relabel_fetch(tmp_path, capsys):
    import json

    from json_ld_spark.__main__ import main

    p = tmp_path / "d.json"
    p.write_text(json.dumps({"@context": {"@vocab": "http://v/"},
                             "name": "x", "n": 3.0}))
    rc = main(["expand", str(p), "--relabel", "--canonicalize"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out[0]["@id"] == "_:b0"
    assert out[0]["http://v/n"][0]["@value"] == 3


def test_skolemize_roundtrip_and_kinds(spark):
    from json_ld_spark.operators.canonical import (
        GENID_BASE, skolemize, unskolemize,
    )

    rows = [
        (None, "_:c0", "p", "bnode", "_:c1", None, None),
        (None, "_:c1", "p", "iri", "http://x", None, None),
        ("g", "http://a", "q", "literal", "_:not-a-bnode-lexical", "t", None),
        (None, "http://a", "q", "bnode", "_:c0", None, None),
    ]
    df = spark.createDataFrame(
        rows, "graph string, subj string, pred string, obj_kind string, "
              "obj string, datatype string, lang string")
    sk = skolemize(df)
    got = {tuple(r) for r in sk.collect()}
    assert (None, GENID_BASE + "c0", "p", "iri", GENID_BASE + "c1",
            None, None) in got
    # literal whose lexical form LOOKS like a bnode label is untouched
    assert ("g", "http://a", "q", "literal", "_:not-a-bnode-lexical",
            "t", None) in got
    assert not [r for r in got if r[3] == "bnode"]
    back = {tuple(r) for r in unskolemize(sk).collect()}
    assert back == {tuple(r) for r in rows}


# ---------------------------------------------------- reification


def _quads(spark, rows):
    return spark.createDataFrame(
        rows,
        "graph string, subj string, pred string, obj_kind string, "
        "obj string, datatype string, lang string",
    )


def test_reify_emits_four_triples_per_statement(spark):
    from json_ld_spark.operators.canonical import RDF_NS, reify_statements

    t = _quads(spark, [(None, "http://e/s", "http://e/p", "iri", "http://e/o", None, None)])
    out = reify_statements(t).collect()
    assert len(out) == 4
    subjs = {r["subj"] for r in out}
    assert len(subjs) == 1 and next(iter(subjs)).startswith("https://example.org/stmt/")
    preds = {r["pred"] for r in out}
    assert preds == {RDF_NS + p for p in ("type", "subject", "predicate", "object")}
    obj_row = next(r for r in out if r["pred"] == RDF_NS + "object")
    assert obj_row["obj"] == "http://e/o" and obj_row["obj_kind"] == "iri"


def test_reify_content_addressed_and_dedups(spark):
    from json_ld_spark.operators.canonical import reify_statements

    rows = [
        (None, "http://e/s", "http://e/p", "literal", "x", "http://e/dt", None),
        (None, "http://e/s", "http://e/p", "literal", "x", "http://e/dt", None),  # dup
        (None, "http://e/s", "http://e/p", "literal", "x", None, "en"),  # distinct
    ]
    out = reify_statements(_quads(spark, rows)).collect()
    assert len(out) == 8  # two distinct statements x 4
    assert len({r["subj"] for r in out}) == 2
    # object triple preserves datatype / lang
    objs = {(r["datatype"], r["lang"]) for r in out if r["pred"].endswith("#object")}
    assert objs == {("http://e/dt", None), (None, "en")}


def test_reify_provenance_column(spark):
    from json_ld_spark.operators.canonical import PROV_DERIVED, reify_statements
    from pyspark.sql import functions as F

    t = _quads(
        spark, [(None, "http://e/s", "http://e/p", "iri", "http://e/o", None, None)]
    ).withColumn("src", F.lit("http://e/conv1"))
    out = reify_statements(t, source_col="src").collect()
    assert len(out) == 5
    prov = next(r for r in out if r["pred"] == PROV_DERIVED)
    assert prov["obj"] == "http://e/conv1" and prov["obj_kind"] == "iri"
