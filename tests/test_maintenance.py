"""KG maintenance (operators/maintenance.py): delta merge, retraction,
incremental node refresh (splice == full recompute), SPARQL UPDATE."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from json_ld_spark.operators.jsonld import node_table
from json_ld_spark.operators.maintenance import (
    affected_subjects,
    merge_triples,
    refresh_node_table,
    retract_documents,
    update_where,
)

QSCHEMA = ("doc_id string, graph string, subj string, pred string, "
           "obj_kind string, obj string, datatype string, lang string")
TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _quads(spark, rows):
    return spark.createDataFrame(rows, QSCHEMA)


def _q(doc, s, p, o, kind="iri", dt=None):
    return (doc, None, s, p, kind, o, dt, None)


def _base(spark):
    return _quads(spark, [
        _q("d1", "n1", TYPE, "T"),
        _q("d1", "n1", "p", "hello", kind="literal",
           dt="http://www.w3.org/2001/XMLSchema#string"),
        _q("d2", "n2", TYPE, "T"),
        _q("d2", "n2", "q", "n1"),
        _q("d3", "n3", "p", "x", kind="literal", dt=None),  # NULL datatype
    ])


def _set(df):
    return {tuple(r) for r in df.collect()}


def test_merge_add_delete_nullsafe(spark):
    base = _base(spark)
    deletes = _quads(spark, [
        _q("d3", "n3", "p", "x", kind="literal", dt=None),
        _q("zz", "n9", "p", "absent"),  # deleting a non-row is a no-op
    ]).drop("doc_id")
    adds = _quads(spark, [
        _q("d4", "n4", TYPE, "T"),
        _q("d1", "n1", TYPE, "T"),  # re-add of an existing quad dedups
    ])
    out = merge_triples(base, adds=adds, deletes=deletes)
    got = _set(out.select("subj", "pred", "obj"))
    assert ("n3", "p", "x") not in got           # null-datatype delete landed
    assert ("n4", TYPE, "T") in got
    assert out.filter((F.col("subj") == "n1") & (F.col("pred") == TYPE)).count() == 1


def test_merge_triple_key_fallback(spark):
    base = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c")], ["subj", "pred", "obj"]
    )
    out = merge_triples(
        base,
        deletes=spark.createDataFrame([("a", "p", "c")], ["subj", "pred", "obj"]),
    )
    assert _set(out) == {("a", "p", "b")}


def test_retract_documents(spark):
    base = _base(spark)
    out = retract_documents(
        base, spark.createDataFrame([("d1",)], ["doc_id"])
    )
    assert set(r.doc_id for r in out.collect()) == {"d2", "d3"}


def test_refresh_node_table_equals_full_recompute(spark):
    base = _base(spark)
    adds = _quads(spark, [
        _q("d4", "n2", "r", "n3"),          # touches existing node n2
        _q("d4", "n5", TYPE, "U"),          # brand-new node n5
    ])
    deletes = _quads(spark, [_q("d3", "n3", "p", "x", kind="literal", dt=None)])
    merged = merge_triples(base, adds=adds, deletes=deletes)

    old_nodes = node_table(base)
    refreshed = refresh_node_table(
        old_nodes, merged, affected_subjects(adds=adds, deletes=deletes)
    )
    full = node_table(merged)
    key = lambda t: tuple("" if x is None else str(x) for x in t)
    assert sorted(map(tuple, refreshed.collect()), key=key) == \
        sorted(map(tuple, full.collect()), key=key)
    # n3 lost its only triple -> gone from both
    assert refreshed.filter(F.col("node_id") == "n3").count() == 0


def test_update_where_rename_predicate(spark):
    triples = spark.createDataFrame(
        [("t1", "role", "user"), ("t2", "role", "assistant"),
         ("t1", "text", "hi")],
        ["subj", "pred", "obj"],
    )
    out = update_where(
        triples,
        where=[("?t", "role", "?r")],
        delete=[("?t", "role", "?r")],
        insert=[("?t", "speakerRole", "?r")],
    )
    got = _set(out)
    assert got == {
        ("t1", "speakerRole", "user"),
        ("t2", "speakerRole", "assistant"),
        ("t1", "text", "hi"),
    }


def test_update_where_delete_before_insert(spark):
    # inserting the SAME triple the delete removes must survive
    triples = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    out = update_where(
        triples,
        where=[("?s", "p", "?o")],
        delete=[("?s", "p", "?o")],
        insert=[("?s", "p", "?o")],
    )
    assert _set(out) == {("a", "p", "b")}


def test_update_where_insert_only_and_validation(spark):
    triples = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    out = update_where(
        triples, where=[("?s", "p", "?o")], insert=[("?o", "pInv", "?s")]
    )
    assert _set(out) == {("a", "p", "b"), ("b", "pInv", "a")}
    with pytest.raises(ValueError):
        update_where(triples, where=[("?s", "p", "?o")])


def test_update_where_fuzz_vs_naive(spark):
    """Randomized DELETE/INSERT WHERE against a brute-force evaluator."""
    import itertools
    import random

    def naive_bindings(triples, patterns):
        sols = [dict()]
        for (ps, pp, po) in patterns:
            new = []
            for sol in sols:
                for (s, p, o) in triples:
                    trial = dict(sol)
                    ok = True
                    for term, val in ((ps, s), (pp, p), (po, o)):
                        if term.startswith("?"):
                            v = term[1:]
                            if v in trial and trial[v] != val:
                                ok = False
                                break
                            trial[v] = val
                        elif term != val:
                            ok = False
                            break
                    if ok:
                        new.append(trial)
            sols = new
        return sols

    def naive_instantiate(sols, template):
        out = set()
        for sol in sols:
            for (s, p, o) in template:
                row = tuple(sol.get(t[1:]) if t.startswith("?") else t
                            for t in (s, p, o))
                if all(x is not None for x in row):
                    out.add(row)
        return out

    rnd = random.Random(5)
    nodes = [f"n{i}" for i in range(5)]
    preds = ["p", "q", "r"]
    for trial in range(4):
        triples = sorted({
            (rnd.choice(nodes), rnd.choice(preds), rnd.choice(nodes))
            for _ in range(12)
        })
        where = [("?a", rnd.choice(preds), "?b"), ("?b", rnd.choice(preds), "?c")]
        delete = [("?a", "q", "?b")]
        insert = [("?c", "derived", "?a")]
        df = spark.createDataFrame(triples, ["subj", "pred", "obj"])
        got = {tuple(r) for r in update_where(
            df, where=where, delete=delete, insert=insert).collect()}

        sols = naive_bindings(triples, where)
        want = (set(triples) - naive_instantiate(sols, delete)) \
            | naive_instantiate(sols, insert)
        assert got == want, (trial, where)


SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def test_merge_same_as_chain_and_rewrites(spark):
    from json_ld_spark.operators.maintenance import merge_same_as

    base = _quads(spark, [
        # alias chain a1 -> b1 -> c1 (three sources, one entity)
        _q("s1", "iri:a1", SAMEAS, "iri:b1"),
        _q("s2", "iri:b1", SAMEAS, "iri:c1"),
        # each source asserts the same fact under its own name
        _q("s1", "iri:a1", TYPE, "T"),
        _q("s2", "iri:b1", TYPE, "T"),
        _q("s3", "iri:c1", TYPE, "T"),
        # IRI object pointing at an alias rewrites too
        _q("s2", "iri:z", "knows", "iri:c1"),
        # literal object equal to an alias name must NOT rewrite
        _q("s3", "iri:z", "label", "iri:b1", kind="literal"),
        # untouched node passes through
        _q("s1", "iri:z", TYPE, "U"),
    ])
    got = _set(merge_same_as(base))
    assert got == {
        (None, "iri:a1", TYPE, "iri", "T", None, None),
        (None, "iri:z", "knows", "iri", "iri:a1", None, None),
        (None, "iri:z", "label", "literal", "iri:b1", None, None),
        (None, "iri:z", TYPE, "iri", "U", None, None),
    }


def test_merge_same_as_excludes_bnodes_and_keeps_pred(spark):
    from json_ld_spark.operators.maintenance import merge_same_as

    base = _quads(spark, [
        _q("d", "_:b0", SAMEAS, "iri:a"),      # bnode subject: not an alias edge
        _q("d", "iri:a", SAMEAS, "_:b1"),      # bnode object: not an alias edge
        _q("d", "_:b0", "p", "v", kind="literal"),
        _q("d", "iri:a", TYPE, "T"),
    ])
    got = _set(merge_same_as(base))
    # bnode rows survive unrewritten; ALL sameAs assertions are dropped
    assert got == {
        (None, "_:b0", "p", "literal", "v", None, None),
        (None, "iri:a", TYPE, "iri", "T", None, None),
    }


def test_merge_same_as_fuzz_vs_union_find(spark):
    import random

    from json_ld_spark.operators.maintenance import merge_same_as

    rnd = random.Random(11)
    for trial in range(4):
        nodes = [f"iri:n{i:02d}" for i in range(12)]
        sameas = sorted({
            (rnd.choice(nodes), rnd.choice(nodes)) for _ in range(8)
        })
        facts = sorted({
            (rnd.choice(nodes), rnd.choice(["p", "q"]), rnd.choice(nodes))
            for _ in range(15)
        })
        rows = [_q("d", s, SAMEAS, o) for s, o in sameas] + [
            _q("d", s, p, o) for s, p, o in facts
        ]

        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, o in sameas:
            if s != o:
                ra, rb = find(s), find(o)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        # representative = lexicographic min of the component
        root_min = {}
        for n in nodes:
            r = find(n)
            root_min[r] = min(root_min.get(r, n), n)
        want = {
            (None, root_min[find(s)], p, "iri", root_min[find(o)], None, None)
            for s, p, o in facts
        }
        got = _set(merge_same_as(_quads(spark, rows)))
        assert got == want, trial


def test_incremental_canonicalize_equals_full_rebuild(spark):
    """The splice (recompute only delta docs) is EXACTLY the full
    canonical rebuild of the merged corpus — including a bnode-rooted
    edited doc whose canonical label must change, a named edited doc,
    a brand-new doc, and a deletion."""
    import json

    from json_ld_spark.operators.jsonld import triples_stage
    from json_ld_spark.operators.maintenance import incremental_canonicalize

    def doc(i, text, anon):
        d = {"@type": "T", "text": text, "n": i}
        if not anon:
            d["@id"] = f"http://x/{i}"
        return (f"d{i}", json.dumps(d))

    ctx = {"@vocab": "http://v/", "@base": "http://b/"}
    base_docs = [doc(i, f"t{i}", anon=(i % 2 == 0)) for i in range(8)]
    # edits: d0 (bnode-rooted) and d1 (named); new: d8; delete: d7
    merged = {t[0]: t for t in base_docs}
    for up in (doc(0, "t0 EDITED", True), doc(1, "t1 EDITED", False),
               doc(8, "t8", True)):
        merged[up[0]] = up
    del merged["d7"]

    schema = "doc_id string, doc string"
    cols = ["doc_id", "graph", "subj", "pred", "obj_kind", "obj",
            "datatype", "lang"]
    base = triples_stage(
        spark.createDataFrame(base_docs, schema), context=ctx,
        canonical_bnodes=True,
    ).select(*cols)
    got = incremental_canonicalize(
        base,
        upserts=spark.createDataFrame(
            [doc(0, "t0 EDITED", True), doc(1, "t1 EDITED", False),
             doc(8, "t8", True)], schema),
        deletes=spark.createDataFrame([("d7",)], "doc_id string"),
        context=ctx,
    )
    full = triples_stage(
        spark.createDataFrame(sorted(merged.values()), schema), context=ctx,
        canonical_bnodes=True,
    ).select(*cols)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, full.collect()))
    # the edited bnode-rooted doc's canonical label actually changed
    lab = {r.doc_id: r.subj for r in got.filter("doc_id = 'd0'").collect()}
    old = {r.doc_id: r.subj for r in base.filter("doc_id = 'd0'").collect()}
    assert lab["d0"].startswith("_:") and lab["d0"] != old["d0"]


def test_incremental_canonicalize_deletes_only_and_validation(spark):
    from json_ld_spark.operators.jsonld import triples_stage
    from json_ld_spark.operators.maintenance import incremental_canonicalize

    base = triples_stage(
        spark.createDataFrame(
            [("a", '{"@id":"http://x/a","http://v/v":1}'),
             ("b", '{"http://v/v":2}')],
            "doc_id string, doc string"),
        canonical_bnodes=True,
    )
    only_del = incremental_canonicalize(
        base, deletes=spark.createDataFrame([("b",)], "doc_id string"))
    assert {r.doc_id for r in only_del.collect()} == {"a"}
    with pytest.raises(ValueError, match="upserts/deletes"):
        incremental_canonicalize(base)


# ---------------------------------------------------------------- as_of

def _log(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, op string, ts long, seq long"
    )


def test_as_of_basic_assert_retract(spark):
    log = _log(spark, [
        ("s1", "p", "a", "assert", 100, 1),
        ("s2", "p", "b", "assert", 100, 2),
        ("s1", "p", "a", "retract", 200, 3),
        ("s1", "p", "a", "assert", 300, 4),
    ])
    from json_ld_spark.operators.maintenance import as_of

    def keys(t):
        return sorted(
            (r.subj, r.pred, r.obj) for r in as_of(log, ts=t).collect()
        )

    assert keys(50) == []                                   # before any op
    assert keys(150) == [("s1", "p", "a"), ("s2", "p", "b")]
    assert keys(250) == [("s2", "p", "b")]                  # retract visible
    assert keys(350) == [("s1", "p", "a"), ("s2", "p", "b")]  # re-asserted


def test_as_of_ties_on_ts_resolve_by_seq(spark):
    # same ts: the larger seq wins (commit order), so retract@seq5 beats
    # assert@seq4 even at the exact snapshot timestamp
    log = _log(spark, [
        ("s1", "p", "a", "assert", 100, 4),
        ("s1", "p", "a", "retract", 100, 5),
        ("s2", "p", "b", "retract", 100, 6),
        ("s2", "p", "b", "assert", 100, 7),
    ])
    from json_ld_spark.operators.maintenance import as_of

    got = sorted(r.subj for r in as_of(log, ts=100).collect())
    assert got == ["s2"]


def test_as_of_future_ops_invisible(spark):
    log = _log(spark, [
        ("s1", "p", "a", "assert", 100, 1),
        ("s1", "p", "a", "retract", 900, 2),
        ("s9", "p", "z", "assert", 900, 3),
    ])
    from json_ld_spark.operators.maintenance import as_of

    got = sorted(r.subj for r in as_of(log, ts=500).collect())
    assert got == ["s1"]


def test_as_of_empty_changelog(spark):
    from json_ld_spark.operators.maintenance import as_of

    log = _log(spark, [])
    assert as_of(log, ts=100).count() == 0


def test_as_of_matches_python_replay_fuzz(spark):
    """Property: as_of == a sequential Python dict replay of the
    changelog, for random logs and random snapshot times."""
    from hypothesis import given, settings, strategies as st

    from json_ld_spark.operators.maintenance import as_of

    keys = [("s%d" % i, "p%d" % (i % 3), "o%d" % (i % 5)) for i in range(6)]

    @st.composite
    def logs(draw):
        n = draw(st.integers(1, 25))
        rows = []
        for seq in range(1, n + 1):
            k = draw(st.sampled_from(keys))
            op = draw(st.sampled_from(["assert", "retract"]))
            ts = draw(st.integers(0, 9)) * 100
            rows.append((*k, op, ts, seq))
        t = draw(st.integers(-1, 10)) * 100
        return rows, t

    @given(logs())
    @settings(max_examples=25, deadline=None)
    def check(arg):
        rows, t = arg
        log = _log(spark, rows)
        got = sorted(
            (r.subj, r.pred, r.obj) for r in as_of(log, ts=t).collect()
        )
        # Python replay: latest (ts <= t) op per key by seq order
        state = {}
        for s, p, o, op, ts, seq in sorted(rows, key=lambda r: r[5]):
            if ts <= t:
                state[(s, p, o)] = op
        want = sorted(k for k, op in state.items() if op == "assert")
        assert got == want

    check()
