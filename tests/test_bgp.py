"""BGP (triple-pattern) query layer (operators/bgp.py)."""

from __future__ import annotations

import pytest

from json_ld_spark.operators.bgp import bgp_query

V = "https://example.org/transcript#"
TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

TRIPLES = [
    # (subj, pred, obj)
    ("t1", TYPE, "Turn"),
    ("t1", V + "role", "user"),
    ("t1", V + "conversation", "c1"),
    ("t2", TYPE, "Turn"),
    ("t2", V + "role", "assistant"),
    ("t2", V + "conversation", "c1"),
    ("t3", TYPE, "Turn"),
    ("t3", V + "role", "assistant"),
    ("t3", V + "conversation", "c2"),
    ("c1", TYPE, "Conversation"),
    ("loop", V + "self", "loop"),
]


@pytest.fixture(scope="module")
def triples(spark):
    df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"]).cache()
    df.count()
    return df


def test_single_pattern_constant_pred(triples):
    out = bgp_query(triples, [("?t", V + "role", "assistant")])
    assert sorted(r["t"] for r in out.collect()) == ["t2", "t3"]


def test_two_pattern_subject_join(triples):
    out = bgp_query(
        triples,
        [("?t", V + "role", "assistant"), ("?t", V + "conversation", "?c")],
    )
    assert sorted(map(tuple, out.select("t", "c").collect())) == [
        ("t2", "c1"),
        ("t3", "c2"),
    ]


def test_object_object_join_across_subjects(triples):
    # user turn and assistant turn in the SAME conversation
    out = bgp_query(
        triples,
        [
            ("?u", V + "role", "user"),
            ("?u", V + "conversation", "?c"),
            ("?a", V + "role", "assistant"),
            ("?a", V + "conversation", "?c"),
        ],
    )
    assert sorted(map(tuple, out.select("u", "a", "c").collect())) == [
        ("t1", "t2", "c1")
    ]


def test_variable_predicate(triples):
    out = bgp_query(triples, [("t1", "?p", "?o")])
    assert len(out.collect()) == 3


def test_repeated_var_within_pattern(triples):
    out = bgp_query(triples, [("?x", V + "self", "?x")])
    assert [r["x"] for r in out.collect()] == ["loop"]


def test_constant_existence_gate(triples):
    base = [("?t", V + "role", "assistant")]
    ok = bgp_query(triples, base + [("c1", TYPE, "Conversation")])
    assert ok.count() == 2
    none = bgp_query(triples, base + [("c9", TYPE, "Conversation")])
    assert none.count() == 0


def test_disconnected_rejected_unless_allowed(triples):
    pats = [("?a", V + "role", "user"), ("?b", V + "self", "?c")]
    with pytest.raises(ValueError, match="disconnected"):
        bgp_query(triples, pats)
    out = bgp_query(triples, pats, allow_cartesian=True)
    assert out.count() == 1  # 1 user x 1 self-loop


def test_select_projection_and_distinct(triples):
    out = bgp_query(
        triples,
        [("?t", TYPE, "Turn"), ("?t", V + "conversation", "?c")],
        select=["?c"],
    )
    assert sorted(r["c"] for r in out.collect()) == ["c1", "c2"]
