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


def test_bgp_matches_naive_matcher_on_random_patterns(spark):
    """Seeded random triple store + random connected BGPs vs a naive
    driver-side backtracking matcher."""
    import random

    rng = random.Random(424242)
    subs = [f"s{i}" for i in range(12)]
    preds = [f"p{i}" for i in range(4)]
    objs = subs + ["x", "y", "z"]
    store = sorted(
        {
            (rng.choice(subs), rng.choice(preds), rng.choice(objs))
            for _ in range(80)
        }
    )
    df = spark.createDataFrame(store, ["subj", "pred", "obj"]).cache()
    df.count()

    def naive(patterns):
        results = [{}]
        for s, p, o in patterns:
            nxt = []
            for binding in results:
                for ts, tp, to in store:
                    b = dict(binding)
                    ok = True
                    for term, val in ((s, ts), (p, tp), (o, to)):
                        if term.startswith("?"):
                            if b.get(term, val) != val:
                                ok = False
                                break
                            b[term] = val
                        elif term != val:
                            ok = False
                            break
                    if ok:
                        nxt.append(b)
            results = nxt
        vars_ = sorted({t for pat in patterns for t in pat if t.startswith("?")})
        return {tuple(b[v] for v in vars_) for b in results}

    n_checked = 0
    for trial in range(12):
        # random connected 2-3 pattern BGP: later patterns reuse a var
        k = rng.choice([2, 3])
        pats = []
        var_pool = ["?a", "?b", "?c", "?d"]
        used = []
        for i in range(k):
            def term(pos):
                if rng.random() < 0.5:
                    v = rng.choice(used) if (used and rng.random() < 0.7) else rng.choice(var_pool)
                    return v
                return rng.choice(preds if pos == 1 else subs + objs)
            while True:
                s, p, o = term(0), term(1), term(2)
                pv = [t for t in (s, p, o) if t.startswith("?")]
                if not pv:
                    continue
                if i == 0 or set(pv) & set(used) or not used:
                    pats.append((s, p, o))
                    used.extend(v for v in pv if v not in used)
                    break
        expect = naive(pats)
        try:
            got_df = bgp_query(df, pats)
        except ValueError:
            # disconnected draw (possible when pattern 2 shares with 3
            # but not 1 transitively absent) — naive has no such guard
            continue
        cols = sorted(got_df.columns)
        got = {tuple(r[c] for c in cols) for r in got_df.collect()}
        exp_vars = sorted({t for pat in pats for t in pat if t.startswith("?")})
        assert [c for c in cols] == [v[1:] for v in exp_vars], (cols, exp_vars)
        assert got == expect, (pats, sorted(got)[:5], sorted(expect)[:5])
        n_checked += 1
    assert n_checked >= 8  # most random draws must actually be validated


def test_optional_group_left_join(triples):
    # every Turn, optionally its conversation; t3's conv exists, c1 (a
    # Conversation node) has no conversation property -> NULL
    out = bgp_query(
        triples,
        [("?t", TYPE, "Turn")],
        optional=[[("?t", V + "conversation", "?c")]],
    )
    got = {r["t"]: r["c"] for r in out.collect()}
    assert got == {"t1": "c1", "t2": "c1", "t3": "c2"}
    # add a turn-like node with no conversation to exercise the NULL arm
    out2 = bgp_query(
        triples,
        [("?s", V + "self", "?s2")],
        optional=[[("?s", V + "conversation", "?c")]],
    )
    rows = out2.collect()
    assert len(rows) == 1 and rows[0]["c"] is None


def test_optional_rejects_disjoint_group(triples):
    import pytest as _pt

    with _pt.raises(ValueError, match="OPTIONAL"):
        bgp_query(
            triples,
            [("?t", TYPE, "Turn")],
            optional=[[("?x", V + "self", "?y")]],
        )


def test_filter_expression(triples):
    out = bgp_query(
        triples,
        [("?t", V + "role", "?r")],
        filters=["r = 'assistant'", "t > 't2'"],
    )
    assert [tuple(r) for r in out.collect()] == [("t3", "assistant")]


def test_union_heterogeneous_branches(triples):
    from json_ld_spark.operators.bgp import bgp_union

    out = bgp_union(
        triples,
        [
            [("?t", V + "role", "user")],
            [("?t", V + "conversation", "?c")],
        ],
    )
    got = {(r["t"], r["c"]) for r in out.collect()}
    assert got == {
        ("t1", None),          # user branch binds only ?t
        ("t1", "c1"),
        ("t2", "c1"),
        ("t3", "c2"),
    }


def test_union_distinct_collapses_duplicates(triples):
    from json_ld_spark.operators.bgp import bgp_union

    out = bgp_union(
        triples,
        [[("?t", TYPE, "Turn")], [("?t", V + "role", "?r")]],
        select=["?t"],
    )
    assert sorted(r["t"] for r in out.collect()) == ["t1", "t2", "t3"]


# ---------------------------------------------------------------------------
# VALUES / MINUS / (NOT) EXISTS (SPARQL 1.1 algebra completion)
# ---------------------------------------------------------------------------

def test_values_single_var(triples):
    out = bgp_query(
        triples,
        [("?t", V + "role", "?r")],
        values={"?t": ["t1", "t3", "t9"]},
    )
    assert sorted(map(tuple, out.select("t", "r").collect())) == [
        ("t1", "user"),
        ("t3", "assistant"),
    ]


def test_values_multi_var_with_undef(triples):
    # UNDEF conversation on the second row: matches ANY conversation
    out = bgp_query(
        triples,
        [("?t", V + "role", "?r"), ("?t", V + "conversation", "?c")],
        values=(
            ["?r", "?c"],
            [("user", "c1"), ("assistant", None)],
        ),
    )
    assert sorted(map(tuple, out.select("t", "c").collect())) == [
        ("t1", "c1"),
        ("t2", "c1"),
        ("t3", "c2"),
    ]


def test_values_unbound_var_rejected(triples):
    with pytest.raises(ValueError, match="not bound"):
        bgp_query(
            triples, [("?t", V + "role", "?r")], values={"?zzz": ["x"]}
        )


def test_minus_shared_var(triples):
    # all turns, minus those in conversation c1
    out = bgp_query(
        triples,
        [("?t", TYPE, "Turn")],
        minus=[[("?t", V + "conversation", "c1")]],
    )
    assert sorted(r["t"] for r in out.collect()) == ["t3"]


def test_minus_disjoint_vars_removes_nothing(triples):
    # SPARQL MINUS with no shared variables is a no-op
    out = bgp_query(
        triples,
        [("?t", TYPE, "Turn")],
        minus=[[("?x", V + "self", "?y")]],
    )
    assert out.count() == 3


def test_minus_null_shared_var_survives(triples):
    # OPTIONAL leaves ?c NULL for turns without a conversation triple;
    # SPARQL keeps such solutions (shared BOUND domain is empty) and the
    # null-unsafe anti-join must too
    extra = [("t9", TYPE, "Turn")]
    df = triples.sparkSession.createDataFrame(
        TRIPLES + extra, ["subj", "pred", "obj"]
    )
    out = bgp_query(
        df,
        [("?t", TYPE, "Turn")],
        optional=[[("?t", V + "conversation", "?c")]],
        minus=[[("?z", V + "conversation", "?c")]],
    )
    assert sorted(r["t"] for r in out.collect()) == ["t9"]


def test_not_exists_shared_var(triples):
    out = bgp_query(
        triples,
        [("?t", TYPE, "Turn")],
        not_exists=[[("?t", V + "role", "assistant")]],
    )
    assert sorted(r["t"] for r in out.collect()) == ["t1"]


def test_exists_shared_var(triples):
    out = bgp_query(
        triples,
        [("?t", TYPE, "Turn")],
        exists=[[("?t", V + "role", "assistant")]],
    )
    assert sorted(r["t"] for r in out.collect()) == ["t2", "t3"]


def test_uncorrelated_not_exists_gates_whole_query(triples):
    # group matches something → every row filtered out
    none = bgp_query(
        triples,
        [("?t", TYPE, "Turn")],
        not_exists=[[("?x", V + "self", "?y")]],
    )
    assert none.count() == 0
    # group matches nothing → no-op
    all_ = bgp_query(
        triples,
        [("?t", TYPE, "Turn")],
        not_exists=[[("?x", V + "nosuch", "?y")]],
    )
    assert all_.count() == 3


def test_uncorrelated_exists_gates_whole_query(triples):
    kept = bgp_query(
        triples,
        [("?t", TYPE, "Turn")],
        exists=[[("?x", V + "self", "?y")]],
    )
    assert kept.count() == 3
    dropped = bgp_query(
        triples,
        [("?t", TYPE, "Turn")],
        exists=[[("?x", V + "nosuch", "?y")]],
    )
    assert dropped.count() == 0


# ---------------------------------------------------------------------------
# ASK / CONSTRUCT / DESCRIBE query forms
# ---------------------------------------------------------------------------

def test_ask(triples):
    from json_ld_spark.operators.bgp import bgp_ask

    assert bgp_ask(triples, [("?t", V + "role", "assistant")])
    assert not bgp_ask(triples, [("?t", V + "role", "narrator")])


def test_construct_derives_new_edges(triples):
    from json_ld_spark.operators.bgp import bgp_construct

    out = bgp_construct(
        triples,
        [
            ("?u", V + "role", "user"),
            ("?u", V + "conversation", "?c"),
            ("?a", V + "role", "assistant"),
            ("?a", V + "conversation", "?c"),
        ],
        template=[("?a", V + "respondsTo", "?u")],
    )
    assert out.columns == ["subj", "pred", "obj"]
    assert sorted(map(tuple, out.collect())) == [
        ("t2", V + "respondsTo", "t1")
    ]


def test_construct_multi_template_and_constants(triples):
    from json_ld_spark.operators.bgp import bgp_construct

    out = bgp_construct(
        triples,
        [("?t", V + "role", "assistant")],
        template=[
            ("?t", TYPE, "AssistantTurn"),
            ("?t", V + "flagged", "true"),
        ],
    )
    got = sorted(map(tuple, out.collect()))
    assert (
        ("t2", TYPE, "AssistantTurn") in got
        and ("t3", V + "flagged", "true") in got
        and len(got) == 4
    )


def test_construct_null_binding_drops_triple(triples):
    from json_ld_spark.operators.bgp import bgp_construct

    # ?tool is NULL for assistant turns without a tool triple: that
    # template instantiation must be dropped, not emitted with NULL
    out = bgp_construct(
        triples,
        [("?t", V + "role", "assistant")],
        template=[("?t", V + "usedTool", "?tool")],
        optional=[[("?t", V + "tool", "?tool")]],
    )
    assert out.count() == 0  # no tool triples in the fixture at all


def test_describe(triples):
    from json_ld_spark.operators.bgp import bgp_describe

    out = bgp_describe(triples, [("?t", V + "role", "user")], "?t")
    got = sorted(map(tuple, out.collect()))
    assert got == [
        ("t1", TYPE, "Turn"),
        ("t1", V + "conversation", "c1"),
        ("t1", V + "role", "user"),
    ]


# ---------------------------------------------------------------------------
# bgp_select: SPARQL SELECT solution modifiers + aggregation
# ---------------------------------------------------------------------------


def test_select_aggregate_group_by(triples):
    from json_ld_spark.operators.bgp import bgp_select

    out = bgp_select(
        triples,
        [("?t", V + "role", "?r"), ("?t", V + "conversation", "?c")],
        group_by=["?c"],
        aggregates={"?n": "COUNT(*)", "?roles": "count(distinct ?r)"},
    )
    got = {r["c"]: (r["n"], r["roles"]) for r in out.collect()}
    assert got == {"c1": (2, 2), "c2": (1, 1)}


def test_select_implicit_single_group(triples):
    from json_ld_spark.operators.bgp import bgp_select

    out = bgp_select(
        triples,
        [("?t", V + "role", "?r")],
        aggregates={"?n": "COUNT(*)", "?mx": "max(?r)"},
    )
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0]["n"], rows[0]["mx"]) == (3, "user")


def test_select_having(triples):
    from json_ld_spark.operators.bgp import bgp_select

    out = bgp_select(
        triples,
        [("?t", V + "conversation", "?c")],
        group_by=["?c"],
        aggregates={"?n": "COUNT(*)"},
        having=["?n >= 2"],
    )
    assert [(r["c"], r["n"]) for r in out.collect()] == [("c1", 2)]


def test_select_bind_and_filter_expression(triples):
    from json_ld_spark.operators.bgp import bgp_select

    out = bgp_select(
        triples,
        [("?t", V + "role", "?r")],
        bind=[("?tag", "concat(?r, ':', ?t)")],
        order_by=["?tag"],
    )
    assert [r["tag"] for r in out.collect()] == [
        "assistant:t2",
        "assistant:t3",
        "user:t1",
    ]


def test_select_bind_rejects_rebinding(triples):
    from json_ld_spark.operators.bgp import bgp_select

    with pytest.raises(ValueError, match="already bound"):
        bgp_select(
            triples,
            [("?t", V + "role", "?r")],
            bind=[("?r", "upper(?r)")],
        )


def test_select_order_limit_offset(triples):
    from json_ld_spark.operators.bgp import bgp_select

    base = dict(order_by=["DESC(?t)"])
    all_t = bgp_select(triples, [("?t", V + "role", "?r")], **base)
    assert [r["t"] for r in all_t.collect()] == ["t3", "t2", "t1"]
    page = bgp_select(
        triples, [("?t", V + "role", "?r")], limit=1, offset=1, **base
    )
    assert [r["t"] for r in page.collect()] == ["t2"]


def test_select_limit_requires_order(triples):
    from json_ld_spark.operators.bgp import bgp_select

    with pytest.raises(ValueError, match="ORDER BY"):
        bgp_select(triples, [("?t", V + "role", "?r")], limit=1)


def test_select_group_by_requires_aggregates(triples):
    from json_ld_spark.operators.bgp import bgp_select

    with pytest.raises(ValueError, match="without aggregates"):
        bgp_select(triples, [("?t", V + "role", "?r")], group_by=["?r"])


def test_select_group_concat_deterministic(triples):
    from json_ld_spark.operators.bgp import bgp_select, group_concat

    out = bgp_select(
        triples,
        [("?t", V + "conversation", "?c")],
        group_by=["?c"],
        aggregates={"?ts": group_concat("?t", ",")},
        order_by=["?c"],
    )
    assert [(r["c"], r["ts"]) for r in out.collect()] == [
        ("c1", "t1,t2"),
        ("c2", "t3"),
    ]


def test_select_composes_with_optional_and_minus(triples):
    from json_ld_spark.operators.bgp import bgp_select

    # count turns per conversation, excluding user turns via MINUS
    out = bgp_select(
        triples,
        [("?t", V + "conversation", "?c")],
        minus=[[("?t", V + "role", "user")]],
        group_by=["?c"],
        aggregates={"?n": "COUNT(*)"},
        order_by=["?c"],
    )
    assert [(r["c"], r["n"]) for r in out.collect()] == [("c1", 1), ("c2", 1)]


def test_subquery_join(triples):
    from json_ld_spark.operators.bgp import bgp_query, bgp_select

    inner = bgp_select(
        triples,
        [("?t", V + "conversation", "?c")],
        group_by=["?c"],
        aggregates={"?n": "COUNT(*)"},
        having=["?n >= 2"],
        select=["?c"],
    )
    out = bgp_query(
        triples,
        [("?t", V + "conversation", "?c")],
        subqueries=[inner],
    )
    assert sorted(r["t"] for r in out.collect()) == ["t1", "t2"]


def test_subquery_disjoint_rejected(triples):
    from json_ld_spark.operators.bgp import bgp_query

    other = triples.sparkSession.createDataFrame([(1,)], ["unrelated"])
    with pytest.raises(ValueError, match="subquery"):
        bgp_query(triples, [("?t", V + "role", "?r")], subqueries=[other])


def test_select_aggregates_fuzz_vs_python(spark):
    """Randomized triple sets: bgp_select GROUP BY aggregates must
    equal a plain Python group-by over the same solutions."""
    import random

    rnd = random.Random(77)
    for trial in range(6):
        rows = [
            (f"s{rnd.randrange(6)}", V + "p", f"o{rnd.randrange(4)}")
            for _ in range(rnd.randrange(5, 30))
        ]
        rows = sorted(set(rows))
        df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
        from json_ld_spark.operators.bgp import bgp_select

        out = bgp_select(
            df,
            [("?s", V + "p", "?o")],
            group_by=["?o"],
            aggregates={"?n": "COUNT(*)", "?mn": "min(?s)"},
        )
        got = {r["o"]: (r["n"], r["mn"]) for r in out.collect()}
        exp: dict = {}
        for s, _p, o in rows:
            n, mn = exp.get(o, (0, None))
            exp[o] = (n + 1, s if mn is None else min(mn, s))
        assert got == exp, f"trial {trial}"


# ---------------------------------------------------------------------------
# round-4 advice fixes: all-constant BGPs, partially-unbound compatibility
# ---------------------------------------------------------------------------


def test_ask_all_constant_ground_triple(triples):
    """ASK { <s> <p> <o> } — the canonical ground-triple ASK must
    return a boolean, not raise (round-3 advice, bgp.py const split)."""
    from json_ld_spark.operators.bgp import bgp_ask

    assert bgp_ask(triples, [("t1", V + "role", "user")]) is True
    assert bgp_ask(triples, [("t1", V + "role", "assistant")]) is False
    # conjunction of ground triples: all must exist
    assert bgp_ask(
        triples, [("t1", V + "role", "user"), ("t2", V + "role", "assistant")]
    ) is True
    assert bgp_ask(
        triples, [("t1", V + "role", "user"), ("nope", V + "role", "user")]
    ) is False


def test_minus_partially_unbound_shared_vars(spark):
    """SPARQL compatibility: a solution with one shared var NULL (from
    OPTIONAL) and the other matching IS removed by MINUS (dom overlap
    via the bound var) — the old all-column null-unsafe anti-join
    wrongly kept it."""
    rows = [
        ("a", V + "p", "x"),
        ("b", V + "p", "y"),
        ("x", V + "q", "q1"),   # only x has an optional ?o binding
        ("x", V + "m", "q1"),   # minus group matches (?v=x, ?o=q1)
        ("y", V + "m", "q9"),   # minus group row for y with o=q9
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = bgp_query(
        df,
        [("?s", V + "p", "?v")],
        optional=[[("?v", V + "q", "?o")]],
        minus=[[("?v", V + "m", "?o")]],
    ).collect()
    got = sorted((r["s"], r["v"], r["o"]) for r in out)
    # (a, x, q1): both shared bound, matches minus row -> removed.
    # (b, y, NULL): ?v=y bound + matches side ?v=y; ?o unbound on the
    # outer side is compatible with the side's q9 -> dom overlap via ?v
    # -> removed per spec (old code kept it).
    assert got == []


def test_minus_all_unbound_shared_kept(spark):
    """A solution with ALL shared-with-MINUS vars unbound is domain
    disjoint from every group solution — MINUS keeps it."""
    rows = [
        ("a", V + "p", "x"),
        ("z", V + "q", "o1"),     # optional never matches subj x
        ("z", V + "m", "o1"),     # minus group binds only ?o
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = bgp_query(
        df,
        [("?s", V + "p", "?v")],
        optional=[[("?v", V + "q", "?o")]],
        minus=[[("z", V + "m", "?o")]],  # shares only ?o, unbound outer
    ).collect()
    assert [(r["s"], r["v"], r["o"]) for r in out] == [("a", "x", None)]


def test_exists_partially_unbound_kept(spark):
    """FILTER EXISTS: an outer row whose shared var is NULL is
    compatible with every side solution — kept iff the group is
    non-empty (old null-unsafe semi-join wrongly dropped it)."""
    rows = [
        ("a", V + "p", "x"),
        ("b", V + "p", "y"),
        ("x", V + "q", "q1"),
        ("q1", V + "e", "yes"),
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = bgp_query(
        df,
        [("?s", V + "p", "?v")],
        optional=[[("?v", V + "q", "?o")]],
        exists=[[("?o", V + "e", "yes")]],
    ).collect()
    got = sorted((r["s"], r["v"], r["o"]) for r in out)
    # (a,x,q1): ?o bound, side has q1 -> kept.
    # (b,y,NULL): ?o unbound -> compatible with the non-empty group -> kept.
    assert got == [("a", "x", "q1"), ("b", "y", None)]
    # NOT EXISTS flips both
    out2 = bgp_query(
        df,
        [("?s", V + "p", "?v")],
        optional=[[("?v", V + "q", "?o")]],
        not_exists=[[("?o", V + "e", "yes")]],
    ).collect()
    assert out2 == []


def test_values_merges_unbound_bindings(spark):
    """VALUES is Join(Omega, data): an outer row with ?o unbound merges
    the VALUES binding (and multiplies over k compatible rows)."""
    rows = [
        ("a", V + "p", "x"),
        ("x", V + "q", "q1"),
        ("b", V + "p", "y"),   # y has no ?o -> unbound
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = bgp_query(
        df,
        [("?s", V + "p", "?v")],
        optional=[[("?v", V + "q", "?o")]],
        values=(["?o"], [("q1",), ("q2",)]),
    ).collect()
    got = sorted((r["s"], r["v"], r["o"]) for r in out)
    # (a,x,q1) compatible with q1 only; (b,y,NULL) merges both values
    assert got == [("a", "x", "q1"), ("b", "y", "q1"), ("b", "y", "q2")]
