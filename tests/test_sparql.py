"""SPARQL text front end (json_ld_spark/sparql.py): the parser must
reproduce the direct operator-API results exactly — it introduces no
new evaluation code, only syntax."""

from __future__ import annotations

import pytest

from json_ld_spark.sparql import SparqlSyntaxError, parse_sparql, sparql

V = "http://v/"


@pytest.fixture(scope="module")
def kg(spark):
    return spark.createDataFrame(
        [
            ("t1", V + "role", "user"), ("t1", V + "conv", "c1"),
            ("t2", V + "role", "assistant"), ("t2", V + "conv", "c1"),
            ("t3", V + "role", "assistant"), ("t3", V + "conv", "c2"),
            ("t4", V + "role", "user"), ("t4", V + "conv", "c2"),
            ("t2", V + "tool", "search"),
            ("c1", V + "next", "c2"), ("c2", V + "next", "c3"),
            ("t1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", V + "Turn"),
        ],
        ["subj", "pred", "obj"],
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_select_join_chain(kg):
    out = sparql(kg, f'''
        PREFIX v: <{V}>
        SELECT ?t ?c WHERE {{ ?t v:role "assistant" ; v:conv ?c . }}''')
    assert _rows(out) == [("t2", "c1"), ("t3", "c2")]


def test_matches_direct_api(kg):
    from json_ld_spark.operators.bgp import bgp_query

    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?t ?c WHERE {{ ?t v:conv ?c . ?t v:role "user" }}''')
    direct = bgp_query(
        kg, [("?t", V + "conv", "?c"), ("?t", V + "role", "user")],
        select=["?t", "?c"],
    )
    assert _rows(out) == _rows(direct)


def test_rdf_type_a_shorthand(kg):
    out = sparql(kg, f'PREFIX v: <{V}> SELECT ?t WHERE {{ ?t a v:Turn }}')
    assert _rows(out) == [("t1",)]


def test_aggregates_group_having_order_limit(kg):
    out = sparql(kg, f'''
        PREFIX v: <{V}>
        SELECT ?c (COUNT(*) AS ?n) WHERE {{ ?t v:conv ?c }}
        GROUP BY ?c HAVING (COUNT(*) >= 2) ORDER BY DESC(?n) ?c LIMIT 3''')
    assert _rows(out) == [("c1", 2), ("c2", 2)]


def test_optional_and_filter(kg):
    out = sparql(kg, f'''
        PREFIX v: <{V}>
        SELECT ?t ?tool WHERE {{
            ?t v:role "assistant" .
            OPTIONAL {{ ?t v:tool ?tool }}
            FILTER (?t != "t9" && bound(?t))
        }}''')
    assert _rows(out) == [("t2", "search"), ("t3", None)]


def test_property_path_plus(kg):
    out = sparql(kg, f'PREFIX v: <{V}> SELECT ?a ?b WHERE {{ ?a v:next+ ?b }}')
    assert _rows(out) == [("c1", "c2"), ("c1", "c3"), ("c2", "c3")]


def test_property_path_inverse_alt(kg):
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?x WHERE {{ "search" ^v:tool/v:conv ?x }}''')
    assert _rows(out) == [("c1",)]


def test_union(kg):
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?t WHERE {{
          {{ ?t v:role "user" }} UNION {{ ?t v:tool "search" }} }}''')
    assert _rows(out) == [("t1",), ("t2",), ("t4",)]


def test_values_and_undef(kg):
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?t ?r WHERE {{ ?t v:role ?r .
          VALUES (?t ?r) {{ ("t1" UNDEF) (UNDEF "assistant") }} }}''')
    assert _rows(out) == [("t1", "user"), ("t2", "assistant"), ("t3", "assistant")]


def test_bind_and_functions(kg):
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?t ?u WHERE {{ ?t v:role ?r .
          BIND (ucase(?r) AS ?u) FILTER (strstarts(?r, "use")) }}''')
    assert _rows(out) == [("t1", "USER"), ("t4", "USER")]


def test_minus_and_not_exists_agree(kg):
    a = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?t WHERE {{ ?t v:conv ?c .
          FILTER NOT EXISTS {{ ?t v:tool ?x }} }}''')
    b = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?t WHERE {{ ?t v:conv ?c . MINUS {{ ?t v:tool ?x }} }}''')
    assert _rows(a) == _rows(b) == [("t1",), ("t3",), ("t4",)]


def test_subselect(kg):
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT DISTINCT ?c ?n WHERE {{
            ?t v:conv ?c .
            {{ SELECT ?c (COUNT(*) AS ?n) WHERE {{ ?x v:conv ?c }} GROUP BY ?c }}
        }}''')
    assert _rows(out) == [("c1", 2), ("c2", 2)]


def test_ask_construct_describe(kg):
    assert sparql(kg, f'ASK {{ ?t <{V}tool> "search" }}') is True
    assert sparql(kg, f'ASK {{ ?t <{V}tool> "browser" }}') is False

    built = sparql(kg, f'''PREFIX v: <{V}>
        CONSTRUCT {{ ?c v:hasTurn ?t }} WHERE {{ ?t v:conv ?c }}''')
    assert ("c1", V + "hasTurn", "t1") in set(map(tuple, built.collect()))

    desc = sparql(kg, f'PREFIX v: <{V}> DESCRIBE ?t WHERE {{ ?t v:tool "search" }}')
    assert _rows(desc) == [
        ("t2", V + "conv", "c1"), ("t2", V + "role", "assistant"),
        ("t2", V + "tool", "search"),
    ]


def test_group_concat_separator(kg):
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?c (GROUP_CONCAT(?t; SEPARATOR="|") AS ?ts)
        WHERE {{ ?t v:conv ?c }} GROUP BY ?c ORDER BY ?c LIMIT 9''')
    assert _rows(out) == [("c1", "t1|t2"), ("c2", "t3|t4")]


def test_comments_and_langtag_and_typed_literals(kg, spark):
    t = spark.createDataFrame(
        [("n", V + "p", "bonjour"), ("n", V + "q", "42")],
        ["subj", "pred", "obj"],
    )
    out = sparql(t, f'''# find the greeting
        PREFIX v: <{V}>
        SELECT ?s WHERE {{
          ?s v:p "bonjour"@fr .        # lang dropped: lexical match
          ?s v:q "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
        }}''')
    assert _rows(out) == [("n",)]


def test_syntax_errors():
    for bad in [
        "SELECT ?x WHERE { ?x }",
        "PREFIX : <http://e/> SELECT ?x WHERE { SERVICE <http://r/> { ?x :p ?y } }",
        "SELECT ?x WHERE { ?x <http://e/p> ?y",
        "FROB ?x",
        "SELECT ?x WHERE { ?x undeclared:p ?y }",
    ]:
        with pytest.raises(SparqlSyntaxError):
            parse_sparql(bad) if "{" not in bad else parse_sparql(bad)


def test_parse_only_structure():
    q = parse_sparql('''
        BASE <http://b/>
        PREFIX v: <http://v/>
        SELECT DISTINCT ?a WHERE { ?a v:p ?b . FILTER(?b > 3) }
        ORDER BY ?a OFFSET 2 LIMIT 10''')
    assert q.form == "select" and q.distinct
    assert q.group.patterns == [("?a", "http://v/p", "?b")]
    assert q.group.filters == ["?b > 3"]
    assert q.order_by == ["?a"] and q.limit == 10 and q.offset == 2


def test_sparql_update_rename(kg, spark):
    from json_ld_spark.sparql import sparql_update

    t = spark.createDataFrame(
        [("t1", "role", "user"), ("t2", "role", "assistant"), ("t1", "txt", "hi")],
        ["subj", "pred", "obj"],
    )
    out = sparql_update(t, '''
        DELETE { ?t <role> ?r } INSERT { ?t <speakerRole> ?r }
        WHERE { ?t <role> ?r FILTER (?r != "system") }''')
    assert _rows(out) == [
        ("t1", "speakerRole", "user"), ("t1", "txt", "hi"),
        ("t2", "speakerRole", "assistant"),
    ]


def test_sparql_update_delete_where_shorthand(spark):
    from json_ld_spark.sparql import sparql_update

    t = spark.createDataFrame(
        [("a", "p", "b"), ("a", "q", "c")], ["subj", "pred", "obj"])
    out = sparql_update(t, 'DELETE WHERE { ?s <p> ?o }')
    assert _rows(out) == [("a", "q", "c")]


def test_sparql_update_insert_only_and_errors(spark):
    from json_ld_spark.sparql import sparql_update

    t = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    out = sparql_update(t, 'INSERT { ?o <pInv> ?s } WHERE { ?s <p> ?o }')
    assert _rows(out) == [("a", "p", "b"), ("b", "pInv", "a")]
    with pytest.raises(SparqlSyntaxError):
        sparql_update(t, 'WHERE { ?s <p> ?o }')


def test_fuzz_rendered_text_vs_direct_api(kg):
    """Render random BGPs as SPARQL text and check the parser-driven
    result equals the direct bgp_query call."""
    import random

    from json_ld_spark.operators.bgp import bgp_query

    rnd = random.Random(17)
    preds = ["role", "conv", "tool", "next"]
    consts = ["user", "assistant", "search", "c1", "c2", "t2"]
    for trial in range(6):
        n_pat = rnd.randint(1, 3)
        patterns = []
        var_pool = ["?a", "?b", "?c"]
        for k in range(n_pat):
            s = rnd.choice(var_pool)
            p = V + rnd.choice(preds)
            o = rnd.choice(var_pool + consts)
            patterns.append((s, p, o))
        # keep the BGP connected: force every pattern after the first
        # to reuse the first subject variable
        patterns = [patterns[0]] + [
            (patterns[0][0], p, o) for (_, p, o) in patterns[1:]
        ]
        text = "PREFIX v: <" + V + "> SELECT * WHERE { " + " . ".join(
            " ".join(
                t if t.startswith("?") else
                (f"<{t}>" if t.startswith("http") else f'"{t}"')
                for t in pat
            )
            for pat in patterns
        ) + " }"
        try:
            direct = bgp_query(kg, patterns)
        except ValueError:
            continue  # e.g. no variables to bind
        got = sparql(kg, text)
        assert sorted(got.columns) == sorted(direct.columns), (trial, text)
        key = lambda t: tuple("" if x is None else str(x) for x in t)
        assert sorted(map(tuple, got.collect()), key=key) == \
            sorted(map(tuple, direct.collect()), key=key), (trial, text)


def test_cli_sparql(tmp_path, spark, capsys):
    from json_ld_spark.__main__ import main
    from json_ld_spark.sources.nquads import write_nquads

    quads = spark.createDataFrame(
        [
            (None, "http://e/t1", "http://e/role", "literal", "user",
             "http://www.w3.org/2001/XMLSchema#string", None),
            (None, "http://e/t2", "http://e/role", "literal", "assistant",
             "http://www.w3.org/2001/XMLSchema#string", None),
        ],
        "graph string, subj string, pred string, obj_kind string, "
        "obj string, datatype string, lang string",
    )
    data = str(tmp_path / "d")
    write_nquads(quads, data)

    rc = main(["sparql",
               'SELECT ?t WHERE { ?t <http://e/role> "user" }',
               "--data", data])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and out == ["t", "http://e/t1"]

    rc = main(["sparql", 'ASK { ?t <http://e/role> "assistant" }',
               "--data", data])
    assert rc == 0 and capsys.readouterr().out.strip() == "yes"

    rc = main(["sparql", "--update",
               'DELETE { ?t <http://e/role> ?r } '
               'INSERT { ?t <http://e/speaker> ?r } '
               'WHERE { ?t <http://e/role> ?r }',
               "--data", data])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and any("speaker" in l for l in out[1:])


@pytest.fixture(scope="module")
def quad_kg(spark):
    return spark.createDataFrame(
        [
            (None, "t0", V + "role", "user"),
            ("http://g/1", "t1", V + "role", "assistant"),
            ("http://g/1", "t1", V + "text", "hi"),
            ("http://g/2", "t2", V + "role", "assistant"),
        ],
        ["graph", "subj", "pred", "obj"],
    )


def test_graph_variable_named_only(quad_kg):
    out = sparql(quad_kg, f'''PREFIX v: <{V}>
        SELECT ?g ?t WHERE {{ GRAPH ?g {{ ?t v:role ?r }} }}''')
    # default-graph row t0 excluded: GRAPH ranges over named graphs
    assert _rows(out) == [("http://g/1", "t1"), ("http://g/2", "t2")]


def test_graph_constant_and_union_default(quad_kg):
    out = sparql(quad_kg, f'''PREFIX v: <{V}>
        SELECT ?t WHERE {{ GRAPH <http://g/1> {{ ?t v:role ?r }} }}''')
    assert _rows(out) == [("t1",)]
    # plain patterns: union-default-graph semantics (all rows)
    allr = sparql(quad_kg, f'PREFIX v: <{V}> SELECT ?t WHERE {{ ?t v:role ?r }}')
    assert _rows(allr) == [("t0",), ("t1",), ("t2",)]


def test_graph_var_joins_inside_block(quad_kg):
    out = sparql(quad_kg, f'''PREFIX v: <{V}>
        SELECT ?g WHERE {{ GRAPH ?g {{ ?t v:role "assistant" . ?t v:text ?x }} }}''')
    assert _rows(out) == [("http://g/1",)]


def test_graph_requires_quad_table(kg):
    with pytest.raises(Exception, match="graph"):
        sparql(kg, f'''PREFIX v: <{V}>
            SELECT ?g WHERE {{ GRAPH ?g {{ ?t v:role ?r }} }}''').collect()


def test_graph_accepts_paths(quad_kg):
    """Round 4 lifts the old restriction: a path inside GRAPH ?g
    evaluates per named graph (sequence path over the fixture)."""
    out = sparql(quad_kg, f'''PREFIX v: <{V}>
        SELECT ?g ?a ?o WHERE {{ GRAPH ?g {{ ?a v:role/^v:role/v:text ?o }} }}''')
    # only g1 has a text triple; role/^role within g1 loops t1->t1
    assert sorted(tuple(r) for r in out.collect()) == [
        ("http://g/1", "t1", "hi"),
    ]


def test_cli_sparql_graph_clause(tmp_path, spark, capsys):
    from json_ld_spark.__main__ import main
    from json_ld_spark.sources.nquads import write_nquads

    quads = spark.createDataFrame(
        [
            ("http://g/1", "http://e/t1", "http://e/p", "iri", "http://e/o",
             None, None),
            (None, "http://e/t2", "http://e/p", "iri", "http://e/o",
             None, None),
        ],
        "graph string, subj string, pred string, obj_kind string, "
        "obj string, datatype string, lang string",
    )
    data = str(tmp_path / "g")
    write_nquads(quads, data)
    rc = main(["sparql",
               'SELECT ?g WHERE { GRAPH ?g { ?s <http://e/p> ?o } }',
               "--data", data])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and out == ["g", "http://g/1"]


def test_filter_numeric_cast(kg, spark):
    """Numeric comparison via CAST — the transpiler passes Spark SQL
    casts through, so lexical obj columns compare numerically."""
    t = spark.createDataFrame(
        [("a", "n", "9"), ("b", "n", "10"), ("c", "n", "2")],
        ["subj", "pred", "obj"],
    )
    out = sparql(t, '''SELECT ?s WHERE {
        ?s <n> ?v FILTER (CAST(?v AS INT) >= 9) }''')
    assert _rows(out) == [("a",), ("b",)]


def test_from_merges_default_graph(quad_kg):
    # dataset: default graph = g/1 only; t0 (NULL graph) and g/2 excluded
    out = sparql(quad_kg, f'''PREFIX v: <{V}>
        SELECT ?t FROM <http://g/1> WHERE {{ ?t v:role ?r }}''')
    assert _rows(out) == [("t1",)]
    # two FROM graphs merge
    out2 = sparql(quad_kg, f'''PREFIX v: <{V}>
        SELECT ?t FROM <http://g/1> FROM <http://g/2>
        WHERE {{ ?t v:role "assistant" }}''')
    assert _rows(out2) == [("t1",), ("t2",)]


def test_from_named_restricts_graph_clause(quad_kg):
    out = sparql(quad_kg, f'''PREFIX v: <{V}>
        SELECT ?g FROM NAMED <http://g/2>
        WHERE {{ GRAPH ?g {{ ?t v:role ?r }} }}''')
    assert _rows(out) == [("http://g/2",)]
    # FROM only -> no named graphs visible to GRAPH
    out2 = sparql(quad_kg, f'''PREFIX v: <{V}>
        SELECT ?g FROM <http://g/1>
        WHERE {{ GRAPH ?g {{ ?t v:role ?r }} }}''')
    assert _rows(out2) == []


def test_from_with_optional_and_filter(quad_kg):
    out = sparql(quad_kg, f'''PREFIX v: <{V}>
        SELECT ?t ?x FROM <http://g/1> FROM <http://g/2> WHERE {{
            ?t v:role "assistant" .
            OPTIONAL {{ ?t v:text ?x }}
        }}''')
    assert _rows(out) == [("t1", "hi"), ("t2", None)]


def test_blank_node_property_list(kg):
    # object-position bnode list: assistant turns whose conv also has a
    # user turn
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?t WHERE {{
            ?t v:role "assistant" ; v:conv ?c .
            [ v:role "user" ; v:conv ?c ]
        }}''')
    assert _rows(out) == [("t2",), ("t3",)]


def test_blank_node_label_is_variable(kg):
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?c WHERE {{ _:x v:role "user" . _:x v:conv ?c }}''')
    assert _rows(out) == [("c1",), ("c2",)]


def test_anonymous_bnode_object(kg, spark):
    t = spark.createDataFrame(
        [("a", "p", "n1"), ("n1", "q", "z")], ["subj", "pred", "obj"])
    out = sparql(t, 'SELECT ?s WHERE { ?s <p> [ <q> "z" ] }')
    assert _rows(out) == [("a",)]


def test_collection_syntax_matches_tordf_chains(spark):
    """( "a" "b" ) expands to the first/rest chain toRdf emits."""
    from json_ld_spark.api import to_rdf

    doc = {"@context": {"steps": {"@id": "http://e/steps",
                                   "@container": "@list"}},
           "@id": "http://n/1", "steps": ["a", "b"]}
    quads = to_rdf(doc)
    t = spark.createDataFrame(
        [(s, p, o) for (_, s, p, _, o, _, _) in quads],
        ["subj", "pred", "obj"],
    )
    out = sparql(t, 'SELECT ?s WHERE { ?s <http://e/steps> ( "a" "b" ) }')
    assert _rows(out) == [("http://n/1",)]
    # wrong order does not match
    out2 = sparql(t, 'SELECT ?s WHERE { ?s <http://e/steps> ( "b" "a" ) }')
    assert _rows(out2) == []


def test_filter_in_list(kg):
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?t WHERE {{ ?t v:role ?r FILTER (?r IN ("user", "system")) }}''')
    assert _rows(out) == [("t1",), ("t4",)]


def test_optional_with_property_path(kg):
    """Property paths work inside OPTIONAL groups (they are ordinary
    patterns to the BGP layer); FILTER inside OPTIONAL stays a
    documented parser boundary."""
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT DISTINCT ?c ?end WHERE {{
            ?t v:conv ?c .
            OPTIONAL {{ ?c v:next+ ?end }}
        }}''')
    got = {(r.c, r.end) for r in out.collect()}
    assert got == {("c1", "c2"), ("c1", "c3"), ("c2", "c3")}
    with pytest.raises(SparqlSyntaxError):
        sparql(kg, f'''PREFIX v: <{V}>
            SELECT ?c WHERE {{
              ?t v:conv ?c .
              OPTIONAL {{ ?c v:next ?e FILTER (?e = "c3") }} }}''')


def test_filter_if_coalesce_not(kg):
    out = sparql(kg, f'''PREFIX v: <{V}>
        SELECT ?t ?lvl WHERE {{
            ?t v:role ?r .
            OPTIONAL {{ ?t v:tool ?tool }}
            BIND (IF(?r = "assistant", "bot", "human") AS ?lvl)
            FILTER (!bound(?tool) && COALESCE(?tool, "none") = "none")
        }}''')
    got = {(r.t, r.lvl) for r in out.collect()}
    assert got == {("t1", "human"), ("t3", "bot"), ("t4", "human")}


def test_filter_string_datetime_builtins(kg, spark):
    """SPARQL 17.4 builtins map onto Spark SQL: SUBSTR (1-based),
    REPLACE (regex), UCASE, STRLEN, ABS/FLOOR passthrough."""
    t = spark.createDataFrame(
        [("a", "n", "alpha"), ("b", "n", "beta"), ("c", "n", "gamma")],
        ["subj", "pred", "obj"],
    )
    out = sparql(t, 'SELECT ?s WHERE { ?s <n> ?v FILTER (SUBSTR(?v, 1, 1) = "a") }')
    assert _rows(out) == [("a",)]
    out2 = sparql(t, '''SELECT ?s WHERE {
        ?s <n> ?v FILTER (REPLACE(?v, "[aeiou]", "") = "gmm") }''')
    assert _rows(out2) == [("c",)]
    out3 = sparql(t, 'SELECT ?s WHERE { ?s <n> ?v FILTER (STRLEN(UCASE(?v)) = 4) }')
    assert _rows(out3) == [("b",)]
    out4 = sparql(t, 'SELECT ?s WHERE { ?s <n> ?v FILTER (ABS(FLOOR(-1.5)) = 2) }')
    assert _rows(out4) == [("a",), ("b",), ("c",)]


# ---------------------------------------------------------------------------
# round-4 advice fixes: FILTER-over-BIND, select expressions, template bnodes
# ---------------------------------------------------------------------------


def test_filter_over_bind_target(kg):
    """SPARQL scopes FILTER over the whole group including BIND targets:
    BIND(...) FILTER(?x ...) must not raise an unresolved-column error."""
    out = sparql(kg, f'''
        PREFIX v: <{V}>
        SELECT ?t ?n WHERE {{
          ?t v:conv ?c .
          BIND(CONCAT(?c, "!") AS ?n)
          FILTER(?n = "c1!")
        }}''')
    assert _rows(out) == [("t1", "c1!"), ("t2", "c1!")]


def test_non_aggregate_select_expression(kg):
    """SELECT (CONCAT(?a, ?b) AS ?c) is a per-solution projection, not
    an aggregate — must not collapse rows or crash in df.agg()."""
    out = sparql(kg, f'''
        PREFIX v: <{V}>
        SELECT ?t (CONCAT(?r, "/", ?c) AS ?rc) WHERE {{
          ?t v:role ?r ; v:conv ?c .
        }}''')
    assert _rows(out) == [
        ("t1", "user/c1"), ("t2", "assistant/c1"),
        ("t3", "assistant/c2"), ("t4", "user/c2"),
    ]


def test_select_mixes_aggregate_and_projection(kg):
    """A projection expression over group keys coexists with a true
    aggregate in the same SELECT."""
    out = sparql(kg, f'''
        PREFIX v: <{V}>
        SELECT ?c (COUNT(?t) AS ?n) (CONCAT("conv:", ?c) AS ?label)
        WHERE {{ ?t v:conv ?c . }} GROUP BY ?c ORDER BY ?c''')
    assert [tuple(r) for r in out.collect()] == [
        ("c1", 2, "conv:c1"), ("c2", 2, "conv:c2"),
    ]


def test_construct_template_blank_nodes_fresh_per_solution(kg):
    """[ p o ] in a CONSTRUCT template mints a fresh blank node per
    solution (spec), not an unresolved ?__b column."""
    out = sparql(kg, f'''
        PREFIX v: <{V}>
        CONSTRUCT {{ ?c v:hasSummary [ v:about ?c ] . }}
        WHERE {{ ?t v:conv ?c . }}''')
    rows = out.collect()
    # 4 solutions (one per ?t,?c pair) x 2 template triples: the spec
    # mints a fresh bnode PER SOLUTION, so c1 gets one node via t1 and
    # another via t2
    assert len(rows) == 8
    bnodes_by_conv = {}
    for r in rows:
        if r["pred"] == V + "hasSummary":
            bnodes_by_conv.setdefault(r["subj"], set()).add(r["obj"])
            assert r["obj"].startswith("_:")
    assert set(bnodes_by_conv) == {"c1", "c2"}
    b1, b2 = bnodes_by_conv["c1"], bnodes_by_conv["c2"]
    assert len(b1) == 2 and len(b2) == 2 and not (b1 & b2)
    # the [ ] node is the SAME node within a solution: every v:about
    # triple's subject is one of its conv's bnodes
    for r in rows:
        if r["pred"] == V + "about":
            assert r["subj"] in bnodes_by_conv[r["obj"]]


def test_graph_variable_with_property_path(spark):
    """Property path inside GRAPH ?g: closure runs WITHIN each named
    graph — edges never cross graphs (struct-encoded nodes)."""
    quads = spark.createDataFrame(
        [
            ("g1", "a", V + "next", "b"),
            ("g1", "b", V + "next", "c"),
            ("g2", "c", V + "next", "d"),  # same node id, other graph
            (None, "a", V + "next", "z"),  # default graph: excluded
        ],
        ["graph", "subj", "pred", "obj"],
    )
    out = sparql(quads, f'''
        PREFIX v: <{V}>
        SELECT ?g ?s ?o WHERE {{ GRAPH ?g {{ ?s v:next+ ?o }} }}''')
    got = sorted(tuple(r) for r in out.collect())
    # g1 closure: a->b, a->c, b->c; g2: c->d. NO a->d (cross-graph).
    assert got == [
        ("g1", "a", "b"), ("g1", "a", "c"), ("g1", "b", "c"),
        ("g2", "c", "d"),
    ]


def test_graph_constant_with_property_path(spark):
    quads = spark.createDataFrame(
        [
            ("g1", "a", V + "next", "b"),
            ("g1", "b", V + "next", "c"),
            ("g2", "a", V + "next", "x"),
        ],
        ["graph", "subj", "pred", "obj"],
    )
    out = sparql(quads, f'''
        PREFIX v: <{V}>
        SELECT ?o WHERE {{ GRAPH <g1> {{ <a> v:next+ ?o }} }}''')
    assert sorted(r["o"] for r in out.collect()) == ["b", "c"]


def test_from_clause_with_property_path(spark):
    """FROM + property path: the path evaluates over the constructed
    default graph (round-4 lift of the documented restriction)."""
    quads = spark.createDataFrame(
        [
            ("g1", "a", V + "next", "b"),
            ("g1", "b", V + "next", "c"),
            ("g2", "b", V + "next", "q"),  # not in FROM: excluded
        ],
        ["graph", "subj", "pred", "obj"],
    )
    out = sparql(quads, f'''
        PREFIX v: <{V}>
        SELECT ?o FROM <g1> WHERE {{ <a> v:next+ ?o }}''')
    assert sorted(r["o"] for r in out.collect()) == ["b", "c"]


def test_ask_with_union_and_bind(kg):
    assert sparql(kg, f'''PREFIX v: <{V}>
        ASK {{ {{ ?t v:role "nonexistent" }} UNION {{ ?t v:tool "search" }} }}''') is True
    assert sparql(kg, f'''PREFIX v: <{V}>
        ASK {{ {{ ?t v:role "x" }} UNION {{ ?t v:tool "y" }} }}''') is False
    assert sparql(kg, f'''PREFIX v: <{V}>
        ASK {{ ?t v:role ?r . BIND(ucase(?r) AS ?u) FILTER(?u = "USER") }}''') is True
    assert sparql(kg, f'''PREFIX v: <{V}>
        ASK {{ ?t v:role ?r . BIND(ucase(?r) AS ?u) FILTER(?u = "NOPE") }}''') is False


def test_select_negated_property_set(spark):
    """NPS through the text front end: !(p|q) matches every predicate
    except the enumerated ones, composes with a joined pattern."""
    from json_ld_spark.sparql import sparql

    tri = spark.createDataFrame(
        [
            ("a", "http://x/p", "b"),
            ("a", "http://x/q", "c"),
            ("a", "http://x/r", "d"),
            ("e", "http://x/conv", "a"),
        ],
        ["subj", "pred", "obj"],
    )
    got = sorted(
        map(
            tuple,
            sparql(
                tri,
                "SELECT ?s ?o WHERE { ?s !(<http://x/p>|<http://x/q>) ?o }",
            ).collect(),
        )
    )
    assert got == [("a", "d"), ("e", "a")]
    comp = sparql(
        tri,
        "SELECT ?s ?o WHERE { ?s !(<http://x/q>)/^<http://x/conv> ?o }",
    ).collect()
    assert sorted(map(tuple, comp)) == [("e", "e")]
