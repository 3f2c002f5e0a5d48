"""SPARQL property paths (operators/paths.py): parser, algebra, and a
random-graph fuzz against a naive in-Python evaluator."""

import random

import pytest

from json_ld_spark.operators.paths import parse_path, path_pairs

EX = "http://example.org/"
P, Q, R = EX + "p", EX + "q", EX + "r"


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o) for s, p, o in rows], "subj string, pred string, obj string"
    )


def _pairs(df):
    return {(r["s"], r["o"]) for r in df.collect()}


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

def test_parse_precedence():
    assert parse_path("a|b/c") == ("alt", ("link", "a"), ("seq", ("link", "b"), ("link", "c")))
    assert parse_path("(a|b)/c") == ("seq", ("alt", ("link", "a"), ("link", "b")), ("link", "c"))
    # SPARQL grammar: PathEltOrInverse ::= '^' PathElt, PathElt ::=
    # PathPrimary PathMod? -- so ^a+ parses as ^(a+)
    assert parse_path("^a+") == ("inv", ("plus", ("link", "a")))
    assert parse_path("(^a)+") == ("plus", ("inv", ("link", "a")))
    assert parse_path("!(a|b)?") == ("opt", ("nps", ["a", "b"]))
    assert parse_path("<http://x/y>*") == ("star", ("link", "http://x/y"))


def test_parse_errors():
    for bad in ["a|", "(a", "a)", "", "a b", "^", "!(a"]:
        with pytest.raises((ValueError, IndexError)):
            parse_path(bad)


# --------------------------------------------------------------------------
# algebra on a fixed graph
#   chain: n0 -p-> n1 -p-> n2 -p-> n3 ; n1 -q-> x ; x -r-> n3
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def chain(spark):
    rows = [
        ("n0", P, "n1"),
        ("n1", P, "n2"),
        ("n2", P, "n3"),
        ("n1", Q, "x"),
        ("x", R, "n3"),
    ]
    return _triples(spark, rows)


def test_link_and_inverse(chain):
    assert _pairs(path_pairs(chain, ("link", Q))) == {("n1", "x")}
    assert _pairs(path_pairs(chain, ("inv", ("link", Q)))) == {("x", "n1")}


def test_seq_and_alt(chain):
    assert _pairs(path_pairs(chain, f"<{Q}>/<{R}>")) == {("n1", "n3")}
    assert _pairs(path_pairs(chain, ("alt", ("link", Q), ("link", R)))) == {
        ("n1", "x"),
        ("x", "n3"),
    }


def test_plus_closure(chain):
    assert _pairs(path_pairs(chain, f"<{P}>+")) == {
        ("n0", "n1"), ("n0", "n2"), ("n0", "n3"),
        ("n1", "n2"), ("n1", "n3"),
        ("n2", "n3"),
    }


def test_star_includes_zero_length(chain):
    got = _pairs(path_pairs(chain, f"<{Q}>*"))
    terms = {"n0", "n1", "n2", "n3", "x"}
    assert got == {("n1", "x")} | {(t, t) for t in terms}


def test_opt(chain):
    got = _pairs(path_pairs(chain, f"<{Q}>?"))
    terms = {"n0", "n1", "n2", "n3", "x"}
    assert got == {("n1", "x")} | {(t, t) for t in terms}


def test_nps(chain):
    got = _pairs(path_pairs(chain, f"!(<{P}>|<{R}>)"))
    assert got == {("n1", "x")}


def test_seeded_closure_matches_filtered_full(chain, spark):
    seeds = spark.createDataFrame([("n1",)], "s string")
    got = _pairs(path_pairs(chain, f"<{P}>+", subjects=seeds))
    assert got == {("n1", "n2"), ("n1", "n3")}
    # star with a bound start: zero-length pair for the seed itself
    got_star = _pairs(path_pairs(chain, f"<{P}>*", subjects=seeds))
    assert got_star == {("n1", "n1"), ("n1", "n2"), ("n1", "n3")}


def test_composite_closure_body(chain):
    # (q/r)+ : n1 -q-> x -r-> n3, no further q from n3 -> single pair
    assert _pairs(path_pairs(chain, f"(<{Q}>/<{R}>)+")) == {("n1", "n3")}


def test_inverse_of_seq(chain):
    assert _pairs(path_pairs(chain, f"^(<{Q}>/<{R}>)")) == {("n3", "n1")}


# --------------------------------------------------------------------------
# BGP integration: tuple-AST predicate inside bgp_query patterns
# --------------------------------------------------------------------------

def test_path_predicate_in_bgp(chain):
    from json_ld_spark.operators.bgp import bgp_query

    out = bgp_query(
        chain,
        [
            ("?a", parse_path(f"<{P}>+"), "?b"),
            ("?b", Q, "?x"),
        ],
    )
    got = {(r["a"], r["b"], r["x"]) for r in out.collect()}
    assert got == {("n0", "n1", "x")}


def test_const_path_pattern_is_existence_gate(chain):
    from json_ld_spark.operators.bgp import bgp_query

    # positive gate: n0 -p+-> n3 holds, so bindings survive
    out = bgp_query(
        chain,
        [("?t", Q, "?x"), ("n0", parse_path(f"<{P}>+"), "n3")],
    )
    assert {(r["t"], r["x"]) for r in out.collect()} == {("n1", "x")}
    # negative gate: n3 has no outgoing p, so zero rows
    out2 = bgp_query(
        chain,
        [("?t", Q, "?x"), ("n3", parse_path(f"<{P}>+"), "n0")],
    )
    assert out2.count() == 0


# --------------------------------------------------------------------------
# fuzz: random graphs + random paths vs a naive evaluator
# --------------------------------------------------------------------------

def _naive(rows, path, terms):
    kind = path[0]
    if kind == "link":
        return {(s, o) for s, p, o in rows if p == path[1]}
    if kind == "nps":
        return {(s, o) for s, p, o in rows if p not in path[1]}
    if kind == "inv":
        return {(o, s) for s, o in _naive(rows, path[1], terms)}
    if kind == "seq":
        acc = _naive(rows, path[1], terms)
        for leg in path[2:]:
            nxt = _naive(rows, leg, terms)
            acc = {(s, o2) for s, o in acc for (s2, o2) in nxt if s2 == o}
        return acc
    if kind == "alt":
        out = set()
        for p in path[1:]:
            out |= _naive(rows, p, terms)
        return out
    if kind == "opt":
        return _naive(rows, path[1], terms) | {(t, t) for t in terms}
    if kind in ("plus", "star"):
        base = _naive(rows, path[1], terms)
        closure = set(base)
        while True:
            new = {
                (s, o2)
                for (s, o) in closure
                for (s2, o2) in base
                if s2 == o and (s, o2) not in closure
            }
            if not new:
                break
            closure |= new
        if kind == "star":
            closure |= {(t, t) for t in terms}
        return closure
    raise AssertionError(path)


def _rand_path(rng, depth=0):
    kinds = ["link", "link", "inv", "seq", "alt", "plus", "star", "opt", "nps"]
    k = rng.choice(kinds if depth < 2 else ["link", "link", "nps"])
    preds = [P, Q, R]
    if k == "link":
        return ("link", rng.choice(preds))
    if k == "nps":
        return ("nps", rng.sample(preds, rng.randint(1, 2)))
    if k in ("inv", "plus", "star", "opt"):
        return (k, _rand_path(rng, depth + 1))
    return (k, _rand_path(rng, depth + 1), _rand_path(rng, depth + 1))


def test_fuzz_vs_naive(spark):
    rng = random.Random(20260817)
    for trial in range(8):
        n = rng.randint(4, 9)
        nodes = [f"v{i}" for i in range(n)]
        rows = list(
            {
                (rng.choice(nodes), rng.choice([P, Q, R]), rng.choice(nodes))
                for _ in range(rng.randint(n, 3 * n))
            }
        )
        terms = {s for s, _, _ in rows} | {o for _, _, o in rows}
        df = _triples(spark, rows)
        for _ in range(3):
            path = _rand_path(rng)
            expect = _naive(rows, path, terms)
            got = _pairs(path_pairs(df, path))
            assert got == expect, f"trial={trial} path={path}"


def test_bgp_constant_subject_seeds_path(spark):
    """A constant-subject path pattern inside a BGP must produce the
    same bindings as the unseeded full evaluation (the seeded frontier
    BFS is the at-scale plan)."""
    import pyspark.sql.functions as F

    from json_ld_spark.operators.bgp import bgp_query
    from json_ld_spark.operators.paths import parse_path, path_pairs

    edges = [(f"n{i}", "http://e/p", f"n{i+1}") for i in range(6)]
    edges += [("m0", "http://e/p", "m1")]  # disconnected island
    t = spark.createDataFrame(edges, ["subj", "pred", "obj"])
    ast = parse_path("<http://e/p>+")

    seeded = bgp_query(t, [("n0", ast, "?x")])
    assert sorted(r.x for r in seeded.collect()) == [f"n{i}" for i in range(1, 7)]

    # equality with the unseeded relation filtered to the seed
    full = path_pairs(t, ast).filter(F.col("s") == "n0")
    assert sorted(r.x for r in seeded.collect()) == \
        sorted(r.o for r in full.collect())
