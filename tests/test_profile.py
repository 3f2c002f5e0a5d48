"""Table profiling / skew diagnostics (operators/profile.py)."""

from __future__ import annotations

from json_ld_spark.operators.profile import column_stats, heavy_hitters


def _df(spark):
    rows = (
        [("a", 1, None)] * 5
        + [("b", 1, "x")] * 3
        + [("c", 2, "x")] * 2
        + [(None, 2, "y")]
    )
    return spark.createDataFrame(rows, "k string, g int, v string")


def test_heavy_hitters_exact_topk_with_ties_and_nulls(spark):
    got = {(r.column, r.value, r.n, r.rank)
           for r in heavy_hitters(_df(spark), ["k", "g"], k=2).collect()}
    assert got == {
        ("k", "a", 5, 1), ("k", "b", 3, 2),
        # tie 6 vs 5: value ascending breaks it deterministically
        ("g", "1", 8, 1), ("g", "2", 3, 2),
    }
    # k larger than cardinality: NULL is ranked as a value
    allk = {(r.value, r.n, r.rank)
            for r in heavy_hitters(_df(spark), ["k"], k=10).collect()}
    assert (None, 1, 4) in allk


def test_column_stats_exact(spark):
    got = {r.column: (r.n_rows, r.n_nulls, r.n_distinct)
           for r in column_stats(_df(spark), ["k", "g", "v"],
                                 exact=True).collect()}
    assert got == {
        "k": (11, 1, 3),
        "g": (11, 0, 2),
        "v": (11, 5, 2),
    }


def test_column_stats_approx_close(spark):
    df = spark.range(0, 2000).selectExpr("cast(id % 500 as string) AS s")
    [r] = column_stats(df, ["s"]).collect()
    assert r.n_rows == 2000 and r.n_nulls == 0
    assert abs(r.n_distinct - 500) <= 25  # HLL within ~5%


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
QSCHEMA = ("graph string, subj string, pred string, obj_kind string, "
           "obj string, datatype string, lang string")


def _quads(spark):
    rows = [
        (None, "a", RDF_TYPE, "iri", "Person", None, None),
        (None, "a", RDF_TYPE, "iri", "Agent", None, None),
        (None, "b", RDF_TYPE, "iri", "Person", None, None),
        (None, "a", "knows", "iri", "b", None, None),
        (None, "a", "knows", "iri", "c", None, None),   # c untyped
        (None, "b", "knows", "iri", "a", None, None),
        (None, "a", "name", "literal", "x", "xs:string", None),
        (None, "b", "name", "literal", "x", "xs:string", None),
        (None, "b", "name", "literal", "x", None, None),  # differs by dt
    ]
    return spark.createDataFrame(rows, QSCHEMA)


def test_void_stats(spark):
    from json_ld_spark.operators.profile import void_stats

    got = {r.pred: (r.n_triples, r.n_distinct_subj, r.n_distinct_obj)
           for r in void_stats(_quads(spark)).collect()}
    assert got == {
        RDF_TYPE: (3, 2, 2),
        "knows": (3, 2, 3),
        "name": (3, 2, 2),  # same lexical, two datatypes
    }


def test_schema_summary(spark):
    from json_ld_spark.operators.profile import schema_summary

    got = {(r.src_type, r.pred, r.dst_type): r.n_edges
           for r in schema_summary(_quads(spark)).collect()}
    # a is Person AND Agent: its edges appear under both src types, and
    # edges INTO a appear under both dst types (quotient-graph fan-out)
    assert got == {
        ("Person", "knows", "Person"): 2,   # a->b (as Person) + b->a (to a-as-Person)
        ("Agent", "knows", "Person"): 1,    # a->b (as Agent)
        ("Person", "knows", "Agent"): 1,    # b->a (to a-as-Agent)
        ("Person", "knows", "untyped"): 1,  # a->c (as Person)
        ("Agent", "knows", "untyped"): 1,   # a->c (as Agent)
    }


def test_transcript_context_windows(spark):
    from json_ld_spark.operators.native import transcript_context_windows

    rows = [("c1", i, f"r{i}", f"t{i}", None, None) for i in range(4)]
    rows += [("c2", 0, "u", "hello", None, None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    got = {(r.conv_id, r.turn_idx): (r.n_context_turns, r.context, r.target)
           for r in transcript_context_windows(df, k=2).collect()}
    assert got[("c1", 0)] == (0, "", "t0")
    assert got[("c1", 1)] == (1, "r0: t0", "t1")
    assert got[("c1", 3)] == (2, "r1: t1\nr2: t2", "t3")
    assert got[("c2", 0)] == (0, "", "hello")


# ---------------------------------------------------- IQR outliers


def test_iqr_outliers_hand_computed(spark):
    from json_ld_spark.operators.profile import iqr_outliers

    # group 'a': values 1..9 plus outlier 100 -> q1=3.25, q3=7.75,
    # iqr=4.5, fences [-3.5, 14.5]; only 100 is flagged
    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["v"]: r for r in iqr_outliers(df, "g", "v").collect()}
    assert out[100]["is_outlier"] and not out[5]["is_outlier"]
    assert out[100]["winsorized"] == out[100]["hi"]
    assert out[5]["winsorized"] == 5.0
    assert out[1]["lo"] == -3.5 and out[1]["hi"] == 14.5


def test_iqr_outliers_groups_independent(spark):
    from json_ld_spark.operators.profile import iqr_outliers

    rows = [("a", v) for v in range(1, 11)] + [("b", v) for v in range(1000, 1010)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = iqr_outliers(df, "g", "v").collect()
    assert not any(r["is_outlier"] for r in out)  # each group is uniform
