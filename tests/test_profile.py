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
