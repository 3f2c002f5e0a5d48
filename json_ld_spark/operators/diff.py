"""Distributed dataset comparison: the corpus-scale twin of the
reference's document/dataset equality machinery (SURVEY.md §2 H1-H4 —
`JsonLdProcessor::compare`, remote_document.rs:15-43; isomorphism via
canonical labels, tests/to_rdf.rs:166-170).

`dataset_diff` compares two quad tables modulo blank-node isomorphism:
both sides are canonicalized (hash-based labels), then the symmetric
difference comes from two left-anti joins on all quad columns. At scale
each anti join is one shuffle on the 7-column key (or a broadcast when
one side is small — AQE decides); no collect, no driver-side sets.

`diff_summary` reduces to the (n_only_left, n_only_right, n_common)
triple — the micro P/R numerator/denominators the golden scoring uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

QUAD_COLS = ["graph", "subj", "pred", "obj_kind", "obj", "datatype", "lang"]


def dataset_diff(
    left: DataFrame,
    right: DataFrame,
    canonicalize: bool = True,
    rounds: int = 6,
) -> dict[str, DataFrame]:
    """Quads only in `left`, only in `right`, and in both — after
    optional distributed bnode canonicalization of BOTH sides, so
    isomorphic datasets diff empty regardless of blank labels."""
    if canonicalize:
        from .canonical import canonicalize_bnodes_df

        left = canonicalize_bnodes_df(left.select(*QUAD_COLS), rounds=rounds)
        right = canonicalize_bnodes_df(right.select(*QUAD_COLS), rounds=rounds)
    l = left.select(*QUAD_COLS).dropDuplicates().alias("l")
    r = right.select(*QUAD_COLS).dropDuplicates().alias("r")
    # eqNullSafe on every column: graph/datatype/lang are NULL for most
    # quads and a plain equi-join would match nothing (NULL != NULL)
    import functools

    def cond(a, b):
        return functools.reduce(
            lambda x, y: x & y,
            [F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}")) for c in QUAD_COLS],
        )

    return {
        "only_left": l.join(r, cond("l", "r"), "left_anti"),
        "only_right": r.join(l.alias("l2"), cond("r", "l2"), "left_anti"),
        "common": l.join(r.alias("r2"), cond("l", "r2"), "left_semi"),
    }


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    canonicalize: bool = True,
    rounds: int = 6,
) -> DataFrame:
    """One-row summary (n_only_left, n_only_right, n_common) — the
    P/R-gate numbers: precision = common/(common+only_left), recall =
    common/(common+only_right) when `right` is the golden side."""
    parts = dataset_diff(left, right, canonicalize=canonicalize, rounds=rounds)
    rows = [
        parts["only_left"].agg(F.count(F.lit(1)).alias("n")).withColumn(
            "side", F.lit("only_left")
        ),
        parts["only_right"].agg(F.count(F.lit(1)).alias("n")).withColumn(
            "side", F.lit("only_right")
        ),
        parts["common"].agg(F.count(F.lit(1)).alias("n")).withColumn(
            "side", F.lit("common")
        ),
    ]
    out = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return out.groupBy().pivot("side", ["only_left", "only_right", "common"]).sum("n").select(
        F.col("only_left").cast("long").alias("n_only_left"),
        F.col("only_right").cast("long").alias("n_only_right"),
        F.col("common").cast("long").alias("n_common"),
    )
