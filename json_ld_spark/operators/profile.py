"""Table profiling and skew diagnostics.

Before a 100 TB join or aggregation is planned, the operational
questions are: which keys are hot (salting / skew-join candidates),
how dense are the columns, and how many distinct values does a key
have (broadcast vs shuffle, bucketing width)? These operators answer
them as plain DataFrame plans:

- `heavy_hitters`: exact per-column top-k values with counts. One
  melt projection (a generator expression, no shuffle) and one
  (column, value)-keyed count — map-side partial aggregation absorbs
  the very hot keys this exists to find, so the shuffle carries one
  row per (column, value) per task, not per input row. The per-column
  top-k window sorts only the distinct-value counts of that column.
- `column_stats`: per-column row/null/distinct counts in one
  aggregation pass over the table. ``exact=False`` (default) uses
  HyperLogLog (`approx_count_distinct`) — constant state per column,
  the only sane choice for high-cardinality columns at corpus scale;
  ``exact=True`` switches to exact distinct counts for
  dictionary-sized columns (and for oracle comparison).

The hot keys found here feed linking's salted join and the AQE skew
thresholds; the distinct counts feed broadcast-threshold decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _melt(df: DataFrame, columns: list[str]) -> DataFrame:
    """(column, value) pairs; values stringified, NULL preserved."""
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("value"),
            )
            for c in columns
        ]
    )
    return df.select(F.explode(entries).alias("e")).select("e.*")


def heavy_hitters(
    df: DataFrame, columns: list[str], k: int = 5
) -> DataFrame:
    """Exact top-k values per column: ``(column, value, n, rank)``,
    rank 1 = most frequent; ties broken by value ascending (NULL
    first) so the output is total-order deterministic. NULL is
    counted as a value — a mostly-null join key is the most common
    skew surprise."""
    counts = (
        _melt(df, columns)
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("column").orderBy(
        F.desc("n"), F.asc_nulls_first("value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def column_stats(
    df: DataFrame, columns: list[str], exact: bool = False
) -> DataFrame:
    """Per-column ``(column, n_rows, n_nulls, n_distinct)`` in one
    aggregation pass (n_distinct excludes NULL, as in SQL COUNT
    (DISTINCT ...)). Default approximate distinct (HLL, ~2% error,
    constant state); ``exact=True`` for dictionary-sized columns."""
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.lit(1)).alias(f"__r_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}"),
            distinct(F.col(c)).alias(f"__d_{c}"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__r_{c}").cast("long").alias("n_rows"),
                F.col(f"__n_{c}").cast("long").alias("n_nulls"),
                F.col(f"__d_{c}").cast("long").alias("n_distinct"),
            )
            for c in columns
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def void_stats(triples: DataFrame) -> DataFrame:
    """VoID-style property partition of a quad table: per predicate,
    ``(pred, n_triples, n_distinct_subj, n_distinct_obj)`` — the
    cardinality statistics a SPARQL/BGP planner orders joins by (the
    BGP layer's greedy most-selective-first ordering consumes exactly
    these numbers) and the dataset description VoID publishes.
    One predicate-keyed aggregation; object identity is the full
    (kind, lexical, datatype, lang) tuple."""
    return triples.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.count_distinct("subj").alias("n_distinct_subj"),
        F.count_distinct(
            F.struct("obj_kind", "obj", "datatype", "lang")
        ).alias("n_distinct_obj"),
    )


def schema_summary(triples: DataFrame, rdf_type: str = RDF_TYPE) -> DataFrame:
    """Class-level summary graph (ABox → TBox profile):
    ``(src_type, pred, dst_type, n_edges)`` over node-object,
    non-rdf:type triples, endpoint classes from their rdf:type
    assertions (``'untyped'`` when absent). Multi-typed endpoints
    contribute one row per type pair — standard quotient-graph
    semantics. Two endpoint-keyed joins + one count agg; the compact
    schema view a 100 TB KG is explored through before any instance
    query runs."""
    types = (
        triples.filter(F.col("pred") == rdf_type)
        .select(F.col("subj").alias("node"), F.col("obj").alias("cls"))
        .dropDuplicates()
    )
    edges = triples.filter(
        (F.col("pred") != rdf_type) & F.col("obj_kind").isin("iri", "bnode")
    ).select("subj", "pred", "obj")
    out = (
        edges.join(
            types.select(F.col("node").alias("subj"),
                         F.col("cls").alias("src_type")),
            "subj", "left",
        )
        .join(
            types.select(F.col("node").alias("obj"),
                         F.col("cls").alias("dst_type")),
            "obj", "left",
        )
        .groupBy(
            F.coalesce("src_type", F.lit("untyped")).alias("src_type"),
            "pred",
            F.coalesce("dst_type", F.lit("untyped")).alias("dst_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return out


def iqr_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Per-group Tukey-fence outlier flagging + winsorization — the
    robust-statistics cleaning pass a corpus profile feeds (clip
    pathological lengths/scores before they skew sampling weights).

    Per group: exact q1/q3 (linear-interpolation percentile — the
    identical definition as SQL quantile_cont), fences
    ``[q1 - k*IQR, q3 + k*IQR]`` rounded to 6 dp, then every row gets
    ``is_outlier`` and the value clamped into the fences.

    Plan shape: ONE group aggregation for the fences + ONE equi-join
    back (group cardinality is vocabulary-sized — Spark broadcasts
    the fence table). Exact percentile is not map-side combinable
    (it buffers the group's values); that is the right trade at
    dictionary-sized groups, and the documented corpus-scale variant
    swaps in approx_percentile (mergeable t-digest-style sketch,
    map-side partial) with everything else unchanged.
    """
    v = F.col(value_col).cast("double")
    fences = (
        df.groupBy(group_col)
        .agg(
            F.percentile(v, F.lit(0.25)).alias("__q1"),
            F.percentile(v, F.lit(0.75)).alias("__q3"),
        )
        .select(
            group_col,
            F.round(F.col("__q1") - k * (F.col("__q3") - F.col("__q1")), 6).alias("lo"),
            F.round(F.col("__q3") + k * (F.col("__q3") - F.col("__q1")), 6).alias("hi"),
        )
    )
    return df.join(F.broadcast(fences), group_col).select(
        *df.columns,
        "lo",
        "hi",
        ((v < F.col("lo")) | (v > F.col("hi"))).alias("is_outlier"),
        F.round(F.least(F.greatest(v, F.col("lo")), F.col("hi")), 6).alias(
            "winsorized"
        ),
    )


# Poisson(1) inverse-CDF thresholds (cumulative e^-1 * sum 1/k!), fixed
# literals shared verbatim with the DuckDB oracle so the replicate
# weights are bit-identical on both engines.
POISSON1_CDF = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253,
]


def bootstrap_ci(
    df: DataFrame,
    metric_col: str,
    group_col: str = "lang",
    id_col: str = "doc_id",
    n_reps: int = 32,
    seed: str = "boot",
) -> DataFrame:
    """Deterministic POISSON BOOTSTRAP confidence interval for the
    per-group mean of an integer metric — the standard resampling
    scheme for distributed data (Chamandy et al., Google 2012: Poisson
    (1) weights need no global coordination, unlike multinomial
    resampling): replicate b gives every row weight k ~ Poisson(1)
    derived from the md5-bridge uniform of (seed, b, id), so every
    engine, partitioning, and rerun agrees on every weight. The CI is
    the [2nd smallest, 2nd largest] order statistics of the n_reps=32
    replicate means (≈ the 5–95% band).

    Scale shape: ONE explode by n_reps (the documented 32× map-side
    price every production bootstrap pays) → one (group, rep)
    aggregation with exact integer weighted sums → one group-
    partitioned rank window over n_reps rows per group. Output:
    (group, n, mean_r, ci_lo_r, ci_hi_r).
    """
    b = F.explode(F.sequence(F.lit(0), F.lit(int(n_reps) - 1))).alias("b")
    rows = df.select(
        F.col(group_col).alias("grp"),
        F.col(metric_col).cast("long").alias("x"),
        F.col(id_col).cast("string").alias("rid"),
        b,
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed + "|"),
                    F.col("b").cast("string"),
                    F.lit("|"),
                    F.col("rid"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
    k = F.lit(len(POISSON1_CDF))
    for i in range(len(POISSON1_CDF) - 1, -1, -1):
        k = F.when(u < F.lit(POISSON1_CDF[i]), F.lit(i)).otherwise(k)
    reps = (
        rows.withColumn("k", k.cast("long"))
        .groupBy("grp", "b")
        .agg(
            F.sum(F.col("k") * F.col("x")).alias("sk"),
            F.sum("k").alias("kn"),
        )
        .where(F.col("kn") > 0)
        .select(
            "grp",
            F.round(
                F.col("sk").cast("double") / F.col("kn").cast("double"), 6
            ).alias("mean_b"),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.asc("mean_b"))
    wn = Window.partitionBy("grp")
    stats = (
        reps.withColumn("rk", F.row_number().over(w))
        .withColumn("nb", F.count(F.lit(1)).over(wn))
        .where((F.col("rk") == 2) | (F.col("rk") == F.col("nb") - 1))
        .groupBy("grp")
        .agg(
            F.min("mean_b").alias("ci_lo_r"),
            F.max("mean_b").alias("ci_hi_r"),
        )
    )
    point = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col(metric_col).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_r"),
    )
    return point.join(stats, "grp").select(
        F.col("grp").alias(group_col), "n", "mean_r", "ci_lo_r", "ci_hi_r"
    )
