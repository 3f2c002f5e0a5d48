"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, fully JVM-side (zip_with/aggregate —
codegen'd, no Python). Scale path: LSH bucketing via random-hyperplane
signatures so the candidate join touches only same-bucket pairs; at
1000 executors the bucket key is uniform and the per-bucket fan-in is
|bucket|², tunable with n_planes.

An embedding-cosine near-duplicate detector reuses the same kernel.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Broadcast the (small)
    query side; the corpus streams through one codegen stage. The only
    shuffle is the per-query top-k window."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def _hyperplane(dim: int, plane_no: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (hash-based; no RNG
    state, reproducible across cluster sizes)."""
    import hashlib
    import struct

    vals = []
    for i in range(dim):
        h = hashlib.sha256(f"plane:{plane_no}:{i}".encode()).digest()[:8]
        (u,) = struct.unpack(">Q", h)
        # map to (-1, 1)
        vals.append((u / 2**63) - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_bucket(vec_col: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane signature: n_planes sign bits → int bucket."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bits.append(F.when(_dot(vec_col, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(bits).cast("int")


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Equi-join on bucket replaces the cross join — the 100 TB
    shape. Recall grows with fewer planes / multi-probe."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, bucketed by
    hyperplane LSH (self-join on bucket, id< dedup)."""
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    l, r = v.alias("l"), v.alias("r")
    return (
        l.join(r, "bucket")
        .filter(F.col("l.vid") < F.col("r.vid"))
        .select(
            F.col("l.vid").alias("vec_a"),
            F.col("r.vid").alias("vec_b"),
            cosine(F.col("l.vec"), F.col("r.vec")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantize to deterministic centroids,
# search only the probe's nearest cells (task brief: "IVF or LSH-bucketed
# variant as the scale path")
# --------------------------------------------------------------------------

def ivf_centroids(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse centroids without iterative k-means: cells
    are seeded by hash-sampling (vec_id with the n_cells smallest
    xxhash64 values — uniform, reproducible across cluster sizes), then
    each centroid is the mean of the vectors hash-assigned to its seed
    group. One aggregation; no RNG state, no driver loops."""
    seeded = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_cells)).cast("int").alias("cell"),
    )
    # mean per component via explode-free aggregate over zip_with sums
    agg = seeded.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        F.aggregate(
            F.collect_list("vec"),
            F.expr("cast(array() as array<double>)"),
            lambda acc, v: F.when(F.size(acc) == 0, v).otherwise(
                F.zip_with(acc, v, lambda a, b: a + b)
            ),
        ).alias("sum_vec"),
    )
    return agg.select(
        "cell",
        F.transform("sum_vec", lambda s: s / F.col("n")).alias("centroid"),
    )


def _nearest_cells(vec_col: Column, centroids: list, n_probe: int) -> Column:
    """Array of the n_probe nearest centroid cell ids (literal centroids
    — broadcast-sized; scored with the codegen'd dot kernel)."""
    scored = F.array(*[
        F.struct(
            (-cosine(vec_col, F.array(*[F.lit(x) for x in c]))).alias("neg_cos"),
            F.lit(i).alias("cell"),
        )
        for i, c in centroids
    ])
    return F.transform(
        F.slice(F.array_sort(scored), 1, n_probe), lambda s: s["cell"]
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: corpus rows live in their nearest cell; each query
    probes its n_probe nearest cells — the candidate join is an
    equi-join on cell id (the 100 TB shape; recall tuned by n_probe).
    Centroids are collected to the driver (coarse codebook ≪ data) and
    inlined as literals so assignment stays in whole-stage codegen."""
    cents = [(int(r["cell"]), list(r["centroid"])) for r in centroids.collect()]
    assign_one = lambda vc: _nearest_cells(vc, cents, 1)[0]  # noqa: E731
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"),
        assign_one(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(_nearest_cells(F.col(vec_col), cents, n_probe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )
