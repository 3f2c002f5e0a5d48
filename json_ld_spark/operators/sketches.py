"""Deterministic cardinality sketches (HyperLogLog) with value-exact
cross-engine replay.

`approx_count_distinct`'s HLL++ registers are implementation-private, so
it can never be oracled. This HLL is built from first principles on the
md5 cross-engine hash bridge (same recipe as the simhash/fingerprint
oracles): every step — bucket split, leading-zero rank via the binary
string length, register max — is INTEGER arithmetic reproducible
bit-for-bit in DuckDB SQL, and the estimator's harmonic sum is kept as
an exact scaled-integer (sum of 2^(32-rho) over registers) so the final
estimate is two IEEE ops on exact integers. The only libm dependence is
the ln() in the linear-counting branch (small-cardinality correction),
absorbed by the 4-dp rounding.

At 100 TB this is the point of a sketch: one `groupBy(bucket).max` over
m = 2^p buckets of state — a fixed-size aggregation regardless of input
row count, mergeable across partitions/datasets by register-wise max
(`merge_registers`).

Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007); standard error
~1.04/sqrt(m) (~3.3% at p=10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HASH_BITS = 32


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(df: DataFrame, col: str, p: int = 10) -> DataFrame:
    """(bucket, rho) register table: bucket = top p bits of the 32-bit
    md5-bridge hash, rho = 1 + leading-zero count of the remaining
    (32-p)-bit suffix (computed as bit-length via bin(), no floats).
    Buckets never observed are simply absent (rho := 0 downstream)."""
    q = _HASH_BITS - p
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    bucket = (h / F.lit(1 << q)).cast("bigint")  # h >> q, exact: h < 2^32
    w = h % F.lit(1 << q)
    rho = F.when(w == 0, F.lit(q + 1)).otherwise(F.lit(q) + 1 - F.length(F.bin(w)))
    return (
        df.select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def merge_registers(*register_tables: DataFrame) -> DataFrame:
    """Union sketches of disjoint (or overlapping) datasets: the HLL
    merge is a register-wise max — sketches compose without rescanning
    either input."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_cardinality(df: DataFrame, col: str, p: int = 10) -> DataFrame:
    """One-row (m, n_zero, s_scaled, estimate_r): the register count,
    zero-register count and scaled harmonic sum are integer-exact; the
    estimate applies the standard small-range linear-counting
    correction and rounds to 4 dp."""
    m = 1 << p
    alpha = _alpha(m)
    regs = hll_registers(df, col, p=p)
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        # exact scaled harmonic sum: sum of 2^(32-rho), rho in [1, 33]
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {_HASH_BITS} - rho)")
        ).alias("s_present"),
    )
    num = float(alpha) * float(m * m * (1 << _HASH_BITS))  # exact: < 2^53
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("n_present")).cast("long").alias("n_zero"),
        (
            F.col("s_present")
            + (F.lit(m) - F.col("n_present")) * F.lit(1 << _HASH_BITS)
        ).cast("long").alias("s_scaled"),
    ).select(
        "m",
        "n_zero",
        "s_scaled",
        F.round(
            F.when(
                (F.lit(num) / F.col("s_scaled") <= F.lit(2.5 * m))
                & (F.col("n_zero") > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")),
            ).otherwise(F.lit(num) / F.col("s_scaled")),
            4,
        ).alias("estimate_r"),
    )


def cm_sketch(df: DataFrame, col: str, d: int = 4, w: int = 1024) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): d independent
    md5-bridge hash rows x w counters, each counter an EXACT integer
    sum — the whole sketch is one groupBy over d*w cells of state, and
    (unlike HLL) estimation never needs floats, so the cross-engine
    replay is integer-exact end to end. Counters only over-count
    (collisions), never under-count; error <= e*N/w with prob 1-e^-d.
    Returns (row, bucket, cnt)."""
    rows = []
    for r in range(d):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cm{r}|"), F.col(col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        rows.append(
            df.select(F.lit(r).alias("row"), (h % F.lit(w)).alias("bucket"))
        )
    all_rows = rows[0]
    for t in rows[1:]:
        all_rows = all_rows.unionByName(t)
    return all_rows.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimate(
    sketch: DataFrame, items: DataFrame, col: str = "item", d: int = 4, w: int = 1024
) -> DataFrame:
    """(item, est): est = min over the d rows of the item's counter —
    a d-way join of the (small) item list against the sketch, then a
    groupBy min. Missing cells count 0 (an item never hashed there)."""
    probes = []
    for r in range(d):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cm{r}|"), F.col(col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        probes.append(
            items.select(F.col(col).alias("item"), F.lit(r).alias("row"), (h % F.lit(w)).alias("bucket"))
        )
    all_probes = probes[0]
    for t in probes[1:]:
        all_probes = all_probes.unionByName(t)
    return (
        all_probes.join(sketch, ["row", "bucket"], "left")
        .select("item", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .groupBy("item")
        .agg(F.min("cnt").alias("est"))
    )


def bloom_bits(df: DataFrame, col: str, k: int = 4, w: int = 1 << 16) -> DataFrame:
    """Bloom filter bit set: the k md5-salted hash positions of every
    member, deduplicated — one (bit,) row per set bit. The scale story:
    w bits of a 100M-entry dictionary is a few hundred KB, broadcastable
    to prefilter a corpus-side join even when the dictionary itself is
    far too big to broadcast (the generalization of linking.py's
    broadcast semi-join prefilter). No false negatives by construction;
    false-positive rate ~(1 - e^(-k*n/w))^k."""
    parts = []
    for r in range(k):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{r}|"), F.col(col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        parts.append(df.select((h % F.lit(w)).alias("bit")))
    bits = parts[0]
    for t in parts[1:]:
        bits = bits.unionByName(t)
    return bits.dropDuplicates()


def bloom_probe(
    bits: DataFrame, items: DataFrame, col: str = "item", k: int = 4, w: int = 1 << 16
) -> DataFrame:
    """(item, maybe_present): true iff ALL k of the item's bit
    positions are set — a k-way left join against the bit set + an
    all() aggregate. `maybe_present = false` is definitive absence
    (prune safely); `true` needs the real join to confirm."""
    probes = []
    for r in range(k):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{r}|"), F.col(col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        probes.append(items.select(F.col(col).alias("item"), (h % F.lit(w)).alias("bit")))
    all_probes = probes[0]
    for t in probes[1:]:
        all_probes = all_probes.unionByName(t)
    hit = bits.withColumn("present", F.lit(True))
    return (
        all_probes.join(hit, "bit", "left")
        .select("item", F.coalesce("present", F.lit(False)).alias("p"))
        .groupBy("item")
        .agg(F.min(F.col("p").cast("int")).cast("boolean").alias("maybe_present"))
    )


def histogram_counts(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 1024
) -> DataFrame:
    """Fixed-bin histogram over a known value range: bucket =
    clamp(floor(((x-lo)/(hi-lo))*bins)). ONE partial-agg shuffle with
    at most `bins` rows of state regardless of input size — the
    quantile/distribution sketch for a 100 TB column when the range is
    known (prices, scores, lengths). Mergeable by bucket-wise sum.
    Deterministic: integer bucket math on an explicit float expression
    both engines evaluate identically."""
    x = F.col(col).cast("double")
    b = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0),
            F.floor(((x - F.lit(float(lo))) / F.lit(float(hi - lo))) * bins).cast("int"),
        ),
    )
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 1024,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile estimates from the fixed-bin histogram: for each q the
    smallest bucket whose cumulative count reaches ceil(q*total);
    the estimate is that bucket's upper edge (error <= one bin width).
    The cumulative window runs over the BUCKET TABLE (<= `bins` rows,
    one task by construction), never over the data. Returns
    (q, bucket, rank, total, est_r)."""
    from pyspark.sql import Window

    counts = histogram_counts(df, col, lo, hi, bins)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "bucket",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wt).alias("total"),
    )
    spark = df.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame([(float(q),) for q in qs], ["q"])
    )
    width = float(hi - lo) / bins
    hit = (
        cum.join(qdf, F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy("q")
        .agg(
            F.min("bucket").alias("bucket"),
            F.max("total").alias("total"),
        )
    )
    return hit.select(
        "q",
        "bucket",
        F.ceil(F.col("q") * F.col("total")).alias("rank"),
        "total",
        F.round(
            F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(width), 6
        ).alias("est_r"),
    )
