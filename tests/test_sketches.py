"""Deterministic HLL sketches (operators/sketches.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_ld_spark.operators import sketches as sk


def _ids(spark, n, prefix="x"):
    return spark.range(n).select(F.concat(F.lit(prefix), F.col("id")).alias("v"))


def test_hll_raw_branch_accuracy(spark):
    # 50k distinct >> 2.5m (m=1024): raw harmonic estimator branch
    n = 50_000
    row = sk.hll_cardinality(_ids(spark, n), "v", p=10).first()
    assert row["n_zero"] == 0 or row["n_zero"] < 10
    assert abs(row["estimate_r"] - n) / n < 0.05  # 1.04/sqrt(1024) ~ 3.3%


def test_hll_linear_counting_branch_accuracy(spark):
    # 300 distinct < 2.5m: linear-counting correction branch
    n = 300
    row = sk.hll_cardinality(_ids(spark, n), "v", p=10).first()
    assert row["n_zero"] > 0
    assert abs(row["estimate_r"] - n) / n < 0.05


def test_hll_duplicates_do_not_move_estimate(spark):
    # cardinality sketch: duplicating every row must not change registers
    base = _ids(spark, 5_000)
    dup = base.unionAll(base).unionAll(base)
    a = sk.hll_cardinality(base, "v").first()
    b = sk.hll_cardinality(dup, "v").first()
    assert a == b


def test_hll_merge_equals_union_sketch(spark):
    # register-wise max merge == sketching the concatenated dataset
    a, b = _ids(spark, 3_000, "a"), _ids(spark, 3_000, "b")
    merged = sk.merge_registers(
        sk.hll_registers(a, "v"), sk.hll_registers(b, "v")
    )
    direct = sk.hll_registers(a.unionAll(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_registers_deterministic_python_reference(spark):
    # registers must equal a driver-side md5 reference implementation
    import hashlib

    n, p, q = 2_000, 10, 22
    regs = {}
    for i in range(n):
        h = int(hashlib.md5(f"x{i}".encode()).hexdigest()[:8], 16)
        bucket, w = h >> q, h % (1 << q)
        rho = (q + 1) if w == 0 else q + 1 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    got = {
        r["bucket"]: r["rho"]
        for r in sk.hll_registers(_ids(spark, n), "v", p=p).collect()
    }
    assert got == regs


def test_cm_sketch_never_undercounts_and_is_tight_here(spark):
    # skewed multiplicities: item k appears k times, k in 1..60
    rows = [(f"k{k}",) for k in range(1, 61) for _ in range(k)]
    df = spark.createDataFrame(rows, ["v"])
    sk_df = sk.cm_sketch(df, "v")
    items = df.select(F.col("v")).distinct()
    est = {r["item"]: r["est"] for r in sk.cm_estimate(sk_df, items, col="v").collect()}
    true = {f"k{k}": k for k in range(1, 61)}
    assert all(est[i] >= true[i] for i in true)  # CM never under-counts
    # N=1830 over w=1024, d=4: expect almost all exact
    exact = sum(1 for i in true if est[i] == true[i])
    assert exact >= 55


def test_cm_total_mass_per_row(spark):
    df = _ids(spark, 4_000)
    sk_df = sk.cm_sketch(df, "v", d=4)
    per_row = {r["row"]: r["s"] for r in
               sk_df.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {0: 4000, 1: 4000, 2: 4000, 3: 4000}


def test_bloom_no_false_negatives_and_low_fp(spark):
    members = _ids(spark, 2_000, "m")
    bits = sk.bloom_bits(members, "v", k=4, w=1 << 16)
    # probe: all members (must all hit) + 2000 non-members
    non = _ids(spark, 2_000, "q")
    probe = members.unionAll(non).withColumnRenamed("v", "item")
    got = {r["item"]: r["maybe_present"]
           for r in sk.bloom_probe(bits, probe).collect()}
    assert all(got[f"m{i}"] for i in range(2_000))  # zero false negatives
    fp = sum(1 for i in range(2_000) if got[f"q{i}"])
    # n=2000, w=65536, k=4 -> theoretical fp ~ 2.4e-4; allow slack
    assert fp <= 10


def test_histogram_quantiles_accuracy_and_bounds(spark):
    import numpy as np

    from json_ld_spark.operators import sketches as sk

    rng = np.random.RandomState(7)
    vals = rng.uniform(0, 1000, size=5000).tolist()
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    out = {
        r["q"]: r
        for r in sk.histogram_quantiles(
            df, "x", 0, 1000, bins=200, qs=(0.5, 0.9, 0.99)
        ).collect()
    }
    width = 1000 / 200
    for q, row in out.items():
        exact = float(np.percentile(vals, q * 100))
        # estimate is the covering bucket's upper edge: within one bin
        assert exact - width <= row["est_r"] <= exact + width
        assert row["total"] == 5000


def test_histogram_counts_clamps_out_of_range(spark):
    from json_ld_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (999.0,), (5000.0,)], ["x"]
    )
    got = {r["bucket"]: r["c"] for r in
           sk.histogram_counts(df, "x", 0, 1000, bins=10).collect()}
    assert got[0] == 2      # -5 clamps into bucket 0
    assert got[9] == 2      # 999 lands in 9; 5000 clamps into 9
