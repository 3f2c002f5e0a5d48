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
