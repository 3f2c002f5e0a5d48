"""Bucketed-table layout: co-located joins with zero Exchange
(operators/checkpoint.write_bucketed_table)."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from json_ld_spark.operators.checkpoint import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark):
    # uses the session's default warehouse dir (static config); tables
    # are dropped on teardown
    df = spark.range(0, 50000).select(
        (F.col("id") % 911).alias("subj"), F.col("id").alias("v")
    )
    write_bucketed_table(df, "t_layout_a", ["subj"], n_buckets=8)
    write_bucketed_table(df, "t_layout_b", ["subj"], n_buckets=8)
    yield spark
    spark.sql("DROP TABLE IF EXISTS t_layout_a")
    spark.sql("DROP TABLE IF EXISTS t_layout_b")


def test_bucketed_join_has_zero_exchange(bucketed):
    spark = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_layout_a").join(spark.table("t_layout_b"), "subj")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        # and the result is still correct: 50000 ids, |group|^2 pairs per key
        counts = (
            spark.table("t_layout_a").groupBy("subj").count()
            .select(F.sum(F.col("count") * F.col("count")))
            .first()[0]
        )
        assert j.count() == counts
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_avoids_exchange(bucketed):
    spark = bucketed
    agg = spark.table("t_layout_a").groupBy("subj").agg(F.sum("v"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # aggregation on the bucket key reuses the write-time partitioning
    assert "Exchange" not in plan
