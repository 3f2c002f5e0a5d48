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


def test_materialize_kg_bucketed_publish_end_to_end(spark, tmp_path):
    """materialize_kg(bucketed_table=...) publishes the triple table
    subj-bucketed; the node merge over it plans with ZERO Exchange and
    a subj point-lookup prunes buckets (SelectedBucketsCount). This is
    the end-to-end pay-the-shuffle-once evidence (PLANS.md §25)."""
    from json_ld_spark.operators.jsonld import node_table
    from json_ld_spark.plans.kg import materialize_kg
    from json_ld_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    res = materialize_kg(
        t, str(tmp_path / "kg"), n_buckets=4,
        bucketed_table="t_kg_bucketed_e2e",
    )
    assert res["bucketed_table"] == "t_kg_bucketed_e2e"
    bt = spark.table("t_kg_bucketed_e2e")

    # (graph, subj) node merge: HashPartitioning(subj) from the bucketed
    # scan satisfies the ClusteredDistribution -> no shuffle at query time
    nodes = node_table(bt)
    plan = nodes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan

    # point lookup on the bucket key prunes to 1 of 4 buckets. Spark's
    # autoBucketedScan reverts a bare filter scan to a regular scan (no
    # exchange to save), hiding the pruning — pin the bucketed scan on
    # for the probe, as a bucket-pruned reader would.
    one_subj = bt.select("subj").first()[0]
    auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old_auto = spark.conf.get(auto)
    spark.conf.set(auto, "false")
    try:
        probe = bt.filter(F.col("subj") == one_subj)
        pplan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 4" in pplan
    finally:
        spark.conf.set(auto, old_auto)

    # BGP star join over the bucketed table: three subj-keyed pattern
    # scans join with zero Exchange even with broadcast disabled (the
    # join-side complement to the aggregation evidence above)
    from json_ld_spark.operators.bgp import bgp_query

    V = "https://example.org/transcript#"
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        star = bgp_query(bt, [
            ("?turn", V + "role", "assistant"),
            ("?turn", V + "conversation", "?conv"),
            ("?turn", V + "turnIndex", "?idx"),
        ])
        splan = star._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in splan
        assert star.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)

    # and the bucketed node table equals the direct-pipeline node table
    from json_ld_spark.operators.jsonld import dedup_triples
    from json_ld_spark.operators.native import transcript_triples_native

    direct = node_table(
        dedup_triples(transcript_triples_native(t))
    ).orderBy("graph", "node_id").collect()
    viabt = nodes.orderBy("graph", "node_id").collect()
    assert viabt == direct

    # resume path (nothing new to process) still refreshes the table
    n_before = bt.count()
    res2 = materialize_kg(
        t, str(tmp_path / "kg"), n_buckets=4,
        bucketed_table="t_kg_bucketed_e2e",
    )
    assert res2["run_id"] is None
    assert res2["bucketed_table"] == "t_kg_bucketed_e2e"
    assert spark.table("t_kg_bucketed_e2e").count() == n_before
