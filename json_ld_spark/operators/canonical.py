"""Distributed blank-node canonicalization over the corpus triple table.

DataFrame-native color refinement — the distributed twin of
json_ld_spark.canonicalize (per-doc, in-UDF). Each round:

  quads ⨝ labels (subj) ⨝ labels (obj) ⨝ labels (graph) ⨝ labels (pred)
  → per-bnode signature rows → groupBy(bnode) sha2 of sorted signatures

All shuffles key on the bnode label; `rounds` is small (default 3).
The label table holds one row per distinct bnode — small relative to
the quad table but PROPORTIONAL to corpus bnode count, so the joins
carry no forced broadcast hint: AQE broadcasts them when they fit and
falls back to shuffle joins when they don't (a hard `broadcast()` here
would force an attempt past driver/broadcast limits at 100 TB).
Cross-checked against the sequential version in tests.

Blank predicates (generalized RDF) participate fully: they join the
bnode set, get signature rows, and are relabeled — matching
json_ld_spark.canonicalize's treatment.

Contract note: with fixed `rounds`, labels are DETERMINISTIC and unique
(collision-disambiguated) — sufficient for corpus-level canonical ids —
but only structures of diameter <= rounds are fully separated by
structure alone; isomorphism-oracle comparisons (golden scoring) use
json_ld_spark.canonicalize, which refines to partition stability and
breaks automorphic orbits by marking. Raise `rounds` toward the max
bnode-graph diameter (e.g. the longest @list) when label-stability
across relabeled inputs matters at corpus level.

Replaces the reference's sequential relabel generator
(crates/core/src/document/expanded.rs:99-115) with the hash-based
canonical identifiers sanctioned by BASELINE.json's north_star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _is_bnode(c):
    return c.isNotNull() & c.startswith("_:")


def canonicalize_bnodes_df(
    triples: DataFrame, rounds: int = 3, prefix: str = "c"
) -> DataFrame:
    """Returns the triple DataFrame with every blank label replaced by a
    deterministic content-hash label (collision-disambiguated)."""
    t = triples
    bnodes = (
        t.select(F.col("subj").alias("b"))
        .where(_is_bnode(F.col("subj")))
        .unionByName(
            t.select(F.col("obj").alias("b")).where(
                (F.col("obj_kind") == "bnode") & _is_bnode(F.col("obj"))
            )
        )
        .unionByName(
            t.select(F.col("graph").alias("b")).where(_is_bnode(F.col("graph")))
        )
        .unionByName(
            t.select(F.col("pred").alias("b")).where(_is_bnode(F.col("pred")))
        )
        .distinct()
    )
    labels = bnodes.select("b", F.lit("").alias("h"))

    # signatures are computed over the quad SET (RDF dataset semantics):
    # duplicate emission rows (@list objects bypass the node-map
    # uniqueness check) must not perturb refinement — mirrors the
    # dict.fromkeys dedup in json_ld_spark.canonicalize
    base = t.select(
        "graph", "subj", "pred", "obj_kind", "obj",
        F.coalesce("datatype", F.lit("~")).alias("dt"),
        F.coalesce("lang", F.lit("~")).alias("lg"),
    ).dropDuplicates()

    for _ in range(rounds):
        lab_s = labels.select(F.col("b").alias("subj"), F.col("h").alias("h_subj"))
        lab_o = labels.select(F.col("b").alias("obj"), F.col("h").alias("h_obj"))
        lab_g = labels.select(F.col("b").alias("graph"), F.col("h").alias("h_graph"))
        lab_p = labels.select(F.col("b").alias("pred"), F.col("h").alias("h_pred"))
        # no broadcast hint: label table ∝ bnode count; AQE picks the
        # join strategy by actual size
        j = (
            base.join(lab_s, "subj", "left")
            .join(lab_o, "obj", "left")
            .join(lab_g, "graph", "left")
            .join(lab_p, "pred", "left")
        )
        # per-position signatures: self marker vs neighbor hash
        g_term = F.when(
            _is_bnode(F.col("graph")), F.coalesce("h_graph", F.lit("_:other"))
        ).otherwise(F.coalesce(F.col("graph"), F.lit("~")))
        s_term = F.when(
            _is_bnode(F.col("subj")), F.coalesce("h_subj", F.lit("_:other"))
        ).otherwise(F.col("subj"))
        o_term = F.when(
            (F.col("obj_kind") == "bnode") & _is_bnode(F.col("obj")),
            F.coalesce("h_obj", F.lit("_:other")),
        ).otherwise(F.col("obj"))
        p_term = F.when(
            _is_bnode(F.col("pred")), F.coalesce("h_pred", F.lit("_:other"))
        ).otherwise(F.col("pred"))

        def sig(self_col: str):
            # every occurrence of the self label (any position) → "_:self",
            # matching json_ld_spark.canonicalize._quad_signature
            self_val = F.col(self_col)
            g_rep = F.when(
                F.col("graph").isNotNull() & (F.col("graph") == self_val),
                F.lit("_:self"),
            ).otherwise(g_term)
            s_rep = F.when(F.col("subj") == self_val, F.lit("_:self")).otherwise(s_term)
            o_rep = F.when(
                (F.col("obj_kind") == "bnode") & (F.col("obj") == self_val),
                F.lit("_:self"),
            ).otherwise(o_term)
            p_rep = F.when(F.col("pred") == self_val, F.lit("_:self")).otherwise(
                p_term
            )
            return F.concat_ws(
                "|", g_rep, s_rep, p_rep, F.col("obj_kind"),
                o_rep, F.col("dt"), F.col("lg"),
            )

        sig_rows = None
        for col, guard in (
            ("subj", _is_bnode(F.col("subj"))),
            ("obj", (F.col("obj_kind") == "bnode") & _is_bnode(F.col("obj"))),
            ("graph", _is_bnode(F.col("graph"))),
            ("pred", _is_bnode(F.col("pred"))),
        ):
            part = j.where(guard).select(F.col(col).alias("b"), sig(col).alias("sig"))
            sig_rows = part if sig_rows is None else sig_rows.unionByName(part)

        new_labels = (
            sig_rows.groupBy("b")
            .agg(
                F.sha2(
                    F.concat_ws("", F.array_sort(F.collect_list("sig"))), 256
                ).alias("agg_sig")
            )
            .join(labels, "b")
            .select(
                "b",
                F.sha2(F.concat_ws("", "agg_sig", "h"), 256).alias("h"),
                "agg_sig",
            )
        )
        # materialize each round: labels feed three joins in the next
        # round, so an unbroken lineage grows ~3^rounds and chokes the
        # optimizer; localCheckpoint truncates it (same trick iterative
        # GraphX/connected-components jobs use)
        new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels.select("b", "h")
        final_sigs = new_labels

    # disambiguate identical hashes deterministically
    from pyspark.sql.window import Window

    w = Window.partitionBy("h").orderBy("agg_sig", "b")
    counts = Window.partitionBy("h")
    final = (
        final_sigs.withColumn("rk", F.row_number().over(w) - 1)
        .withColumn("n", F.count(F.lit(1)).over(counts))
        .select(
            "b",
            F.concat(
                F.lit("_:" + prefix),
                F.substring("h", 1, 16),
                F.when(F.col("n") > 1, F.concat(F.lit("-"), F.col("rk"))).otherwise(
                    F.lit("")
                ),
            ).alias("canon"),
        )
    )

    m_s = final.select(F.col("b").alias("subj"), F.col("canon").alias("c_subj"))
    m_o = final.select(F.col("b").alias("obj"), F.col("canon").alias("c_obj"))
    m_g = final.select(F.col("b").alias("graph"), F.col("canon").alias("c_graph"))
    m_p = final.select(F.col("b").alias("pred"), F.col("canon").alias("c_pred"))
    out = (
        t.join(m_s, "subj", "left")
        .join(m_o, "obj", "left")
        .join(m_g, "graph", "left")
        .join(m_p, "pred", "left")
        .select(
            F.coalesce("c_graph", "graph").alias("graph"),
            F.coalesce("c_subj", "subj").alias("subj"),
            F.coalesce("c_pred", "pred").alias("pred"),
            "obj_kind",
            F.when(
                (F.col("obj_kind") == "bnode") & F.col("c_obj").isNotNull(),
                F.col("c_obj"),
            )
            .otherwise(F.col("obj"))
            .alias("obj"),
            "datatype",
            "lang",
            *[c for c in t.columns if c not in (
                "graph", "subj", "pred", "obj_kind", "obj", "datatype", "lang"
            )],
        )
    )
    return out
