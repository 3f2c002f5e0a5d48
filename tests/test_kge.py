"""TransE link-prediction ranking (operators/kge.py).

Protocol: Bordes et al. NeurIPS'13 filtered ranking — rank of the
true tail among all entity corruptions, known true triples skipped.
Embeddings are integer-lattice hash embeddings, so every distance and
rank is an exact integer (partition- and engine-invariant).
"""

import pytest
from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _brute_ranks(rows, dim=16, test_mod=1, salt="kge", filtered=True):
    """Driver-side reference: same hash embeddings via hashlib."""
    import hashlib

    def bridge(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def emb(term, tag):
        return [bridge(f"{salt}|{tag}|{term}|{i}") % 2001 - 1000
                for i in range(dim)]

    pos = sorted(set(rows))
    ents = sorted({s for s, _, _ in pos} | {o for _, _, o in pos})
    out = {}
    for s, p, o in pos:
        if bridge(f"{salt}|test|{s}|{p}|{o}") % test_mod != 0:
            continue
        q = [a + b for a, b in zip(emb(s, "E"), emb(p, "R"))]

        def d(e):
            return sum(abs(a - b) for a, b in zip(q, emb(e, "E")))

        true_d = d(o)
        known = {oo for ss, pp, oo in pos if ss == s and pp == p} - {o}
        rank = 1
        for e in ents:
            if e == o or (filtered and e in known):
                continue
            de = d(e)
            if de < true_d or (de == true_d and e < o):
                rank += 1
        out[(s, p, o)] = rank
    return out


def test_transe_rank_matches_brute_force(spark):
    """Every rank matches a driver-side recomputation on a small graph
    with multi-tail (s, p) groups exercising the filtered skip."""
    from json_ld_spark.operators.kge import transe_rank

    rows = [(f"n{i}", f"r{i % 2}", f"n{(i * 3 + 1) % 7}") for i in range(12)]
    rows += [("n0", "r0", f"n{j}") for j in (2, 3, 4)]  # multi-tail group
    got = {
        (r.subj, r.pred, r.obj): r.rank
        for r in transe_rank(_edges(spark, rows), dim=16, test_mod=1).collect()
    }
    assert got == _brute_ranks(rows)


def test_transe_rank_unfiltered_vs_filtered(spark):
    """filtered=False ranks are >= filtered ranks (known true tails
    re-enter the candidate list) and match the brute force."""
    from json_ld_spark.operators.kge import transe_rank

    rows = [("a", "p", x) for x in ("b", "c", "d", "e")] + [
        ("b", "p", "c"), ("c", "q", "a")]
    edges = _edges(spark, rows)
    filt = {(r.subj, r.pred, r.obj): r.rank
            for r in transe_rank(edges, test_mod=1).collect()}
    unf = {(r.subj, r.pred, r.obj): r.rank
           for r in transe_rank(edges, test_mod=1, filtered=False).collect()}
    assert unf == _brute_ranks(rows, filtered=False)
    assert set(filt) == set(unf)
    assert all(unf[k] >= filt[k] for k in filt)
    assert any(unf[k] > filt[k] for k in filt)  # the a/p group must differ


def test_transe_rank_partition_invariant(spark):
    """Ranks are a pure function of the edge SET: repartitioning and
    duplicating input rows changes nothing."""
    from json_ld_spark.operators.kge import transe_rank

    rows = [(f"s{i % 5}", "r", f"o{i % 7}") for i in range(30)]
    e1 = _edges(spark, rows)
    e2 = _edges(spark, rows + rows).repartition(13)
    r1 = sorted(map(tuple, transe_rank(e1, test_mod=1).collect()))
    r2 = sorted(map(tuple, transe_rank(e2, test_mod=1).collect()))
    assert r1 == r2 and len(r1) > 0


def test_transe_rank_bounds_and_mrr(spark, sf_dir):
    """On the transcript KG sample: ranks are in [1, |entities|], the
    test set is the documented hash sample, and MRR/Hits@k derive by
    one aggregation."""
    from json_ld_spark.operators.kge import transe_rank
    from json_ld_spark.operators.native import (
        transcript_adjacency_native,
        transcript_triples_native,
    )
    from json_ld_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, sf_dir)
    edges = (
        transcript_triples_native(t)
        .filter(F.col("obj_kind") == "iri")
        .select("subj", "pred", "obj")
        .unionByName(
            transcript_adjacency_native(t, with_doc_id=False)
            .select("subj", "pred", "obj")
        )
    )
    n_ents = (
        edges.select(F.col("subj").alias("e"))
        .unionByName(edges.select(F.col("obj").alias("e")))
        .distinct().count()
    )
    ranks = transe_rank(edges, dim=16, test_mod=97)
    agg = ranks.agg(
        F.count("*").alias("n"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
        F.avg(1.0 / F.col("rank")).alias("mrr"),
        F.avg((F.col("rank") <= 10).cast("double")).alias("hits10"),
    ).collect()[0]
    assert agg.n > 0
    assert 1 <= agg.lo and agg.hi <= n_ents
    assert 0.0 < agg.mrr <= 1.0 and 0.0 <= agg.hits10 <= 1.0
