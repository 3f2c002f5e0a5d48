"""Deterministic splits/sampling (operators/sampling.py) and lexical
retrieval (operators/retrieval.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from json_ld_spark.operators import retrieval, sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc {i} " + " ".join(f"w{j}" for j in range(i % 5 + 1)), ["en", "de", "fr"][i % 3])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"]).cache()
    df.count()
    return df


# ---------------------------------------------------------------------------
# hash_split
# ---------------------------------------------------------------------------


def test_hash_split_partitions_everything(docs):
    out = sampling.hash_split(docs, "doc_id").cache()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == 300
    # 80/10/10 within generous tolerance on 300 keys
    assert counts["train"] > 200
    assert 10 <= counts.get("val", 0) <= 70
    assert 10 <= counts.get("test", 0) <= 70


def test_hash_split_invariant_to_partitioning(docs):
    a = sampling.hash_split(docs, "doc_id").select("doc_id", "split")
    b = sampling.hash_split(docs.repartition(7), "doc_id").select("doc_id", "split")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_hash_split_seed_changes_assignment(docs):
    a = dict(map(tuple, sampling.hash_split(docs, "doc_id").select("doc_id", "split").collect()))
    b = dict(map(tuple, sampling.hash_split(docs, "doc_id", seed="fold2").select("doc_id", "split").collect()))
    assert a != b  # independent folds


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        sampling.hash_split(docs, "doc_id", weights={"a": 0.0})
    with pytest.raises(ValueError):
        sampling.hash_split(docs, "doc_id", weights={"a": -1.0, "b": 2.0})


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def test_stratified_sample_drops_unlisted_strata(docs):
    out = sampling.stratified_sample(docs, "doc_id", "lang", {"en": 0.5})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.filter("lang = 'en'").count()
    assert 0 < out.count() < n_en


def test_stratified_sample_monotone_in_fraction(docs):
    small = {r["doc_id"] for r in sampling.stratified_sample(docs, "doc_id", "lang", 0.2).collect()}
    large = {r["doc_id"] for r in sampling.stratified_sample(docs, "doc_id", "lang", 0.6).collect()}
    assert small <= large  # hash thresholding grows monotonically


# ---------------------------------------------------------------------------
# sample_per_key
# ---------------------------------------------------------------------------


def test_sample_per_key_exact_counts(docs):
    out = sampling.sample_per_key(docs, ["lang"], "doc_id", 7)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 7, "de": 7, "fr": 7}


def test_sample_per_key_order_invariant(docs):
    a = sampling.sample_per_key(docs, ["lang"], "doc_id", 5).select("doc_id")
    b = sampling.sample_per_key(
        docs.orderBy("text").repartition(11), ["lang"], "doc_id", 5
    ).select("doc_id")
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_sample_per_key_caps_at_group_size(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["id", "k"])
    out = sampling.sample_per_key(df, ["k"], "id", 10)
    assert out.count() == 3


# ---------------------------------------------------------------------------
# tfidf / bm25 vs a pure-Python reference
# ---------------------------------------------------------------------------

CORPUS = [
    (0, "spark shuffle join shuffle"),
    (1, "spark broadcast join"),
    (2, "duck db oracle oracle oracle"),
    (3, "join order and shuffle order"),
    (4, "tiny doc"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"]).cache()
    df.count()
    return df


def _py_tf():
    tf = {}
    for i, text in CORPUS:
        for w in text.lower().split():
            tf[(i, w)] = tf.get((i, w), 0) + 1
    return tf


def test_term_freqs(corpus):
    got = {(r["doc_id"], r["term"]): r["tf"] for r in retrieval.term_freqs(corpus).collect()}
    assert got == _py_tf()


def test_tfidf_matches_reference(corpus):
    tf = _py_tf()
    n = len(CORPUS)
    dfreq = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    got = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in retrieval.tfidf(corpus).collect()
    }
    assert set(got) == set(tf)
    for (i, w), v in got.items():
        exp = (1 + math.log(tf[(i, w)])) * math.log((n + 1) / (dfreq[w] + 1))
        assert abs(v - exp) < 1e-9, (i, w)


def _py_bm25(query, k1=1.2, b=0.75):
    tf = _py_tf()
    n = len(CORPUS)
    dls = {i: len(t.split()) for i, t in CORPUS}
    avgdl = sum(dls.values()) / n
    dfreq = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    scores = {}
    hits = {}
    for q in query:
        if q not in dfreq:
            continue
        idf = math.log(1 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
        for i, _ in CORPUS:
            t = tf.get((i, q))
            if not t:
                continue
            denom = t + k1 * (1 - b + b * dls[i] / avgdl)
            scores[i] = scores.get(i, 0.0) + idf * t * (k1 + 1) / denom
            hits[i] = hits.get(i, 0) + 1
    return {i: (round(s, 6), hits[i]) for i, s in scores.items()}


def test_bm25_matches_reference(corpus):
    query = ["shuffle", "join", "oracle"]
    got = {
        r["doc_id"]: (r["score"], r["n_hit"])
        for r in retrieval.bm25(corpus, query).collect()
    }
    exp = _py_bm25(query)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][1] == exp[i][1]
        assert abs(got[i][0] - exp[i][0]) < 2e-6


def test_bm25_topk_deterministic_page(corpus):
    out = retrieval.bm25(corpus, ["shuffle", "join", "oracle"], top_k=2)
    rows = [(r["doc_id"], r["score"]) for r in out.collect()]
    exp = sorted(_py_bm25(["shuffle", "join", "oracle"]).items(), key=lambda kv: (-kv[1][0], kv[0]))[:2]
    assert [i for i, _ in rows] == [i for i, _ in exp]


def test_bm25_empty_query_rejected(corpus):
    with pytest.raises(ValueError, match="empty query"):
        retrieval.bm25(corpus, ["  "])


# ---------------------------------------------------------------------------
# pack_documents
# ---------------------------------------------------------------------------


def test_pack_documents_contiguous_fill(spark):
    rows = [(i, t) for i, t in enumerate([400, 400, 300, 900, 100, 1200, 50])]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = {r["doc_id"]: r["pack_id"]
           for r in sampling.pack_documents(df, "n_tok", budget=1000,
                                            order_col="doc_id").collect()}
    # cum-before: 0,400,800,1100,2000,2100,3300 -> //1000: 0,0,0,1,2,2,3
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 2, 6: 3}


def test_pack_documents_oversized_doc_isolated(spark):
    df = spark.createDataFrame(
        [(0, 100), (1, 5000), (2, 100)], ["doc_id", "n_tok"])
    out = sampling.pack_documents(df, "n_tok", budget=1000, order_col="doc_id")
    packs = {r["doc_id"]: r["pack_id"] for r in out.collect()}
    # the 5000-token doc occupies its own pack; the next doc starts fresh
    assert packs[0] != packs[1] or packs[0] == 0
    assert packs[1] != packs[2]


def test_pack_documents_sharded_matches_global_per_shard(spark):
    rows = [(i, ["a", "b"][i % 2], 300) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tok"])
    sharded = sampling.pack_documents(
        df, "n_tok", budget=1000, order_col="doc_id", shard_col="shard")
    for s in ("a", "b"):
        sub = {r["doc_id"]: r["pack_id"]
               for r in sharded.filter(f"shard = '{s}'").collect()}
        solo = {r["doc_id"]: r["pack_id"]
                for r in sampling.pack_documents(
                    df.filter(f"shard = '{s}'"), "n_tok", budget=1000,
                    order_col="doc_id").collect()}
        assert sub == solo


def test_pack_documents_rejects_bad_budget(spark):
    df = spark.createDataFrame([(0, 1)], ["doc_id", "n_tok"])
    with pytest.raises(ValueError):
        sampling.pack_documents(df, "n_tok", budget=0)


def test_pack_documents_fuzz_vs_cumsum(spark):
    import random

    rnd = random.Random(11)
    for trial in range(5):
        toks = [rnd.randrange(1, 900) for _ in range(rnd.randrange(3, 40))]
        budget = rnd.randrange(500, 2500)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(toks)], ["doc_id", "n_tok"])
        got = {r["doc_id"]: r["pack_id"]
               for r in sampling.pack_documents(
                   df, "n_tok", budget=budget, order_col="doc_id").collect()}
        cum = 0
        for i, t in enumerate(toks):
            assert got[i] == cum // budget, (trial, i)
            cum += t


def test_leakage_safe_split_keeps_clusters_together(spark):
    # clusters: {1,2,3} (chain), {4,5}; singletons 6..40
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 41)], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], ["doc_a", "doc_b"]
    )
    out = sampling.leakage_safe_split(docs, pairs).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 40
    # cluster members share group and split
    assert by_id[1].dup_group == by_id[2].dup_group == by_id[3].dup_group == 1
    assert by_id[4].dup_group == by_id[5].dup_group == 4
    assert by_id[1].split == by_id[2].split == by_id[3].split
    assert by_id[4].split == by_id[5].split
    # singleton group = own id, and split matches a plain hash_split of
    # the group key (same seed) — determinism across the composition
    plain = {
        r.doc_id: r.split
        for r in sampling.hash_split(docs, "doc_id").collect()
    }
    for i in range(6, 41):
        assert by_id[i].dup_group == i
        assert by_id[i].split == plain[i]


def test_leakage_safe_split_no_pairs(spark):
    docs = spark.createDataFrame([(i,) for i in range(5)], ["doc_id"])
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = sampling.leakage_safe_split(docs, pairs).collect()
    assert {r.doc_id: r.dup_group for r in out} == {i: i for i in range(5)}


# --------------------------------------------------------------------------
# dense_index / negative_triples
# --------------------------------------------------------------------------

import hashlib
import random as _random


def test_dense_index_matches_sorted_enumeration(spark):
    rnd = _random.Random(17)
    ents = list({f"e{rnd.randrange(10_000):05d}" for _ in range(500)})
    df = spark.createDataFrame([(e,) for e in ents + ents[:50]], ["entity"])
    idx_df, n = sampling.dense_index(df)
    got = {r.entity: r.idx for r in idx_df.collect()}
    want = {e: i for i, e in enumerate(sorted(set(ents)))}
    assert n == len(want)
    assert got == want


def _md5_mod(payload: str, n: int) -> int:
    return int(hashlib.md5(payload.encode()).hexdigest()[:8], 16) % n


def _py_negatives(pos, k, seed, corrupt="obj", filtered=True):
    ents = sorted({s for (s, _, _) in pos} | {o for (_, _, o) in pos})
    n = len(ents)
    truth = set(pos)
    out = set()
    for (s, p, o) in pos:
        for i in range(k):
            if corrupt == "both":
                side = ("obj" if _md5_mod(f"{seed}|side:{s}:{p}:{o}:{i}", 2) == 0
                        else "subj")
            else:
                side = corrupt
            neg = ents[_md5_mod(f"{seed}:{s}:{p}:{o}:{i}:{side}", n)]
            cs, co = (neg, o) if side == "subj" else (s, neg)
            if filtered and (cs, p, co) in truth:
                continue
            out.add((s, p, o, i, side, neg))
    return out


def _pos_df(spark, pos):
    return spark.createDataFrame(
        [(None, s, p, "iri", o, None, None) for (s, p, o) in pos],
        "graph string, subj string, pred string, obj_kind string, "
        "obj string, datatype string, lang string",
    )


def test_negative_triples_md5_matches_python_replay(spark):
    rnd = _random.Random(3)
    nodes = [f"n{i}" for i in range(12)]
    preds = ["p", "q"]
    pos = {(rnd.choice(nodes), rnd.choice(preds), rnd.choice(nodes))
           for _ in range(30)}
    for corrupt in ("obj", "subj", "both"):
        got = {tuple(r) for r in sampling.negative_triples(
            _pos_df(spark, pos), k=3, corrupt=corrupt, seed="ns",
            hash_fn="md5").collect()}
        assert got == _py_negatives(sorted(pos), 3, "ns", corrupt)


def test_negative_triples_filtered_removes_truths(spark):
    # dense graph over 3 nodes: most corruptions ARE true triples
    nodes = ["a", "b", "c"]
    pos = [(s, "r", o) for s in nodes for o in nodes]
    df = _pos_df(spark, pos)
    unfiltered = sampling.negative_triples(
        df, k=4, seed="f", hash_fn="md5", filtered=False)
    filtered = sampling.negative_triples(
        df, k=4, seed="f", hash_fn="md5", filtered=True)
    assert filtered.count() == 0          # every corruption is a truth
    assert unfiltered.count() == 9 * 4    # nothing dropped


def test_negative_triples_deterministic_xxhash(spark):
    pos = [(f"s{i}", "p", f"o{i % 4}") for i in range(20)]
    df = _pos_df(spark, pos)
    a = {tuple(r) for r in sampling.negative_triples(df, k=2, seed="d").collect()}
    b = {tuple(r) for r in sampling.negative_triples(df, k=2, seed="d").collect()}
    assert a == b and len(a) > 0
    # literal-object triples are not corruption candidates
    lit = spark.createDataFrame(
        [(None, "s", "p", "literal", "v", None, None)],
        "graph string, subj string, pred string, obj_kind string, "
        "obj string, datatype string, lang string",
    )
    with pytest.raises(ValueError):
        sampling.negative_triples(lit, k=1)


def test_weighted_sample_python_replay_and_monotonicity(spark):
    rows = [(i, ((i * 37) % 100) / 100.0) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "rate"])

    def u(i, seed="s"):
        return int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8],
                   16) / 2**32

    got = {r.doc_id for r in
           sampling.weighted_sample(df, "rate", seed="s").collect()}
    want = {i for (i, rt) in rows if u(i) < rt}
    assert got == want
    assert 0 < len(got) < 400
    # monotone: doubling every rate only ADDS rows
    df2 = df.withColumn("rate", F.least(F.col("rate") * 2, F.lit(1.0)))
    got2 = {r.doc_id for r in
            sampling.weighted_sample(df2, "rate", seed="s").collect()}
    assert got <= got2
    # rate 0 keeps nothing; rate 1 keeps everything
    assert sampling.weighted_sample(
        df.withColumn("rate", F.lit(0.0)), "rate").count() == 0
    assert sampling.weighted_sample(
        df.withColumn("rate", F.lit(1.0)), "rate").count() == 400


def test_temperature_mix_python_replay_and_budget(spark):
    """alpha-mix replay: per-group epochs from exact integer counts,
    per-row draws via the md5 bridge; alpha=1 is identity-in-
    expectation (every epoch rate is exactly 1.0 -> output == input);
    alpha=0.5 lifts the tail group above 1 epoch; corpus-shaped group
    columns fail loudly."""
    import hashlib
    import math

    import pytest as _pytest

    from json_ld_spark.operators.sampling import temperature_mix

    rows = [(i, "big" if i < 90 else "small", f"t{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    # alpha=1: w_g = n_g/N, epochs = 1.0 exactly -> identity (plus epoch=0)
    out1 = temperature_mix(df, "source", alpha=1.0, seed="tm")
    assert sorted(r.doc_id for r in out1.collect()) == list(range(100))
    assert {r.epoch for r in out1.collect()} == {0}

    # alpha=0.5 replay
    got = sorted((r.doc_id, r.epoch)
                 for r in temperature_mix(df, "source", alpha=0.5,
                                          seed="tm").collect())
    counts = {"big": 90, "small": 10}
    total = 100
    p = {g: math.floor(math.sqrt(n) * 1_000_000) for g, n in counts.items()}
    s = sum(p.values())
    expect = []
    for i, g, _ in rows:
        e = (p[g] * total) / (s * counts[g])
        u = int(hashlib.md5(f"tm|{i}".encode()).hexdigest()[:8], 16) / 2**32
        n_copies = math.floor(e) + (1 if u < e - math.floor(e) else 0)
        expect += [(i, k) for k in range(n_copies)]
    assert got == sorted(expect)
    # the tail group repeats (epochs > 1 -> some epoch=1 copies)
    assert any(ep == 1 for d, ep in got if d >= 90)
    # total stays ~budget (= corpus size)
    assert abs(len(got) - total) <= 15

    with _pytest.raises(ValueError, match="max_groups"):
        temperature_mix(df, "doc_id", alpha=0.5, max_groups=10)


def test_textrank_matches_python_reference(spark):
    """TextRank ranks vs a direct Python replay of the weighted
    power iteration on the same co-occurrence graph."""
    from json_ld_spark.operators.retrieval import (
        TEXTRANK_STOPWORDS,
        textrank_keywords,
    )

    docs = [
        (1, "spark shuffle join spark shuffle aggregation"),
        (2, "spark shuffle partition skew salting"),
        (3, "graph pagerank power iteration graph"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["word"]: r["rank_r"] for r in textrank_keywords(df, window=2, iters=4, k=50).collect()}

    # python replay
    import re
    from collections import defaultdict

    pairs = defaultdict(int)
    for _, text in docs:
        toks = [
            (i, w)
            for i, w in enumerate(text.lower().strip().split())
            if re.fullmatch("[a-z]+", w) and len(w) >= 3 and w not in TEXTRANK_STOPWORDS
        ]
        bypos = dict(toks)
        for i, w in toks:
            for off in (1, 2):
                w2 = bypos.get(i + off)
                if w2 is not None and w2 != w:
                    pairs[(min(w, w2), max(w, w2))] += 1
    edges = defaultdict(dict)
    for (a, b), w in pairs.items():
        edges[a][b] = edges[a].get(b, 0) + w
        edges[b][a] = edges[b].get(a, 0) + w
    nodes = sorted(edges)
    n = len(nodes)
    wdeg = {u: sum(edges[u].values()) for u in nodes}
    rank = {u: 1.0 / n for u in nodes}
    base = (1.0 - 0.85) / n
    for _ in range(4):
        inflow = {u: 0.0 for u in nodes}
        for u in nodes:
            for v, w in edges[u].items():
                inflow[v] += rank[u] * (w / wdeg[u])
        rank = {u: base + 0.85 * inflow[u] for u in nodes}
    assert set(got) == set(nodes)
    for u in nodes:
        assert abs(got[u] - round(rank[u], 6)) < 2e-6, u
    # the repeated hub word outranks a leaf word
    assert got["shuffle"] > got["salting"]


def test_textrank_empty_and_topk(spark):
    from json_ld_spark.operators.retrieval import textrank_keywords

    empty = spark.createDataFrame([(1, "the and for")], "doc_id long, text string")
    assert textrank_keywords(empty).count() == 0
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    assert textrank_keywords(df, k=3).count() == 3


def test_weighted_topk_sample_es_properties(spark):
    """ES keys: exact size k, weight<=0 excluded, deterministic across
    partitionings, and heavier rows win in aggregate (statistical
    sanity over the fixed hash draws)."""
    from json_ld_spark.operators.sampling import weighted_topk_sample

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(500)] + [(999, 0.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_topk_sample(df, k=60, weight_col="w", seed="t")
    got = [r["doc_id"] for r in out.collect()]
    assert len(got) == 60 and 999 not in got
    heavy = sum(1 for i in got if i < 50)
    assert heavy >= 40  # 50 heavy rows at 100x weight dominate the top-60
    got2 = [r["doc_id"] for r in weighted_topk_sample(
        df.repartition(13), k=60, weight_col="w", seed="t").collect()]
    assert sorted(got) == sorted(got2)
    # different seed -> different draw
    got3 = [r["doc_id"] for r in weighted_topk_sample(
        df, k=60, weight_col="w", seed="u").collect()]
    assert sorted(got) != sorted(got3)


def test_weighted_topk_plan_is_take_ordered(spark):
    from json_ld_spark.operators.sampling import weighted_topk_sample

    df = spark.range(1000).selectExpr("id AS doc_id", "1.0 + id % 7 AS w")
    plan = (
        weighted_topk_sample(df, k=10, weight_col="w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_epoch_order_is_permutation_and_epoch_independent(spark):
    from json_ld_spark.operators.sampling import epoch_order

    df = spark.range(500).selectExpr("id AS doc_id")
    e0 = {r["doc_id"]: r["epoch_rank"] for r in epoch_order(df, 0).collect()}
    e1 = {r["doc_id"]: r["epoch_rank"] for r in epoch_order(df, 1).collect()}
    assert sorted(e0.values()) == list(range(500))  # dense permutation
    assert e0 != e1  # epochs reshuffle
    # deterministic across partitionings
    e0b = {r["doc_id"]: r["epoch_rank"]
           for r in epoch_order(df.repartition(7), 0).collect()}
    assert e0 == e0b


# ---------------------------------------------------------------------------
# round-robin group interleave (round 5)
# ---------------------------------------------------------------------------

def test_interleave_groups_round_robin(spark):
    from json_ld_spark.operators.sampling import interleave_groups

    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = interleave_groups(df, "lang", "doc_id", seed="s").collect()
    by_pos = [r["lang"] for r in sorted(out, key=lambda r: r["interleave_pos"])]
    # equal-size groups: every cycle of 3 visits all three languages
    for c in range(10):
        assert set(by_pos[3 * c:3 * c + 3]) == {"en", "fr", "de"}
    # positions injective, grp_rank dense per group
    poss = [r["interleave_pos"] for r in out]
    assert len(set(poss)) == len(poss)
    for lang in ("en", "fr", "de"):
        ranks = sorted(r["grp_rank"] for r in out if r["lang"] == lang)
        assert ranks == list(range(10))
    # deterministic
    again = interleave_groups(df, "lang", "doc_id", seed="s").collect()
    assert sorted((r["doc_id"], r["interleave_pos"]) for r in again) == \
        sorted((r["doc_id"], r["interleave_pos"]) for r in out)
    # a different seed permutes within groups
    other = interleave_groups(df, "lang", "doc_id", seed="t").collect()
    assert sorted((r["doc_id"], r["interleave_pos"]) for r in other) != \
        sorted((r["doc_id"], r["interleave_pos"]) for r in out)


def test_interleave_groups_skewed_and_guard(spark):
    import pytest

    from json_ld_spark.operators.sampling import interleave_groups

    rows = [(i, "big" if i < 8 else "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sorted(
        interleave_groups(df, "lang", "doc_id").collect(),
        key=lambda r: r["interleave_pos"],
    )
    # while both groups last, they alternate; then 'big' continues alone
    assert {out[0]["lang"], out[1]["lang"]} == {"big", "small"}
    assert [r["lang"] for r in out[4:]] == ["big"] * 6

    corpus = spark.range(50).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("lang")
    )
    with pytest.raises(ValueError, match="corpus-shaped"):
        interleave_groups(corpus, "lang", "doc_id", max_groups=8)

    empty = spark.createDataFrame([], "doc_id long, lang string")
    assert interleave_groups(empty, "lang", "doc_id").count() == 0


def test_ordered_cumsum_matches_window_and_avoids_global_window(spark):
    """ordered_cumsum == SUM OVER (ORDER BY ...) value-for-value, with
    NO partition-less window in the executed plan (the audit-violation
    shape it exists to replace)."""
    import importlib.util

    from json_ld_spark.operators.sampling import ordered_cumsum

    spec = importlib.util.spec_from_file_location(
        "plan_audit", "/root/repo/scripts/plan_audit.py"
    )
    pa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pa)

    rows = [(i, (i * 37) % 19, (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k long, v long")
    out = ordered_cumsum(df, ["k", "id"], "v", out_col="cum")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert pa.partitionless_windows(plan) == []
    assert pa.single_partition_exchanges(plan) == []

    got = {r["id"]: r["cum"] for r in out.collect()}
    acc, expect = 0, {}
    for i, k, v in sorted(rows, key=lambda r: (r[1], r[0])):
        acc += v
        expect[i] = acc
    assert got == expect

    ex = {
        r["id"]: r["cum"]
        for r in ordered_cumsum(df, ["k", "id"], "v", inclusive=False).collect()
    }
    assert all(ex[i] == expect[i] - dict((r[0], r[2]) for r in rows)[i] for i in ex)

    empty = spark.createDataFrame([], "id long, k long, v long")
    assert ordered_cumsum(empty, ["k"], "v").count() == 0


# ---------------------------------------------------------------------------
# token_budget_select — per-group token-budget mixture executor
# ---------------------------------------------------------------------------

def _py_token_budget(rows, budget, seed="tb"):
    """Exact replica: rows = [(id, group, value)]; returns
    {id: within-group inclusive cum} for the selected prefix."""
    import hashlib

    def key(g, i):
        h = hashlib.md5(f"{seed}|{g}|{i}".encode()).hexdigest()
        return int(h[:15], 16)

    sel = {}
    groups = sorted({g for _, g, _ in rows})
    for g in groups:
        members = sorted(
            [(key(g, i), i, v) for i, gg, v in rows if gg == g]
        )
        cum = 0
        for _, i, v in members:
            if cum >= budget:
                break
            cum += v
            sel[i] = cum
    return sel


def test_token_budget_select_matches_python(spark):
    from json_ld_spark.operators.sampling import token_budget_select

    rows = [(i, ["en", "de", "fr"][i % 3], 10 + (i * 7) % 23) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, nw long")
    out = token_budget_select(df, "lang", "nw", budget=100)
    got = {r["doc_id"]: r["cum_tokens"] for r in out.collect()}
    assert got == _py_token_budget(rows, 100)


def test_token_budget_select_small_group_fully_kept(spark):
    from json_ld_spark.operators.sampling import token_budget_select

    # a group whose total is under budget keeps every row
    rows = [(1, "a", 5), (2, "a", 5), (3, "b", 500), (4, "b", 500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, nw long")
    out = token_budget_select(df, "lang", "nw", budget=100).collect()
    a = [r for r in out if r["lang"] == "a"]
    b = [r for r in out if r["lang"] == "b"]
    assert len(a) == 2            # both kept (total 10 < 100)
    assert len(b) == 1            # first row already straddles
    assert b[0]["cum_tokens"] == 500


def test_token_budget_select_empty_and_plan(spark):
    from json_ld_spark.operators.sampling import token_budget_select

    empty = spark.createDataFrame([], "doc_id long, lang string, nw long")
    assert token_budget_select(empty, "lang", "nw", budget=10).count() == 0

    df = spark.createDataFrame(
        [(i, "en", 1) for i in range(20)], "doc_id long, lang string, nw long"
    )
    plan = (
        token_budget_select(df, "lang", "nw", budget=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the scale contract: no partition-less window (ordered_cumsum's
    # two-phase rank partitions by __pid)
    import re

    for m in re.finditer(r"Window \[(.*?)\]", plan):
        assert "windowspecdefinition" not in m.group(1) or "__pid" in m.group(1) or "lang" in m.group(1)


# ---------------------------------------------------------------------------
# rrf_fuse — reciprocal-rank fusion
# ---------------------------------------------------------------------------

def test_rrf_fuse_hand_case(spark):
    from json_ld_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse([("a", a), ("b", b)], k=60).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 3 appears in both lists
    assert out[3]["rank_a"] == 3 and out[3]["rank_b"] == 1
    assert abs(out[3]["rrf_score"] - round(1 / 63 + 1 / 61, 6)) < 1e-12
    # doc 1 only in a; missing source contributes 0
    assert out[1]["rank_b"] is None
    assert abs(out[1]["rrf_score"] - round(1 / 61, 6)) < 1e-12
    # overlap beats single-source membership
    assert out[3]["rrf_score"] > out[1]["rrf_score"]


def test_rrf_fuse_single_source_and_empty(spark):
    from json_ld_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1)], "doc_id long, rank long")
    out = rrf_fuse([("only", a)]).collect()
    assert len(out) == 1 and abs(out[0]["rrf_score"] - round(1 / 61, 6)) < 1e-12
    e = spark.createDataFrame([], "doc_id long, rank long")
    assert rrf_fuse([("a", e), ("b", e)]).count() == 0


def test_knn_classify_hand_case(spark):
    from json_ld_spark.operators.similarity import knn_classify

    # 2D embeddings: two tight clusters with labels 0 and 1
    pts = [
        (0, [1.0, 0.0], 0), (1, [0.99, 0.1], 0), (2, [0.98, 0.15], 0),
        (3, [0.0, 1.0], 1), (4, [0.1, 0.99], 1), (5, [0.15, 0.98], 1),
    ]
    emb = spark.createDataFrame(
        pts, "vec_id long, embedding array<double>, label int"
    )
    q = emb.filter(F.col("vec_id").isin(0, 3)).select("vec_id", "embedding")
    out = {
        r["query_id"]: r
        for r in knn_classify(
            q, emb.select("vec_id", "embedding"),
            emb.select("vec_id", "label"), k=3,
        ).collect()
    }
    assert out[0]["pred_label"] == 0 and out[3]["pred_label"] == 1
    # leave-one-out: query 0's 3-NN are {1, 2, 3} -> votes 2 for label 0
    assert out[0]["n_votes"] == 2 and out[0]["best_rank"] == 1


def test_knn_classify_tie_goes_to_nearest(spark):
    from json_ld_spark.operators.similarity import knn_classify

    # 2-2 vote split: label of the single NEAREST neighbor must win
    pts = [
        (10, [1.0, 0.0], None),   # query (label unused)
        (1, [0.999, 0.01], 7),    # nearest, label 7
        (2, [0.99, 0.05], 3),
        (3, [0.98, 0.08], 7),
        (4, [0.97, 0.1], 3),
    ]
    emb = spark.createDataFrame(
        pts, "vec_id long, embedding array<double>, label int"
    )
    corpus = emb.filter(F.col("vec_id") != 10)
    q = emb.filter(F.col("vec_id") == 10).select("vec_id", "embedding")
    out = knn_classify(
        q, corpus.select("vec_id", "embedding"),
        corpus.select("vec_id", "label"), k=4,
    ).collect()
    assert len(out) == 1
    assert out[0]["pred_label"] == 7 and out[0]["n_votes"] == 2
    assert out[0]["best_rank"] == 1


def test_knn_classify_empty(spark):
    from json_ld_spark.operators.similarity import knn_classify

    e = spark.createDataFrame([], "vec_id long, embedding array<double>")
    lab = spark.createDataFrame([], "vec_id long, label int")
    assert knn_classify(e, e, lab).count() == 0


def test_token_budget_select_fuzz(spark):
    """Random (group, value) tables vs the exact Python replica — the
    md5 permutation, straddler semantics, and within-group cumsum must
    agree for every group shape (empty, tiny, all-one-group)."""
    from hypothesis import given, settings, strategies as st

    from json_ld_spark.operators.sampling import token_budget_select

    @given(
        st.lists(
            st.tuples(st.sampled_from(["g1", "g2", "g3"]), st.integers(1, 40)),
            min_size=1,
            max_size=40,
        ),
        st.integers(1, 120),
    )
    @settings(max_examples=10, deadline=None)
    def prop(pairs, budget):
        rows = [(i, g, v) for i, (g, v) in enumerate(pairs)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, nw long")
        got = {
            r["doc_id"]: r["cum_tokens"]
            for r in token_budget_select(df, "lang", "nw", budget=budget).collect()
        }
        assert got == _py_token_budget(rows, budget)

    prop()


# ---------------------------------------------------------- rank_normalize

def test_rank_normalize_matches_percent_rank(spark):
    from json_ld_spark.operators.sampling import rank_normalize

    rows = [
        (1, "en", 10), (2, "en", 30), (3, "en", 20), (4, "en", 30),
        (5, "fr", 7), (6, "fr", 9),
        (7, "de", 4),                       # singleton group -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score long")
    got = {r.doc_id: r.pct_r
           for r in rank_normalize(df, "lang", "score", "doc_id").collect()}
    # en order by (score, id): 1(10) 3(20) 2(30) 4(30) -> 0, 1/3, 2/3, 1
    assert got[1] == 0.0 and got[3] == 0.333333
    assert got[2] == 0.666667 and got[4] == 1.0      # id breaks the 30-tie
    assert got[5] == 0.0 and got[6] == 1.0
    assert got[7] == 0.0


def test_rank_normalize_partitioning_invariant(spark):
    from json_ld_spark.operators.sampling import rank_normalize

    rows = [(i, "g" + str(i % 3), (i * 37) % 11) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score long")
    a = sorted(map(tuple, rank_normalize(df, "lang", "score").collect()))
    b = sorted(map(tuple,
                   rank_normalize(df.repartition(13), "lang", "score").collect()))
    assert a == b


def test_rank_normalize_group_cap_fails_loudly(spark):
    import pytest

    from json_ld_spark.operators.sampling import rank_normalize

    df = spark.createDataFrame(
        [(i, f"g{i}", i) for i in range(30)], "doc_id long, lang string, score long"
    )
    with pytest.raises(ValueError, match="distinct"):
        rank_normalize(df, "lang", "score", max_groups=10)
