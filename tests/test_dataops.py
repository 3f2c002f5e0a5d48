"""Tests for the training-data pipeline operators: dedup (exact/minhash/
simhash), similarity search, text analysis, multimodal plumbing,
streaming triples."""

import pytest
from pyspark.sql import functions as F

from json_ld_spark.operators.dedup import (
    cdc_chunks,
    dedup_exact,
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_candidates,
    simhash_near_duplicates,
    shingles,
)
from json_ld_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from json_ld_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_topk,
)
from json_ld_spark.operators.textops import analyze_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "völlig anderes deutsches dokument der die und das ist"),
        (5, "short"),
        (6, "el perro de la casa que corre los caminos"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    groups = exact_duplicates(docs).collect()
    assert {r["doc_id"] for r in groups} == {1, 2}
    assert all(r["canonical_id"] == 1 for r in groups)
    kept = dedup_exact(docs)
    assert kept.count() == 5
    assert kept.filter(F.col("doc_id") == 2).count() == 0


def test_minhash_lsh_and_jaccard(docs):
    pairs = minhash_lsh_candidates(docs, num_hashes=32, bands=16, shingle_n=2)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # exact dups always collide
    assert (1, 3) in got or (2, 3) in got  # near dup should collide too
    verified = jaccard_pairs(docs, pairs, shingle_n=2, threshold=0.5)
    v = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in verified.collect()}
    assert v[(1, 2)] == 1.0
    assert 0.5 <= v[(1, 3)] < 1.0


def test_simhash_near_duplicates(docs):
    pairs = simhash_near_duplicates(docs, bits=32, max_hamming=6, n_blocks=8)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((1, 2)) == 0


def test_shingles_expr(spark):
    df = spark.createDataFrame([(1, "a b c d")], "id long, text string")
    out = df.select(shingles(F.col("text"), 2).alias("sh")).collect()[0]["sh"]
    assert sorted(out) == ["a b", "b c", "c d"]


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_brute_force_topk(spark, embeddings):
    queries = embeddings.limit(3)
    out = brute_force_topk(queries, embeddings, k=4)
    rows = out.collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
    assert set(by_query) == {r["vec_id"] for r in queries.collect()}
    for items in by_query.values():
        assert len(items) == 4
        cos_sorted = [r["cos"] for r in sorted(items, key=lambda x: x["rank"])]
        assert cos_sorted == sorted(cos_sorted, reverse=True)
        assert all(-1.001 <= c <= 1.001 for c in cos_sorted)


def test_lsh_topk_recall(spark, embeddings):
    dim = len(embeddings.select("embedding").first()[0])
    queries = embeddings.limit(5)
    exact = brute_force_topk(queries, embeddings, k=1)
    approx = lsh_topk(queries, embeddings, dim=dim, k=1, n_planes=2)
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    # with 2 planes (4 buckets) recall@1 should be decent on 100 vecs
    assert len(e & a) >= 2


def test_embedding_near_duplicates(spark, embeddings):
    dim = len(embeddings.select("embedding").first()[0])
    # duplicate a vector under a new id → must be found
    dup = embeddings.limit(1).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    vecs = embeddings.unionByName(dup)
    pairs = embedding_near_duplicates(vecs, dim=dim, threshold=0.999, n_planes=4)
    got = {(r["vec_a"], r["vec_b"]) for r in pairs.collect()}
    first_id = embeddings.first()["vec_id"]
    assert (first_id, first_id + 1000000) in got


def test_text_analysis(spark, docs):
    out = {r["doc_id"]: r for r in analyze_documents(docs).collect()}
    assert out[1]["lang_pred"] == "en"
    assert out[4]["lang_pred"] == "de"
    assert out[6]["lang_pred"] == "es"
    assert out[1]["n_tokens_ws"] == 9
    assert out[1]["n_tokens_bpe"] >= 9
    assert 0.0 <= out[1]["quality"] <= 1.0
    assert out[1]["fingerprint"] == out[2]["fingerprint"]
    assert out[1]["fingerprint"] != out[4]["fingerprint"]


def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, n=12)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r["feature"]) == 8 and r["decode_ok"] for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)
    plan = frame_sample_plan(media, every_ms=500)
    assert plan.count() > 0
    # real decode is an explicit stub
    from json_ld_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"x", "image")


def test_real_audio_codec(spark):
    """The audio path is a REAL codec: stdlib-wave decode of actual
    PCM16 WAV payloads; features must equal the analytic waveform."""
    import math

    from json_ld_spark.operators.multimodal import (
        audio_features,
        decode_media,
        synthesize_wav_media,
    )

    media = synthesize_wav_media(spark, n=4)
    # direct decode round-trip
    payload = bytes(media.filter(F.col("media_id") == 2).first()["payload"])
    dec = decode_media(payload, "audio")
    assert dec["sample_rate"] == 8000 and dec["n_channels"] == 1
    freq = 220.0 + 55.0 * 2
    expect = [int(6000 * math.sin(2 * math.pi * freq * k / 8000.0)) for k in range(1600)]
    assert dec["samples"] == expect
    # distributed features match the analytic values
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert set(rows) == {0, 1, 2, 3}
    s = expect
    nonneg = [x >= 0 for x in s]
    assert rows[2]["n_samples"] == 1600
    assert rows[2]["max_abs"] == max(abs(x) for x in s)
    assert rows[2]["sum_abs"] == sum(abs(x) for x in s)
    assert rows[2]["zero_crossings"] == sum(
        1 for a, b in zip(nonneg, nonneg[1:]) if a != b
    )


def test_streaming_triples(spark, tmp_path):
    from json_ld_spark.sources.transcripts import synthesize_transcripts
    from json_ld_spark.streaming.stream import run_stream_to_memory

    path = str(tmp_path / "stream_in")
    tr = synthesize_transcripts(spark, n_convs=5, avg_turns=3)
    tr.write.mode("overwrite").parquet(path)
    out = run_stream_to_memory(spark, path, query_name="t_stream")
    batch = tr.count()
    # one quad per non-null field + type + conv + turn
    assert out.count() > batch * 5
    assert out.filter(F.col("pred").endswith("#text")).count() == batch


def test_ivf_ann(spark, sf_dir):
    """IVF ANN: deterministic centroids, cell-equi-join search, recall
    against the exact kernel on the hardest case (random near-orthogonal
    embeddings)."""
    from pyspark.sql import functions as F, types as T

    from json_ld_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast(T.ArrayType(T.DoubleType())).alias("embedding")
    )
    c1 = {r["cell"]: r["centroid"] for r in sim.ivf_centroids(emb, n_cells=8).collect()}
    c2 = {r["cell"]: r["centroid"] for r in sim.ivf_centroids(emb, n_cells=8).collect()}
    assert c1 == c2  # deterministic, no RNG state
    q = emb.filter(F.col("vec_id") % 100 == 0)
    cents = sim.ivf_centroids(emb, n_cells=16, lloyd_rounds=2)
    ivf = set(map(tuple, sim.ivf_topk(q, emb, cents, k=5, n_probe=6, n_assign=2)
                  .select("query_id", "cand_id").toPandas().values))
    exact = set(map(tuple, sim.brute_force_topk(q, emb, k=5)
                    .select("query_id", "cand_id").toPandas().values))
    # Lloyd-refined centroids + corpus replication (n_assign=2) reach
    # 0.92 here; the round-1 hash-subset "centroids" all approximated
    # the global mean and only managed 0.6. Uniform random 64-dim
    # embeddings are IVF's worst case (no cluster structure), hence the
    # generous n_probe — clusterable corpora need far fewer probes.
    assert len(ivf & exact) / len(exact) >= 0.9


def test_ivfpq_ann(spark, sf_dir):
    """IVF-PQ ANN: deterministic PQ residual codebooks, ADC shortlist,
    exact re-rank — recall gate matches the raw-IVF row's >= 0.9 on the
    same hardest case (uniform random embeddings). Also asserts the
    index side actually ships codes, not vectors (the 16x-bytes
    claim)."""
    from pyspark.sql import functions as F, types as T

    from json_ld_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast(T.ArrayType(T.DoubleType())).alias("embedding")
    )
    cents = sim.ivf_centroids(emb, n_cells=16, lloyd_rounds=2)
    b1 = sim.pq_codebooks(emb, cents, m_subspaces=8, n_codes=32, lloyd_rounds=2)
    b2 = sim.pq_codebooks(emb, cents, m_subspaces=8, n_codes=32, lloyd_rounds=2)
    assert b1 == b2  # deterministic, no RNG state
    assert len(b1) == 8 and all(len(b) == 32 for b in b1)
    assert all(len(c) == 8 for b in b1 for c in b)  # 64/8 dims per code
    q = emb.filter(F.col("vec_id") % 100 == 0)
    pq = set(map(tuple, sim.ivfpq_topk(q, emb, cents, b1, k=5, n_probe=6,
                                       n_assign=2, rerank=80)
                 .select("query_id", "cand_id").toPandas().values))
    exact = set(map(tuple, sim.brute_force_topk(q, emb, k=5)
                    .select("query_id", "cand_id").toPandas().values))
    assert len(pq & exact) / len(exact) >= 0.9


def test_interning_roundtrip(spark, sf_dir):
    from json_ld_spark.operators import interning as it
    from json_ld_spark.operators.native import transcript_triples_native
    from json_ld_spark.sources.transcripts import transcripts_from_documents

    triples = transcript_triples_native(
        transcripts_from_documents(spark, sf_dir)
    ).select("graph", "subj", "pred", "obj_kind", "obj", "datatype", "lang")
    d = it.build_iri_dictionary(triples)
    assert it.verify_dictionary(d) == d.count()
    back = it.decode_triples(it.encode_triples(triples), d)
    assert back.select(*triples.columns).subtract(triples).count() == 0
    assert triples.subtract(back.select(*triples.columns)).count() == 0


def test_minhash_recall_on_injected_duplicates(spark, sf_dir):
    """Ground-truth recall: every injected exact duplicate pair
    (jaccard 1.0) must survive banded LSH + verification."""
    from pyspark.sql import functions as F

    from json_ld_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = base.unionByName(dup)
    expected = {
        (int(r["doc_id"]), int(r["doc_id"]) + 1000000)
        for r in docs.filter(F.col("doc_id") % 10 == 0).select("doc_id").collect()
    }
    found = dd.jaccard_pairs(corpus, dd.minhash_lsh_candidates(corpus), threshold=0.95)
    got = {(int(a), int(b)) for a, b in found.select("doc_a", "doc_b").collect()}
    assert expected <= got  # recall 1.0 on exact dups
    # precision: every reported pair really has jaccard >= 0.95 (verified
    # by construction in jaccard_pairs; sanity: no self pairs)
    assert all(a < b for a, b in got)


def test_prefix_filter_equals_bruteforce(spark):
    """Prefix filtering is EXACT: verified candidates == brute-force
    all-pairs Jaccard >= t, including near-threshold pairs."""
    from json_ld_spark.operators import dedup as dd
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),                                   # exact dup
        (3, base.replace("kappa", "lambda")),        # near dup
        (4, "one two three four five six"),          # unrelated
        (5, base.replace("alpha", "mu").replace("beta", "nu")),  # weaker
        (6, "one two three four five seven"),        # near dup of 4
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    t = 0.5
    cands = dd.prefix_filter_candidates(docs, threshold=t)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dd.jaccard_pairs(docs, cands, threshold=t).collect()
    }
    ids = docs.select("doc_id")
    allp = (
        ids.selectExpr("doc_id as doc_a")
        .crossJoin(ids.selectExpr("doc_id as doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
    )
    expect = {
        (r["doc_a"], r["doc_b"])
        for r in dd.jaccard_pairs(docs, allp, threshold=t).collect()
    }
    assert got == expect and len(expect) >= 2


def test_redact_pii_and_counts(spark):
    from pyspark.sql import functions as F

    from json_ld_spark.operators import textops as tx

    rows = [
        (1, "mail me at a.b+c@example.co.uk or x@y.io today"),
        (2, "server 10.0.0.1 and phone 555-123-4567"),
        (3, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    c = tx.pii_counts(F.col("text"))
    out = df.select(
        "doc_id",
        c["email"].alias("e"), c["ip"].alias("i"), c["phone"].alias("p"),
        tx.redact_pii(F.col("text")).alias("red"),
    ).collect()
    by = {r["doc_id"]: r for r in out}
    assert (by[1]["e"], by[1]["i"], by[1]["p"]) == (2, 0, 0)
    assert (by[2]["e"], by[2]["i"], by[2]["p"]) == (0, 1, 1)
    assert (by[3]["e"], by[3]["i"], by[3]["p"]) == (0, 0, 0)
    assert by[1]["red"] == "mail me at [EMAIL] or [EMAIL] today"
    assert by[2]["red"] == "server [IP] and phone [PHONE]"
    assert by[3]["red"] == rows[2][1]


def test_word_repetition_signals(spark):
    from json_ld_spark.operators import textops as tx

    rows = [
        (1, "a a a b"),          # 4 words, 2 distinct, top 3
        (2, "x y z"),            # no repetition
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in tx.word_repetition(df).collect()}
    assert (out[1]["n_words"], out[1]["n_distinct"], out[1]["top_count"]) == (4, 2, 3)
    assert abs(out[1]["dup_frac"] - 0.5) < 1e-9
    assert out[2]["dup_frac"] == 0.0


def test_repeated_spans_reference(spark):
    from json_ld_spark.operators.dedup import repeated_spans

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "a lazy dog saw the quick brown fox sleeping"),
            (3, "entirely different words here"),
            (4, "the quick brown fox jumps again and the quick brown fox"),
        ],
        ["doc_id", "text"],
    )
    out = repeated_spans(docs, n=4, min_count=2).collect()
    rows = {(r.doc_id, r.pos, r.gram): (r.n_occurrences, r.n_docs) for r in out}

    # python reference
    from collections import defaultdict
    occ = defaultdict(list)
    for d, t in [(r, t) for r, t in
                 [(1, "the quick brown fox jumps"),
                  (2, "a lazy dog saw the quick brown fox sleeping"),
                  (3, "entirely different words here"),
                  (4, "the quick brown fox jumps again and the quick brown fox")]]:
        toks = t.split()
        for i in range(len(toks) - 3):
            occ[" ".join(toks[i:i+4])].append((d, i))
    want = {}
    for g, lst in occ.items():
        if len(lst) >= 2:
            nd = len({d for d, _ in lst})
            for d, p in lst:
                want[(d, p, g)] = (len(lst), nd)
    assert rows == want
    assert any(g == "the quick brown fox" for (_, _, g) in rows)


def test_select_survivors(spark):
    from json_ld_spark.operators.dedup import select_survivors

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 7)],
        ["doc_id", "n_chars"],
    )
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (9, 9)],
        ["doc_id", "dup_group"],
    )
    # prefer largest n_chars, tie -> smallest id: group1 -> 2
    out = select_survivors(docs, groups, prefer_col="n_chars")
    assert sorted(r.doc_id for r in out.collect()) == [2, 4, 9]
    # no preference: smallest id
    out2 = select_survivors(docs, groups)
    assert sorted(r.doc_id for r in out2.collect()) == [1, 4, 9]


def test_cdc_chunks_python_replay_and_shift_stability(spark):
    import hashlib

    def py_cdc(text, window=4, modulus=64):
        n = len(text)
        cuts = [0] + [
            p for p in range(window, n + 1)
            if int(hashlib.md5(text[p - window:p].encode()).hexdigest()[:8], 16)
            % modulus == 0
        ] + [n]
        out = []
        for j in range(len(cuts) - 1):
            s, e = cuts[j], cuts[j + 1]
            if e > s:
                out.append((j, s, e - s,
                            hashlib.md5(text[s:e].encode()).hexdigest()))
        return out

    base = ("the quick brown fox jumps over the lazy dog and then "
            "wanders far away into the deep dark forest tonight") * 3
    edited = "INSERTED PREFIX!! " + base
    df = spark.createDataFrame([(1, base), (2, edited), (3, "tiny")],
                               ["doc_id", "text"])
    got = {}
    from json_ld_spark.operators.dedup import cdc_chunks
    for r in cdc_chunks(df, modulus=16).collect():
        got.setdefault(r.id, []).append((r.chunk_idx, r.start, r.chunk_len, r.chunk_md5))
    for i, txt in ((1, base), (2, edited), (3, "tiny")):
        assert sorted(got[i]) == py_cdc(txt, modulus=16), f"doc {i}"
    # shift stability: after the edit settles, chunk hashes realign —
    # most of doc 1's chunk hashes appear in doc 2 despite the prefix
    h1 = {h for (_, _, _, h) in got[1]}
    h2 = {h for (_, _, _, h) in got[2]}
    assert len(h1 & h2) >= len(h1) - 2


def test_cdc_chunks_reassemble_exactly(spark):
    """Chunks partition the document: sorting by chunk_idx and
    concatenating the substrings reproduces the original text."""
    import random as _r

    rnd = _r.Random(11)
    alpha = "abcdefg \n"
    texts = ["".join(rnd.choice(alpha) for _ in range(rnd.randrange(0, 300)))
             for _ in range(20)]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {}
    for r in cdc_chunks(df, modulus=8).collect():
        got.setdefault(r.id, []).append((r.chunk_idx, r.start, r.chunk_len))
    for i, text in enumerate(texts):
        spans = sorted(got.get(i, []))
        rebuilt = "".join(text[s:s + ln] for (_, s, ln) in spans)
        assert rebuilt == text, f"doc {i}"
        # spans are contiguous and non-overlapping
        pos = 0
        for (_, s, ln) in spans:
            assert s == pos and ln > 0
            pos += ln
        assert pos == len(text)


def test_containment_pairs_detects_excerpts(spark):
    from json_ld_spark.operators.dedup import containment_pairs

    long_doc = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lambda mu nu xi omicron pi rho sigma tau")
    excerpt = "delta epsilon zeta eta theta"      # contiguous slice
    unrelated = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(1, long_doc), (2, excerpt), (3, unrelated)], ["doc_id", "text"])
    cands = spark.createDataFrame(
        [(2, 1), (3, 1)], ["doc_a", "doc_b"])
    got = {(r.doc_a, r.doc_b): (r.c_ab_r, r.c_ba_r, r.direction)
           for r in containment_pairs(docs, cands, threshold=0.9).collect()}
    # the excerpt is fully contained in the long doc, not vice versa
    assert set(got) == {(2, 1)}
    c_ab, c_ba, d = got[(2, 1)]
    assert c_ab == 1.0 and c_ba < 0.5 and d == "a_in_b"
    # identical docs: both directions
    docs2 = spark.createDataFrame([(1, excerpt), (2, excerpt)],
                                  ["doc_id", "text"])
    cands2 = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    [r] = containment_pairs(docs2, cands2).collect()
    assert r.direction == "both" and r.c_ab_r == r.c_ba_r == 1.0


def test_upsample_epochs(spark, sf_dir):
    """Fractional-epoch repetition: floor copies always, fractional
    pass deterministic + monotone in epochs; epoch index 0-based."""
    from pyspark.sql import functions as F

    from json_ld_spark.operators.sampling import upsample_epochs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = d.count()
    out = upsample_epochs(d, 2.5, seed="s").cache()
    rows = out.count()
    # every doc at least twice, at most 3 times; fraction ~0.5
    per = out.groupBy("doc_id").count()
    assert per.filter((F.col("count") < 2) | (F.col("count") > 3)).count() == 0
    assert 2 * n < rows < 3 * n
    # deterministic
    assert upsample_epochs(d, 2.5, seed="s").count() == rows
    # monotone: raising epochs never drops a (doc, epoch) pair
    bigger = upsample_epochs(d, 2.9, seed="s")
    assert bigger.count() >= rows
    assert out.join(bigger, ["doc_id", "epoch"], "left_anti").count() == 0
    # epochs=0.0 keeps nothing; whole epochs exact
    assert upsample_epochs(d, 0.0, seed="s").count() == 0
    assert upsample_epochs(d, 2.0, seed="s").count() == 2 * n


def test_semantic_dedup_matches_brute_force(spark, sf_dir):
    """SemDeDup cluster-then-prune: kept set equals a driver-side
    replay (nearest-cell assignment + within-cell lower-id cosine
    pruning), is partition-invariant, and keeps at least one vector
    per non-empty cell."""
    import math

    from pyspark.sql import functions as F, types as T

    from json_ld_spark.operators import similarity as sim
    from json_ld_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.col("embedding").cast(T.ArrayType(T.DoubleType())).alias("embedding"),
    )
    cents = sim.ivf_centroids(emb, n_cells=8, lloyd_rounds=1)
    got = {(r.vec_id, r.cell, r.kept)
           for r in semantic_dedup(emb, cents, tau=0.3).collect()}
    got_repart = {(r.vec_id, r.cell, r.kept)
                  for r in semantic_dedup(emb.repartition(13), cents,
                                          tau=0.3).collect()}
    assert got == got_repart

    cent = {r.cell: list(r.centroid) for r in cents.collect()}
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(x * x for x in b)))

    def assign(v):
        return max(sorted(cent), key=lambda c: (cos(v, cent[c]), -c))

    cells = {vid: assign(v) for vid, v in vecs.items()}
    expect = set()
    for vid, v in vecs.items():
        dropped = any(
            cells[o] == cells[vid] and o < vid and cos(vecs[o], v) >= 0.3
            for o in vecs
        )
        expect.add((vid, cells[vid], not dropped))
    assert got == expect
    # every non-empty cell keeps >= 1 vector (min id never drops)
    kept_cells = {c for _, c, k in got if k}
    assert kept_cells == {c for _, c, _ in got}


def test_paragraph_dedup_sep_and_window_modes(spark):
    """Boilerplate removal: global first occurrence wins (by (doc_id,
    idx)), repeats drop, docs reassemble in order, fully-boilerplate
    docs survive empty; the word-window mode slices k-word windows
    including the short tail; duplicated docs empty out entirely."""
    import pytest as _pytest

    from json_ld_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame([
        (1, "hello world\n\nshared boiler\n\nunique one"),
        (2, "shared boiler\n\nunique two"),
        (3, "shared boiler"),
    ], "doc_id long, text string")
    out = {r.doc_id: (r.text, r.n_paras, r.n_kept)
           for r in paragraph_dedup(docs).collect()}
    assert out[1] == ("hello world\n\nshared boiler\n\nunique one", 3, 3)
    assert out[2] == ("unique two", 2, 1)
    assert out[3] == ("", 1, 0)
    # dropping empties instead:
    assert {r.doc_id for r in
            paragraph_dedup(docs, keep_empty=False).collect()} == {1, 2}

    # word-window mode: 3-word windows, last window short; doc 11 is a
    # full copy of doc 10 -> empties; doc 12 shares one window
    wdocs = spark.createDataFrame([
        (10, "a b c d e f g"),
        (11, "a b c d e f g"),
        (12, "a b c x y z"),
    ], "doc_id long, text string")
    w = {r.doc_id: (r.text, r.n_paras, r.n_kept)
         for r in paragraph_dedup(wdocs, sep=None, words_per_para=3).collect()}
    assert w[10] == ("a b c d e f g", 3, 3)
    assert w[11] == ("", 3, 0)
    assert w[12] == ("x y z", 2, 1)

    with _pytest.raises(ValueError, match="exactly one"):
        paragraph_dedup(docs, sep=None, words_per_para=None)


def test_incremental_minhash_matches_restricted_full_run(spark):
    """incremental(old, new) == from-scratch pairs over old+new
    restricted to at-least-one-new; old x old pairs never reappear;
    a precomputed index (old_entries) gives identical output."""
    from json_ld_spark.operators.dedup import (
        incremental_minhash_dedup,
        jaccard_pairs as _jp,
        minhash_band_entries,
        minhash_lsh_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows_old = [
        (1, base),
        (2, base),  # old x old exact dup: must NOT be re-emitted
        (3, base.replace("river", "sea")),
        (4, "completely different text about spark shuffles and joins here"),
    ]
    rows_new = [
        (101, base),                      # dup of old 1/2
        (102, rows_old[3][1]),            # dup of old 4
        (103, base),                      # new x new dup with 101 too
        (104, "nothing like anything else in this corpus at all truly"),
    ]
    old = spark.createDataFrame(rows_old, "doc_id long, text string")
    new = spark.createDataFrame(rows_new, "doc_id long, text string")
    inc = incremental_minhash_dedup(old, new, num_hashes=32, bands=16,
                                    shingle_n=2, threshold=0.7)
    got = {(r["doc_a"], r["doc_b"]) for r in inc.collect()}
    assert all(a >= 101 or b >= 101 for a, b in got)
    assert (1, 2) not in got
    assert {(1, 101), (2, 101), (4, 102), (101, 103)} <= got

    both = old.unionByName(new)
    full = _jp(
        both,
        minhash_lsh_candidates(both, num_hashes=32, bands=16, shingle_n=2),
        shingle_n=2, threshold=0.7,
    )
    want = {
        (r["doc_a"], r["doc_b"])
        for r in full.collect()
        if r["doc_a"] >= 101 or r["doc_b"] >= 101
    }
    assert got == want

    pre = minhash_band_entries(old, num_hashes=32, bands=16, shingle_n=2)
    inc2 = incremental_minhash_dedup(
        old, new, num_hashes=32, bands=16, shingle_n=2, threshold=0.7,
        old_entries=pre,
    )
    assert {(r["doc_a"], r["doc_b"]) for r in inc2.collect()} == got


# ---------------------------------------------------------------------------
# margin-based pair mining (round 5)
# ---------------------------------------------------------------------------

def test_margin_pairs_deflates_hubs_and_is_deterministic(spark):
    """A hub vector close to EVERYTHING gets a dense neighborhood, so
    the ratio margin deflates its raw-cosine wins; a genuinely matched
    pair with sparse neighborhoods clears the threshold."""
    from json_ld_spark.operators.similarity import margin_pairs

    def vec(*xs):
        return list(map(float, xs))

    # x0/y1 is an isolated exact match; y9 is a hub similar to all xs
    x = spark.createDataFrame(
        [
            (0, vec(1, 0, 0, 0)),
            (2, vec(0, 1, 0, 0)),
            (4, vec(0, 0, 1, 0)),
            (6, vec(0.5, 0.5, 0.5, 0.2)),
        ],
        "vec_id long, embedding array<double>",
    )
    y = spark.createDataFrame(
        [
            (1, vec(1, 0.05, 0, 0)),      # x0's true match
            (3, vec(0.05, 1, 0, 0)),      # x2's true match
            (9, vec(0.6, 0.6, 0.6, 0.3)),  # hub
        ],
        "vec_id long, embedding array<double>",
    )
    out = margin_pairs(x, y, k=2, threshold=1.0).collect()
    got = {r["x_id"]: (r["y_id"], r["margin_r"]) for r in out}
    assert got[0][0] == 1 and got[2][0] == 3  # true matches win
    # the true matches outscore any hub pairing in margin
    hub_margins = [m for (yid, m) in got.values() if yid == 9]
    assert all(got[0][1] > m and got[2][1] > m for m in hub_margins)

    again = {r["x_id"]: (r["y_id"], r["margin_r"])
             for r in margin_pairs(x, y, k=2, threshold=1.0).collect()}
    assert got == again

    # pluggable candidate generator: same algebra over a custom knn
    from json_ld_spark.operators.similarity import brute_force_topk

    alt = margin_pairs(
        x, y, k=2, threshold=1.0,
        knn=lambda q, c: brute_force_topk(q, c, k=2),
    ).collect()
    assert {r["x_id"]: r["y_id"] for r in alt} == {k: v[0] for k, v in got.items()}


def test_margin_pairs_empty_sides(spark):
    from json_ld_spark.operators.similarity import margin_pairs

    e = spark.createDataFrame([], "vec_id long, embedding array<double>")
    x = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert margin_pairs(x, e, k=2).count() == 0
    assert margin_pairs(e, x, k=2).count() == 0


# ------------------------------------------------ Kneser-Ney bigrams


def test_kn_bigram_stats_hand_computed(spark):
    from json_ld_spark.operators.textops import kn_bigram_stats

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "a dog sat on the mat"),
            (4, "hi"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r["w1"], r["w2"]): r
        for r in kn_bigram_stats(docs, min_count=2).collect()
    }
    # counts: the-cat/sat-on/on-the/the-mat = 2; four singletons
    # n1 = 4, n2 = 4 -> D = 1/3; btypes = 8
    assert set(rows) == {
        ("the", "cat"), ("sat", "on"), ("on", "the"), ("the", "mat")
    }
    r = rows[("the", "cat")]
    assert (r["c"], r["cw1"], r["nfollow_w1"], r["ncont_w2"]) == (2, 4, 2, 1)
    assert r["d_r"] == pytest.approx(1 / 3, abs=1e-6)
    # (2 - 1/3)/4 + 1/3 * (2/4) * (1/8)
    assert r["pkn_r"] == pytest.approx(0.4375, abs=1e-6)
    r = rows[("sat", "on")]
    assert (r["c"], r["cw1"], r["nfollow_w1"], r["ncont_w2"]) == (2, 2, 1, 1)
    assert r["pkn_r"] == pytest.approx(
        (2 - 1 / 3) / 2 + (1 / 3) * (1 / 2) * (1 / 8), abs=1e-6
    )


def test_kn_bigram_short_docs_are_safe(spark):
    from json_ld_spark.operators.textops import kn_bigram_stats

    docs = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "   "), (4, "a b a b a b")],
        ["doc_id", "text"],
    )
    rows = {(r["w1"], r["w2"]): r["c"] for r in
            kn_bigram_stats(docs, min_count=1).collect()}
    # only doc 4 contributes: a-b x3, b-a x2
    assert rows == {("a", "b"): 3, ("b", "a"): 2}


# ---------------------------------------------------- MOSS winnowing


def _py_winnow(text, gram=4, window=5):
    import hashlib

    words = text.strip().lower().split()
    ng = max(len(words) - gram + 1, 1)
    grams = [
        hashlib.md5(" ".join(words[i:i + gram]).encode()).hexdigest()
        for i in range(ng)
    ]
    nw = max(len(grams) - window + 1, 1)
    return {min(grams[j:j + window]) for j in range(nw)}


def test_winnow_matches_python_replay(spark):
    from json_ld_spark.operators.textops import winnow_fingerprints

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short one",
        "a b c d e f g h i j k l m n o p",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: set(r["fps"])
        for r in docs.select(
            "doc_id", winnow_fingerprints(F.col("text")).alias("fps")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert out[i] == _py_winnow(t), f"doc {i}"


def test_winnow_shared_run_guarantee(spark):
    from json_ld_spark.operators.textops import winnow_fingerprints

    # any shared run of gram + window - 1 = 8 words guarantees >= 1
    # shared fingerprint (the winnowing coverage lemma)
    run = "alpha beta gamma delta epsilon zeta eta theta"
    a = "xx yy zz " + run + " pp qq"
    b = run + " completely different tail words here"
    c = "totally disjoint vocabulary nothing in common at all whatsoever"
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: set(r["fps"])
        for r in docs.select(
            "doc_id", winnow_fingerprints(F.col("text")).alias("fps")
        ).collect()
    }
    assert out[0] & out[1], "shared 8-word run must share a fingerprint"
    assert not (out[0] & out[2])
    assert not (out[1] & out[2])


def test_kn_doc_logprob_hand_computed(spark):
    from json_ld_spark.operators.textops import kn_doc_logprob

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "a dog sat on the mat"),
            (4, "hi"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in kn_doc_logprob(docs).collect()}
    # doc 4 has one word -> no bigrams -> dropped
    assert set(rows) == {1, 2, 3}
    # doc 2 = the-cat (pkn .4375) + cat-ran (pkn .375):
    # micro-nats round(ln(.4375)*1e6) + round(ln(.375)*1e6)
    r = rows[2]
    assert r["n_bigrams"] == 2
    assert r["logp_micro"] == -826679 + -980829
    assert r["avg_logp_r"] == pytest.approx(-0.903754, abs=1e-6)


# ----------------------------------------------------------- quantize_int8

def test_quantize_int8_codes_and_error(spark):
    from json_ld_spark.operators.similarity import quantize_int8

    embs = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [1.0, 20.0]), (3, [2.0, 30.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r.id: r for r in quantize_int8(embs).collect()}
    # dim 0: mn=0 mx=2 -> codes floor(x*255/2): 0, 127, 255
    # dim 1: mn=10 mx=30 -> codes floor((x-10)*255/20): 0, 127, 255
    assert got[1].code_sum == 0
    assert got[2].code_sum == 254
    assert got[3].code_sum == 510
    assert got[1].n_dims == 2
    # exact endpoints reconstruct exactly
    assert got[1].max_abs_err_r == 0.0 and got[3].max_abs_err_r == 0.0
    # mid: code 127 reconstructs to 127*2/255 = 0.996078 (err 0.003922)
    # and 10 + 127*20/255 = 19.960784 (err 0.039216) -> max is dim 1
    assert got[2].max_abs_err_r == 0.039216


def test_quantize_int8_constant_dimension_is_code_zero(spark):
    from json_ld_spark.operators.similarity import quantize_int8

    embs = spark.createDataFrame(
        [(1, [5.0, 1.0]), (2, [5.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r.id: r for r in quantize_int8(embs).collect()}
    # constant dim 0 -> code 0 for everyone, reconstruction error = |5 - 5| = 0
    # (mn == mx branch reconstructs to mn exactly)
    assert got[1].code_sum == 0          # 0 (const) + 0 (min of dim 1)
    assert got[2].code_sum == 255        # 0 + 255 (max of dim 1)


def test_quantize_int8_error_bounded_by_step(spark):
    import random

    from json_ld_spark.operators.similarity import quantize_int8

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # per-dim range <= 2.0 -> quantization step <= 2/255; floor gives
    # error < one full step
    for r in quantize_int8(embs).collect():
        assert r.max_abs_err_r < 2.0 / 255 + 1e-9
        assert r.n_dims == 8


# ------------------------------------------------------------ tool_bigrams

def test_tool_bigrams_counts_and_support(spark):
    from json_ld_spark.operators.native import tool_bigrams

    t = spark.createDataFrame(
        [
            ("c1", 0, "search"), ("c1", 2, "python"), ("c1", 5, "search"),
            ("c1", 7, "python"),
            ("c2", 1, "search"), ("c2", 3, "python"),
            ("c3", 0, "sql"),                      # lone tool: no bigram
            ("c4", 0, None), ("c4", 1, "search"),  # null tools skipped
        ],
        "conv_id string, turn_idx int, tool string",
    )
    got = {(r.tool_a, r.tool_b): (r.n_occurrences, r.n_convs)
           for r in tool_bigrams(t).collect()}
    assert got == {
        ("search", "python"): (3, 2),   # twice in c1, once in c2
        ("python", "search"): (1, 1),
    }


def test_tool_bigrams_orders_by_turn_not_input_order(spark):
    from json_ld_spark.operators.native import tool_bigrams

    t = spark.createDataFrame(
        [("c1", 9, "b"), ("c1", 1, "a")],  # reversed input order
        "conv_id string, turn_idx int, tool string",
    )
    got = [(r.tool_a, r.tool_b) for r in tool_bigrams(t).collect()]
    assert got == [("a", "b")]


def test_quantize_int8_matches_python_replay_fuzz(spark):
    """Property: codes and errors equal a sequential Python replay of
    the same IEEE expressions, for random small embedding tables."""
    import math

    from hypothesis import given, settings, strategies as st

    from json_ld_spark.operators.similarity import quantize_int8

    @st.composite
    def tables(draw):
        d = draw(st.integers(1, 4))
        n = draw(st.integers(1, 8))
        vals = st.floats(-10, 10, allow_nan=False, width=32)
        return [
            (i, [draw(vals) for _ in range(d)]) for i in range(n)
        ]

    @given(tables())
    @settings(max_examples=20, deadline=None)
    def check(rows):
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {r.id: (r.code_sum, r.max_abs_err_r)
               for r in quantize_int8(df).collect()}
        d = len(rows[0][1])
        mn = [min(r[1][j] for r in rows) for j in range(d)]
        mx = [max(r[1][j] for r in rows) for j in range(d)]
        for i, vec in rows:
            cs, me = 0, 0.0
            for j, x in enumerate(vec):
                if mx[j] > mn[j]:
                    c = int(math.floor((x - mn[j]) * 255.0 / (mx[j] - mn[j])))
                    c = min(255, max(0, c))
                else:
                    c = 0
                cs += c
                if mx[j] > mn[j]:
                    rec = mn[j] + c * (mx[j] - mn[j]) / 255.0
                else:
                    rec = mn[j]
                me = max(me, abs(x - rec))
            assert got[i][0] == cs, (i, vec)
            assert got[i][1] == round(me, 6), (i, vec)

    check()
