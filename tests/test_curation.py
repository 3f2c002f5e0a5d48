"""Curation operators (operators/curation.py): decontamination and
bigram-LM scoring, verified against plain-Python references."""

from __future__ import annotations

import math

import pytest

from json_ld_spark.operators.curation import decontaminate, lm_score, ngrams

import pyspark.sql.functions as F

from json_ld_spark.operators import textops as tx


def _py_tokens(text):
    return [w for w in text.strip().lower().split() if w]


def _py_ngrams(text, n):
    t = _py_tokens(text)
    return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]


def test_ngrams_column(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("  X  y ",), ("one",), ("",)], ["text"]
    )
    rows = df.select(ngrams(F.col("text"), 2).alias("g")).collect()
    assert rows[0].g == ["a b", "b c", "c d"]
    assert rows[1].g == ["x y"]
    assert rows[2].g == []
    assert rows[3].g == []


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "totally different words here now"),
            (3, "prefix beta gamma delta suffix"),
            (4, "x"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "zzz beta gamma delta qqq")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in decontaminate(docs, bench, n=3).collect()}
    assert out[1].contaminated and out[1].n_hits == 1  # 'beta gamma delta'
    assert out[3].contaminated and out[3].n_hits == 1
    assert not out[2].contaminated and out[2].n_hits == 0
    assert not out[4].contaminated and out[4].n_grams == 0
    assert out[1].n_grams == len(_py_ngrams("alpha beta gamma delta epsilon", 3))


def test_decontaminate_distinct_hits(spark):
    # repeated contaminated n-gram counts once
    docs = spark.createDataFrame(
        [(1, "a b a b a b")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "a b")], ["doc_id", "text"])
    row = decontaminate(docs, bench, n=2).collect()[0]
    # doc grams: {'a b' x3, 'b a' x2}; bench has only 'a b' -> ONE
    # distinct hit despite three occurrences
    assert row.n_hits == 1
    assert row.n_grams == 5


def test_decontaminate_hashed_matches_plain(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} common phrase tail {i}") for i in range(20)],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(0, "common phrase tail")], ["doc_id", "text"])
    a = sorted(map(tuple, decontaminate(docs, bench, n=2).collect()))
    b = sorted(map(tuple, decontaminate(docs, bench, n=2, hashed=True).collect()))
    assert a == b


def _py_lm(texts):
    """Reference bigram add-one model."""
    toks = {d: _py_tokens(t) for d, t in texts}
    vocab = {w for ws in toks.values() for w in ws}
    v = len(vocab)
    c1, c2 = {}, {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c1[a] = c1.get(a, 0) + 1
            c2[(a, b)] = c2.get((a, b), 0) + 1
    out = {}
    for d, ws in toks.items():
        lps = [
            math.log((c2[(a, b)] + 1) / (c1[a] + v))
            for a, b in zip(ws, ws[1:])
        ]
        out[d] = (
            round(sum(lps) / len(lps), 6) if lps else None,
            len(lps),
        )
    return out


def test_lm_score_matches_python(spark):
    texts = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "a dog sat on a log"),
        (4, "solo"),
        (5, ""),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r.doc_id: (r.avg_logprob, r.n_bigrams) for r in lm_score(df).collect()}
    want = _py_lm(texts)
    assert set(got) == set(want)
    for d in want:
        assert got[d][1] == want[d][1], d
        if want[d][0] is None:
            assert got[d][0] is None
        else:
            assert got[d][0] is not None and abs(got[d][0] - want[d][0]) < 2e-6, d


def test_lm_score_repeated_bigrams_score_higher(spark):
    # a doc made of corpus-frequent bigrams must beat a doc of rare ones
    rows = [(i, "good flow good flow good flow") for i in range(5)]
    rows.append((100, "rare weird pairing indeed"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.avg_logprob for r in lm_score(df).collect()}
    assert got[0] > got[100]


def _py_chunks(text, max_tokens, overlap):
    t = _py_tokens(text)
    if not t:
        return []
    stride = max_tokens - overlap
    n_chunks = max(-(-(len(t) - overlap) // stride), 1)
    return [
        (i, len(t[i * stride:i * stride + max_tokens]),
         " ".join(t[i * stride:i * stride + max_tokens]), i * stride)
        for i in range(n_chunks)
    ]


def test_chunk_documents_matches_python(spark):
    texts = [
        (1, " ".join(f"w{i}" for i in range(23))),
        (2, "only three words"),
        (3, ""),
        (4, " ".join(f"w{i}" for i in range(10))),   # exactly max
        (5, " ".join(f"w{i}" for i in range(11))),   # one over
    ]
    from json_ld_spark.operators.curation import chunk_documents

    out = chunk_documents(spark.createDataFrame(texts, ["doc_id", "text"]),
                          max_tokens=10, overlap=3)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.n_chunk_tokens, r.chunk_text, r.tok_start))
    for d, text in texts:
        assert sorted(got.get(d, [])) == _py_chunks(text, 10, 3), d
    # every token of doc 1 appears in some chunk; consecutive chunks
    # share exactly `overlap` tokens
    c1 = sorted(got[1])
    assert c1[0][2].split()[-3:] == c1[1][2].split()[:3]


def test_chunk_documents_no_overlap_partitions_exactly(spark):
    from json_ld_spark.operators.curation import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(12)))], ["doc_id", "text"])
    rows = sorted(chunk_documents(df, max_tokens=5, overlap=0).collect(),
                  key=lambda r: r.chunk_idx)
    rebuilt = " ".join(r.chunk_text for r in rows)
    assert rebuilt == " ".join(f"t{i}" for i in range(12))
    assert [r.n_chunk_tokens for r in rows] == [5, 5, 2]


def test_chunk_documents_validation(spark):
    import pytest
    from json_ld_spark.operators.curation import chunk_documents

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=5, overlap=5)


def test_normalize_text(spark):
    import unicodedata

    from json_ld_spark.operators import textops as tx

    rows = [
        ("café   x\tb",),          # decomposed -> composed, ws collapse
        ("plain  ascii\x07ctrl",),        # control strip, never leaves JVM
        ("é café",),            # already NFC: unchanged
        ("",), (None,),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = [r.t for r in df.select(tx.normalize_text(F.col("text")).alias("t")).collect()]

    def py_norm(s):
        if s is None:
            return None
        import re
        s = unicodedata.normalize("NFC", s)
        s = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", s)
        return re.sub(r"\s+", " ", s).strip()

    assert got == [py_norm(s) for (s,) in rows]
    assert got[0] == "café x b"


def test_normalize_text_idempotent(spark):
    from hypothesis import given, settings, strategies as st

    from json_ld_spark.operators import textops as tx

    @given(st.lists(st.text(max_size=20), min_size=1, max_size=8))
    @settings(max_examples=15, deadline=None)
    def prop(texts):
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        once = df.select(tx.normalize_text(F.col("text")).alias("t"))
        twice = once.select(tx.normalize_text(F.col("t")).alias("t"))
        assert [r.t for r in once.collect()] == [r.t for r in twice.collect()]

    prop()


def test_gopher_quality_reference(spark):
    from json_ld_spark.operators import textops as tx

    good = " ".join(
        ["the quick brown fox jumps over and rests with care of that be to have"] * 5
    )
    texts = [
        (1, good),                                   # passes everything
        (2, "short text only"),                      # too few words
        (3, " ".join(["####"] * 60)),                # symbols, no alpha, no stopwords
        (4, "\n".join(["- bullet line the of"] * 30)),  # all bullets
        (5, ""),                                      # empty: no ANSI crash
        (6, "   "),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    import pyspark.sql.functions as F
    rows = {r.doc_id: r.q for r in
            df.select("doc_id", tx.gopher_quality(F.col("text")).alias("q")).collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False and rows[2]["n_words"] == 3
    assert rows[3]["keep"] is False and rows[3]["alpha_frac"] == 0.0
    assert rows[4]["keep"] is False and rows[4]["bullet_frac"] == 1.0
    assert rows[5]["keep"] is False and rows[5]["n_words"] == 0
    assert rows[6]["keep"] is False and rows[6]["mean_word_len"] is None
    # reference math on the good doc
    words = good.lower().split()
    assert rows[1]["n_words"] == len(words)
    assert abs(rows[1]["mean_word_len"] -
               round(sum(map(len, words)) / len(words), 6)) < 1e-9
    assert rows[1]["n_stopwords"] == len(
        set(words) & set(tx.GOPHER_STOPWORDS))


def test_normalize_url(spark):
    cases = [
        ("HTTP://Example.COM:80/a/b?utm_source=x&b=2&a=1#frag",
         "http://example.com/a/b?a=1&b=2"),
        ("https://Site.ORG:443/p/7/?z=9&a=0&utm_campaign=c&fbclid=f",
         "https://site.org/p/7/?a=0&z=9"),
        ("http://example.org/", "http://example.org"),
        ("https://example.org/path?gclid=1&q=5",
         "https://example.org/path?q=5"),
        # non-default port kept; empty params dropped; utm= prefix family
        ("http://h:8080/x?&utm_medium=m&k=v", "http://h:8080/x?k=v"),
        # no scheme: passes through the path machinery unchanged
        ("relative/path?b=1&a=2", "relative/path?a=2&b=2"[:-3] + "b=1"),
        # fragment-only tail
        ("https://h/x#only", "https://h/x"),
    ]
    df = spark.createDataFrame([(u,) for (u, _) in cases], ["url"])
    got = [r.n for r in df.select(tx.normalize_url(F.col("url")).alias("n")).collect()]
    assert got == [w for (_, w) in cases]


def test_hashed_ngram_score_matches_python(spark):
    import hashlib
    import math

    buckets = 256

    def py_score(text):
        toks = [w for w in text.strip().lower().split() if w]
        grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        if not grams:
            return None
        ws = []
        for gm in grams:
            b = int(hashlib.md5(gm.encode()).hexdigest()[:8], 16) % buckets
            ws.append((b % 7) / 10 - 0.3)
        raw = sum(ws) / len(ws)
        return len(grams), round(1 / (1 + math.exp(-raw)), 6)

    texts = [(1, "the cat sat on the mat"), (2, "one"), (3, "a b a b a")]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    wts = spark.range(buckets).selectExpr(
        "id AS bucket", "CAST(id % 7 AS DOUBLE)/10 - 0.3 AS weight")
    got = {r.id: (r.n_feats, r.score_r)
           for r in tx.hashed_ngram_score(df, wts, buckets=buckets).collect()}
    assert got == {i: py_score(t) for (i, t) in texts if py_score(t)}


def test_sft_pairs_rendering_and_window(spark):
    """SFT pair assembly: prompt = previous <=n turns 'role: text' in
    turn order, completion = the target turn; min_context drops
    no-context rows; target_roles filter; frame truncation at
    n_context."""
    from json_ld_spark.operators.curation import sft_pairs

    rows = [("c1", i, "user" if i % 2 == 0 else "assistant", f"t{i}")
            for i in range(6)] + [("c2", 0, "assistant", "solo")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    out = {(r.conv_id, r.turn_idx): (r.prompt, r.completion, r.n_context_turns)
           for r in sft_pairs(df, n_context=2).collect()}
    # assistant turns at 1, 3, 5 in c1; c2's solo turn has no context
    assert set(out) == {("c1", 1), ("c1", 3), ("c1", 5)}
    assert out[("c1", 1)] == ("user: t0", "t1", 1)
    assert out[("c1", 3)] == ("assistant: t1\nuser: t2", "t3", 2)
    assert out[("c1", 5)] == ("assistant: t3\nuser: t4", "t5", 2)
    # wider context + user targets
    out2 = {(r.conv_id, r.turn_idx): r.prompt
            for r in sft_pairs(df, n_context=4,
                               target_roles=("user",)).collect()}
    assert out2[("c1", 4)] == "user: t0\nassistant: t1\nuser: t2\nassistant: t3"


def test_dsir_weights_matches_python(spark):
    """DSIR log importance weights vs a direct Python replay of the
    add-one hashed-bigram multinomial ratio."""
    import hashlib
    import math as m

    from json_ld_spark.operators.curation import dsir_weights

    docs = [
        (0, "the cat sat on the mat", "en"),
        (1, "le chat est noir", "fr"),
        (2, "the dog sat on the rug", "en"),
        (3, "el perro come pan", "es"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    B, alpha = 64, 1.0

    def feats(text):
        toks = [w for w in text.lower().strip().split() if w]
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B for g in grams
        ]

    tgt_counts, raw_counts = {}, {}
    for i, text, lang in docs:
        for b in feats(text):
            raw_counts[b] = raw_counts.get(b, 0) + 1
            if lang == "en":
                tgt_counts[b] = tgt_counts.get(b, 0) + 1
    tt = float(sum(tgt_counts.values())) + alpha * B
    rt = float(sum(raw_counts.values())) + alpha * B
    expect = {}
    for i, text, lang in docs:
        fs = feats(text)
        if not fs:
            continue
        lw = sum(
            m.log((tgt_counts.get(b, 0) + alpha) / tt)
            - m.log((raw_counts.get(b, 0) + alpha) / rt)
            for b in fs
        )
        expect[i] = (len(fs), round(lw, 6))

    got = {
        r["id"]: (r["n_feats"], r["logw_r"])
        for r in dsir_weights(
            df, df.filter(F.col("lang") == "en"), buckets=B, alpha=alpha
        ).collect()
    }
    assert got.keys() == expect.keys()
    for k in expect:
        assert got[k][0] == expect[k][0]
        assert abs(got[k][1] - expect[k][1]) < 2e-6
    # English docs must outrank the non-English ones
    en = {0, 2}
    assert min(got[k][1] for k in en) > max(got[k][1] for k in got.keys() - en)


def test_dsir_rejects_bad_alpha(spark):
    from json_ld_spark.operators.curation import dsir_weights

    df = spark.createDataFrame([(1, "a b", "en")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError):
        dsir_weights(df, df, alpha=0.0)


def test_preference_pairs_rotation_and_filters(spark):
    """chosen = own response; rejected = another conv's response at the
    same position (cyclic rotation, never self); positions with a
    single conversation emit nothing; responses not preceded by a user
    turn emit nothing."""
    from json_ld_spark.operators.curation import preference_pairs

    rows = [
        ("a", 0, "user", "qa"), ("a", 1, "assistant", "ra"),
        ("b", 0, "user", "qb"), ("b", 1, "assistant", "rb"),
        ("c", 0, "user", "qc"), ("c", 1, "assistant", "rc"),
        # lone position: only conv 'a' has an assistant turn at idx 3
        ("a", 2, "user", "qa2"), ("a", 3, "assistant", "ra2"),
        # assistant not after user: dropped
        ("b", 2, "system", "sys"), ("b", 3, "assistant", "orphan"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = preference_pairs(df).collect()
    got = {(r["conv_id"], r["turn_idx"]): r for r in out}
    # only the three idx-1 pairs survive
    assert set(got) == {("a", 1), ("b", 1), ("c", 1)}
    chosen = {"a": "ra", "b": "rb", "c": "rc"}
    rejected = {}
    for (cid, _), r in got.items():
        assert r["chosen"] == chosen[cid]
        assert r["prompt"] == "q" + cid
        assert r["rejected"] != r["chosen"]
        rejected[cid] = r["rejected"]
    # cyclic derangement over the three responses
    assert sorted(rejected.values()) == ["ra", "rb", "rc"]


def test_preference_pairs_deterministic(spark):
    from json_ld_spark.operators.curation import preference_pairs

    rows = [
        (f"c{i}", j, "user" if j % 2 == 0 else "assistant", f"t{i}-{j}")
        for i in range(6)
        for j in range(4)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    a = sorted(map(tuple, preference_pairs(df).collect()))
    b = sorted(map(tuple, preference_pairs(df.repartition(7)).collect()))
    assert a == b and len(a) == 12


# ---------------------------------------------------------------------------
# ngram_novelty — memorization-risk signal
# ---------------------------------------------------------------------------

def test_ngram_novelty_hand_case(spark):
    from json_ld_spark.operators.curation import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),     # grams: "a b c d e", "b c d e f"
            (2, "a b c d e f"),     # identical -> both grams df=2
            (3, "q w e r t y u"),   # unique grams -> novelty 1.0
            (4, "too short"),       # < 5 words -> no grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=5, min_df=2).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["n_dup"] == 2
    assert out[1]["dup_frac"] == 1.0 and out[2]["dup_frac"] == 1.0
    assert out[3]["n_grams"] == 3 and out[3]["n_dup"] == 0
    assert out[3]["dup_frac"] == 0.0
    assert out[4]["n_grams"] == 0 and out[4]["n_dup"] == 0
    assert out[4]["dup_frac"] is None


def test_ngram_novelty_within_doc_repeats_not_counted(spark):
    from json_ld_spark.operators.curation import ngram_novelty

    # the same 5-gram repeated INSIDE one doc must not raise its own
    # document frequency (array_distinct runs before the explode)
    docs = spark.createDataFrame(
        [(1, "a b c d e a b c d e")], "doc_id long, text string"
    )
    r = ngram_novelty(docs, n=5, min_df=2).first()
    assert r["n_dup"] == 0


def test_ngram_novelty_empty(spark):
    from json_ld_spark.operators.curation import ngram_novelty

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert ngram_novelty(docs).count() == 0


# ---------------------------------------------------------------------------
# bt_strengths — Bradley-Terry MM on the integer lattice
# ---------------------------------------------------------------------------

def _py_bt(pairs, rounds=8, scale=1_000_000):
    """Plain-Python replica of the documented fixed-point MM."""
    pairs = [(w, l) for w, l in pairs if w != l]
    stats = {}
    for w, l in pairs:
        a, b = min(w, l), max(w, l)
        n, wa = stats.get((a, b), (0, 0))
        stats[(a, b)] = (n + 1, wa + (1 if w == a else 0))
    dir_rows = []
    for (a, b), (n, wa) in stats.items():
        dir_rows.append((a, b, n, wa))
        dir_rows.append((b, a, n, n - wa))
    players = sorted({i for i, _, _, _ in dir_rows})
    wins = {i: 0 for i in players}
    for i, _, n, w in dir_rows:
        wins[i] += w
    s2 = scale * scale
    p = {i: scale for i in players}
    for _ in range(rounds):
        den = {i: 0 for i in players}
        for i, j, n, _ in dir_rows:
            den[i] += (n * s2) // (p[i] + p[j])
        p = {i: max(((wins[i] + 1) * s2) // den[i], 1) for i in players}
    return p, wins


def test_bt_strengths_hand_case(spark):
    from json_ld_spark.operators.curation import bt_strengths

    # A(1) beats B(2) 3x, B beats A once, B beats C(3) twice
    raw = [(1, 2), (1, 2), (1, 2), (2, 1), (2, 3), (2, 3)]
    pairs = spark.createDataFrame(raw, "winner long, loser long")
    out = {r["player"]: r for r in bt_strengths(pairs, rounds=8).collect()}
    exp_p, exp_w = _py_bt(raw)
    for i in (1, 2, 3):
        assert out[i]["strength"] == exp_p[i]
        assert out[i]["wins"] == exp_w[i]
    assert out[1]["strength"] > out[2]["strength"] > out[3]["strength"]
    assert [out[i]["rank"] for i in (1, 2, 3)] == [1, 2, 3]
    assert out[1]["n_comp"] == 4 and out[2]["n_comp"] == 6 and out[3]["n_comp"] == 2


def test_bt_strengths_self_and_empty(spark):
    from json_ld_spark.operators.curation import bt_strengths

    empty = spark.createDataFrame([], "winner long, loser long")
    assert bt_strengths(empty).count() == 0
    selfs = spark.createDataFrame([(1, 1), (2, 2)], "winner long, loser long")
    assert bt_strengths(selfs).count() == 0


def test_bt_strengths_max_players_guard(spark):
    from json_ld_spark.operators.curation import bt_strengths

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "winner long, loser long"
    )
    with pytest.raises(ValueError, match="players"):
        bt_strengths(pairs, max_players=2)


def test_bt_strengths_never_winner_floor(spark):
    from json_ld_spark.operators.curation import bt_strengths

    # a player that loses every comparison must keep strength >= 1
    # (the floor that protects later denominators)
    raw = [(1, 2)] * 50
    pairs = spark.createDataFrame(raw, "winner long, loser long")
    out = {r["player"]: r for r in bt_strengths(pairs, rounds=8).collect()}
    assert out[2]["strength"] >= 1
    exp_p, _ = _py_bt(raw)
    assert out[2]["strength"] == exp_p[2]


# ---------------------------------------------------------------------------
# conversation_quality — SFT-data gate
# ---------------------------------------------------------------------------

def test_conversation_quality_hand_case(spark):
    from datetime import datetime

    from json_ld_spark.operators.curation import conversation_quality

    t = spark.createDataFrame(
        [
            # clean 2-turn conversation
            ("c1", 0, "user", "hi there", None, datetime(2026, 1, 1, 0, 0, 0)),
            ("c1", 1, "assistant", "hello friend of mine", "search",
             datetime(2026, 1, 1, 0, 0, 9)),
            # broken alternation (two consecutive user turns), no assistant
            ("c2", 0, "user", "a b", None, datetime(2026, 1, 1)),
            ("c2", 1, "user", "c", None, datetime(2026, 1, 1)),
            # single-turn conversation
            ("c3", 0, "assistant", "solo", None, datetime(2026, 1, 1)),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {r["conv_id"]: r for r in conversation_quality(t).collect()}
    c1 = out["c1"]
    assert c1["n_turns"] == 2 and c1["n_user"] == 1 and c1["n_assistant"] == 1
    assert c1["n_tool"] == 1 and c1["n_role_repeats"] == 0
    assert c1["mean_assistant_words"] == 4.0
    assert c1["span_us"] == 9_000_000
    assert c1["keep"] is True
    c2 = out["c2"]
    assert c2["n_role_repeats"] == 1 and c2["n_assistant"] == 0
    assert c2["keep"] is False and c2["mean_assistant_words"] is None
    c3 = out["c3"]
    assert c3["keep"] is False  # below min_turns
    assert c3["span_us"] == 0


def test_conversation_quality_empty(spark):
    from json_ld_spark.operators.curation import conversation_quality

    t = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    assert conversation_quality(t).count() == 0


def test_bt_strengths_matches_python_fuzz(spark):
    """Random tournaments: the Spark pipeline (distributed matrix agg +
    driver MM) must equal the pure-Python replica exactly — the fit is
    integer arithmetic, so there is no tolerance."""
    from hypothesis import given, settings, strategies as st

    from json_ld_spark.operators.curation import bt_strengths

    @given(
        st.lists(
            st.tuples(st.integers(0, 6), st.integers(0, 6)),
            min_size=1,
            max_size=60,
        )
    )
    @settings(max_examples=12, deadline=None)
    def prop(raw):
        pairs = spark.createDataFrame(raw, "winner long, loser long")
        out = {r["player"]: r for r in bt_strengths(pairs, rounds=5).collect()}
        exp_p, exp_w = _py_bt(raw, rounds=5)
        assert set(out) == set(exp_p)
        for i, p in exp_p.items():
            assert out[i]["strength"] == p
            assert out[i]["wins"] == exp_w[i]
        # ranks are the (-strength, player) total order
        order = sorted(exp_p, key=lambda i: (-exp_p[i], i))
        for rank, i in enumerate(order, start=1):
            assert out[i]["rank"] == rank

    prop()


def test_ngram_novelty_matches_python_fuzz(spark):
    """Random corpora of small-vocab docs vs a pure-Python document-
    frequency replica."""
    from hypothesis import given, settings, strategies as st

    from json_ld_spark.operators.curation import ngram_novelty

    words = st.sampled_from(["a", "b", "c", "d"])

    @given(
        st.lists(
            st.lists(words, min_size=0, max_size=8).map(" ".join),
            min_size=1,
            max_size=10,
        )
    )
    @settings(max_examples=12, deadline=None)
    def prop(texts):
        n = 3
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_grams"], r["n_dup"])
            for r in ngram_novelty(docs, n=n, min_df=2).collect()
        }
        grams = {
            i: {
                " ".join(t.split()[j:j + n])
                for j in range(max(len(t.split()) - n + 1, 0))
            }
            for i, t in enumerate(texts)
        }
        df = {}
        for gs in grams.values():
            for g in gs:
                df[g] = df.get(g, 0) + 1
        for i, gs in grams.items():
            assert got[i] == (len(gs), sum(1 for g in gs if df[g] >= 2))

    prop()


# ---------------------------------------------------------------------------
# ccnet_buckets — head/middle/tail perplexity terciles
# ---------------------------------------------------------------------------

def test_ccnet_buckets_tercile_shape(spark, sf_dir):
    from json_ld_spark.operators.curation import ccnet_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ccnet_buckets(docs)
    counts = {r["ccnet_bucket"]: r["n"] for r in
              out.groupBy("ccnet_bucket").agg(F.count("*").alias("n")).collect()}
    total = docs.count()
    # all three buckets populated, tercile-ish (histogram-resolution
    # slack), and the partition covers every scored doc
    for b in ("head", "middle", "tail"):
        assert counts.get(b, 0) > 0
        assert counts[b] < 0.6 * total
    assert sum(v for k, v in counts.items() if k) <= total


def test_ccnet_buckets_order_and_nulls(spark):
    from json_ld_spark.operators.curation import ccnet_buckets

    rows = [(i, "the quick brown fox " * (1 + i % 7)) for i in range(30)]
    rows += [(100, "")]  # no bigrams -> NULL score and bucket
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ccnet_buckets(docs, qs=(0.33, 0.67)).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["ccnet_bucket"], []).append(r)
    assert by_bucket[None][0]["doc_id"] == 100
    # every tail score <= every middle score <= every head score
    def rng(b):
        xs = [r["avg_logprob"] for r in by_bucket.get(b, [])]
        return (min(xs), max(xs)) if xs else None
    t, m, h = rng("tail"), rng("middle"), rng("head")
    if t and m:
        assert t[1] <= m[0] + 1e-9
    if m and h:
        assert m[1] <= h[0] + 1e-9


def test_ccnet_buckets_empty(spark):
    from json_ld_spark.operators.curation import ccnet_buckets

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert ccnet_buckets(docs).count() == 0


# ---------------------------------------------------------------------------
# remove_repeated_spans — substring-dedup execution
# ---------------------------------------------------------------------------

def test_remove_repeated_spans_hand_case(spark):
    import hashlib

    from json_ld_spark.operators.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),          # global first occurrence
            (2, "x y a b c d e f z"),        # repeat inside -> cut 6 tokens
            (3, "unique words only here now"),
            (4, "a b c d e f a b c d e f"),  # both copies are non-first
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           remove_repeated_spans(docs, n=6, min_count=2).collect()}
    assert out[1]["n_cut_tokens"] == 0           # first occurrence kept
    assert out[2]["n_kept"] == 3 and out[2]["n_intervals"] == 1
    assert out[2]["dedup_md5"] == hashlib.md5(b"x y z").hexdigest()
    assert out[3]["n_cut_tokens"] == 0
    # doc 4: occurrences at pos 0 and 6 merge into one [0,12) interval
    assert out[4]["n_kept"] == 0 and out[4]["n_intervals"] == 1
    assert out[4]["dedup_md5"] == hashlib.md5(b"").hexdigest()


def test_remove_repeated_spans_staggered_overlap(spark):
    from json_ld_spark.operators.dedup import remove_repeated_spans

    # two DIFFERENT repeated grams overlapping in one doc must merge
    # into a single maximal interval
    docs = spark.createDataFrame(
        [
            (1, "p q r s"),
            (2, "q r s t"),
            (3, "z p q r s t z"),  # contains both (pos 1 and pos 2)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           remove_repeated_spans(docs, n=4, min_count=2).collect()}
    assert out[3]["n_intervals"] == 1
    assert out[3]["n_kept"] == 2  # the two flanking z tokens


def test_remove_repeated_spans_empty_and_short(spark):
    from json_ld_spark.operators.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [(1, ""), (2, "tiny")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           remove_repeated_spans(docs, n=6, min_count=2).collect()}
    assert out[2]["n_kept"] == 1 and out[2]["n_intervals"] == 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert remove_repeated_spans(empty).count() == 0


# ------------------------------------------------------------ label_votes

def _ann(spark, rows):
    return spark.createDataFrame(
        rows, "item long, annotator string, label string"
    )


def test_label_votes_simple_majority(spark):
    from json_ld_spark.operators.curation import label_votes

    ann = _ann(spark, [
        (1, "a0", "cat"), (1, "a1", "cat"), (1, "a2", "dog"),
        (2, "a0", "dog"), (2, "a1", "dog"), (2, "a2", "dog"),
    ])
    got = {r.item: r for r in label_votes(ann).collect()}
    assert got[1].label_mv == "cat" and got[2].label_mv == "dog"
    assert got[1].n_votes == 3
    # weights: a0 agrees 2x, a1 2x, a2 1x (dog on item 1 disagrees)
    # item 1 weighted: cat = 2+2 = 4 beats dog = 1
    assert got[1].label_weighted == "cat" and got[1].top_weight == 4
    assert got[2].label_weighted == "dog" and got[2].top_weight == 5


def test_label_votes_tie_breaks_lexicographic(spark):
    from json_ld_spark.operators.curation import label_votes

    ann = _ann(spark, [
        (1, "a0", "zebra"), (1, "a1", "ant"),
    ])
    got = label_votes(ann).collect()[0]
    assert got.label_mv == "ant"  # 1-1 tie -> smaller label


def test_label_votes_reliability_flips_weighted_winner(spark):
    from json_ld_spark.operators.curation import label_votes

    # Item 1 splits 2-2, so round 1 falls to the lexicographic
    # tie-break ('w' < 'x' -> mv = 'w'). But a0/a1 carry more
    # majority-agreements from the other items (item 7 is theirs
    # alone), so round 2's reliability weights flip the winner to 'x'.
    ann = _ann(spark, [
        (9, "a0", "k"), (9, "a1", "k"), (9, "a2", "k"), (9, "a3", "k"),
        (8, "a0", "m"), (8, "a1", "m"), (8, "a2", "q"), (8, "a3", "q"),
        (7, "a0", "m"), (7, "a1", "m"),
        (1, "a0", "x"), (1, "a1", "x"), (1, "a2", "w"), (1, "a3", "w"),
    ])
    got = {r.item: r for r in label_votes(ann).collect()}
    # round 1 on item 1: 2-2 tie -> 'w' (lexicographic)
    assert got[1].label_mv == "w"
    # weights: a0/a1 agree on items 9, 8, 7 -> 3 each;
    #          a2/a3 agree on items 9, 1   -> 2 each.
    # item 1 round 2: x = 3+3 = 6 beats w = 2+2 = 4 -> the flip.
    assert got[1].label_weighted == "x"
    assert got[1].top_weight == 6


def test_label_votes_duplicate_votes_collapse(spark):
    from json_ld_spark.operators.curation import label_votes

    ann = _ann(spark, [
        (1, "a0", "cat"), (1, "a0", "cat"), (1, "a1", "dog"),
    ])
    got = label_votes(ann).collect()[0]
    assert got.n_votes == 2  # the duplicate (item, annotator, label) row drops


# --------------------------------------------------- classification_report

def test_classification_report_hand_case(spark):
    from json_ld_spark.operators.curation import classification_report

    preds = spark.createDataFrame(
        [
            ("cat", "cat"), ("cat", "cat"), ("cat", "dog"),
            ("dog", "dog"), ("dog", "cat"),
            ("fox", "dog"),                 # fox never predicted
        ],
        "true_label string, pred_label string",
    )
    got = {r.label: r for r in classification_report(preds).collect()}
    # cat: tp 2, fp 1 (dog->cat), fn 1 -> p = 2/3, r = 2/3, f1 = 2/3
    assert (got["cat"].tp, got["cat"].fp, got["cat"].fn) == (2, 1, 1)
    assert got["cat"].precision_r == got["cat"].recall_r == 0.666667
    assert got["cat"].f1_r == 0.666667
    # dog: tp 1, fp 2 (cat->dog, fox->dog), fn 1
    assert (got["dog"].tp, got["dog"].fp, got["dog"].fn) == (1, 2, 1)
    assert got["dog"].precision_r == 0.333333 and got["dog"].recall_r == 0.5
    assert got["dog"].f1_r == 0.4  # 2*1/(2+2+1)
    # fox: support 1, never predicted -> precision 0 by zero_division=0
    assert (got["fox"].support, got["fox"].tp, got["fox"].fp) == (1, 0, 0)
    assert got["fox"].precision_r == 0.0 and got["fox"].recall_r == 0.0


def test_classification_report_label_only_predicted(spark):
    from json_ld_spark.operators.curation import classification_report

    preds = spark.createDataFrame(
        [("a", "b"), ("a", "a")], "true_label string, pred_label string"
    )
    got = {r.label: r for r in classification_report(preds).collect()}
    # 'b' appears only as a prediction: support 0, fp 1, recall 0
    assert (got["b"].support, got["b"].fp, got["b"].recall_r) == (0, 1, 0.0)


def test_classification_report_perfect(spark):
    from json_ld_spark.operators.curation import classification_report

    preds = spark.createDataFrame(
        [("a", "a"), ("b", "b")], "true_label string, pred_label string"
    )
    for r in classification_report(preds).collect():
        assert r.precision_r == r.recall_r == r.f1_r == 1.0


# ------------------------------------------------------- calibration_bins

def test_calibration_bins_hand_case(spark):
    from json_ld_spark.operators.curation import calibration_bins

    scored = spark.createDataFrame(
        [
            (50, 0), (150, 0), (150, 1),     # bins 0 and 1
            (950, 1), (1000, 1),             # bin 9 (1000 clamps into 9)
        ],
        "conf int, y int",
    )
    got = {r.bin: r for r in calibration_bins(scored, "conf", "y").collect()}
    assert got[0].n == 1 and got[0].acc_r == 0.0 and got[0].conf_r == 0.05
    assert got[1].n == 2 and got[1].acc_r == 0.5 and got[1].conf_r == 0.15
    assert got[1].gap_r == 0.35
    assert got[9].n == 2 and got[9].acc_r == 1.0 and got[9].conf_r == 0.975
    assert got[9].gap_r == 0.025


def test_calibration_bins_perfectly_calibrated_gap_zero(spark):
    from json_ld_spark.operators.curation import calibration_bins

    # two rows at confidence 0.5, one positive -> acc == conf -> gap 0
    scored = spark.createDataFrame(
        [(500, 1), (500, 0)], "conf int, y int"
    )
    got = calibration_bins(scored, "conf", "y").collect()
    assert len(got) == 1 and got[0].gap_r == 0.0


# ------------------------------------------------- DoReMi weights


def test_doremi_upweights_harder_domain(spark):
    from json_ld_spark.operators.curation import doremi_weights

    # domain b's docs carry twice the loss of a's at equal size
    rows = [("a", 10, 100), ("a", 10, 100), ("b", 20, 100), ("b", 20, 100)]
    df = spark.createDataFrame(rows, "source string, loss int, n_chars int")
    out = {r["domain"]: r for r in doremi_weights(df).collect()}
    assert out["a"]["base_share_r"] == out["b"]["base_share_r"] == 0.5
    assert out["b"]["excess_r"] == 5.0 and out["a"]["excess_r"] == -5.0
    assert out["b"]["weight_r"] > out["a"]["weight_r"]
    assert out["a"]["weight_r"] + out["b"]["weight_r"] == pytest.approx(
        1.0, abs=2e-6
    )
    assert out["a"]["n_docs"] == 2 and out["b"]["n_docs"] == 2


def test_doremi_zero_excess_returns_base_shares(spark):
    from json_ld_spark.operators.curation import doremi_weights

    rows = [("a", 5, 300), ("b", 5, 100)]
    df = spark.createDataFrame(rows, "source string, loss int, n_chars int")
    out = {r["domain"]: r for r in doremi_weights(df).collect()}
    # equal losses: exp(0)=1, weights reduce to the token-share mixture
    assert out["a"]["weight_r"] == pytest.approx(0.75, abs=1e-6)
    assert out["b"]["weight_r"] == pytest.approx(0.25, abs=1e-6)


def test_doremi_guard_fires_before_collecting_corpus_key(spark):
    from json_ld_spark.operators.curation import doremi_weights

    df = spark.range(0, 10_000).select(
        F.col("id").cast("string").alias("source"),
        F.lit(1).alias("loss"),
        F.lit(10).alias("n_chars"),
    )
    with pytest.raises(ValueError, match="corpus-shaped"):
        doremi_weights(df, max_domains=100)


# --------------------------------------------------- best-of-n


def test_best_of_n_argmax_with_tiebreak_and_floor(spark):
    from json_ld_spark.operators.curation import best_of_n

    rows = [
        ("c1", 0, 0.5), ("c1", 1, 0.9), ("c1", 2, 0.9),  # tie -> turn 1
        ("c2", 0, 0.1), ("c2", 1, 0.15),                  # best < floor
        ("c3", 7, 0.3),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, s double")
    out = {
        r["conv_id"]: r
        for r in best_of_n(
            df, "conv_id", "turn_idx", score=F.col("s"), min_score=F.lit(0.2)
        ).collect()
    }
    assert set(out) == {"c1", "c3"}
    assert out["c1"]["best_turn_idx"] == 1
    assert out["c1"]["best_score_r"] == 0.9
    assert out["c3"]["best_turn_idx"] == 7


def test_best_of_n_empty_input(spark):
    from json_ld_spark.operators.curation import best_of_n

    df = spark.createDataFrame([], "conv_id string, turn_idx int, s double")
    assert best_of_n(df, "conv_id", "turn_idx", score=F.col("s")).count() == 0
