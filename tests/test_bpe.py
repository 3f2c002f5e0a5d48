"""BPE tokenizer: trainer determinism, application-algorithm
equivalence (JVM fold == GPT-2 rank-dict), conservation properties,
and the zero-shuffle application plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_ld_spark.operators import bpe


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_bpe_learns_expected_merges(spark):
    # "ab" occurs 6x (4x in abab, 2x in abc), so (a,b) must merge
    # first; the tie between follow-ups resolves by (count, pair) order
    docs = _docs(spark, ["abab abab", "abc abc", "b"])
    merges = bpe.train_bpe(docs, n_merges=3, max_words=10)
    assert merges[0] == ("a", "b")
    # after (a,b): "abab" = [ab, ab] pairs {(ab,ab):2}; "abc" = [ab,c]
    # pairs {(ab,c):2} — tie at 2, (ab,ab) < (ab,c) lexicographically
    assert merges[1] == ("ab", "ab")
    assert merges[2] == ("ab", "c")


def test_train_bpe_deterministic_and_loud_on_exhaustion(spark):
    docs = _docs(spark, ["xy xy yx"])
    a = bpe.train_bpe(docs, n_merges=2, max_words=5)
    b = bpe.train_bpe(docs, n_merges=2, max_words=5)
    assert a == b
    with pytest.raises(ValueError, match="exhausted"):
        bpe.train_bpe(docs, n_merges=50, max_words=5)


def test_tokens_conserve_pretoken_text(spark):
    """Concatenating a pre-token's BPE tokens must reproduce the
    pre-token exactly — merging only removes boundaries."""
    texts = [
        "the merger merged mergers, remerging!",
        "a1b2c3 ... 12345 hello---world",
        "aaaa aaa aa a",  # overlapping-pair left-to-right semantics
        "",
        "   ",
    ]
    docs = _docs(spark, texts)
    merges = bpe.train_bpe(docs, n_merges=5, max_words=50)
    rows = bpe.bpe_tokenize(docs, merges).orderBy("doc_id").collect()
    import re

    for r, t in zip(rows, texts):
        pretoks = re.findall(bpe.PRETOKEN_RE, t)
        # token stream re-segments into the pre-tokens by concatenation
        joined = "".join(r["bpe_tokens"])
        assert joined == "".join(pretoks)
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])


def test_overlapping_pair_merges_left_to_right(spark):
    """[a,a,a] under merge (a,a) -> [aa,a]: the left-to-right
    non-overlapping semantics every engine's replace() shares."""
    docs = _docs(spark, ["aa aa aa aaa"])
    merges = bpe.train_bpe(docs, n_merges=1, max_words=5)
    assert merges == [("a", "a")]
    rows = (
        bpe.bpe_tokenize(docs, merges).select("bpe_tokens").first()
    )["bpe_tokens"]
    assert rows == ["aa", "aa", "aa", "aa", "a"]


def test_fold_matches_arrow_rank_dict(spark):
    """The JVM fold (merges in learned order) and the GPT-2 rank-dict
    algorithm must produce identical token streams on real corpus
    text — the documented equivalence both paths rely on."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe.train_bpe(docs, n_merges=20, max_words=800)
    a = bpe.bpe_tokenize(docs, merges).select("doc_id", "bpe_tokens")
    b = bpe.bpe_tokenize_arrow(docs, merges).select("doc_id", "bpe_tokens")
    n = a.count()
    assert (
        a.join(b.withColumnRenamed("bpe_tokens", "bt2"), "doc_id")
        .where(F.col("bpe_tokens") == F.col("bt2"))
        .count()
        == n
    )


def test_fold_matches_arrow_on_adversarial_strings(spark):
    docs = _docs(
        spark,
        [
            "aaaaa bababab abcabcabc",
            "!!!??!! 000111000 xyxyxyx",
            "mississippi banana bandana",
        ],
    )
    merges = bpe.train_bpe(docs, n_merges=8, max_words=50)
    a = bpe.bpe_tokenize(docs, merges).orderBy("doc_id").collect()
    b = bpe.bpe_tokenize_arrow(docs, merges).orderBy("doc_id").collect()
    for x, y in zip(a, b):
        assert x["bpe_tokens"] == y["bpe_tokens"]


def test_application_plan_is_pure_projection(spark):
    """After training (one shuffle, bounded collect), application must
    be a zero-shuffle JVM projection: no Exchange, no Python eval."""
    docs = _docs(spark, ["the quick brown fox", "jumps over the dog"])
    merges = bpe.train_bpe(docs, n_merges=3, max_words=20)
    plan = (
        bpe.bpe_tokenize(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_exact_counts_drive_packing(spark):
    """pack_documents over n_bpe_tokens: budget accounting uses the
    exact token count, never the regex proxy."""
    from json_ld_spark.operators.sampling import pack_documents

    docs = _docs(spark, ["aa bb cc", "dd ee", "ff", "gg hh ii jj"])
    merges = bpe.train_bpe(docs, n_merges=2, max_words=20)
    toks = docs.select(
        "doc_id",
        bpe.bpe_token_count(F.col("text"), merges).alias("n"),
    )
    packed = pack_documents(toks, "n", budget=4, order_col="doc_id")
    rows = {r["doc_id"]: r["pack_id"] for r in packed.collect()}
    # cumulative exact counts decide the boundaries deterministically
    counts = {r["doc_id"]: r["n"] for r in toks.collect()}
    cum, expect = 0, {}
    for i in sorted(counts):
        expect[i] = (cum) // 4
        cum += counts[i]
    assert rows == expect
