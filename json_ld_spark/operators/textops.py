"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All JVM
column expressions except the BPE-ish tokenizer regex (still native
regexp) — zero Python in hot paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# crude n-gram/stopword language evidence (heuristic language-ID; real
# models plug in as pandas UDFs behind the same column contract)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

# a BPE-ish tokenizer regex: words with optional leading space, numbers,
# punctuation runs (GPT-2 style classes, simplified)
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def _words(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def _count_word(words: Column, marker: str) -> Column:
    # single-arg lambda: a two-arg lambda would receive (element, index)
    return F.size(F.filter(words, lambda w: w == F.lit(marker)))


def lang_id(col: Column) -> Column:
    """Best-scoring marker language, 'und' when nothing matches."""
    words = _words(col)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        score = sum((_count_word(words, m) for m in markers), F.lit(0))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_count_whitespace(col: Column) -> Column:
    return F.size(_words(col))


def token_count_bpe(col: Column) -> Column:
    """Count of BPE-ish regex tokens (regexp_extract_all is JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), 0))


def quality_score(col: Column) -> Column:
    """[0,1] heuristic from length, punctuation ratio, stopword ratio,
    mean word length — the standard cheap pre-filter stack."""
    length = F.length(col)
    words = _words(col)
    n_words = F.size(words)
    punct = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    punct_ratio = punct / F.greatest(length, F.lit(1))
    stop = sum((_count_word(words, m) for m in _LANG_MARKERS["en"]), F.lit(0))
    stop_ratio = stop / F.greatest(n_words, F.lit(1))
    mean_word_len = length / F.greatest(n_words, F.lit(1))
    len_score = F.least(length / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))
    stop_score = F.least(stop_ratio * 5, F.lit(1.0))
    wordlen_score = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return (
        len_score * 0.3 + punct_score * 0.3 + stop_score * 0.2 + wordlen_score * 0.2
    )


def fingerprint(col: Column, window: int = 4) -> Column:
    """Winnowing-style document fingerprint: min over rolling-window
    hashes of word n-grams → one stable 64-bit id per document."""
    words = _words(col)
    k = F.greatest(F.size(words) - F.lit(window - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, window))),
    )
    return F.array_min(grams)


def fingerprint_md5(col: Column, window: int = 4) -> Column:
    """Same winnowing fingerprint with an md5 gram hash (hex-string min)
    so a DuckDB oracle can reproduce it bit-for-bit; xxhash64
    (`fingerprint`) stays the cheap production variant."""
    words = _words(col)
    k = F.greatest(F.size(words) - F.lit(window - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, window))),
    )
    return F.array_min(grams)


# PII patterns: kept to the Java-regex / RE2 common subset (no
# lookaround, no backrefs) so a DuckDB oracle replays them exactly
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category PII occurrence counts (JVM regexp_count)."""
    return {
        name: F.regexp_count(col, F.lit(pat))
        for name, pat in PII_PATTERNS.items()
    }


def redact_pii(col: Column) -> Column:
    """Replace every PII match with a typed placeholder token —
    applied in fixed (email, ip, phone) order so overlapping-ish
    matches resolve identically everywhere. A pure column expression:
    the 100 TB scrub is a projection, no shuffle, no Python."""
    out = col
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def word_repetition(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rule family):
    per-document word totals, distinct words, the top word's count, and
    the duplicate-word fraction. Two partial-agg shuffles — the
    (doc, word) count state is one long per pair and the per-doc
    rollup one row per doc; nothing is collected."""
    words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_words(F.col(text_col))).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return words.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_count"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)) / F.sum("c").cast("double"), 6
        ).alias("dup_frac"),
    )


def analyze_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        lang_id(t).alias("lang_pred"),
        token_count_whitespace(t).alias("n_tokens_ws"),
        token_count_bpe(t).alias("n_tokens_bpe"),
        F.round(quality_score(t), 6).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )


def normalize_text(col: Column) -> Column:
    """Unicode/whitespace normalization for pre-dedup text hygiene:
    NFC-compose, strip C0 control characters (keeping \\t \\n), collapse
    whitespace runs to single spaces, trim.

    The NFC step is the only part Spark lacks a JVM builtin for — it
    runs in an Arrow-batched pandas UDF entered ONLY by rows containing
    non-ASCII bytes (ASCII is NFC-closed), so an ASCII-dominant crawl
    never leaves the JVM; the regex cleanup is JVM codegen either way.
    Cross-engine exact: DuckDB's nfc_normalize matches Python's
    unicodedata NFC on this container (probed), so the whole chain
    replays in SQL."""
    import pandas as _pd  # noqa: F401  (module-level import exists)
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _nfc(vals):
        import unicodedata

        return vals.map(
            lambda s: None if s is None else unicodedata.normalize("NFC", s)
        )

    composed = F.when(
        col.rlike("[^\\x00-\\x7F]"), _nfc(col)
    ).otherwise(col)
    cleaned = F.regexp_replace(
        composed, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""
    )
    return F.trim(F.regexp_replace(cleaned, "\\s+", " "))


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    col: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    min_alpha_frac: float = 0.7,
    min_stopwords: int = 2,
) -> Column:
    """Gopher quality rules (Rae et al. 2021 A1.1) as ONE struct-valued
    JVM projection — word-count bounds, mean word length 3–10, symbol
    ratio, bullet-line fraction, alphabetic-word fraction, distinct-
    stopword requirement, plus the final `keep` conjunction. No Python,
    no shuffle; every signal replays in SQL."""
    words = F.filter(_words(col), lambda w: w != "")
    n_words = F.size(words)
    # try_divide: an empty doc has n_words = 0, and ANSI mode makes a
    # plain / throw DIVIDE_BY_ZERO — NULL signals instead, and `keep`
    # still collapses to false through the n_words lower bound
    # (false AND NULL = false)
    mean_wl = F.try_divide(
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ),
        n_words,
    )
    n_sym = (
        F.length(col) - F.length(F.regexp_replace(col, "[#…]", ""))
        + F.size(F.filter(words, lambda w: w.endswith("...")))
    )
    lines = F.split(col, "\n")
    n_lines = F.size(lines)
    bullet_frac = F.try_divide(
        F.size(F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]"))), n_lines
    )
    alpha_frac = F.try_divide(
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))), n_words
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    keep = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mean_wl >= 3) & (mean_wl <= 10)
        & (F.try_divide(n_sym, n_words) <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (alpha_frac >= min_alpha_frac)
        & (n_stop >= min_stopwords)
    )
    return F.struct(
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(F.try_divide(n_sym, n_words), 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.cast("long").alias("n_stopwords"),
        keep.alias("keep"),
    )


def normalize_url(col: Column) -> Column:
    """Canonical URL form for crawl-level dedup grouping: lowercase
    scheme+host, default ports stripped, fragment dropped, tracking
    params (utm_*, fbclid, gclid) removed, remaining query params
    sorted, trailing slash on a bare path dropped. Pure JVM column
    expression (regexp + split/filter/sort/join over arrays) — runs
    inside whole-stage codegen, replayable in SQL, no Python.

    This is the grouping key for URL-exact dedup — two syntactic
    variants of the same address land in one group before any content
    hashing runs."""
    # scheme://host[:port] — lowercase, strip :80/:443
    base = F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)
    rest = col.substr(F.length(base) + F.lit(1), F.lit(1 << 20))
    base = F.lower(base)
    base = F.regexp_replace(base, r":(80|443)$", "")
    # split off fragment, then query
    rest = F.regexp_replace(rest, r"#.*$", "")
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)"),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    path = F.when(path == "/", F.lit("")).otherwise(path)
    return F.concat(
        base,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )


def hashed_ngram_score(
    docs: "DataFrame",
    weights: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 1 << 12,
    bias: float = 0.0,
) -> "DataFrame":
    """fastText-style linear quality scorer over hashed word n-grams:
    tokenize → n-grams → feature bucket = md5-bridge(gram) mod
    ``buckets`` → look the bucket up in the (bucket, weight) model
    table → per-doc score = sigmoid(bias + mean weight). This is the
    model-application PLUMBING of a trained quality/language
    classifier (hashing-trick features, linear head) as two shuffles:
    one broadcast join against the MB-scale model table and one doc-
    keyed mean — no Python, deterministic, SQL-replayable.

    Output: (id, n_feats, score_r) — score rounded to 6 dp (the only
    cross-engine divergence is summation order). Docs with fewer than
    ``n`` tokens produce no features and are absent (gate them
    upstream with text_stats)."""
    from pyspark.sql import functions as F  # local alias for clarity

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: w != "",
    )
    if n == 1:
        grams = toks
    else:
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    feats = docs.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("gram")
    ).select(
        "id",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        ).alias("bucket"),
    )
    joined = feats.join(F.broadcast(weights), "bucket", "left").select(
        "id", F.coalesce("weight", F.lit(0.0)).alias("weight")
    )
    raw = F.lit(bias) + F.avg("weight")
    return joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_feats"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)), 6).alias("score_r"),
    )


def bigram_pairs(col: Column) -> Column:
    """Adjacent word pairs of a text column as an array of
    (w1, w2) structs — the flatMap step of n-gram LM count
    collection. Built from two clamped slices + zip_with (never
    element_at / sequence), so documents with < 2 words yield an
    empty array instead of an ANSI index error — safe to evaluate
    on every row regardless of filter/projection collapse."""
    words = _words(col)
    ln = F.greatest(F.size(words) - F.lit(1), F.lit(0))
    return F.zip_with(
        F.slice(words, 1, ln),
        F.slice(words, 2, ln),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def kn_bigram_stats(
    df: DataFrame, text_col: str = "text", min_count: int = 3
) -> DataFrame:
    """Interpolated Kneser–Ney bigram statistics (Kneser & Ney 1995;
    Chen & Goodman 1998) — the count tables an n-gram LM trainer
    needs, computed distributed:

      c(w1 w2)        bigram count
      c(w1 .)         left-context total        (cw1)
      N1+(w1 .)       distinct continuations    (nfollow_w1)
      N1+(. w2)       distinct left contexts    (ncont_w2)
      D = n1/(n1+2 n2)  absolute discount from count-of-counts
      P_KN(w2|w1) = max(c-D,0)/c(w1) + D*N1+(w1 .)/c(w1) * N1+(. w2)/B

    where B is the number of distinct bigram types. Output is the
    deterministic set of bigrams with c >= min_count (no top-k limit,
    so the result is order-free and oracle-hashable).

    Scale shape: one tokenize+explode projection, then four
    map-side-combinable aggregations keyed by bigram / w1 / w2, and a
    1-row totals broadcast — the classic MapReduce LM-count job
    (Brants et al. 2007, "Large Language Models in Machine
    Translation"). No window, no all-pairs, no collect.
    """
    lit1 = F.lit(1)
    toks = df.select(bigram_pairs(F.col(text_col)).alias("bg"))
    bg = toks.select(F.explode("bg").alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bc = bg.groupBy("w1", "w2").agg(F.count(lit1).alias("c"))
    left = bc.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count(lit1).alias("nfollow_w1")
    )
    right = bc.groupBy("w2").agg(F.count(lit1).alias("ncont_w2"))
    tot = bc.agg(
        F.count(lit1).alias("btypes"),
        F.coalesce(
            F.sum((F.col("c") == 1).cast("long")), F.lit(0)
        ).alias("n1"),
        F.coalesce(
            F.sum((F.col("c") == 2).cast("long")), F.lit(0)
        ).alias("n2"),
    )
    d = F.col("n1") / F.greatest(
        F.col("n1") + F.lit(2) * F.col("n2"), F.lit(1)
    )
    cw1d = F.col("cw1").cast("double")
    pkn = (
        F.greatest(F.col("c") - d, F.lit(0.0)) / cw1d
        + d
        * (F.col("nfollow_w1") / cw1d)
        * (F.col("ncont_w2") / F.col("btypes").cast("double"))
    )
    return (
        bc.filter(F.col("c") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("c"),
            F.col("cw1").cast("long").alias("cw1"),
            F.col("nfollow_w1").cast("long").alias("nfollow_w1"),
            F.col("ncont_w2").cast("long").alias("ncont_w2"),
            F.round(d, 6).alias("d_r"),
            F.round(pkn, 6).alias("pkn_r"),
        )
    )


def winnow_fingerprints(
    col: Column, gram: int = 4, window: int = 5
) -> Column:
    """MOSS winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003):
    md5 hashes of word ``gram``-grams, the minimum hash selected from
    every sliding window of ``window`` consecutive gram hashes, then
    de-duplicated — the guaranteed-coverage local fingerprint set
    (any shared run of ``gram + window - 1`` words yields at least one
    shared fingerprint). Unlike the single global-min `fingerprint`,
    this detects PARTIAL overlap between documents.

    md5 (not xxhash64) so a DuckDB oracle replays the selection
    bit-for-bit; windows near the end of short documents clamp, which
    both engines do identically via slice semantics.
    """
    words = _words(col)
    ng = F.greatest(F.size(words) - F.lit(gram - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), ng - F.lit(1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + F.lit(1), gram))),
    )
    nw = F.greatest(F.size(grams) - F.lit(window - 1), F.lit(1))
    sel = F.transform(
        F.sequence(F.lit(0), nw - F.lit(1)),
        lambda j: F.array_min(F.slice(grams, j + F.lit(1), window)),
    )
    return F.array_distinct(sel)


def kn_doc_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document average Kneser-Ney bigram log-probability under the
    corpus-trained table (kn_bigram_stats, min_count=1) — LM-fluency
    quality scoring in the CCNet tradition, but with OUR OWN n-gram
    model instead of an external one, so the whole train+score pipeline
    is two passes over the corpus.

    Determinism contract: the joined probability is the 6-dp-rounded
    pkn_r (cross-engine stable, floored at 1e-6 so ln never sees 0),
    each bigram's log term is rounded to micro-nats and summed as an
    EXACT long — the cross-partition sum is order-free, the one float
    division happens once per doc at the end.

    Scale shape: tokenize+explode, one (w1,w2)-keyed equi-join of doc
    bigrams against the bigram table (both corpus-derived; shuffle
    hash join), one per-doc agg. Documents with < 2 words have no
    bigrams and drop out (no NULL scores).
    """
    bg = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(bigram_pairs(F.col(text_col))).alias("p"),
    ).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    stats = kn_bigram_stats(
        df.select(F.col(text_col).alias("text")), text_col="text", min_count=1
    ).select("w1", "w2", "pkn_r")
    micro = F.round(
        F.log(F.greatest(F.col("pkn_r"), F.lit(1e-6))) * F.lit(1000000.0), 0
    ).cast("long")
    return (
        bg.join(stats, ["w1", "w2"])
        .select("doc_id", micro.alias("micro"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("micro").cast("long").alias("logp_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "logp_micro",
            F.round(
                F.col("logp_micro") / F.lit(1000000.0)
                / F.col("n_bigrams").cast("double"),
                6,
            ).alias("avg_logp_r"),
        )
    )


def topic_segments(
    turns: DataFrame,
    min_jaccard: float = 0.2,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """TextTiling-style topic segmentation of multi-turn conversations
    (Hearst 1997, re-expressed relationally): each turn's word SET is
    compared to the previous turn of the same conversation by Jaccard
    similarity; a similarity dip below ``min_jaccard`` opens a new
    segment, and ``segment_id`` is the running count of boundaries —
    the per-conversation topic structure a transcript-curation pipeline
    feeds into chunking / context-window assembly.

    Scale shape: the word-set projection is JVM-only (split/filter/
    array_distinct — no Python), and the ONLY shuffle is one
    conv-partitioned window (lag + running sum share the same
    partitioning, so Catalyst plans a single Exchange + one sort; a
    conversation is bounded, so no partition-less window anywhere).
    Jaccard is emitted at 6 dp for cross-engine hash parity.
    """
    words = F.array_distinct(
        F.filter(_words(F.col(text_col)), lambda x: x != F.lit(""))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(conv_col).orderBy(idx_col)
    run = Window.partitionBy(conv_col).orderBy(idx_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag("__wset").over(w)
    inter = F.size(F.array_intersect(F.col("__wset"), prev))
    union = F.size(F.array_union(F.col("__wset"), prev))
    jacc = F.round(
        inter.cast("double") / F.nullif(union, F.lit(0)).cast("double"), 6
    )
    keyed = turns.withColumn("__wset", words).withColumn(
        "jaccard_prev", F.when(prev.isNull(), F.lit(None)).otherwise(jacc)
    )
    boundary = (
        F.col("jaccard_prev").isNull()
        | (F.col("jaccard_prev") < F.lit(float(min_jaccard)))
    ).cast("int")
    return (
        keyed.withColumn("is_boundary", boundary)
        .withColumn(
            "segment_id", (F.sum("is_boundary").over(run) - 1).cast("long")
        )
        .select(
            F.col(conv_col).alias("conv_id"),
            F.col(idx_col).alias("turn_idx"),
            "jaccard_prev",
            "is_boundary",
            "segment_id",
        )
    )


def ttr_zipf(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Per-language corpus-health linguistics: type-token ratio and the
    Zipf slope of the top-``top_k`` word frequencies — the audit
    metrics that flag boilerplate floods (TTR collapses) and synthetic/
    templated text (Zipf slope drifts from ≈ −1). The OLS slope of
    ln(freq) on ln(rank) is computed ENTIRELY in scaled integer
    arithmetic: each ln is quantized to 1e-6 BIGINT per row, and

        slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)

    over those micro-ints cancels the scale factor in the ratio, so
    cross-engine summation order cannot move a bit until the single
    final division (rounded 6 dp).

    Scale shape: one (lang, word) count aggregation, one
    lang-partitioned rank window over the dictionary (vocabulary-sized,
    never corpus-sized), one lang rollup. No Python.
    """
    words = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.explode(_words(F.col(text_col))).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    freq = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    base = freq.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("n").cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("word"))
    top = (
        freq.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            "lang",
            F.round(F.log(F.col("rank").cast("double")) * F.lit(1e6), 0)
            .cast("long")
            .alias("x"),
            F.round(F.log(F.col("n").cast("double")) * F.lit(1e6), 0)
            .cast("long")
            .alias("y"),
        )
    )
    ols = top.groupBy("lang").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope_num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope_den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        base.join(ols, "lang")
        .select(
            "lang",
            "n_types",
            "n_tokens",
            F.round(
                F.col("n_types").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ).alias("ttr_r"),
            F.when(
                slope_den != 0,
                F.round(
                    slope_num.cast("double") / slope_den.cast("double"), 6
                ),
            ).alias("zipf_slope_r"),
        )
    )
