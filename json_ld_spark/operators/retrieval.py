"""Ranked full-text retrieval over a document corpus: TF-IDF term
weights and BM25 query scoring — the classic lexical-retrieval stack a
training-data pipeline uses for corpus curation (find documents about
X, weight duplicates, build hard negatives for embedding training).

Everything is DataFrame algebra with exactly the shuffles the problem
requires and no more:

* `term_freqs` — explode(words) + groupBy(doc, term): ONE shuffle,
  map-side partial counts, state one long per (doc, term).
* `doc_freqs` / `tfidf` — a second groupBy(term) over the already
  per-doc-deduped terms; df state is one long per term.
* `bm25` — ONE corpus scan, ONE shuffle. The scan explodes tokens
  once and aggregates per document: dl plus one conditional-sum tf
  column per query term (a pivot — queries are a handful of terms).
  `stack` unpivots the hit rows WITHOUT a shuffle (the groupBy(doc)
  hash partitioning is preserved through project/filter/broadcast-join,
  so the final per-doc score aggregation adds no Exchange), df is a
  tiny broadcast aggregate of the hit rows, and top-k is
  orderBy+limit, which Catalyst executes as TakeOrderedAndProject
  (per-partition heap + single merge — no global sort at any scale).
  The plan was audited with .explain: a naive tf⋈df⋈dl formulation
  re-scanned and re-exploded the corpus for the df branch.

Float determinism: scores are IEEE-double expressions of integer
counts, identical across engines except for addend order in the final
per-doc SUM; round(score, 6) absorbs that (the repo-wide oracle
convention, see __spark_entry__ determinism notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _words(col: Column) -> Column:
    # the corpus-wide token normalization (same as textops/simhash):
    # lower, trim, split on whitespace runs
    return F.split(F.lower(F.trim(col)), r"\s+")


def term_freqs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf) — raw term counts per document."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_words(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dl) — whitespace token count per document (BM25's
    length normalizer). A pure projection, no shuffle."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(_words(F.col(text_col)), lambda w: w != F.lit(""))).alias(
            "dl"
        ),
    )


def doc_freqs(tf: DataFrame) -> DataFrame:
    """(term, df) from a `term_freqs` table — documents containing the
    term. `tf` is already one row per (doc, term), so this is a plain
    count, not a count_distinct (no expanded agg state)."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
) -> DataFrame:
    """(doc_id, term, tf, df, tfidf) with the smoothed formulation
    ``(1 + ln(tf)) * ln((N + 1) / (df + 1))`` — strictly positive,
    defined for every present term. Pass `n_docs` when the caller
    already knows the corpus size (saves a count job); otherwise it is
    computed once on the driver (a scalar, not a collect of data)."""
    tf = term_freqs(docs, id_col, text_col)
    n = n_docs if n_docs is not None else docs.count()
    df = doc_freqs(tf)
    return tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (
            (F.lit(1.0) + F.log(F.col("tf").cast("double")))
            * F.log(F.lit(float(n + 1)) / (F.col("df").cast("double") + 1.0))
        ).alias("tfidf"),
    )


def bm25(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """Score every document containing >= 1 query term with Okapi BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5))) and return
    (doc_id, score, n_hit) — `n_hit` = how many distinct query terms
    matched. With `top_k`, results are the deterministic top page
    ordered by (score desc, doc_id asc).

    N and avgdl are corpus scalars; at repeated-query scale compute
    them once and pass them in. df (document frequency) is computed on
    the POST-filter postings — identical to corpus df for the query
    terms, at a fraction of the shuffle."""
    terms = sorted({t for t in (q.strip().lower() for q in query_terms) if t})
    if not terms:
        raise ValueError("empty query")
    n = n_docs if n_docs is not None else docs.count()
    if avgdl is None:
        dl_tbl = doc_lengths(docs, id_col, text_col)
        avgdl = float(dl_tbl.agg(F.avg("dl")).first()[0] or 1.0)

    k = len(terms)
    words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_words(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    per_doc = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    hit = per_doc
    cond = None
    for i in range(k):
        c = F.col(f"tf_{i}") > 0
        cond = c if cond is None else (cond | c)
    hit = per_doc.filter(cond)
    stack_expr = (
        f"stack({k}, "
        + ", ".join(f"{i}, tf_{i}" for i in range(k))
        + ") as (ti, tf)"
    )
    tf_long = hit.select("doc_id", "dl", F.expr(stack_expr)).filter(
        F.col("tf") > 0
    )
    # df via a window, NOT a groupBy+join: a second consumer of tf_long
    # would re-run its whole lineage (Spark has no cross-consumer CSE),
    # i.e. a second corpus scan+explode. The window consumes the subtree
    # once; its shuffle carries only the hit postings (|terms| ≪ corpus)
    from pyspark.sql import Window

    tf_long = tf_long.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("ti"))
    )

    tf_d = F.col("tf").cast("double")
    df_d = F.col("df").cast("double")
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n)) - df_d + 0.5) / (df_d + 0.5)
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    contrib = idf * tf_d * (k1 + 1.0) / (tf_d + norm)

    scored = (
        tf_long.groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 6).alias("score"),
            F.count(F.lit(1)).alias("n_hit"),
        )
    )
    if top_k is not None:
        scored = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
            top_k
        )
    return scored


# the inlined-literal stopword list (mirrored verbatim in the DuckDB
# oracle): high-frequency English function words; keyword extraction
# quality, not semantics, depends on its contents
TEXTRANK_STOPWORDS = (
    "the", "and", "for", "that", "this", "with", "from", "are", "was",
    "were", "has", "have", "had", "not", "but", "all", "can", "will",
    "its", "their", "they", "them", "his", "her", "she", "him", "you",
    "your", "our", "out", "into", "over", "under", "about", "than",
    "then", "when", "where", "which", "while", "who", "what", "how",
)


def textrank_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    iters: int = 4,
    damping: float = 0.85,
    k: int = 50,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04):
    corpus-level keyword salience as weighted PageRank over the word
    co-occurrence graph — words are nodes, edges weighted by how often
    two words appear within ``window`` positions of each other, ranks
    from ``iters`` damped power iterations, top ``k`` words returned
    as ``(word, rank_r)``.

    Plan shape: ONE corpus tokenize pass (posexplode), co-occurrence
    pairs as an EQUI-join — the partner side is exploded over offsets
    1..window and joined on exact (doc, position), never a range
    predicate — then one groupBy((w1,w2)) count builds the weighted
    edge list (integer weights). The iteration state is one double per
    word; the symmetric graph has no dangling nodes, so each round is
    one equi-join + one groupBy SUM with NO scalar probe — the whole
    loop stays lazy (lineage cut per round with localCheckpoint).
    Top-k is orderBy+limit = TakeOrderedAndProject (per-partition heap,
    no global sort). The only driver scalar is the node count.
    Ordering key is (round(rank, 6) DESC, word) so the selected set is
    deterministic cross-engine (6 dp absorbs SUM-order drift).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_words(F.col(text_col))).alias("pos", "word"),
    ).where(
        F.col("word").rlike("^[a-z]+$")
        & (F.length("word") >= 3)
        & ~F.col("word").isin(*TEXTRANK_STOPWORDS)
    )
    offs = toks.select(
        "doc_id",
        "pos",
        F.explode(F.array(*[F.lit(o) for o in range(1, window + 1)])).alias("off"),
        F.col("word").alias("w2"),
    ).select("doc_id", (F.col("pos") - F.col("off")).alias("pos"), "w2")
    pairs = (
        toks.join(offs, ["doc_id", "pos"])
        .where(F.col("word") != F.col("w2"))
        .select(
            F.least("word", "w2").alias("a"), F.greatest("word", "w2").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    ).localCheckpoint(eager=False)
    wdeg = edges.groupBy("a").agg(F.sum("w").alias("wd"))
    src = edges.join(wdeg, "a").select(
        "a", "b", (F.col("w") / F.col("wd")).alias("frac")
    ).localCheckpoint(eager=False)
    nodes = edges.select(F.col("a").alias("word")).dropDuplicates()
    n = nodes.count()
    if n == 0:
        return nodes.select("word", F.lit(0.0).alias("rank_r"))
    base = (1.0 - damping) / n
    ranks = nodes.select("word", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            ranks.join(src, ranks["word"] == src["a"], "inner")
            .select(F.col("b").alias("word"), (F.col("rank") * F.col("frac")).alias("c"))
            .groupBy("word")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "word", "left")
            .select(
                "word",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.select("word", F.round("rank", 6).alias("rank_r"))
        .orderBy(F.col("rank_r").desc(), "word")
        .limit(k)
    )


def rrf_fuse(
    rankings: list,
    key_col: str = "doc_id",
    k: int = 60,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    hybrid-search combiner for sparse (BM25) + dense (ANN) rank lists:
    rrf(d) = sum over sources of 1 / (k + rank_source(d)), documents
    missing from a source contribute 0.

    ``rankings`` is an ORDERED list of (name, DataFrame) where each
    frame carries (key_col, rank). The score sum follows the list
    order, so it is a fixed IEEE composition — one exact division per
    source plus a pinned-order chain of adds — and replays
    bit-identically in SQL before the 6-dp round.

    Scale shape: rank lists are top-k bounded by construction (each
    source ends in a TakeOrderedAndProject / per-query window), so the
    full-outer join chain runs on k-sized inputs per query — fusion
    cost is O(sources * k), never corpus-shaped. Output keeps each
    source's rank column (rank_<name>, NULL when absent) plus
    ``rrf_score``.
    """
    from functools import reduce

    outs = [
        df.select(
            F.col(key_col),
            F.col("rank").cast("long").alias(f"rank_{name}"),
        )
        for name, df in rankings
    ]
    joined = reduce(lambda a, b: a.join(b, key_col, "full_outer"), outs)
    score = None
    for name, _ in rankings:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"rank_{name}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return joined.withColumn("rrf_score", F.round(score, round_digits))
