"""Byte-pair-encoding tokenization: distributed training statistics,
JVM-side merge application, Arrow fast path for production vocabularies.

The trainer is Sennrich et al. 2016 ("Neural machine translation of
rare words with subword units") over word frequencies, with GPT-2's
regex pre-tokenization idea (Radford et al. 2019) simplified to an
engine-portable alternation. The SCALE split follows the FAISS-codebook
pattern already used by the IVF family (similarity.py): the corpus pass
is distributed (pre-token counting = one groupBy + TakeOrdered), the
merge-learning loop runs on the CAPPED word-frequency table — bounded
driver state (``max_words`` rows), exactly how production BPE trainers
(HuggingFace tokenizers, SentencePiece) operate on word counts.

Application semantics are Sennrich's original: merges applied IN
LEARNED ORDER, each replacing its pair occurrences left-to-right. On a
symbol sequence encoded as a separator-interleaved string
(``\\x1f h \\x1f e \\x1f l \\x1f l \\x1f o`` for "hello"), one merge is
EXACTLY one non-overlapping left-to-right ``replace()`` — the same
primitive with the same semantics in Spark, DuckDB, and Python, which
makes the whole tokenizer (training AND application) value-exactly
replayable by a SQL oracle. GPT-2's lowest-rank-first application is
equivalent: a merge can only reference symbols formed by strictly
earlier merges, so rank order and priority order produce the same
final sequence (``bpe_tokenize_arrow`` implements it and the test
suite pins the equivalence on real corpus text).

Scale shape at 100 TB: training = one shuffle (token groupBy) + one
TakeOrderedAndProject; the merge table is vocabulary-sized driver
state shipped to executors as ONE literal array (the IVF-codebook
lesson: a single literal + fold keeps codegen linear, unrolled
per-entry expression trees do not). Application is a pure projection —
zero shuffle, zero Python on the default path. For production merge
tables (50k merges) the fold's O(merges x len) cost inverts in favor
of the O(len log len) rank-dict algorithm: use ``bpe_tokenize_arrow``
(Arrow-batched pandas UDF, per-batch memoization across repeated
pre-tokens).

Reference parity note: the json-ld reference workspace has no
tokenizer; this operator family belongs to the training-data-pipeline
surface (SURVEY.md "beyond-reference" section).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints are strings
                     # under future-annotations and must resolve here

from pyspark.sql import Column, DataFrame, functions as F

# separator between symbols inside the working representation (US) and
# between search/replacement inside one encoded merge entry (RS) — both
# outside every printable alphabet the pre-tokenizer can emit
SEP = "\x1f"
ENC = "\x1e"

# engine-portable pre-tokenizer: letter runs, digit runs, punctuation
# runs. The whitespace class is EXPLICIT ([ \t\n\r]) because Python
# \s, Java \s and RE2 \s disagree on \x0b and Unicode spaces — this
# alternation parses identically under all three engines.
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+"


def _interleave(tok: str) -> str:
    return "".join(SEP + c for c in tok)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 40,
    max_words: int = 2000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Distributed part: pre-tokenize every document (JVM regex), count
    pre-token frequencies (one shuffle), keep the top ``max_words``
    types by (count DESC, token ASC) — a deterministic heavy-hitters
    cap that bounds driver state regardless of corpus size. Driver
    part: the classic merge loop over the word-frequency table; ties
    broken by (count DESC, pair ASC) so every engine replaying the
    same table learns the same merges.

    Returns the merges in learned order. Raises if the corpus cannot
    supply ``n_merges`` merges (every word fully merged) — a loud
    failure beats a silently short merge table that downstream token
    budgets would misinterpret.
    """
    top = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), 0)
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(max_words)
        .collect()
    )
    # rows, not a dict: the SQL replay keeps one row per word type, and
    # two distinct types can never collide under merging (merges only
    # delete separators, the character content stays distinct)
    words: list[list] = [[_interleave(r["tok"]), int(r["cnt"])] for r in top]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, c in words:
            syms = w.split(SEP)[1:]
            for pair in zip(syms, syms[1:]):
                pairs[pair] = pairs.get(pair, 0) + c
        if not pairs:
            raise ValueError(
                f"train_bpe: corpus exhausted after {len(merges)} merges "
                f"(requested {n_merges}) — lower n_merges or raise max_words"
            )
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        pat = SEP + best[0] + SEP + best[1]
        rep = SEP + best[0] + best[1]
        for row in words:
            row[0] = row[0].replace(pat, rep)
    return merges


def encode_merges(merges: list[tuple[str, str]]) -> list[str]:
    """One string per merge: ``search RS replacement`` on the
    interleaved representation — the literal-array payload both the
    JVM fold and the DuckDB oracle consume."""
    return [
        SEP + a + SEP + b + ENC + SEP + a + b for a, b in merges
    ]


def bpe_fold(text: Column, merges: list[tuple[str, str]]) -> Column:
    """``array<string>`` of separator-interleaved BPE-merged pre-tokens
    — the canonical encoded form (each element: ``\\x1f`` + token, one
    per final token). Pure JVM projection: regex pre-tokenize, then for
    each pre-token fold ``replace()`` over the single literal merge
    array. Folding per pre-token (not over the whole document) is what
    guarantees merges never cross pre-token boundaries."""
    lit = F.lit(encode_merges(merges))

    def fold(tok: Column) -> Column:
        return F.aggregate(
            lit,
            F.regexp_replace(tok, F.lit("(.)"), F.lit(SEP + "$1")),
            lambda acc, m: F.replace(
                acc,
                F.substring_index(m, ENC, 1),
                F.substring_index(m, ENC, -1),
            ),
        )

    return F.transform(
        F.regexp_extract_all(text, F.lit(PRETOKEN_RE), 0), fold
    )


def bpe_token_count(text: Column, merges: list[tuple[str, str]]) -> Column:
    """EXACT BPE token count as a long column — the number every
    downstream token budget (pack_documents, trainer contracts) should
    run on. One separator per token, so the count is the separator
    count of the folded form."""
    return F.aggregate(
        bpe_fold(text, merges),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + (F.length(s) - F.length(F.replace(s, F.lit(SEP), F.lit("")))),
    )


def bpe_tokens(text: Column, merges: list[tuple[str, str]]) -> Column:
    """``array<string>`` of BPE tokens in document order."""
    return F.flatten(
        F.transform(
            bpe_fold(text, merges),
            lambda s: F.array_remove(F.split(s, F.lit(SEP)), ""),
        )
    )


def bpe_stream_md5(text: Column, merges: list[tuple[str, str]]) -> Column:
    """md5 of the concatenated folded form — a value-exact fingerprint
    of the full token stream (each token carries its leading separator,
    so the concatenation decodes unambiguously)."""
    return F.md5(F.concat_ws("", bpe_fold(text, merges)))


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Adds ``bpe_tokens`` (array<string>) and ``n_bpe_tokens`` (long)
    via the JVM fold path."""
    t = F.col(text_col)
    return df.withColumn("bpe_tokens", bpe_tokens(t, merges)).withColumn(
        "n_bpe_tokens", bpe_token_count(t, merges)
    )


def bpe_tokenize_arrow(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Adds the same ``bpe_tokens``/``n_bpe_tokens`` columns via the
    GPT-2 rank-dict algorithm in an Arrow-batched pandas UDF — the
    production path for vocabulary-scale merge tables where the JVM
    fold's O(merges x len) per pre-token loses to O(len) with a rank
    lookup. Per-batch memoization collapses repeated pre-tokens
    (Zipf makes the cache hit rate high). Output is bit-identical to
    :func:`bpe_tokenize` (equivalence pinned in tests)."""
    import re as _re

    from pyspark.sql.types import ArrayType, StringType

    ranks = {pair: i for i, pair in enumerate(merges)}
    pre = _re.compile(PRETOKEN_RE)

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(tok: str) -> list[str]:
            got = cache.get(tok)
            if got is not None:
                return got
            word = list(tok)
            while len(word) > 1:
                cand = [
                    (ranks[p], i)
                    for i, p in enumerate(zip(word, word[1:]))
                    if p in ranks
                ]
                if not cand:
                    break
                rank = min(cand)[0]
                a, b = merges[rank]
                out, i = [], 0
                while i < len(word):
                    if (
                        i + 1 < len(word)
                        and word[i] == a
                        and word[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(word[i])
                        i += 1
                word = out
            cache[tok] = word
            return word

        return texts.map(
            lambda t: [s for tok in pre.findall(t or "") for s in one(tok)]
        )

    return df.withColumn("bpe_tokens", _tok(F.col(text_col))).withColumn(
        "n_bpe_tokens", F.size("bpe_tokens").cast("long")
    )
