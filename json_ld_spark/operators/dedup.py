"""Document deduplication operators for training-data pipelines
(task brief: exact, MinHash+LSH, SimHash, n-gram Jaccard). All are
DataFrame-native — hashing via xxhash64/md5 (JVM, codegen'd), banding and
bucket joins as groupBy/self-join on band keys. No Python in any hot
path; scale notes on each operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def normalize_text(col: Column) -> Column:
    """whitespace-collapse + lowercase; the usual exact-dup canonical form."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical (normalized) documents: one row per doc
    that belongs to a duplicate group, with the group's canonical
    (minimum) id. Single hash-shuffle on the content hash; at 100 TB the
    md5 group key keeps the shuffle payload to 32 bytes/row."""
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
    )
    w = Window.partitionBy("content_hash")
    return (
        hashed.withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .filter(F.col("group_size") > 1)
        .select("doc_id", "content_hash", "canonical_id", "group_size")
    )


def dedup_exact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one representative (min id) per content hash."""
    w = Window.partitionBy(F.md5(normalize_text(F.col(text_col)))).orderBy(
        F.col(id_col)
    )
    return docs.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")


# --------------------------------------------------------------------------
# shingles + MinHash + LSH
# --------------------------------------------------------------------------

def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct), JVM-side: split + transform
    over index sequence — no UDF."""
    words = F.split(normalize_text(col), " ")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.when(k <= 0, F.array(normalize_text(col))).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
        )
    )


def minhash_signature(hashed_shingle_col: Column, num_hashes: int = 64) -> Column:
    """num_hashes min-hash values per doc from a PRE-HASHED shingle array
    (array<long>, one xxhash64 per shingle — see minhash_lsh_candidates).
    Each family member re-mixes the precomputed long with xxhash64(h, i),
    ~5x cheaper than hashing the shingle string per lane.

    IMPORTANT: pass a materialized column (own select), not an inline
    shingles(...) expression — higher-order functions disable Catalyst
    subexpression elimination, so an inline expression would be
    recomputed once per lane.
    """
    def lane(i: int):
        # single-param lambda closing over a local: a `lambda h, i=i:`
        # default-arg binding makes the callable TWO-parameter, and
        # Spark's transform() then feeds the ARRAY INDEX as the second
        # argument — every lane collapses to the same positional hash
        # (real bug, caught by the brute-force Jaccard oracle: recall
        # stayed 1.0 on exact dups, so tests never noticed)
        return F.array_min(
            F.transform(hashed_shingle_col, lambda h: F.xxhash64(h, F.lit(i)))
        )

    return F.array(*[lane(i) for i in range(num_hashes)])


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    rows/band = num_hashes/bands; docs agreeing on all rows of any band
    collide. Plan shape: one projection builds signatures (codegen), one
    explode to (band_key, doc), one groupBy-join per band bucket.
    At scale the band-bucket groupBy is the only shuffle and its key
    (band id + 16-byte hash) is uniform by construction — no skew.
    """
    band_entries = minhash_band_entries(
        docs, id_col, text_col, num_hashes, bands, shingle_n
    )
    left = band_entries.alias("l")
    right = band_entries.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def minhash_band_entries(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, band, band_hash) LSH index entries — the persistable
    unit of a MinHash index: batch N writes its entries once; batch
    N+1 joins against them without touching batch N's text again (see
    incremental_minhash_dedup)."""
    rows_per_band = num_hashes // bands
    # staged projections: shingle once, string-hash once, then num_hashes
    # cheap long-remix lanes. CollapseProject keeps each stage separate
    # because the produced arrays are non-cheap and multiply-referenced.
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    hashed = sh.select(
        "doc_id", F.transform("sh", lambda s: F.xxhash64(s)).alias("hs")
    )
    sig = hashed.select(
        "doc_id", minhash_signature(F.col("hs"), num_hashes).alias("sig")
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_hash")


def incremental_minhash_dedup(
    old_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    threshold: float = 0.7,
    old_entries: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup detection for a NEW batch against an
    already-indexed corpus — the production shape of MinHash dedup at
    100 TB, where re-pairing the whole corpus per arriving batch would
    be quadratic in batches. Returns exact-Jaccard-verified pairs
    ``(doc_a, doc_b, jaccard)`` >= ``threshold`` where at least one
    side is new (old x old pairs were already emitted when THOSE
    batches arrived and are never regenerated).

    Per-batch cost: one signature pass over the NEW docs only, one
    equi-join of their band entries against the persisted index
    (``old_entries`` — pass the table read back from storage; derived
    from ``old_docs`` here only as the self-contained default), one
    new x new self-join, then the exact verify joins keyed on doc id.
    The index grows by exactly the new batch's entries
    (``minhash_band_entries(new_docs)`` — union and persist it for
    batch N+1). Band keys are uniform md5 values — no skew; the old
    side's TEXT is touched only for the candidate ids that reach the
    verify (semi-join-sized), not for the whole corpus.
    """
    if old_entries is None:
        old_entries = minhash_band_entries(
            old_docs, id_col, text_col, num_hashes, bands, shingle_n
        )
    new_entries = minhash_band_entries(
        new_docs, id_col, text_col, num_hashes, bands, shingle_n
    ).localCheckpoint(eager=False)  # two consumers: old-join + self-join
    n = new_entries.alias("n")
    o = old_entries.alias("o")
    cross = (
        n.join(
            o,
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.band_hash") == F.col("o.band_hash")),
        )
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_a"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_b"),
        )
        .where(F.col("doc_a") != F.col("doc_b"))
    )
    n2 = new_entries.alias("m")
    intra = (
        n.join(
            n2,
            (F.col("n.band") == F.col("m.band"))
            & (F.col("n.band_hash") == F.col("m.band_hash"))
            & (F.col("n.doc_id") < F.col("m.doc_id")),
        )
        .select(F.col("n.doc_id").alias("doc_a"), F.col("m.doc_id").alias("doc_b"))
    )
    cands = cross.unionByName(intra).distinct()
    corpus = old_docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).unionByName(
        new_docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )
    return jaccard_pairs(
        corpus, cands, shingle_n=shingle_n, threshold=threshold
    )


def jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Verify candidates with exact n-gram Jaccard (array_intersect /
    array_union on shingle sets). Joins are on doc ids (uniform)."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        candidate_pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32, token_hash: str = "xxhash64") -> DataFrame:
    """bits-bit SimHash per document: explode tokens, per-bit weighted
    vote via groupBy sum over shifted token hashes — two narrow shuffles
    keyed on doc_id, all JVM expressions.

    token_hash='xxhash64' is the cheap production variant;
    token_hash='md5' derives 32 bits from the first 8 hex chars of
    md5(token), which DuckDB can reproduce exactly (oracle parity)."""
    if token_hash == "md5":
        h_expr = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    elif token_hash == "xxhash64":
        h_expr = F.xxhash64("tok")
    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")
    tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", h_expr)
    votes = tokens.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"bit{i}")
            for i in range(bits)
        ]
    )
    sim = votes.select(
        "doc_id",
        sum(
            (F.when(F.col(f"bit{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)))
            for i in range(bits)
        ).cast("long").alias("simhash"),
    )
    return sim


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    n_blocks: int = 4,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Pairs within `max_hamming` bits: block-permutation LSH (split the
    hash into n_blocks; any pair within distance d < n_blocks shares at
    least one exact block — pigeonhole, so recall is EXACTLY 1.0, which
    is why an all-pairs DuckDB oracle can check this operator), then
    exact popcount filter via bit_count. Scale: block-key self-join,
    uniform keys."""
    sim = simhash(docs, id_col, text_col, bits, token_hash=token_hash)
    block_bits = bits // n_blocks
    mask = (1 << block_bits) - 1
    blocks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_no"),
                        F.shiftright(F.col("simhash"), i * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("block_val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "simhash", "blk.block_no", "blk.block_val")
    l, r = blocks.alias("l"), blocks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.block_no") == F.col("r.block_no"))
            & (F.col("l.block_val") == F.col("r.block_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def prefix_filter_candidates(
    corpus: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT-recall candidate pairs for Jaccard >= threshold via prefix
    filtering (the SSJoin/PPJoin family, Chaudhuri et al. ICDE'06 /
    Xiao et al. WWW'08) — the deterministic alternative to MinHash-LSH:
    no probabilistic recall argument, the guarantee is a pigeonhole
    lemma. Tokens are globally ordered rarest-first ((doc-frequency,
    token) ascending); each doc keeps only its first
    |T| - ceil(t*|T|) + 1 tokens under that order; any pair with
    J >= t must share at least one prefix token.

    Scale shape: the candidate join is an equi-join on prefix tokens,
    and because prefixes keep the RAREST tokens, the per-token fan-in
    is bounded by that token's document frequency with the hot head of
    the distribution excluded from prefixes whenever |T| allows — the
    inverse of the naive token-join's skew profile. Pair fan-in is
    sum over prefix tokens of C(df, 2), dominated by the rare tail."""
    sh = corpus.select(
        F.col(id_col).alias("pf_id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("gram"),
    )
    freq = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("df_cnt"))
    toks = (
        sh.join(freq, "gram")
        .groupBy("pf_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df_cnt"), F.col("gram")))
            ).alias("ts")
        )
    )
    prefix_len = (
        F.size("ts")
        - F.ceil(F.lit(float(threshold)) * F.size("ts")).cast("int")
        + F.lit(1)
    )
    pref = toks.select(
        "pf_id", F.explode(F.slice("ts", F.lit(1), prefix_len)).alias("p")
    ).select("pf_id", F.col("p.gram").alias("gram"))
    return (
        pref.alias("a")
        .join(pref.alias("b"), "gram")
        .where(F.col("a.pf_id") < F.col("b.pf_id"))
        .select(F.col("a.pf_id").alias("doc_a"), F.col("b.pf_id").alias("doc_b"))
        .dropDuplicates()
    )


def repeated_spans(
    docs: DataFrame,
    n: int = 12,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact repeated-span discovery — the candidate stage of
    substring-level dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): every word n-gram occurring
    at least `min_count` times corpus-wide, with the (doc, token
    position) of each occurrence so the caller can splice spans out.

    Returns (id_col, pos, gram, n_occurrences, n_docs). Plan: one
    posexplode of the JVM n-gram array, then TWO window counts over the
    gram key (occurrences; distinct docs via the dense-rank trick — a
    count(distinct) window is unsupported), then the filter. At corpus
    scale nearly all n-grams are unique (Zipf tail), so the shuffle is
    gram-keyed with no hot keys EXCEPT true repeats — which are exactly
    the rows that survive; AQE skew-split handles pathological
    boilerplate grams (the n-gram length caps per-key fan-in at total
    occurrence count, not corpus size)."""
    from .curation import ngrams as _word_ngrams

    grams = docs.select(
        F.col(id_col),
        F.posexplode(_word_ngrams(F.col(text_col), n)).alias("pos", "gram"),
    )
    w = Window.partitionBy("gram")
    w_doc = Window.partitionBy("gram", id_col)
    occ = F.count("*").over(w)
    # distinct docs per gram: dense_rank over doc within gram, maxed
    first_in_doc = F.row_number().over(
        w_doc.orderBy("pos")
    )
    out = (
        grams.withColumn("n_occurrences", occ)
        .withColumn("__fid", first_in_doc)
        .withColumn(
            "n_docs",
            F.sum(F.when(F.col("__fid") == 1, 1).otherwise(0)).over(w),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .select(
            id_col, F.col("pos").cast("long").alias("pos"), "gram",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )
    return out


def select_survivors(
    docs: DataFrame,
    groups: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "dup_group",
    prefer_col: str | None = None,
) -> DataFrame:
    """The step AFTER duplicate clustering: keep one survivor per dup
    group. Deterministic argmax — prefer the largest `prefer_col`
    (e.g. n_chars, a quality score), ties and the no-preference case
    broken by smallest id. One struct-max aggregation (map-side
    partials, no window sort, no join-back): returns the surviving
    rows of `docs`."""
    joined = docs.join(groups, id_col)
    # two aggregation stages keep this type-agnostic: max preference
    # per group, then min id among the maxima — both map-side partial
    if prefer_col is not None:
        best = joined.groupBy(group_col).agg(
            F.max(prefer_col).alias("__best")
        )
        joined = joined.join(best, group_col).filter(
            F.col(prefer_col) == F.col("__best")
        ).drop("__best")
    winners = joined.groupBy(group_col).agg(F.min(id_col).alias(id_col))
    return docs.join(winners.select(id_col), id_col, "left_semi")


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    modulus: int = 64,
) -> DataFrame:
    """Content-defined chunking (Rabin-style): cut a document after
    position p whenever the hash of the trailing ``window`` characters
    is ≡ 0 mod ``modulus`` — boundaries move WITH the content, so an
    insertion near the start shifts every chunk of a byte-offset
    splitter but leaves all later CDC chunks (and their hashes)
    identical. Chunk-hash grouping therefore catches near-duplicates
    that differ by splices, the storage-dedup trick applied to corpus
    text. Expected chunk length ≈ ``modulus`` chars.

    Boundaries are position-local (fixed-window hash, no running
    state, no min/max clamp), which is what makes the operator a pure
    projection — sequence/transform/filter over positions, one explode;
    no shuffle, no Python, and bit-for-bit replayable in SQL through
    the md5 bridge. Output: (id, chunk_idx, start, chunk_len,
    chunk_md5), zero-length tail chunks dropped."""
    text = F.col(text_col)
    n = F.length(text)
    pos = F.when(
        n >= window, F.sequence(F.lit(window), n)
    ).otherwise(F.array().cast("array<int>"))
    bridge = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")  # noqa: E731
    cut = F.filter(
        pos,
        lambda p: bridge(text.substr(p - F.lit(window - 1), F.lit(window)))
        % modulus == 0,
    )
    cuts = F.concat(F.array(F.lit(0)), cut, F.array(n))
    # materialize the cut array ONCE per row before anything indexes
    # into it: Catalyst expression trees have no sharing, so writing
    # element_at(<cuts-expr>, …) twice per span would re-run the whole
    # per-position boundary hash per reference (measured 25x blowup);
    # the explicit projection boundary makes downstream refs read the
    # computed array (CollapseProject keeps multi-referenced non-cheap
    # producers un-inlined)
    staged = docs.select(
        F.col(id_col).alias("id"), text.alias("__t"), cuts.alias("__cuts")
    )
    rows = staged.select(
        "id", "__t", "__cuts",
        F.explode(
            F.sequence(F.lit(0), F.size(F.col("__cuts")) - 2)
        ).alias("chunk_idx"),
    ).select(
        "id", "__t", "chunk_idx",
        F.element_at("__cuts", F.col("chunk_idx") + 1).alias("start"),
        (
            F.element_at("__cuts", F.col("chunk_idx") + 2)
            - F.element_at("__cuts", F.col("chunk_idx") + 1)
        ).alias("chunk_len"),
    )
    return rows.filter(F.col("chunk_len") > 0).select(
        "id", "chunk_idx", "start", "chunk_len",
        F.md5(
            F.col("__t").substr(F.col("start") + 1, F.col("chunk_len"))
        ).alias("chunk_md5"),
    )


def containment_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Asymmetric near-SUPERSET verification: for candidate pairs,
    exact shingle containment ``|A∩B| / |A|`` in both directions —
    the quote/excerpt/boilerplate-inclusion detector Jaccard misses
    (a short document fully contained in a long one has tiny Jaccard
    but containment 1.0). A pair survives when EITHER direction
    reaches ``threshold``; ``direction`` says which ('a_in_b',
    'b_in_a', or 'both'). Same plan shape as jaccard_pairs: two
    id-keyed joins against the shingle table + one projection —
    candidate generation (minhash bands, cdc chunk hits) is unchanged
    upstream."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    c_ab = inter / F.greatest(F.size("sh_a"), F.lit(1)).cast("double")
    c_ba = inter / F.greatest(F.size("sh_b"), F.lit(1)).cast("double")
    out = (
        candidate_pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("c_ab", c_ab)
        .withColumn("c_ba", c_ba)
        .filter(
            (F.col("c_ab") >= threshold) | (F.col("c_ba") >= threshold)
        )
    )
    direction = (
        F.when(
            (F.col("c_ab") >= threshold) & (F.col("c_ba") >= threshold),
            F.lit("both"),
        )
        .when(F.col("c_ab") >= threshold, F.lit("a_in_b"))
        .otherwise(F.lit("b_in_a"))
    )
    return out.select(
        "doc_a", "doc_b",
        F.round("c_ab", 6).alias("c_ab_r"),
        F.round("c_ba", 6).alias("c_ba_r"),
        direction.alias("direction"),
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    tau: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540): cluster-then-prune. Each vector
    is assigned to its nearest centroid (the deterministic IVF codebook
    from similarity.ivf_centroids); WITHIN each cell, a vector is
    dropped when a lower-id vector in the same cell has cosine >= tau
    to it. The paper keeps one near-arbitrary exemplar per semantic
    group; the min-id rule makes that choice partition-, engine- and
    cluster-size-invariant (and SQL-replayable).

    Scale shape: pair generation is an equi-self-join on the cell id —
    fan-in is the cell size, never corpus all-pairs; pick n_cells so
    cells hold ~the paper's 10k-50k points and the within-cell
    quadratic term stays bounded (the exact trade the paper makes).
    Cosines run in the codegen'd zip_with kernel; the codebook is the
    only driver-side state.

    Returns (id_col, cell, kept) — one row per input vector.
    """
    from .similarity import _nearest_cells, cosine

    cents = [
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in centroids.collect()
    ]
    assigned = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("cell", _nearest_cells(F.col("vec"), cents, 1)[0])
    a, b = assigned.alias("a"), assigned.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .where(cosine(F.col("a.vec"), F.col("b.vec")) >= F.lit(float(tau)))
        .select(F.col("b.vid").alias("vid"))
        .dropDuplicates()
        .withColumn("__dropped", F.lit(True))
    )
    return (
        assigned.join(dropped, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            F.col("cell").cast("int").alias("cell"),
            F.col("__dropped").isNull().alias("kept"),
        )
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str | None = "\n\n",
    words_per_para: int | None = None,
    keep_empty: bool = True,
) -> DataFrame:
    """Paragraph-level exact deduplication — the Dolma/FineWeb-style
    boilerplate REMOVER (not just detector): split every document into
    paragraphs, keep only the globally FIRST occurrence of each
    distinct paragraph (first = smallest (doc_id, paragraph index) —
    deterministic across partitionings/engines), drop every repeat,
    and reassemble the documents.

    Segmenters: ``sep`` splits on a separator string (real corpora:
    "\\n\\n"); ``words_per_para=k`` instead slices fixed k-word windows
    (for flat word-stream corpora). Exactly one must be active.

    Scale shape: ONE groupBy on the paragraph hash-key computes the
    global first occurrence (map-side-combinable MIN of a (doc, idx)
    struct), one equi-join back marks keepers, one per-doc aggregation
    re-concatenates in index order (array_sort of (idx, para) structs
    — not collect_list order, which is partitioning-dependent). No
    all-pairs anywhere; state per distinct paragraph is one struct.

    Returns (id_col, text, n_paras, n_kept) — text rebuilt from the
    kept paragraphs; with keep_empty, fully-boilerplate documents
    survive with empty text (so downstream length filters decide).
    """
    if (sep is None) == (words_per_para is None):
        raise ValueError("exactly one of sep / words_per_para required")
    d = docs.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    if sep is not None:
        paras = d.select(
            "__id", F.posexplode(F.split(F.col("__t"), F.lit(sep).cast("string"),
                                         -1)).alias("__idx", "__p")
        )
    else:
        w = int(words_per_para)
        words = F.split(F.col("__t"), " ")
        slices = F.transform(
            F.sequence(F.lit(0), F.floor((F.size(words) - 1) / F.lit(w)).cast("int")),
            lambda i: F.array_join(F.slice(words, i * w + 1, w), " "),
        )
        paras = d.select("__id", F.posexplode(slices).alias("__idx", "__p"))
    firsts = paras.groupBy("__p").agg(
        F.min(F.struct("__id", "__idx")).alias("__first")
    )
    kept = paras.join(firsts, "__p").where(
        (F.col("__first.__id") == F.col("__id"))
        & (F.col("__first.__idx") == F.col("__idx"))
    )
    joiner = sep if sep is not None else " "
    reasm = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__p"))),
                lambda s: s["__p"],
            ),
            joiner,
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = paras.groupBy("__id").agg(F.count(F.lit(1)).alias("n_paras"))
    out = totals.join(reasm, "__id", "left" if keep_empty else "inner").select(
        F.col("__id").alias(id_col),
        F.coalesce("text", F.lit("")).alias("text"),
        F.col("n_paras").cast("long").alias("n_paras"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )
    return out


def remove_repeated_spans(
    docs: DataFrame,
    n: int = 12,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring-level dedup EXECUTION — the second half of Lee et al.
    2022 (:func:`repeated_spans` is the discovery half): every word
    n-gram occurring >= ``min_count`` times corpus-wide keeps exactly
    its FIRST occurrence (global (doc_id, pos) order) and every other
    occurrence is cut from its document. Overlapping cut spans merge
    into maximal intervals before token removal, so nested/staggered
    repeats cut cleanly.

    Plan: one posexplode into the gram relation, ONE gram-keyed
    shuffle serving both windows (the occurrence count and the
    first-occurrence rank share the partition key), a doc-keyed
    interval aggregation, and a doc-keyed join back. The interval
    merge is a pure-JVM ``aggregate`` fold over the sorted start
    array (fixed span width makes the running end the last element's
    end); token removal is a ``filter`` over position-tagged tokens.
    Nothing after the gram shuffle is corpus-fan-out: cut rows are
    bounded by true repeats (Zipf tail grams never survive the
    min_count filter).

    Output: (id_col, n_tokens, n_kept, n_cut_tokens, n_intervals,
    dedup_md5) with ``dedup_md5`` the md5 of the whitespace-normalized
    deduplicated text (single-space joined surviving tokens).
    """
    from .curation import _tokens, ngrams as _word_ngrams

    grams = docs.select(
        F.col(id_col),
        F.posexplode(_word_ngrams(F.col(text_col), n)).alias("pos", "gram"),
    )
    w = Window.partitionBy("gram")
    first = F.row_number().over(w.orderBy(id_col, "pos"))
    cut = (
        grams.withColumn("__occ", F.count("*").over(w))
        .withColumn("__rn", first)
        .filter((F.col("__occ") >= min_count) & (F.col("__rn") > 1))
        .select(id_col, F.col("pos").cast("long").alias("pos"))
    )
    starts = cut.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("__starts")
    )
    empty_ivs = F.expr("CAST(array() AS array<struct<s:BIGINT,e:BIGINT>>)")
    merged = F.aggregate(
        F.col("__starts"),
        empty_ivs,
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(
                            F.element_at(acc, -1)["e"], p + F.lit(n)
                        ).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(F.struct(p.alias("s"), (p + F.lit(n)).alias("e"))),
            )
        ),
    )
    toks = _tokens(F.col(text_col))
    tagged = F.transform(
        toks, lambda t, i: F.struct(t.alias("t"), i.cast("long").alias("i"))
    )
    ivs = F.coalesce(F.col("__ivs"), empty_ivs)
    kept = F.filter(
        tagged,
        lambda s: ~F.exists(
            ivs, lambda iv: (s["i"] >= iv["s"]) & (s["i"] < iv["e"])
        ),
    )
    out_text = F.array_join(F.transform(kept, lambda s: s["t"]), " ")
    return (
        docs.join(
            starts.withColumn("__ivs", merged).drop("__starts"),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(kept).cast("long").alias("n_kept"),
            (F.size(toks) - F.size(kept)).cast("long").alias("n_cut_tokens"),
            F.size(ivs).cast("long").alias("n_intervals"),
            F.md5(out_text).alias("dedup_md5"),
        )
    )


def minhash_md5_candidates(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash LSH candidate pairs with an md5-derived hash family —
    the ORACLE-REPLAYABLE twin of :func:`minhash_lsh_candidates`
    (which re-mixes xxhash64 lanes for speed; DuckDB has no xxhash64,
    so a cross-engine evaluation of the candidate set itself needs a
    family both engines share). Lane i hashes each shingle through
    md5(f"mh{i}|" + shingle) → first 8 hex chars → 32-bit int; band
    keys concatenate the lane minima. Use for measurement/eval; the
    xxhash64 family remains the production hot path.
    """
    r = num_hashes // bands
    assert bands * r == num_hashes, "bands must divide num_hashes"
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )

    def lane(i: int):
        return F.array_min(
            F.transform(
                F.col("sh"),
                lambda g: F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"mh{i}|"), g)), 1, 8),
                    16,
                    10,
                ).cast("long"),
            )
        )

    sig = sh.select("doc_id", *[lane(i).alias(f"s{i}") for i in range(num_hashes)])
    keys = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(b),
                        *[
                            F.col(f"s{b * r + j}").cast("string")
                            for j in range(r)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    )
    a = keys.select(F.col("doc_id").alias("doc_a"), "bk")
    b = keys.select(F.col("doc_id").alias("doc_b"), "bk")
    return (
        a.join(b, "bk")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )


def lsh_pr_eval(
    corpus: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate-quality evaluation of the banded MinHash index:
    precision/recall of the RAW candidate pair set against exact
    shingle-Jaccard ≥ threshold ground truth — the measurement every
    dedup deployment owes its tuning loop (band/row trade-off is a
    recall curve, not a constant). Run on a bounded sample: ground
    truth is all-pairs by construction (the caller samples; the
    production index never does this).

    Output is ONE row of integer counts + 6-dp ratios: n_truth,
    n_candidates, n_hits, precision_r, recall_r. Integer-exact joins;
    the only doubles are the two final rounded divisions.
    """
    cand = minhash_md5_candidates(
        corpus, num_hashes=num_hashes, bands=bands,
        id_col=id_col, text_col=text_col,
    )
    ids = corpus.select(F.col(id_col).alias("doc_id"))
    allp = (
        ids.select(F.col("doc_id").alias("doc_a"))
        .crossJoin(ids.select(F.col("doc_id").alias("doc_b")))
        .where(F.col("doc_a") < F.col("doc_b"))
    )
    truth = jaccard_pairs(
        corpus, allp, id_col=id_col, text_col=text_col, threshold=threshold
    ).select("doc_a", "doc_b")
    hits = truth.join(cand, ["doc_a", "doc_b"])
    stats = (
        truth.agg(F.count(F.lit(1)).alias("n")).select(F.lit("t").alias("k"), "n")
        .unionByName(
            cand.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("c").alias("k"), "n"
            )
        )
        .unionByName(
            hits.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("h").alias("k"), "n"
            )
        )
    )
    wide = stats.groupBy().pivot("k", ["t", "c", "h"]).sum("n")
    return wide.select(
        F.col("t").cast("long").alias("n_truth"),
        F.col("c").cast("long").alias("n_candidates"),
        F.col("h").cast("long").alias("n_hits"),
        F.round(
            F.col("h").cast("double")
            / F.greatest(F.col("c"), F.lit(1)).cast("double"),
            6,
        ).alias("precision_r"),
        F.round(
            F.col("h").cast("double")
            / F.greatest(F.col("t"), F.lit(1)).cast("double"),
            6,
        ).alias("recall_r"),
    )
