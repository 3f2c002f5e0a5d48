"""Corpus-curation operators: benchmark decontamination and n-gram
language-model quality scoring.

Standard large-scale training-data hygiene (GPT-3 appendix C
13-gram decontamination; CCNet-style LM perplexity filtering) expressed
Spark-first:

- **decontamination**: the benchmark side is small by definition
  (eval suites are MBs), so its distinct n-grams become a broadcast
  build side; the corpus is scanned once, its n-grams generated as a
  JVM array expression (``transform`` over a position ``sequence`` +
  ``slice`` — no explode until the join needs rows), and matches
  resolve through one broadcast semi/inner join. No corpus shuffle
  except the per-doc count aggregation, which is partial-agg friendly.
  Join key is the n-gram STRING (broadcast map lookup — exact, no
  collision caveat); pass ``hashed=True`` to switch the key to
  ``xxhash64`` when the benchmark set is too wide to broadcast raw.

- **LM scoring**: a bigram add-one-smoothed model trained on the
  corpus itself, P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V). One tokenize
  pass produces the bigram relation; c2 and c1 come from two window
  counts over it (no join-back — Spark has no cross-consumer CSE, a
  groupBy+join would re-run the tokenize lineage per consumer); the
  per-doc mean log-prob is one final aggregation. V (distinct-token
  count) is the only scalar driver value (bounded collect, same
  contract as linking.py's corpus total).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped (split on a
    zero-width leading match yields '')."""
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda w: w != ""
    )


def ngrams(col: Column, n: int) -> Column:
    """Array of space-joined word n-grams — pure JVM: transform over a
    position sequence + slice, no explode."""
    toks = _tokens(col)
    m = F.size(toks) - F.lit(n - 1)
    return F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """Flag training documents sharing any word n-gram with a benchmark
    corpus. Returns (id_col, n_grams, n_hits, contaminated) for every
    doc; n_hits counts DISTINCT overlapping n-grams."""
    key = (lambda c: F.xxhash64(c)) if hashed else (lambda c: c)

    bench = (
        benchmark.select(F.explode(ngrams(F.col(bench_text_col), n)).alias("g"))
        .select(key(F.col("g")).alias("bk"))
        .dropDuplicates()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.size(ngrams(F.col(text_col), n)).cast("long").alias("n_grams"),
        F.explode_outer(F.array_distinct(ngrams(F.col(text_col), n))).alias("g"),
    )
    hits = (
        doc_grams.join(
            F.broadcast(bench), key(F.col("g")) == F.col("bk"), "left"
        )
        .groupBy(id_col)
        .agg(
            # n_grams is constant per doc; max() keeps the agg
            # order-independent by construction (first() is only
            # deterministic by that same argument)
            F.max("n_grams").alias("n_grams"),
            F.count(F.col("bk")).cast("long").alias("n_hits"),
        )
    )
    return hits.select(
        id_col, "n_grams", "n_hits", (F.col("n_hits") > 0).alias("contaminated")
    )


def lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Bigram add-one LM trained on the corpus, scored per document:
    avg_logprob = mean over bigrams of ln((c(w1,w2)+1)/(c(w1)+V)),
    where c(w1) counts w1 as a bigram PREFIX and V is the corpus
    distinct-token count. Rounded so cross-engine float-sum order can't
    flip low bits. Docs with <2 tokens get NULL (no bigrams).

    Plan: tokenize once -> bigram rows -> two window counts -> per-doc
    agg. Window counts shuffle by (w1,w2) then w1 — both partial-agg
    free but bounded by vocabulary skew; hot unigrams ('the') are the
    skew hazard, and the window variant degrades gracefully under AQE
    skew-split because no row explosion happens after the count."""
    toks = _tokens(F.col(text_col))
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bigrams = docs.select(
        F.col(id_col), F.explode(pairs).alias("p")
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    v_distinct = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .agg(F.countDistinct("w"))
        .first()[0]
    )

    c2 = F.count("*").over(Window.partitionBy("w1", "w2"))
    c1 = F.count("*").over(Window.partitionBy("w1"))
    scored = bigrams.withColumn("c2", c2).withColumn("c1", c1).select(
        id_col,
        F.log((F.col("c2") + F.lit(1)) / (F.col("c1") + F.lit(v_distinct)))
        .alias("lp"),
    )
    return (
        docs.select(id_col)
        .join(
            scored.groupBy(id_col).agg(
                F.round(F.avg("lp"), round_digits).alias("avg_logprob"),
                F.count("*").cast("long").alias("n_bigrams"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            "avg_logprob",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG/retrieval-style sliding-window chunking: split each document
    into word-token windows of `max_tokens` with `overlap` tokens of
    context carried between consecutive chunks (stride =
    max_tokens - overlap).

    Pure JVM: windows are a `transform` over a stride `sequence` +
    `slice` (the n-gram construction generalized), exploded to one row
    per chunk — per-document work, no shuffle, embarrassingly parallel
    at any corpus size. Output: (id_col, chunk_idx, n_chunk_tokens,
    chunk_text, tok_start) with tok_start the 0-based token offset so
    spans map back into the source. Empty documents produce no chunks;
    a final shorter window is kept (never dropped, never padded). The
    last chunk starts at the last stride position whose window still
    adds NEW tokens — a document of exactly max_tokens yields one
    chunk."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    stride = max_tokens - overlap
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    # chunks = ceil((n - overlap) / stride), floored at 1 for any
    # non-empty doc (short docs still get their single chunk); guard
    # the sequence — sequence(0, -1) DESCENDS in Spark
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    chunks = F.when(n <= 0, F.array().cast(
        "array<struct<chunk_idx:int,tok_start:int,win:array<string>>>"
    )).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                (i * stride).cast("int").alias("tok_start"),
                F.slice(toks, i * stride + 1, max_tokens).alias("win"),
            ),
        )
    )
    out = docs.select(
        F.col(id_col), F.explode(chunks).alias("c")
    )
    return out.select(
        id_col,
        F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
        F.size("c.win").cast("long").alias("n_chunk_tokens"),
        F.array_join("c.win", " ").alias("chunk_text"),
        F.col("c.tok_start").cast("long").alias("tok_start"),
    )


def sft_pairs(
    transcripts: DataFrame,
    n_context: int = 4,
    target_roles: tuple[str, ...] = ("assistant",),
    min_context: int = 1,
) -> DataFrame:
    """Render conversation transcripts into SFT training pairs: for
    every turn whose role is in ``target_roles``, the prompt is the
    previous ``<= n_context`` turns rendered ``role: text`` and joined
    with newlines (stable turn order), the completion is the turn's
    own text — the transcripts-to-training-data transform at the end
    of every conversation pipeline.

    Scale shape: ONE conv-keyed ordered window (ROWS n_context
    PRECEDING .. 1 PRECEDING) collects the context structs; rendering
    sorts the collected frame by turn_idx via array_sort (never
    relying on collect_list accumulation order) and stays in JVM
    expressions. A conversation is one window group — the same
    per-entity profile as every turn window in this repo.

    Output: (conv_id, turn_idx, prompt, completion, n_context_turns);
    turns with fewer than ``min_context`` preceding turns are dropped
    (no-context pairs teach nothing).
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-int(n_context), -1)
    )
    ctx = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "text")).over(w)
    )
    rendered = F.array_join(
        F.transform(ctx, lambda s: F.concat(s["role"], F.lit(": "), s["text"])),
        "\n",
    )
    return (
        transcripts.select(
            "conv_id", "turn_idx", "role", "text",
            rendered.alias("prompt"),
            F.size(ctx).cast("long").alias("n_context_turns"),
        )
        .where(
            F.col("role").isin(*target_roles)
            & (F.col("n_context_turns") >= int(min_context))
        )
        .select(
            "conv_id", "turn_idx", "prompt",
            F.col("text").alias("completion"), "n_context_turns",
        )
    )


def _hashed_grams(docs: DataFrame, id_col: str, text_col: str, n: int, buckets: int) -> DataFrame:
    """(id, bucket) rows: word n-grams hashed through the md5 bridge
    (Spark conv(substring(md5(g),1,8),16,10) == DuckDB
    ('0x'||substr(md5(g),1,8))::BIGINT) mod ``buckets`` — the feature
    hashing trick, replayable cross-engine."""
    grams = ngrams(F.col(text_col), n) if n > 1 else _tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("gram")
    ).select(
        "id",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        ).alias("bucket"),
    )


def dsir_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 1 << 12,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS'23 "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by the log importance ratio of a hashed-n-gram bag-of-
    words model fit on the target domain vs one fit on the raw corpus,

        logw(d) = sum_{g in d} [ ln p_tgt(bucket(g)) - ln p_raw(bucket(g)) ]

    with add-alpha smoothed multinomials p(b) = (c(b)+alpha) /
    (C+alpha*B). Resampling the raw corpus proportional to exp(logw)
    shifts it toward the target domain — the standard pre-training
    data-selection recipe when the target set (curated/domain text)
    is far smaller than the raw pool.

    Plan shape (the 100 TB argument): the model state is two
    bucket-count tables bounded by ``buckets`` rows (default 4096) —
    KBs, broadcast; the raw corpus is tokenized ONCE into hashed
    features, joined against the broadcast ratio table, and absorbed
    by a map-side-partial per-doc sum. The only corpus-keyed shuffle
    is the final groupBy(id). Two scalar totals come to the driver
    (bounded, same contract as linking.py). Target corpus is scanned
    once; it is small by definition.

    Output: (id, n_feats, logw_r) — logw rounded 6 dp (cross-engine
    divergence is float SUM order only; ln parity holds via libm).
    Docs with no features (< n tokens) are absent — gate upstream.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    tgt_feats = _hashed_grams(target_docs, id_col, text_col, n, buckets)
    raw_feats = _hashed_grams(raw_docs, id_col, text_col, n, buckets)
    # lazy-checkpoint the bucket tables: they are <= ``buckets`` rows
    # but have the full corpus tokenization as lineage, and they are
    # consumed twice each (totals + ratio) — Spark has no
    # cross-consumer CSE, so without the cut the corpus would be
    # re-tokenized once per consumer (measured 17 s -> ~6 s at sf0.1).
    # The raw corpus itself is deliberately NOT cached: it is the
    # 100 TB side, and DSIR's two passes over it (train, score) are
    # the algorithm's intended shape.
    tcnt = (
        tgt_feats.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
        .localCheckpoint(eager=False)
    )
    rcnt = (
        raw_feats.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("rc"))
        .localCheckpoint(eager=False)
    )
    totals = (
        tcnt.agg(F.sum("tc").alias("t")).crossJoin(rcnt.agg(F.sum("rc").alias("r")))
    ).first()
    t_total = float(totals["t"] or 0) + alpha * buckets
    r_total = float(totals["r"] or 0) + alpha * buckets
    ratio = (
        rcnt.join(tcnt, "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("tc", F.lit(0)) + F.lit(alpha)) / F.lit(t_total)
                )
                - F.log(
                    (F.coalesce("rc", F.lit(0)) + F.lit(alpha)) / F.lit(r_total)
                )
            ).alias("logratio"),
        )
    )
    joined = raw_feats.join(F.broadcast(ratio), "bucket", "inner")
    return joined.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        F.round(F.sum("logratio"), 6).alias("logw_r"),
    )


def preference_pairs(
    transcripts: DataFrame,
    response_role: str = "assistant",
    prompt_role: str = "user",
) -> DataFrame:
    """DPO/RLHF preference-pair assembly from transcripts: for every
    response turn whose immediate predecessor is a prompt turn, emit
    (prompt, chosen, rejected) where chosen = the conversation's real
    response and rejected = the response another conversation gave at
    the SAME turn position (the standard mismatched-response negative
    when no human preference labels exist — the real answer to the
    prompt is preferred over a fluent answer to a different prompt).

    Partner selection is deterministic and collision-free: within each
    turn position, conversations are ordered by the md5 bridge of
    conv_id and each takes the NEXT one's response text, cyclically
    (lead + coalesce(first_value) over the same window) — a fixed
    derangement whenever >= 2 conversations share the position;
    positions with a single conversation produce no pair (rejected
    would equal chosen) and are filtered by partner != self.

    Plan: one conv-keyed window (prompt lookup via lag) + one
    turn-position-keyed window (partner rotation) — two shuffles, no
    joins, no Python. Both windows replay exactly in ANSI SQL, so the
    output is value-oracle-able.
    """
    conv_w = Window.partitionBy("conv_id").orderBy("turn_idx")
    resp = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.lag("role").over(conv_w).alias("prev_role"),
            F.lag("text").over(conv_w).alias("prev_text"),
        )
        .where((F.col("role") == response_role) & (F.col("prev_role") == prompt_role))
    )
    bridge = F.conv(F.substring(F.md5(F.col("conv_id")), 1, 8), 16, 10).cast("long")
    pos_w = Window.partitionBy("turn_idx").orderBy(bridge, F.col("conv_id"))
    pos_all = pos_w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        resp.select(
            "conv_id",
            "turn_idx",
            F.col("prev_text").alias("prompt"),
            F.col("text").alias("chosen"),
            F.coalesce(
                F.lead("text").over(pos_w), F.first("text").over(pos_all)
            ).alias("rejected"),
            F.coalesce(
                F.lead("conv_id").over(pos_w), F.first("conv_id").over(pos_all)
            ).alias("rejected_conv"),
        )
        .where(F.col("rejected_conv") != F.col("conv_id"))
        .drop("rejected_conv")
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document n-gram novelty / memorization-risk signal: the
    fraction of a document's DISTINCT word n-grams that also occur in
    at least ``min_df`` documents corpus-wide (itself included).
    High ``dup_frac`` marks boilerplate-heavy or near-memorized text —
    the per-document complement of pair-level MinHash dedup, used as a
    filter/weighting signal when dropping whole near-dup clusters is
    too blunt (Lee et al. 2021 report n-gram overlap fractions
    alongside substring dedup).

    Plan: one tokenize pass -> distinct (doc, gram) rows (the
    ``array_distinct`` happens BEFORE the explode, so within-doc
    repeats never become rows) -> gram document-frequency via ONE
    gram-keyed window count (rows are distinct per (doc, gram), so
    ``count(*)`` over the gram partition IS the document frequency —
    no join-back; Spark has no cross-consumer CSE) -> per-doc
    aggregation. Two shuffles total, both partial-agg-friendly or
    window-local; hot grams (corpus boilerplate) are the skew hazard
    and split cleanly under AQE because nothing explodes after the
    count. Docs with fewer than ``n`` words emit NULL dup_frac and
    zero counts.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams(F.col(text_col), n))).alias("g"),
    )
    df_w = F.count("*").over(Window.partitionBy("g"))
    per_doc = (
        grams.withColumn("__df", df_w)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("__df") >= min_df).cast("long"))
            .cast("long")
            .alias("n_dup"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_dup", F.lit(0).cast("long")).alias("n_dup"),
            F.round(F.col("n_dup") / F.col("n_grams"), round_digits).alias(
                "dup_frac"
            ),
        )
    )


def bt_strengths(
    pairs: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    rounds: int = 8,
    scale: int = 1_000_000,
    max_players: int = 4096,
) -> DataFrame:
    """Bradley-Terry strength fitting over pairwise comparisons — the
    arena/reward-model primitive (Chatbot-Arena-style model ranking,
    RLHF preference aggregation): given one row per comparison
    (winner, loser), estimate each player's strength pi with the
    classical MM iteration (Hunter 2004)

        pi_i  <-  W_i / sum_j n_ij / (pi_i + pi_j)

    run for a FIXED number of rounds from a uniform start.

    Determinism: the iteration runs on EXACT integer fixed-point
    (strengths scaled by ``scale``): each opponent term is
    ``n_ij * scale^2 // (p_i + p_j)`` — one exact floor division per
    term, integer sums (order-free), then
    ``p_i' = max(W_i * scale^2 // denom_i, 1)`` (the floor at 1 keeps
    never-winners from collapsing a later denominator to zero). Every
    operation replays bit-identically in ANSI SQL / DuckDB ``//``,
    so the output is value-oracle-able despite being an iterative
    fit. Wins are +1 smoothed (half-win prior) so W_i > 0.

    Scale shape: the corpus-sized comparison stream is absorbed by ONE
    partial-agg-friendly groupBy into a matrix bounded by
    |players|^2 (players are an arena-sized dictionary — models,
    checkpoints, prompt templates — hard-capped at ``max_players``
    with a LIMIT-ed probe so a corpus-shaped player column fails
    loudly before any driver materialization, the temperature_mix
    contract). The MM loop then runs driver-side on that bounded
    matrix, exactly like IVF codebooks / BPE merge tables.

    Output: (player, wins, n_comp, strength, rank) — raw win count,
    comparisons played, fixed-point strength, dense 1-based rank by
    (strength DESC, player ASC).
    """
    w, l = F.col(winner_col), F.col(loser_col)
    probe = (
        pairs.select(w.alias("p"))
        .union(pairs.select(l.alias("p")))
        .distinct()
        .limit(max_players + 1)
        .count()
    )
    if probe > max_players:
        raise ValueError(
            f"bt_strengths: >{max_players} players (max_players="
            f"{max_players}) — player columns look corpus-shaped, not an arena"
        )
    out_schema = "player long, wins long, n_comp long, strength long, rank long"
    if probe == 0:
        return pairs.sparkSession.createDataFrame([], out_schema)
    mat = (
        pairs.where(w != l)
        .select(
            F.least(w, l).alias("a"),
            F.greatest(w, l).alias("b"),
            (w < l).cast("long").alias("wa"),
        )
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("wa").cast("long").alias("wa"),
        )
        .collect()
    )
    dir_rows = []  # (i, j, n_ij, wins of i vs j)
    for r in mat:
        a, b, nn, wa = int(r["a"]), int(r["b"]), int(r["n"]), int(r["wa"])
        dir_rows.append((a, b, nn, wa))
        dir_rows.append((b, a, nn, nn - wa))
    players = sorted({i for i, _, _, _ in dir_rows})
    wins = {i: 0 for i in players}
    ncomp = {i: 0 for i in players}
    for i, _, nn, wi in dir_rows:
        wins[i] += wi
        ncomp[i] += nn
    s2 = scale * scale
    p = {i: scale for i in players}
    for _ in range(rounds):
        denom = {i: 0 for i in players}
        for i, j, nn, _ in dir_rows:
            denom[i] += (nn * s2) // (p[i] + p[j])
        p = {
            i: max(((wins[i] + 1) * s2) // denom[i], 1)
            for i in players
        }
    order = sorted(players, key=lambda i: (-p[i], i))
    rows = [
        (i, wins[i], ncomp[i], p[i], rank + 1)
        for rank, i in enumerate(order)
    ]
    return pairs.sparkSession.createDataFrame(rows, out_schema)


def conversation_quality(
    transcripts: DataFrame,
    min_turns: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Per-conversation SFT-data quality gate over the transcripts
    table — the instruction-tuning analogue of Gopher document rules:
    turn counts by role, tool-call count, role-repeat violations
    (consecutive turns by the same speaker — broken alternation),
    mean assistant-turn word length, and the conversation's wall-clock
    span. ``keep`` = enough turns, at least one assistant turn, and no
    role repeats — the standard pre-filter before SFT-pair assembly.

    Plan: ONE conv-keyed ordered window (lag for the repeat check)
    feeding ONE conv-keyed aggregation — the window's hash
    partitioning already satisfies the groupBy requirement, so the
    corpus shuffles once. Word counts are JVM expressions; the
    assistant mean is an exact integer sum divided once (no float
    accumulation order), rounded for the cross-engine contract.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wc = F.size(_tokens(F.col("text"))).cast("long")
    t = transcripts.select(
        "conv_id",
        "role",
        "tool",
        "ts",
        wc.alias("__wc"),
        (F.lag("role").over(w) == F.col("role")).cast("long").alias("__rep"),
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    agg = t.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).cast("long").alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("long"))
        .cast("long")
        .alias("n_assistant"),
        F.sum(F.col("tool").isNotNull().cast("long")).cast("long").alias("n_tool"),
        F.coalesce(F.sum("__rep"), F.lit(0)).cast("long").alias("n_role_repeats"),
        F.round(
            F.avg(F.when(F.col("role") == "assistant", F.col("__wc"))),
            round_digits,
        ).alias("mean_assistant_words"),
        (F.max(us) - F.min(us)).cast("long").alias("span_us"),
    )
    keep = (
        (F.col("n_turns") >= min_turns)
        & (F.col("n_assistant") >= 1)
        & (F.col("n_role_repeats") == 0)
    )
    return agg.withColumn("keep", keep)


def ccnet_buckets(
    docs: DataFrame,
    lo: float = -16.0,
    hi: float = 0.0,
    bins: int = 1000,
    qs: tuple = (0.33, 0.67),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the corpus bigram LM (:func:`lm_score`), then
    split the corpus into head / middle / tail terciles of LM quality
    — the signature move of the CCNet curation pipeline (train on
    head+middle, drop or downweight tail).

    Thresholds come from the fixed-bin histogram-quantile sketch, so
    the tercile cut is INTEGER bucket arithmetic end to end: each doc
    maps to clamp(floor((score-lo)/(hi-lo)*bins)) and compares against
    the two quantile buckets (smallest bucket whose cumulative count
    reaches ceil(q*total)) — no float comparison can straddle engines.
    Docs with no bigrams (NULL score) get a NULL bucket (CCNet drops
    them before LM scoring).

    Scale shape: lm_score's two vocabulary-keyed window counts + one
    per-doc agg; the histogram is ONE partial-agg shuffle with
    <= bins rows of state; thresholds are a 2-row driver collect
    (sketch contract). The labeling pass is a pure projection.
    """
    from json_ld_spark.operators.sketches import histogram_quantiles

    scored = lm_score(docs, text_col=text_col, id_col=id_col)
    x = F.col("avg_logprob").cast("double")
    ib = F.when(
        x.isNotNull(),
        F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    ((x - F.lit(float(lo))) / F.lit(float(hi - lo))) * bins
                ).cast("int"),
            ),
        ),
    )
    cuts = {
        float(r["q"]): int(r["bucket"])
        for r in histogram_quantiles(
            scored, "avg_logprob", lo=lo, hi=hi, bins=bins, qs=qs
        ).collect()
    }
    # empty/all-NULL corpora produce no histogram rows; -1 keeps the
    # projection valid (no row has a bucket <= -1, labels stay NULL
    # via the ib guard or fall to "head" vacuously on zero rows)
    b_lo = cuts.get(float(qs[0]), -1)
    b_hi = cuts.get(float(qs[1]), -1)
    label = (
        F.when(ib.isNull(), F.lit(None).cast("string"))
        .when(ib <= F.lit(b_lo), F.lit("tail"))
        .when(ib <= F.lit(b_hi), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    return scored.select(
        id_col,
        "avg_logprob",
        ib.cast("int").alias("score_bucket"),
        label.alias("ccnet_bucket"),
    )


def label_votes(
    annotations: DataFrame,
    item_col: str = "item",
    annotator_col: str = "annotator",
    label_col: str = "label",
) -> DataFrame:
    """Multi-annotator label aggregation with one Dawid-Skene-style
    reliability round (Dawid & Skene 1979; the modern crowd/LLM-judge
    ensemble shape): round 1 takes the per-item majority label; round
    2 weights each annotator by HOW MANY items it agreed with the
    round-1 majority on (an exact integer — the deterministic stand-in
    for the EM confusion-matrix weight, chosen so the whole pipeline
    is integer-exact and engine-portable), then revotes with those
    weights. Ties break to the lexicographically smallest label at
    both rounds, so the output is a pure function of the input set.

    Output: ``(item, n_votes, label_mv, label_weighted, top_weight)``.

    Plan shape: two item-keyed aggs (map-side combinable min-of-struct
    argmin — no windows), one annotator-keyed agg over the
    item-joined votes (annotator table is workforce-sized, so the
    round-2 weight join broadcasts), and one final item-keyed agg.
    Nothing is ever keyed on (item x annotator x label) beyond the
    input votes themselves; no all-pairs, no driver state."""
    votes = annotations.select(
        F.col(item_col).alias("item"),
        F.col(annotator_col).alias("annotator"),
        F.col(label_col).alias("label"),
    ).dropDuplicates()
    counts = votes.groupBy("item", "label").agg(F.count(F.lit(1)).alias("c"))
    mv = counts.groupBy("item").agg(
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("label").alias("lb")))["lb"]
        .alias("label_mv")
    )
    agree = (
        votes.join(mv, "item")
        .groupBy("annotator")
        .agg(
            F.sum(
                F.when(F.col("label") == F.col("label_mv"), 1).otherwise(0)
            ).alias("w")
        )
    )
    wcounts = (
        votes.join(F.broadcast(agree), "annotator")
        .groupBy("item", "label")
        .agg(F.sum("w").alias("wc"))
    )
    weighted = wcounts.groupBy("item").agg(
        F.min(F.struct((-F.col("wc")).alias("nwc"), F.col("label").alias("lb")))
        .alias("__m")
    )
    nv = votes.groupBy("item").agg(F.count(F.lit(1)).alias("n_votes"))
    return (
        nv.join(mv, "item")
        .join(weighted, "item")
        .select(
            "item",
            F.col("n_votes").cast("long").alias("n_votes"),
            "label_mv",
            F.col("__m")["lb"].alias("label_weighted"),
            (-F.col("__m")["nwc"]).cast("long").alias("top_weight"),
        )
    )


def classification_report(
    preds: DataFrame,
    true_col: str = "true_label",
    pred_col: str = "pred_label",
) -> DataFrame:
    """Per-class confusion-matrix evaluation of a prediction table —
    the scoreboard every labeler/classifier in the curation pipeline
    (knn_classify, hashed_ngram_score gates, label_votes) reports to:
    ``(label, support, tp, fp, fn, precision_r, recall_r, f1_r)`` for
    every label appearing on either side. F1 is computed as
    2*tp / (2*tp + fp + fn) — algebraically identical to the harmonic
    mean but a single division over exact integers, so engines can't
    disagree through intermediate float precision/recall. Zero
    denominators score 0.0 (sklearn's zero_division=0 convention).
    Macro/micro averages derive by one trivial aggregation over the
    output (kept per-class so the output grain is uniform).

    Plan shape: three map-side-combinable label-keyed aggs (tp /
    support / predicted-count) + two label-keyed outer joins over
    label-cardinality-sized tables — the corpus is touched once per
    agg, never joined row-to-row."""
    m = preds.select(
        F.col(true_col).alias("t"), F.col(pred_col).alias("p")
    )
    tp = (
        m.filter(F.col("t") == F.col("p"))
        .groupBy(F.col("t").alias("label"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    sup = m.groupBy(F.col("t").alias("label")).agg(
        F.count(F.lit(1)).alias("support")
    )
    pc = m.groupBy(F.col("p").alias("label")).agg(
        F.count(F.lit(1)).alias("pred_n")
    )
    base = (
        sup.join(pc, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            (F.coalesce("pred_n", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.coalesce("support", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fn"),
        )
    )
    def _ratio(num, den):
        return F.when(den > 0, F.round(num / den.cast("double"), 6)).otherwise(
            F.lit(0.0)
        )

    return base.select(
        "label", "support", "tp", "fp", "fn",
        _ratio(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision_r"),
        _ratio(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall_r"),
        _ratio(2 * F.col("tp"), 2 * F.col("tp") + F.col("fp") + F.col("fn"))
        .alias("f1_r"),
    )


def calibration_bins(
    scored: DataFrame,
    score_scaled_col: str,
    outcome_col: str,
    scale: int = 1000,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram / expected-calibration-error bins (Guo et
    al. 2017) over a table of (integer-scaled confidence, binary
    outcome): bin b collects rows with score_scaled*bins // scale == b
    (clamped), and reports count, positives, accuracy, mean confidence
    and the |acc - conf| gap. ECE = sum(n * gap) / N derives by one
    aggregation over the output.

    The confidence column is INTEGER-scaled (0..scale) by contract —
    the same trick as ccnet_buckets' tercile cut: bin assignment and
    mean confidence are then exact integer arithmetic (sums of longs),
    so no cross-engine float summation-order ambiguity exists anywhere;
    the only doubles are the two final divisions. One
    map-side-combinable agg over <= bins groups."""
    s = F.col(score_scaled_col).cast("long")
    b = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), (s * bins / F.lit(scale)).cast("long")),
    )
    return (
        scored.select(
            b.alias("bin"),
            s.alias("sc"),
            F.col(outcome_col).cast("long").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.round(F.sum("y") / F.count(F.lit(1)).cast("double"), 6).alias("acc_r"),
            F.round(
                F.sum("sc") / (F.count(F.lit(1)) * F.lit(scale)).cast("double"), 6
            ).alias("conf_r"),
            F.round(
                F.abs(
                    F.sum("y") / F.count(F.lit(1)).cast("double")
                    - F.sum("sc") / (F.count(F.lit(1)) * F.lit(scale)).cast("double")
                ),
                6,
            ).alias("gap_r"),
        )
    )


def doremi_weights(
    df: DataFrame,
    domain_col: str = "source",
    loss_col: str = "loss",
    size_col: str = "n_chars",
    eta: float = 1.0,
    max_domains: int = 100_000,
) -> DataFrame:
    """One DoReMi-style mirror-descent update of training-mixture
    domain weights (Xie et al., "DoReMi: Optimizing Data Mixtures
    Speeds Up Language Model Pretraining", NeurIPS'23): starting from
    the token-share reference mixture, each domain's weight is scaled
    by ``exp(eta * excess_loss)`` — excess = the domain's mean
    per-example loss minus the size-weighted global mean (the "proxy
    minus reference" regret signal) — then renormalized. Domains whose
    examples are harder than the corpus average get upweighted; the
    output column feeds `temperature_mix` / `interleave_groups` as the
    next epoch's recipe.

    Plan shape: ONE map-side-combinable groupBy over the corpus
    (per-domain count, loss sum, size sum) + ONE scalar agg for the
    global means; the exp/normalize algebra runs on the domain table,
    which is LIMIT-probed against ``max_domains`` BEFORE any collect
    (the `temperature_mix` guard pattern) — never corpus-sized driver
    state. Ratios are rounded to 6 dp before the exp and the exp
    rounded to 6 dp so both engines' libm agree bit-for-bit after the
    round.

    Output: (domain, n_docs, base_share_r, excess_r, weight_r) with
    weight_r summing to ~1 (each term individually rounded).
    """
    d = F.col(domain_col)
    per = df.groupBy(d.alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(loss_col).cast("double")).alias("loss_sum"),
        F.sum(F.col(size_col).cast("long")).alias("size_sum"),
    )
    probe = per.select("domain").limit(max_domains + 1).count()
    if probe > max_domains:
        raise ValueError(
            f"doremi_weights: >{max_domains} domains — domain_col looks "
            "corpus-shaped, not a mixture key"
        )
    tot = per.agg(
        F.sum("loss_sum").alias("g_loss"),
        F.sum("n_docs").alias("g_n"),
        F.sum("size_sum").alias("g_size"),
    )
    base = F.round(F.col("size_sum") / F.col("g_size"), 6)
    excess = F.round(
        F.col("loss_sum") / F.col("n_docs") - F.col("g_loss") / F.col("g_n"), 6
    )
    scored = (
        per.crossJoin(F.broadcast(tot))
        .select(
            "domain",
            F.col("n_docs").cast("long").alias("n_docs"),
            base.alias("base_share_r"),
            excess.alias("excess_r"),
            F.round(base * F.round(F.exp(F.lit(float(eta)) * excess), 6), 12)
            .alias("unnorm"),
        )
    )
    z = scored.agg(F.sum("unnorm").alias("z"))
    return (
        scored.crossJoin(F.broadcast(z))
        .select(
            "domain", "n_docs", "base_share_r", "excess_r",
            F.round(F.col("unnorm") / F.col("z"), 6).alias("weight_r"),
        )
    )


def best_of_n(
    df: DataFrame,
    group_col: str = "conv_id",
    id_col: str = "turn_idx",
    score: Column = None,
    min_score: Column = None,
) -> DataFrame:
    """Best-of-n rejection sampling over candidate responses — the
    RLHF / RFT data-selection primitive (Nakano et al. WebGPT'21;
    rejection-sampling fine-tuning in Llama-2): per prompt group keep
    exactly the max-`score` candidate (ties broken by lowest id so
    the pick is deterministic), optionally dropping groups whose best
    is below ``min_score``.

    Plan shape: ONE map-side-combinable argmax per group — the scored
    row is packed into a struct and reduced with MAX (score first,
    then inverted id so MAX realizes min-id tiebreak), the
    `dedup_survivors` shape — no windows, no self-join back. Output:
    one row per surviving group with the winning id and 6-dp score.
    """
    s = F.round(score.cast("double"), 6)
    packed = df.select(
        F.col(group_col).alias("grp"),
        F.struct(
            s.alias("s"),
            (-F.col(id_col).cast("long")).alias("neg_id"),
        ).alias("cand"),
    )
    best = packed.groupBy("grp").agg(F.max("cand").alias("best")).select(
        F.col("grp").alias(group_col),
        (-F.col("best.neg_id")).cast("long").alias("best_" + id_col),
        F.col("best.s").alias("best_score_r"),
    )
    if min_score is not None:
        best = best.where(F.col("best_score_r") >= min_score)
    return best


def logreg_features(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature projection shared by the batch trainer
    (:func:`logreg_quality`) and the streaming online-SGD updater
    (streaming/stream.py): x1 = min(n_chars, 2000)/1000, x2 =
    digit-char ratio, weak label y = (lang = 'en'). Pure JVM."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        (F.least(F.col("n_chars"), F.lit(2000)).cast("double") / F.lit(1000.0)).alias("x1"),
        (
            F.regexp_count(F.col("text"), F.lit(r"\d")).cast("double")
            / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
        ).alias("x2"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )


def logreg_step(feats: DataFrame, w: list, lr: float = 1.0) -> list:
    """ONE engine-rounded gradient-descent step over `feats` from
    weights `w` — the unit both the full-batch trainer and the
    per-micro-batch online-SGD updater iterate. Per-row gradient
    contributions are quantized to BIGINT micros (exact order-free
    sums) and the weight update is computed AND 6-dp-rounded inside
    the engine, so DuckDB CTEs replaying the step land on bit-equal
    weights. Returns the previous weights unchanged on an empty batch
    (COUNT = 0)."""
    z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    err = p - F.col("y").cast("double")
    gm = [
        F.sum(F.round(err * x * F.lit(1e6), 0).cast("long")).alias(f"g{j}")
        for j, x in enumerate([F.lit(1.0), F.col("x1"), F.col("x2")])
    ]
    row = feats.agg(*gm, F.count(F.lit(1)).alias("n")).select(
        *[
            F.when(F.col("n") == 0, F.lit(w[j]))
            .otherwise(
                F.round(
                    F.lit(w[j])
                    - F.lit(lr)
                    * (F.col(f"g{j}").cast("double") / F.lit(1e6))
                    / F.col("n").cast("double"),
                    6,
                )
            )
            .alias(f"w{j}")
            for j in range(3)
        ]
    ).collect()[0]
    return [row[f"w{j}"] for j in range(3)]


def logreg_quality(
    docs: DataFrame,
    n_rounds: int = 3,
    lr: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed logistic-regression quality classifier trained with
    full-batch gradient descent — the learned-filter stage of a
    training-data pipeline (a FastText/fineweb-edu-style quality model)
    expressed as pure DataFrame aggregation: each GD round is ONE
    map-side-combinable aggregation over the corpus (3 gradient sums +
    a count), the weight vector is bounded driver state (3 doubles,
    FAISS-codebook-style), and the final scoring pass is a shuffle-free
    projection. No MLlib, no Python row loop; at 100 TB each round is a
    single scan whose state per executor is 4 longs.

    Cross-engine determinism (the repo's micro-unit trick): per-row
    gradient contributions are quantized to integer MICROS before the
    sum (exact BIGINT addition in any order), and the weight update is
    computed and 6-dp-rounded INSIDE the engine, so a DuckDB oracle
    replaying the same unrolled rounds reproduces the weights bit-for-
    bit. Features: x1 = min(n_chars,2000)/1000, x2 = digit-char ratio;
    weak label y = (lang = 'en').
    """
    feats = logreg_features(docs, id_col=id_col)
    w = [0.0, 0.0, 0.0]  # bias, w1, w2
    for _ in range(max(0, n_rounds)):
        w = logreg_step(feats, w, lr=lr)
    z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "doc_id",
        F.col("y").cast("int").alias("y"),
        F.round(p, 6).alias("score_r"),
        (F.round(p, 6) >= F.lit(0.5)).cast("int").alias("pred"),
    )


def mmr_select_turns(
    turns: DataFrame,
    k: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Maximal-marginal-relevance exemplar selection per conversation
    (Carbonell & Goldstein 1998), in an ALL-INTEGER variant: pick k
    turns that are relevant (word-set overlap with the REST of the
    conversation) but mutually diverse (penalized by overlap with the
    already-picked set) — the diverse-exemplar subsampling stage of
    SFT-data assembly (k representative turns instead of the whole
    transcript).

        score_r1(t)   = |W(t) ∩ W(conv \\ t)|               (integer)
        score_rk(t)   = score_r1(t) − max_{s∈picked} |W(t) ∩ W(s)|

    Ties break to the earlier turn. Everything is set-intersection
    cardinality — exact integers on every engine, no float MMR λ.

    Scale shape: one conv-keyed word-set projection; per greedy round
    ONE conv-partitioned argmax window + ONE equi-join of the (conv,
    picked-turn) 1-row-per-conv table back to the candidates (never a
    cross join); k is a small constant, so the plan is k unrolled
    rounds. Conversations are bounded, windows partitioned.
    """
    wset = F.array_distinct(
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda x: x != F.lit(""),
        )
    )
    base = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("turn_idx"),
        wset.alias("w"),
    )
    conv_words = base.select(
        "conv_id", F.explode("w").alias("word"), "turn_idx"
    )
    # relevance: words of t that also appear in ANOTHER turn of the conv
    other = (
        conv_words.groupBy("conv_id", "word")
        .agg(
            F.count(F.lit(1)).alias("n_turns_with"),
        )
    )
    rel = (
        conv_words.join(other, ["conv_id", "word"])
        .where(F.col("n_turns_with") >= 2)
        .groupBy("conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("rel"))
    )
    cand = base.join(rel, ["conv_id", "turn_idx"], "left").select(
        "conv_id",
        "turn_idx",
        "w",
        F.coalesce(F.col("rel"), F.lit(0)).cast("long").alias("rel"),
    )
    picked = None
    remaining = cand
    out = []
    for r in range(1, max(1, k) + 1):
        if picked is None:
            scored = remaining.withColumn("score", F.col("rel"))
        else:
            pen = (
                remaining.join(
                    picked.select(
                        "conv_id", F.col("w").alias("pw")
                    ),
                    "conv_id",
                )
                .withColumn(
                    "p", F.size(F.array_intersect(F.col("w"), F.col("pw")))
                )
                .groupBy("conv_id", "turn_idx")
                .agg(F.max("p").alias("pen"))
            )
            scored = remaining.join(pen, ["conv_id", "turn_idx"], "left").withColumn(
                "score",
                F.col("rel") - F.coalesce(F.col("pen"), F.lit(0)),
            ).drop("pen")
        w_arg = Window.partitionBy("conv_id").orderBy(
            F.desc("score"), F.asc("turn_idx")
        )
        pick_r = (
            scored.withColumn("rk", F.row_number().over(w_arg))
            .where(F.col("rk") == 1)
            .select(
                "conv_id",
                "turn_idx",
                "w",
                F.col("score").cast("long").alias("score"),
                F.lit(r).cast("int").alias("pick_rank"),
            )
        )
        out.append(pick_r.select("conv_id", "turn_idx", "score", "pick_rank"))
        picked = pick_r if picked is None else picked.select(
            "conv_id", "turn_idx", "w"
        ).unionByName(pick_r.select("conv_id", "turn_idx", "w"))
        remaining = remaining.join(
            pick_r.select("conv_id", F.col("turn_idx").alias("pt")),
            "conv_id",
        ).where(F.col("turn_idx") != F.col("pt")).drop("pt")
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
