"""Deterministic dataset splitting and sampling for training-data
pipelines: hash-based train/val/test splits, stratified sampling, and
fixed-size per-key samples.

Why not `DataFrame.randomSplit` / `sample`? Their assignment depends on
partition layout and traversal order, so the "same" split changes when
the cluster size, file order, or AQE plan changes — a training/eval
leak waiting to happen at 100 TB. Everything here derives the decision
from a hash of a caller-named key column instead:

* reproducible across reruns, partitionings, and engine versions;
* zero-shuffle: split/sample assignment is a pure projection, so it
  composes with any downstream plan without adding an Exchange;
* cross-engine replayable: the bucket is the repo's md5 bridge
  (first 8 md5 hex chars as a big-endian int — the same recipe the
  sketch/fingerprint oracles replay bit-for-bit in DuckDB).

The reference engine (timothee-haudebourg/json-ld) stops at document
processing; these are the corpus-management operators its users need
next to the KG (see SURVEY.md "LLM-data-pipeline" inventory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: bucket resolution: fractions are quantized to 1/10000
N_BUCKETS = 10_000


def split_bucket(col: Column, seed: str = "") -> Column:
    """Deterministic bucket in [0, N_BUCKETS) from a key column: the
    md5-bridge hash of ``seed + "|" + key``. Changing `seed` produces
    an independent assignment (fresh folds without touching the data).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "|"), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return (h % N_BUCKETS).cast("int")


def _thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to > 0")
    out, acc = [], 0.0
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative split weight for {name!r}")
        acc += w / total
        out.append((name, round(acc * N_BUCKETS)))
    # force the last edge to cover the full range despite rounding
    out[-1] = (out[-1][0], N_BUCKETS)
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default,
    80/10/10) by hashing `key_col`. Weights are normalized and
    quantized to 1/10000. All rows sharing a key land in the same
    split — pass a document id to split documents, a conversation id
    to keep whole conversations together (the grouped-split that
    prevents dialogue-level leakage)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    b = split_bucket(F.col(key_col), seed)
    expr: Column | None = None
    prev = 0
    for name, edge in _thresholds(weights):
        cond = b < F.lit(edge) if prev == 0 else (b >= prev) & (b < edge)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        prev = edge
    assert expr is not None
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float] | float,
    seed: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash
    bucket falls under the stratum's fraction. `fractions` is either a
    single fraction for every stratum or a {stratum: fraction} dict
    (strata absent from the dict are dropped — the down-sample-the-
    majority-language use case). Unlike `sampleBy`, the decision is a
    per-row hash comparison: no RNG state, no shuffle, and the sampled
    set only shrinks/grows monotonically as fractions move."""
    b = split_bucket(F.col(key_col), seed)
    if isinstance(fractions, dict):
        if not fractions:
            raise ValueError("empty fractions dict")
        edge: Column | None = None
        for stratum, frac in fractions.items():
            cond = F.col(strata_col) == F.lit(stratum)
            val = F.lit(int(round(frac * N_BUCKETS)))
            edge = F.when(cond, val) if edge is None else edge.when(cond, val)
        assert edge is not None
        return df.filter(b < edge.otherwise(F.lit(0)))
    return df.filter(b < F.lit(int(round(float(fractions) * N_BUCKETS))))


def pack_documents(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str | None = None,
    shard_col: str | None = None,
) -> DataFrame:
    """Sequence packing for training batches: assign each document a
    `pack_id` so consecutive documents (in `order_col` order) fill
    ~`budget` tokens per pack — the contiguous-fill approximation of
    bin packing every large-scale pretraining pipeline uses (exact
    first-fit is inherently sequential; contiguous fill is one window
    pass and deterministic).

    pack = floor((cumsum(tokens) - tokens) / budget): a document starts
    a new pack when the tokens BEFORE it already filled the budget, so
    packs overflow by at most one document (never split). With
    `shard_col`, packing runs per shard — the distributed form: one
    window per shard, pack ids scoped (shard, pack_id). Without it the
    window is global (one task for the running sum — fine to ~10^8
    rows; shard above that). Documents larger than `budget` get a pack
    of their own by construction."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    order = order_col or df.columns[0]
    keys = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return df.withColumn(
        "pack_id",
        F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("long"),
    )


def sample_per_key(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    n: int,
    seed: str = "perkey",
) -> DataFrame:
    """Exactly min(n, group size) rows per key, chosen uniformly-ish and
    deterministically: rank rows inside each key by (hash bucket, id)
    and keep the first n. The window shuffles once on the key columns;
    the (bucket, id) tiebreak makes the pick independent of input
    order. For pathologically hot keys the sort is per-group top-n, not
    global — Spark's WindowExec spills, and a rank<=n filter right
    above it keeps downstream state at n rows per key."""
    if n <= 0:
        raise ValueError("n must be >= 1")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(split_bucket(F.col(id_col), seed), F.col(id_col))
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def leakage_safe_split(
    df: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    weights: dict[str, float] | None = None,
    seed: str = "split",
    out_col: str = "split",
    group_col: str = "dup_group",
) -> DataFrame:
    """Cluster-aware split: near-duplicate PAIRS (from any dedup
    candidate generator — minhash/simhash/jaccard) are closed into
    connected components, and the split key is the component
    representative rather than the document id. A duplicate cluster
    therefore never straddles train/test — the standard fix for
    eval contamination via near-copies (retains `hash_split`'s
    determinism and engine-replayability; the only extra cost over a
    plain split is the component join).

    Singletons (docs in no pair) keep their own id as the group."""
    from .graphops import connected_components

    comp = connected_components(dup_pairs, src=src, dst=dst)
    grouped = df.join(comp, df[id_col] == comp["node"], "left").select(
        df["*"],
        F.coalesce(comp["component"], df[id_col].cast("long")).alias(group_col),
    )
    return hash_split(grouped, group_col, weights, seed, out_col)


def dense_index(df: DataFrame, col: str = "entity") -> tuple[DataFrame, int]:
    """Distributed dense index: ``(entity, idx)`` with idx contiguous
    in [0, n) in lexicographic entity order, plus n itself.

    A bare ``row_number() over (ORDER BY entity)`` funnels the whole
    dictionary through ONE task; this is the standard two-phase
    ranking instead: range-repartition on the key (ascending ranges on
    ascending partition ids), rank locally per partition, then shift
    each partition by the cumulative count of the partitions before it.
    The only driver-side data is one row per shuffle partition (the
    counts), the same bounded-collect class as linking's corpus total.
    Output order matches SQL ``ROW_NUMBER() OVER (ORDER BY entity)-1``
    on binary collation, so oracles can replay the index exactly."""
    d = (
        df.select(F.col(col).alias("entity"))
        .dropDuplicates()
        .repartitionByRange(F.col("entity"))
        .withColumn("pid", F.spark_partition_id())
    )
    # one materialization serves both the counts collect and the final
    # projection (Spark has no cross-consumer CSE — a second consumer
    # would re-run the dedup + range shuffle)
    local = d.withColumn(
        "rn", F.row_number().over(Window.partitionBy("pid").orderBy("entity"))
    ).localCheckpoint(eager=True)
    counts = sorted(
        (r["pid"], r["cnt"])
        for r in local.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    spark = df.sparkSession
    off = spark.createDataFrame(offsets or [(0, 0)], "pid int, off long")
    # broadcast join, not a literal-map expression: offsets has one row
    # per shuffle partition, which can reach 1e5 on a large cluster
    return (
        local.join(F.broadcast(off), "pid")
        .select("entity", (F.col("off") + F.col("rn") - 1).alias("idx")),
        acc,
    )


def _neg_hash(hash_fn: str, seed: str, *cols) -> Column:
    if hash_fn == "md5":
        payload = F.concat_ws(
            ":", F.lit(seed), *[c.cast("string") for c in cols]
        )
        return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")
    return F.xxhash64(F.lit(seed), *cols)


def negative_triples(
    triples: DataFrame,
    entities: DataFrame | None = None,
    k: int = 2,
    corrupt: str = "obj",
    seed: str = "",
    hash_fn: str = "xxhash64",
    filtered: bool = True,
) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training
    (TransE-family corruption; Bordes et al., NeurIPS'13): for each
    positive node-to-node triple emit up to ``k`` corrupted copies,
    replacing the ``corrupt`` side ("obj", "subj", or "both" —
    hash-chosen per sample) with the entity at index
    ``hash(seed, s, p, o, i, side) mod n`` of the lexicographically
    dense-indexed entity dictionary. ``filtered=True`` drops
    corruptions that happen to be true triples (the standard filtered
    setting — also removes no-op corruptions, since the uncorrupted
    triple is itself true). Output: (subj, pred, obj, sample_i, side,
    neg) — one row per surviving negative.

    Hash-indexed choices, not RNG: reproducible across reruns /
    partitionings / cluster sizes, and SQL-replayable through the md5
    bridge (``hash_fn="md5"``). Scale shape: the dictionary index is
    the two-phase rank of dense_index (no single-task sort), sampling
    is a projection plus ONE equi-join on idx against the dictionary,
    and the filter is ONE left-anti join on the corrupted key — no
    collect of entities, no rejection-resampling loop."""
    pos = triples.filter(
        F.col("obj_kind").isin("iri", "bnode")
    ).select("subj", "pred", "obj").dropDuplicates()
    if entities is None:
        entities = pos.select(F.col("subj").alias("entity")).unionByName(
            pos.select(F.col("obj").alias("entity"))
        )
    ents, n = dense_index(entities)
    if n == 0:
        raise ValueError("empty entity dictionary")

    cand = pos.select(
        "subj", "pred", "obj",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("sample_i"),
    )
    if corrupt == "both":
        side = F.when(
            F.pmod(
                _neg_hash(hash_fn, seed + "|side",
                          F.col("subj"), F.col("pred"), F.col("obj"),
                          F.col("sample_i")),
                F.lit(2),
            ) == 0,
            F.lit("obj"),
        ).otherwise(F.lit("subj"))
    elif corrupt in ("obj", "subj"):
        side = F.lit(corrupt)
    else:
        raise ValueError(f"corrupt must be obj|subj|both, got {corrupt!r}")
    cand = cand.withColumn("side", side)
    cand = cand.withColumn(
        "idx",
        F.pmod(
            _neg_hash(hash_fn, seed, F.col("subj"), F.col("pred"),
                      F.col("obj"), F.col("sample_i"), F.col("side")),
            F.lit(n),
        ).cast("long"),
    )
    neg = cand.join(ents, "idx").select(
        "subj", "pred", "obj", "sample_i", "side",
        F.col("entity").alias("neg"),
    )
    if filtered:
        key_s = F.when(F.col("side") == "subj", F.col("neg")).otherwise(F.col("subj"))
        key_o = F.when(F.col("side") == "obj", F.col("neg")).otherwise(F.col("obj"))
        neg = (
            neg.withColumn("__cs", key_s)
            .withColumn("__co", key_o)
            .join(
                pos.select(
                    F.col("subj").alias("__cs"),
                    F.col("pred").alias("pred"),
                    F.col("obj").alias("__co"),
                ),
                ["__cs", "pred", "__co"],
                "left_anti",
            )
            .drop("__cs", "__co")
        )
    # the USING anti-join moves its keys first; restore column order
    return neg.select("subj", "pred", "obj", "sample_i", "side", "neg")


def weighted_sample(
    df: DataFrame,
    rate_col: Column | str,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic per-row Bernoulli sampling with a PER-ROW rate —
    the corpus-mixing primitive (keep high-quality documents with
    probability ∝ quality score, re-weight domains from a rates
    table): keep a row iff ``u(id) < clamp(rate, 0, 1)`` where
    ``u(id) = md5-bridge(seed|id) / 2^32`` is the row's fixed uniform
    draw. Same guarantees as hash_split: pure projection (zero
    shuffle), reproducible across reruns/partitionings/engines, and
    changing only the rate keeps the draws fixed — raising a rate
    strictly GROWS the kept set (monotone, so corpus mixes can be
    retuned without churning previously kept rows)."""
    rate = F.col(rate_col) if isinstance(rate_col, str) else rate_col
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    u = h / F.lit(float(1 << 32))
    keep = u < F.greatest(F.least(rate, F.lit(1.0)), F.lit(0.0))
    return df.filter(keep)


def upsample_epochs(
    df: DataFrame,
    epochs: Column | str | float,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Fractional-epoch repetition — the data-recipe primitive ("train
    on 2.3 epochs of source X"): every row appears ``floor(epochs)``
    times, plus once more with probability ``epochs - floor(epochs)``
    (the same deterministic md5-bridge draw as :func:`weighted_sample`,
    so the fractional pass is reproducible across reruns, partitionings
    and engines, and raising ``epochs`` strictly grows the output).

    ``epochs`` may be a per-row column/expression (per-domain recipes
    via a joined weights table) or one float for the whole frame. The
    output adds an ``epoch`` column (0-based copy index) so downstream
    shuffling/packing can interleave copies instead of concatenating
    them.

    Scale shape: one ``explode(sequence(...))`` projection — zero
    shuffle, output size exactly sum(ceil-or-floor per row); no
    driver-side state. Copies share the row's id, so exact dedup must
    run BEFORE upsampling (the standard ordering in a training
    pipeline)."""
    e = (
        F.lit(float(epochs))
        if isinstance(epochs, (int, float))
        else (F.col(epochs) if isinstance(epochs, str) else epochs)
    )
    whole = F.floor(e).cast("int")
    frac = e - F.floor(e)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    u = h / F.lit(float(1 << 32))
    n_copies = (whole + F.when(u < frac, F.lit(1)).otherwise(F.lit(0))).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    budget: int | None = None,
    id_col: str = "doc_id",
    seed: str = "",
    max_groups: int = 1_000_000,
) -> DataFrame:
    """Temperature (alpha) mixture re-weighting — the multilingual-LM
    corpus recipe (exponentiated sampling, Conneau & Lample 2019;
    Devlin et al.'s mBERT exponent): group g with n_g rows gets
    mixture weight w_g = n_g^alpha / sum_h n_h^alpha and target size
    t_g = budget * w_g (budget defaults to the corpus size — reshape
    without growing). Rows are then drawn at epochs_g = t_g / n_g via
    :func:`upsample_epochs`: epochs < 1 Bernoulli-downsamples the head
    groups, epochs > 1 fractionally repeats the tail — one mechanism,
    both directions. alpha=1 is proportional (identity in
    expectation), alpha=0 uniform-over-groups.

    Determinism: per-group rates are computed driver-side from EXACT
    integer counts as (p_g * N) / (s * n_g) with p_g =
    floor(n_g^alpha * 1e6) and s = sum p_g — integer products within
    2^53, one correctly-rounded double division, so the rate (and
    hence every per-row draw) is bit-identical across engines with no
    quantization step. For alpha=0.5, n^alpha uses math.sqrt
    (IEEE-exactly-rounded — guaranteed engine parity); other alphas
    rely on libm pow agreement at the floor(…*1e6) boundary.

    Scale shape: ONE count aggregation (|groups| rows, collected —
    groups are dictionary-sized: sources/languages/domains; hard-capped
    at max_groups so corpus-shaped group columns fail loudly), a
    broadcast join of the rates, then upsample_epochs' zero-shuffle
    projection. Output adds (epoch,) as in upsample_epochs.
    """
    import math

    # LIMIT the aggregation BEFORE collecting: the guard must fire
    # without ever materializing a corpus-shaped group dictionary on
    # the driver (an unbounded collect would OOM before it could
    # "fail loudly"). The limit bounds driver memory at max_groups+1
    # rows in every case, and when it isn't hit we already hold the
    # complete counts — no second job.
    rows = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .limit(max_groups + 1)
        .collect()
    )
    if len(rows) > max_groups:
        raise ValueError(
            f"temperature_mix: >{max_groups} groups (max_groups="
            f"{max_groups}) — group_col looks corpus-shaped, not a recipe key"
        )
    if not rows:
        return df.withColumn("epoch", F.lit(0)).limit(0)
    counts = {r[group_col]: int(r["n"]) for r in rows}
    total = sum(counts.values())
    tgt = int(budget) if budget is not None else total
    pow_ = (math.sqrt if alpha == 0.5
            else (lambda x: math.pow(x, alpha)))
    p = {g: math.floor(pow_(n) * 1_000_000) for g, n in counts.items()}
    s = sum(p.values())
    rates = df.sparkSession.createDataFrame(
        [(g, (p[g] * tgt) / (s * counts[g])) for g in sorted(counts)],
        f"{group_col} string, __epochs double",
    )
    out = upsample_epochs(
        df.join(F.broadcast(rates), group_col), F.col("__epochs"),
        id_col=id_col, seed=seed,
    )
    return out.drop("__epochs")


def weighted_topk_sample(
    df: DataFrame,
    k: int,
    weight_col: Column | str,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Exact-size-k weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006, "Weighted random sampling with a reservoir"):
    each row draws the fixed uniform ``u(id) = (bridge(seed|id) + 0.5)
    / 2^32`` and is ranked by the ES key ``ln(u) / w`` (monotone in
    u^(1/w)); the top k keys are a weighted sample without
    replacement. The complement of weighted_sample: that one keeps a
    RATE per row (random size), this one hits an exact budget (the
    "sample 1M docs proportional to quality" shape).

    Plan: pure projection + TakeOrderedAndProject (per-partition heap
    + single driver merge of k rows) — zero shuffle, no full sort, and
    like every sampler here the draw is a function of (seed, id):
    reproducible across reruns, partitionings, and engines. The
    ordering key is 6-dp-rounded with an id tiebreak so the SELECTED
    SET is stable cross-engine (ln differs by <=1 ulp between libms;
    at 6 dp the round absorbs it).

    Rows with weight <= 0 are excluded (ES requires w > 0).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    key = F.round(F.log(u) / w, 6)
    return (
        df.where(w > 0)
        .withColumn("es_key_r", key)
        .orderBy(F.col("es_key_r").desc(), F.col(id_col))
        .limit(k)
    )


def epoch_order(
    df: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic per-epoch global shuffle ORDER for training data:
    adds ``epoch_rank`` = the row's position under the (seed, epoch)
    keyed md5-bridge permutation — epoch 0 and epoch 1 orders are
    independent pseudorandom permutations, every rerun/partitioning/
    engine agrees, and resuming mid-epoch is a WHERE epoch_rank >= k
    filter instead of replaying a stateful shuffle. This is the
    reshuffle-each-epoch contract of a training loader expressed as a
    pure projection + one rank window over the permutation key.

    The rank is computed by the same two-phase pattern as
    :func:`dense_index` — range-repartition on the (uniform, skew-free
    by construction) permutation key, rank locally per partition, then
    shift by broadcast per-partition offsets. A bare
    ``row_number() OVER (ORDER BY __ek)`` would be a partition-less
    window: Spark funnels the WHOLE corpus through one task — the worst
    possible shape for an every-epoch full-corpus op. Driver state is
    one count per shuffle partition. Writers that only need the ORDER
    (not the dense rank) can sort-write by the key and skip ranking
    entirely.
    """
    # 15 hex chars = 60 bits: comfortably inside BIGINT on BOTH engines
    # (16 chars can exceed 2^63 and breaks DuckDB's ::BIGINT hex cast)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}|{int(epoch)}|"), F.col(id_col).cast("string")
                )
            ),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    keyed = (
        df.withColumn("__ek", h)
        .repartitionByRange(F.col("__ek"), F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
    )
    # one materialization serves both the counts collect and the final
    # projection (no cross-consumer CSE in Spark)
    local = keyed.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("__pid").orderBy(
                F.col("__ek").asc(), F.col(id_col).asc()
            )
        ),
    ).localCheckpoint(eager=True)
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in local.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off = df.sparkSession.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    return (
        local.join(F.broadcast(off), "__pid")
        .withColumn("epoch_rank", (F.col("__off") + F.col("__rn") - 1).cast("long"))
        .drop("__ek", "__pid", "__rn", "__off")
    )


def interleave_groups(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "",
    max_groups: int = 100_000,
) -> DataFrame:
    """Deterministic round-robin interleave across groups — the
    mixture SCHEDULE of a multilingual/multi-source training run:
    reading rows in ``interleave_pos`` order visits the groups in a
    fixed rotation (one row per group per cycle, while each group
    lasts), with each group's internal order a fresh (seed)-keyed
    md5-bridge permutation. Consecutive same-group batches are what
    the schedule exists to prevent.

    Pure arithmetic, NO global window: within-group rank ``r`` comes
    from one group-partitioned window (partitioned — the audited-safe
    shape) over the permutation key, the group's rotation slot ``g``
    from a broadcast of the sorted group dictionary, and

        interleave_pos = r * n_groups + g

    which is injective and orders exactly round-robin. Positions are
    sparse once short groups exhaust (the rotation simply skips them);
    readers ORDER BY interleave_pos, they never index by it. The group
    dictionary is LIMIT-probed against ``max_groups`` before
    collecting — corpus-shaped group columns fail loudly with bounded
    driver memory (same guard as temperature_mix).

    Adds (grp_rank, interleave_pos). Replays exactly in SQL:
    ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY key, id) - 1`` plus
    the same arithmetic on a ``DENSE_RANK`` group index.
    """
    rows = (
        df.select(F.col(group_col)).dropDuplicates().limit(max_groups + 1).collect()
    )
    if len(rows) > max_groups:
        raise ValueError(
            f"interleave_groups: >{max_groups} groups — group_col looks "
            "corpus-shaped, not a mixture key"
        )
    groups = sorted(r[group_col] for r in rows)
    n = len(groups)
    if n == 0:
        return (
            df.withColumn("grp_rank", F.lit(0).cast("long"))
            .withColumn("interleave_pos", F.lit(0).cast("long"))
            .limit(0)
        )
    gi = df.sparkSession.createDataFrame(
        [(g, i) for i, g in enumerate(groups)], f"{group_col} string, __gi long"
    )
    key = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"ilv|{seed}|"), F.col(id_col).cast("string")
                )
            ),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(gi), group_col)
        .withColumn("grp_rank", (F.row_number().over(w) - 1).cast("long"))
        .withColumn(
            "interleave_pos",
            (F.col("grp_rank") * F.lit(n) + F.col("__gi")).cast("long"),
        )
        .drop("__gi")
    )


def ordered_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cum",
    inclusive: bool = True,
) -> DataFrame:
    """Distributed ORDERED prefix sum — the scale-safe replacement for
    ``SUM(x) OVER (ORDER BY ...)``, whose partition-less window funnels
    every row through one task (the plan-audit violation class). Same
    two-phase shape as :func:`dense_index`: range-repartition on the
    order key(s), one PARTITIONED cumulative window locally, then shift
    each partition by the broadcast total of the partitions before it.
    Driver state is one partial sum per shuffle partition.

    ``order_cols`` must be a total order (include a tiebreaker when
    keys repeat — with duplicates, intra-key accumulation order is
    undefined exactly as in SQL). ``inclusive=False`` gives the
    exclusive prefix (sum strictly BEFORE the row). Values accumulate
    as longs (exact; overflow raises under ANSI rather than wrapping).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    keyed = (
        df.repartitionByRange(*cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*[c.asc() for c in cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = keyed.withColumn(
        "__lc", F.sum(F.col(value_col).cast("long")).over(w)
    ).localCheckpoint(eager=True)
    parts = sorted(
        (r["__pid"], r["s"])
        for r in local.groupBy("__pid")
        .agg(F.coalesce(F.sum(F.col(value_col).cast("long")), F.lit(0)).alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, s in parts:
        offsets.append((pid, acc))
        acc += int(s)
    off = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    cum = F.col("__off") + F.col("__lc")
    if not inclusive:
        cum = cum - F.col(value_col).cast("long")
    return (
        local.join(F.broadcast(off), "__pid")
        .withColumn(out_col, cum.cast("long"))
        .drop("__pid", "__lc", "__off")
    )


def token_budget_select(
    df: DataFrame,
    group_col: str,
    value_col: str,
    budget: int,
    id_col: str = "doc_id",
    seed: str = "tb",
    out_col: str = "cum_tokens",
) -> DataFrame:
    """Per-group token-budget selection — the mixture-recipe executor:
    given a target token budget per group (language / source / domain),
    keep a seeded uniform-random prefix of each group's documents until
    the budget is reached (the straddling document is kept, so every
    group with any data meets its budget). This is how a mixture spec
    ("30 B tokens of code, 5 B of forum text") becomes an actual
    document selection.

    Scale shape: NO per-group window. A per-group ``SUM OVER
    (PARTITION BY group ORDER BY ...)`` concentrates each group in one
    task — a hot group (English) is most of the corpus, so that's the
    epoch_order failure class in group clothing. Instead the rows get
    ONE GLOBAL total order (group major, seeded md5 key minor) and run
    through :func:`ordered_cumsum`'s two-phase range-partitioned rank;
    each group's start offset is then its MIN exclusive prefix — a
    groups-sized aggregate broadcast back. Hot groups therefore spread
    across as many range partitions as their mass requires.

    Output: the selected rows with ``tokens`` (the value) and
    ``out_col`` = the within-group INCLUSIVE running total at that row
    (<= budget + the straddler's overhang).
    """
    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(seed),
                    F.col(group_col).cast("string"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    keyed = df.withColumn("__k", key)
    cum = ordered_cumsum(
        keyed,
        [group_col, "__k", id_col],
        value_col,
        out_col="__cum",
        inclusive=True,
    )
    excl = (F.col("__cum") - F.col(value_col).cast("long")).alias("__excl")
    cum = cum.withColumn("__excl", excl)
    base = cum.groupBy(group_col).agg(F.min("__excl").alias("__base"))
    return (
        cum.join(F.broadcast(base), group_col)
        .withColumn("__wexcl", F.col("__excl") - F.col("__base"))
        .where(F.col("__wexcl") < F.lit(int(budget)))
        .withColumn(
            out_col,
            (F.col("__wexcl") + F.col(value_col).cast("long")).cast("long"),
        )
        .drop("__k", "__cum", "__excl", "__base", "__wexcl")
    )


def rank_normalize(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str = "doc_id",
    out_col: str = "pct_r",
    max_groups: int = 10_000,
) -> DataFrame:
    """Per-group percentile (rank) normalization of a score column —
    the cross-lingual quality-calibration move (a raw quality score is
    not comparable across languages/sources; its within-group
    percentile is): pct = (rank_in_group - 1) / (n_group - 1), with
    the unique ``id_col`` as tiebreaker so the rank is row_number-exact
    and PERCENT_RANK-equal on both engines.

    Scale shape: NO per-group window (a hot group would be the
    partition-less-window failure class in group clothing). The global
    rank over (group, score, id) comes from :func:`ordered_cumsum`'s
    two-phase range-repartition pattern; each group's start offset and
    size then come from ONE group-keyed aggregation whose output is
    group-cardinality-sized and broadcasts back. ``max_groups`` probes
    the cardinality with a LIMIT before that broadcast so a
    corpus-shaped group column fails loudly instead of OOMing the
    join (the temperature_mix guard)."""
    probe = (
        df.select(group_col).distinct().limit(max_groups + 1).count()
    )
    if probe > max_groups:
        raise ValueError(
            f"rank_normalize: >{max_groups} distinct {group_col!r} groups — "
            "the group table must be dictionary-sized (raise max_groups if "
            "that is genuinely true)"
        )
    base = df.withColumn("__one", F.lit(1))
    ranked = ordered_cumsum(
        base, [group_col, score_col, id_col], "__one", out_col="__r"
    )
    g = ranked.groupBy(group_col).agg(
        F.min("__r").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    return (
        ranked.join(F.broadcast(g), group_col)
        .withColumn(
            out_col,
            F.when(
                F.col("__n") > 1,
                F.round(
                    (F.col("__r") - F.col("__s"))
                    / (F.col("__n") - 1).cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__one", "__r", "__s", "__n")
    )


def pack_stats(
    packed: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str = "lang",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Bin-utilization report for :func:`pack_documents` output — THE
    packing metric a pretraining pipeline watches (fill factor decides
    how many FLOPs train on padding): per (shard, utilization-decile),
    how many packs landed there, how many documents they carry, and
    the min/max fill. Deciles are integer arithmetic
    (``LEAST(fill*10 DIV budget, 10)`` — the 10 bucket holds packs that
    overflowed the budget by their last document, which contiguous
    fill permits by construction).

    Scale shape: two map-side-combinable aggregations (pack rollup,
    then decile rollup); integer-exact everywhere.
    """
    per = packed.groupBy(F.col(shard_col).alias("shard"), pack_col).agg(
        F.sum(token_col).alias("fill"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    decile = F.least(
        F.expr(f"fill * 10 DIV {int(budget)}"), F.lit(10)
    ).cast("int")
    return (
        per.groupBy("shard", decile.alias("util_decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.min("fill").cast("long").alias("min_fill"),
            F.max("fill").cast("long").alias("max_fill"),
        )
    )
