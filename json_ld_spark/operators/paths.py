"""SPARQL 1.1 property paths over the constructed triple table.

The reference emits a canonical triple set (toRdf,
`crates/core/src/rdf/mod.rs`); the natural next query surface beyond
conjunctive BGPs (operators/bgp.py) is SPARQL property paths —
``^p`` (inverse), ``p1/p2`` (sequence), ``p1|p2`` (alternative),
``p?``/``p+``/``p*`` (closures), ``!(p1|...)`` (negated property set).
This module compiles a path expression into a DataFrame of distinct
``(s, o)`` endpoint pairs, keeping everything declarative so Catalyst
owns the physical plan:

- every atomic step is a *filtered projection* of the triple table
  (``pred = <iri>`` reaches the parquet scan as a pushed filter);
- sequence is an equi-join on the shared midpoint;
- alternative is a union;
- ``+``/``*`` run **semi-naive transitive closure**: each round joins
  only the newly-discovered delta pairs against the one-step relation,
  anti-joins the known set, and truncates lineage with an eager
  localCheckpoint — the same fixpoint discipline as
  `graphops.connected_components` (iterative DataFrame plans double in
  size per round otherwise, a measured 2^n analysis blow-up).

Scale contract: an *unrestricted* ``p+`` materializes the transitive
closure of the ``p`` relation, which is O(n^2) on dense graphs no
matter the engine — exactly as in any SPARQL store. The scale path is
to bind one end: `path_pairs(..., subjects=seeds)` evaluates the
closure as a frontier BFS from the seed set (work proportional to the
reachable set, never the full closure), which is what a bound-subject
SPARQL pattern compiles to. Per-conversation chain graphs (the
north-star turn ordering) have bounded reachable sets, so either form
is safe there.

Path AST (nested tuples, also produced by `parse_path`):

    ("link", iri)            p          — exactly this predicate
    ("inv", path)            ^path      — reversed endpoints
    ("seq", p1, p2, ...)     p1/p2      — composition
    ("alt", p1, p2, ...)     p1|p2      — union
    ("opt", path)            path?      — zero or one
    ("plus", path)           path+      — one or more
    ("star", path)           path*      — zero or more
    ("nps", [iri, ...])      !(p1|...)  — any predicate not listed

Zero-length matches (``?``/``*``) follow SPARQL 1.1 §18.4: they bind
s = o for every *term in the graph* (any subject or object position),
evaluated against the supplied triple table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

Path = tuple


# --------------------------------------------------------------------------
# parser: SPARQL path syntax subset  a/b, a|b, ^a, a+, a*, a?, !(a|b), (...)
# --------------------------------------------------------------------------

def parse_path(s: str) -> Path:
    """Parse SPARQL property-path syntax into the tuple AST. IRIs are
    written bare (no angle brackets needed, but ``<...>`` is accepted);
    precedence (loosest to tightest): ``|``, ``/``, unary ``^``/``!``,
    postfix ``?``/``+``/``*``, parentheses."""
    toks = _tokenize(s)
    pos = [0]

    def peek() -> str | None:
        return toks[pos[0]] if pos[0] < len(toks) else None

    def eat(t: str | None = None) -> str:
        tok = toks[pos[0]]
        if t is not None and tok != t:
            raise ValueError(f"expected {t!r}, got {tok!r} in path {s!r}")
        pos[0] += 1
        return tok

    def alt() -> Path:
        parts = [seq()]
        while peek() == "|":
            eat("|")
            parts.append(seq())
        return parts[0] if len(parts) == 1 else ("alt", *parts)

    def seq() -> Path:
        parts = [unary()]
        while peek() == "/":
            eat("/")
            parts.append(unary())
        return parts[0] if len(parts) == 1 else ("seq", *parts)

    def unary() -> Path:
        if peek() == "^":
            eat("^")
            return _postfix(("inv", unary()))
        if peek() == "!":
            eat("!")
            eat("(")
            iris = [_iri(eat())]
            while peek() == "|":
                eat("|")
                iris.append(_iri(eat()))
            eat(")")
            return _postfix(("nps", iris))
        return _postfix(primary())

    def primary() -> Path:
        if peek() == "(":
            eat("(")
            inner = alt()
            eat(")")
            return inner
        tok = eat()
        if tok in "|/^?+*()!":
            raise ValueError(f"unexpected {tok!r} in path {s!r}")
        return ("link", _iri(tok))

    def _postfix(p: Path) -> Path:
        while peek() in ("?", "+", "*"):
            p = ({"?": "opt", "+": "plus", "*": "star"}[eat()], p)
        return p

    out = alt()
    if pos[0] != len(toks):
        raise ValueError(f"trailing tokens in path {s!r}: {toks[pos[0]:]}")
    return out


def _tokenize(s: str) -> list[str]:
    toks: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c.isspace():
            i += 1
        elif c in "|/^?+*()!":
            toks.append(c)
            i += 1
        elif c == "<":
            j = s.index(">", i)
            toks.append(s[i : j + 1])
            i = j + 1
        else:
            j = i
            while j < len(s) and not (s[j].isspace() or s[j] in "|/^?+*()!"):
                j += 1
            toks.append(s[i:j])
            i = j
    return toks


def _iri(tok: str) -> str:
    return tok[1:-1] if tok.startswith("<") and tok.endswith(">") else tok


# --------------------------------------------------------------------------
# evaluation
# --------------------------------------------------------------------------

def _graph_terms(triples: DataFrame) -> DataFrame:
    """All RDF terms of the graph (subject or object position), one
    column `t` — SPARQL's zero-length-path domain."""
    return (
        triples.select(F.col("subj").alias("t"))
        .unionByName(triples.select(F.col("obj").alias("t")))
        .where(F.col("t").isNotNull())
        .dropDuplicates()
    )


def path_pairs(
    triples: DataFrame,
    path: Path | str,
    subjects: DataFrame | None = None,
    max_iter: int = 32,
) -> DataFrame:
    """Distinct ``(s, o)`` pairs connected by `path` over `triples`
    (columns ``subj``/``pred``/``obj``; literal objects participate as
    opaque terms, like SPARQL). `subjects` (one column ``s``) bounds
    the evaluation to paths *starting* in that set — the closure then
    runs as frontier BFS over the reachable set only (the 100 TB form).
    """
    if isinstance(path, str):
        path = parse_path(path)
    pairs = _eval(triples, path, subjects, max_iter)
    if subjects is not None:
        pairs = pairs.join(subjects.select("s").dropDuplicates(), "s")
    return pairs.dropDuplicates()


def _step(triples: DataFrame, path: Path) -> DataFrame | None:
    """The one-step relation for closure bodies when it is join-free
    (link / inv(link) / nps / alt of those): lets `+`/`*` iterate a
    single filtered scan. Returns None for composite bodies."""
    kind = path[0]
    if kind == "link":
        return triples.where(F.col("pred") == F.lit(path[1])).select(
            F.col("subj").alias("s"), F.col("obj").alias("o")
        )
    if kind == "inv" and path[1][0] == "link":
        return triples.where(F.col("pred") == F.lit(path[1][1])).select(
            F.col("obj").alias("s"), F.col("subj").alias("o")
        )
    if kind == "nps":
        return triples.where(~F.col("pred").isin(list(path[1]))).select(
            F.col("subj").alias("s"), F.col("obj").alias("o")
        )
    return None


def _eval(
    triples: DataFrame,
    path: Path,
    subjects: DataFrame | None,
    max_iter: int,
) -> DataFrame:
    kind = path[0]
    if kind in ("link", "nps") or (kind == "inv" and path[1][0] == "link"):
        return _step(triples, path)  # type: ignore[return-value]
    if kind == "inv":
        inner = _eval(triples, path[1], None, max_iter)
        return inner.select(F.col("o").alias("s"), F.col("s").alias("o"))
    if kind == "seq":
        # left-to-right joins on the midpoint; when the start set is
        # bound, seed the FIRST leg so every later leg only sees
        # reachable midpoints (the frontier discipline, composed)
        legs = path[1:]
        acc = _eval(triples, legs[0], subjects, max_iter)
        if subjects is not None:
            acc = acc.join(subjects.select("s").dropDuplicates(), "s")
        for leg in legs[1:]:
            mids = acc.select(F.col("o").alias("s")).dropDuplicates()
            nxt = _eval(triples, leg, mids, max_iter).join(mids, "s")
            acc = (
                acc.select("s", F.col("o").alias("m"))
                .join(nxt.select(F.col("s").alias("m"), "o"), "m")
                .select("s", "o")
                .dropDuplicates()
            )
        return acc
    if kind == "alt":
        branches = [_eval(triples, p, subjects, max_iter) for p in path[1:]]
        acc = branches[0]
        for b in branches[1:]:
            acc = acc.unionByName(b)
        return acc.dropDuplicates()
    if kind == "opt":
        zero = _zero_length(triples, subjects)
        return _eval(triples, path[1], subjects, max_iter).unionByName(zero)
    if kind == "plus":
        return _closure(triples, path[1], subjects, max_iter)
    if kind == "star":
        zero = _zero_length(triples, subjects)
        return _closure(triples, path[1], subjects, max_iter).unionByName(zero)
    raise ValueError(f"unknown path node {path!r}")


def _zero_length(triples: DataFrame, subjects: DataFrame | None) -> DataFrame:
    if subjects is not None:
        # zero-length from a bound start: s = o for each seed (SPARQL
        # 18.4 ZeroLengthPath with term bound on one side)
        return subjects.select("s").dropDuplicates().withColumn("o", F.col("s"))
    return _graph_terms(triples).select(
        F.col("t").alias("s"), F.col("t").alias("o")
    )


def _closure(
    triples: DataFrame,
    body: Path,
    subjects: DataFrame | None,
    max_iter: int,
) -> DataFrame:
    """Transitive closure of the body relation (path+). Semi-naive:
    round i joins only pairs first discovered in round i-1 against the
    one-step relation. Unbounded graphs converge in diameter rounds;
    `max_iter` is a safety stop (documented contract, same as
    canonicalize's bounded refinement)."""
    step = _step(triples, body)
    if step is None:
        # composite body (e.g. (a/b)+): materialize its pair relation
        # once, then close over it
        step = _eval(triples, body, None, max_iter).dropDuplicates()
    if subjects is not None:
        # frontier BFS keyed by reachable endpoint: state is (s, o)
        # pairs but each round's join input is only the new frontier
        seeds = subjects.select("s").dropDuplicates()
        known = seeds.join(step, "s").dropDuplicates().localCheckpoint(eager=False)
    else:
        known = step.dropDuplicates().localCheckpoint(eager=False)
    # Only the per-round delta is checkpointed: `known` stays a flat
    # union of already-checkpointed deltas, so its lineage is depth-1
    # regardless of round count (no 2^n plan growth) and we avoid
    # re-materializing the whole growing closure every round —
    # O(diameter × |closure|) checkpoint writes saved.
    #
    # Rounds are LATENCY-bound when the closure slice is small (the
    # count doubles as the lazy checkpoint's materializing action):
    # narrow the loop's shuffle width and skip AQE re-planning in that
    # regime; a corpus-sized slice keeps the caller's width and AQE
    # skew handling (same policy as entailment.owl_property_closure).
    spark = triples.sparkSession
    _SP = "spark.sql.shuffle.partitions"
    _AQE = "spark.sql.adaptive.enabled"
    sp_old, aqe_old = spark.conf.get(_SP), spark.conf.get(_AQE, "true")
    if known.count() <= 2_000_000:
        spark.conf.set(_AQE, "false")
        spark.conf.set(_SP, str(max(1, min(int(sp_old), 8))))
    delta = known
    try:
        if subjects is None:
            # PATH DOUBLING (R ← R ∪ R∘R): diameter-D graphs close in
            # ceil(log2 D) rounds instead of D — the rounds are the
            # cost, not the data, so the fatter self-join wins. Not
            # valid for the seeded case (composing seed-anchored pairs
            # requires the midpoint to be a seed), which stays BFS.
            for _ in range(max_iter):
                new = (
                    known.select("s", F.col("o").alias("m"))
                    .join(known.select(F.col("s").alias("m"), "o"), "m")
                    .select("s", "o")
                    .dropDuplicates()
                    .join(known, ["s", "o"], "left_anti")
                    .localCheckpoint(eager=False)
                )
                # lazy checkpoint + count: one job materializes + probes
                if new.count() == 0:
                    break
                known = known.unionByName(new)
        else:
            for _ in range(max_iter):
                delta = (
                    delta.select("s", F.col("o").alias("m"))
                    .join(step.select(F.col("s").alias("m"), "o"), "m")
                    .select("s", "o")
                    .dropDuplicates()
                    .join(known, ["s", "o"], "left_anti")
                    .localCheckpoint(eager=False)
                )
                if delta.count() == 0:
                    break
                known = known.unionByName(delta)
    finally:
        spark.conf.set(_SP, sp_old)
        spark.conf.set(_AQE, aqe_old)
    return known
