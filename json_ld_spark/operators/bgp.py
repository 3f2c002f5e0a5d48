"""SPARQL-style Basic Graph Pattern (BGP) queries over the triple table.

The reference ends at emitting RDF (toRdf, `crates/core/src/rdf/mod.rs`);
the first thing a consumer of the constructed KG does is ask triple-
pattern queries against it. `bgp_query` compiles a conjunctive pattern
list — the SPARQL BGP core — into a chain of DataFrame equi-joins:

    bgp_query(triples, [
        ("?turn", V + "role",         "assistant"),
        ("?turn", V + "conversation", "?conv"),
    ])  # -> DataFrame(turn, conv)

Each pattern becomes a filtered projection of the triple table
(constants → pushed-down predicates on subj/pred/obj; `?name` terms →
binding columns), and patterns are greedily ordered most-constants-
first while staying connected, so every join is an equi-join on shared
variables and the most selective scan anchors the chain. Catalyst then
owns the physical strategy: the per-pattern filters reach the scan
(PushedFilters on a parquet-backed triple table; partition pruning when
the table is pred-partitioned, the standard layout for a triple store),
and AQE picks broadcast vs shuffle per join from runtime sizes.

Disconnected pattern groups multiply results (a cartesian product), so
they are rejected unless `allow_cartesian=True` — at corpus scale an
accidental cross join is a job-killer, not a semantics question.

A pattern's predicate may also be a SPARQL property-path AST tuple
(operators/paths.py, `parse_path`): the pattern then scans the path's
(s, o) pair relation instead of the raw triple table — sequence /
alternative / inverse / closures compose with ordinary patterns in one
BGP. String predicates are always plain IRIs (IRIs contain `/`, so
path syntax is never sniffed out of a string).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_POS_COLS = ("subj", "pred", "obj")

_VAR_RE = re.compile(r"\?([A-Za-z_]\w*)")
# aggregate function at top level distinguishes SPARQL aggregate select
# expressions from plain projections (SELECT (CONCAT(?a,?b) AS ?c))
_AGG_FN_RE = re.compile(
    r"\b(count|sum|min|max|avg|sample|stddev\w*|variance|var_\w+|"
    r"collect_list|collect_set|first|last|approx_\w+|percentile\w*|"
    r"group_concat)\s*\(",
    re.IGNORECASE,
)


def _sub_vars(expr: str) -> str:
    """Rewrite SPARQL ``?var`` references in a SQL expression to the
    bare binding-column names (``?idx > 2`` -> ``idx > 2``)."""
    return _VAR_RE.sub(r"\1", expr)


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def bgp_query(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    distinct: bool = True,
    allow_cartesian: bool = False,
    optional: list[list[tuple[str, str, str]]] | None = None,
    filters: list[str] | None = None,
    values: tuple[list[str], list[tuple]] | dict[str, list] | None = None,
    minus: list[list[tuple[str, str, str]]] | None = None,
    exists: list[list[tuple[str, str, str]]] | None = None,
    not_exists: list[list[tuple[str, str, str]]] | None = None,
    subqueries: list[DataFrame] | None = None,
) -> DataFrame:
    """Evaluate a conjunctive triple-pattern query; returns one column
    per variable (without the leading '?'). A variable repeated inside
    one pattern (e.g. ``("?x", p, "?x")``) becomes an intra-pattern
    equality filter; repeated across patterns, an equi-join key.

    `optional`: SPARQL OPTIONAL — each entry is a pattern GROUP
    evaluated as its own conjunctive BGP and LEFT-joined onto the
    required bindings on their shared variables (unmatched rows keep
    the required bindings with NULL optional columns). Groups are
    applied left-to-right, each seeing bindings from earlier groups
    (SPARQL's sequential-OPTIONAL semantics for the common
    well-designed-pattern case). A group must share >= 1 variable with
    the bindings it joins (else it would be a cartesian — rejected).

    `filters`: SPARQL FILTER — SQL boolean expressions over the
    variable columns (e.g. ``"idx > '2'"``), applied after all joins
    (Catalyst pushes them down wherever legal).

    `values`: SPARQL VALUES — an inline binding table restricting the
    solutions. Either ``{"?x": [v1, v2, ...]}`` (single variable) or
    ``(["?x", "?y"], [(a, b), (c, None), ...])`` where ``None`` is
    SPARQL's UNDEF (matches any binding of that variable on that row).
    The inline table is tiny by construction, so it joins as a
    broadcast: a plain equi-join when no UNDEFs appear, else a
    broadcast theta-join with per-column ``IS NULL OR =`` compatibility.

    `subqueries`: SPARQL subselects — binding tables (typically from
    `bgp_select`, whose aggregates/modifiers evaluate independently per
    the spec's bottom-up semantics) inner-joined onto the outer
    solutions on their shared variable columns. A subquery sharing no
    variable with the outer pattern would be a cartesian — rejected.
    Catalyst plans each join from runtime sizes (an aggregated
    subselect is usually tiny → broadcast).

    `minus` / `exists` / `not_exists`: SPARQL MINUS and FILTER
    (NOT) EXISTS — each entry is a pattern group evaluated as its own
    BGP (side groups are plain BGPs, so side bindings are always fully
    bound). Compatibility is exact even for outer solutions whose
    shared variables are PARTIALLY unbound (NULL from OPTIONAL): the
    outer table is partitioned by its bound/unbound pattern over the
    shared columns and each partition hash-joins on just its bound
    subset (see _finish_bgp). MINUS keeps all-unbound rows (domain
    disjoint) and groups sharing no variables remove nothing, per
    spec; an EXISTS row with all shared variables unbound is
    compatible with every side solution, so it gates on the group's
    non-emptiness — as does an uncorrelated group."""
    if not patterns:
        raise ValueError("empty BGP")

    # fully-constant patterns are existence gates (1-or-0-row cross
    # join, not a cartesian hazard) — split them off the join chain
    const_pats = [p for p in patterns if not any(_is_var(t) for t in p)]
    patterns = [p for p in patterns if any(_is_var(t) for t in p)]
    if not patterns:
        # all-constant BGP (the canonical `ASK { <s> <p> <o> }`): the
        # SPARQL result is the single empty solution mapping μ0 gated on
        # every ground triple existing — a zero-column one-row DataFrame
        # that the const-gate loop below prunes to 0 rows if any gate is
        # empty. bgp_ask then reads non-emptiness; callers that need
        # binding columns get an (accurate) empty projection.
        result = triples.sparkSession.range(1).select()
        return _finish_bgp(
            triples, result, const_pats, optional, values, minus,
            exists, not_exists, subqueries, filters, select, distinct,
            allow_cartesian,
        )

    remaining = list(range(len(patterns)))
    # greedy order: most constants first, then any pattern sharing a
    # variable with what's already bound (connectivity beats raw
    # selectivity for join-key availability)
    def n_consts(i: int) -> int:
        return sum(0 if _is_var(t) else 1 for t in patterns[i])

    def pat_vars(i: int) -> set[str]:
        return {t for t in patterns[i] if _is_var(t)}

    order = [max(remaining, key=n_consts)]
    remaining.remove(order[0])
    bound = set(pat_vars(order[0]))
    while remaining:
        connected = [i for i in remaining if pat_vars(i) & bound]
        if not connected:
            if not allow_cartesian:
                raise ValueError(
                    "disconnected BGP (cartesian product); pass "
                    "allow_cartesian=True to run it anyway"
                )
            connected = remaining
        nxt = max(connected, key=n_consts)
        remaining.remove(nxt)
        order.append(nxt)
        bound |= pat_vars(nxt)

    result: DataFrame | None = None
    for i in order:
        scan = _pattern_scan(triples, patterns[i])
        if result is None:
            result = scan
        else:
            shared = [c for c in scan.columns if c in result.columns]
            result = (
                result.join(scan, on=shared, how="inner")
                if shared
                else result.crossJoin(scan)
            )
    assert result is not None
    return _finish_bgp(
        triples, result, const_pats, optional, values, minus, exists,
        not_exists, subqueries, filters, select, distinct,
        allow_cartesian,
    )


def _null_mask_partitions(shared: list[str]):
    """Enumerate the 2^k bound/unbound patterns of the shared columns
    (k is small — it's the variable overlap of two pattern groups).
    Yields (bound_cols, row_predicate) pairs that partition the outer
    binding table by which shared variables are bound."""
    for mask in range(1 << len(shared)):
        bound = [c for i, c in enumerate(shared) if mask & (1 << i)]
        pred = F.lit(True)
        for i, c in enumerate(shared):
            pred = pred & (
                F.col(c).isNotNull() if mask & (1 << i) else F.col(c).isNull()
            )
        yield bound, pred


def _finish_bgp(
    triples, result, const_pats, optional, values, minus, exists,
    not_exists, subqueries, filters, select, distinct, allow_cartesian,
):
    """Shared tail of bgp_query: existence gates, OPTIONAL, VALUES,
    MINUS, (NOT) EXISTS, subselects, filters, projection.

    MINUS / EXISTS / VALUES implement SPARQL *compatibility* exactly,
    including solutions whose shared variables are partially unbound
    (NULL from OPTIONAL): side groups are plain BGPs, so the side is
    always fully bound, and the outer table is partitioned by its
    bound/unbound pattern over the shared columns — each partition
    joins HASH-equi on just its bound columns (never a nested-loop
    theta join, so the decomposition scales). MINUS additionally
    requires a non-empty shared *bound* domain (all-unbound rows are
    kept; domain-disjoint groups remove nothing), per the spec's
    dom-overlap clause."""
    for gi, p in enumerate(const_pats):
        if isinstance(p[1], tuple):  # constant-endpoint path pattern
            gate = _pattern_scan(triples, p)
        else:
            gate = triples
            for col, term in zip(_POS_COLS, p):
                gate = gate.filter(F.col(col) == F.lit(term))
        result = result.crossJoin(gate.limit(1).select(F.lit(1).alias(f"__g{gi}")))
        result = result.drop(f"__g{gi}")
    for group in optional or []:
        side = bgp_query(
            triples, group, distinct=distinct, allow_cartesian=allow_cartesian
        )
        shared = [c for c in side.columns if c in result.columns]
        if not shared:
            raise ValueError(
                "OPTIONAL group shares no variable with the required "
                "patterns (cartesian left join)"
            )
        result = result.join(side, on=shared, how="left")
    if values is not None:
        result = _apply_values(result, values)
    for group in minus or []:
        side = bgp_query(triples, group, allow_cartesian=allow_cartesian)
        shared = [c for c in side.columns if c in result.columns]
        if not shared:
            continue  # no shared variables: SPARQL MINUS removes nothing
        side_keys = side.select(*shared).dropDuplicates()
        if len(shared) == 1:
            # single shared var: NULL rows are domain-disjoint (kept),
            # bound rows anti-join — the null-unsafe anti-join does both
            result = result.join(side_keys, on=shared, how="left_anti")
            continue
        parts = []
        for bound, pred in _null_mask_partitions(shared):
            part = result.filter(pred)
            if bound:  # dom overlap on the bound subset → compatibility
                part = part.join(
                    side_keys.select(*bound).dropDuplicates(),
                    on=bound, how="left_anti",
                )
            # all shared unbound: domain-disjoint, row survives MINUS
            parts.append(part)
        result = parts[0]
        for p_ in parts[1:]:
            result = result.unionByName(p_)
    for kind, groups in (("left_semi", exists), ("left_anti", not_exists)):
        for group in groups or []:
            side = bgp_query(triples, group, allow_cartesian=allow_cartesian)
            shared = [c for c in side.columns if c in result.columns]
            if not shared:
                # uncorrelated (NOT) EXISTS: one boolean for the whole
                # query — gate every row on the group's non-emptiness
                n = F.broadcast(
                    side.limit(1).select(F.lit(1).alias("__nonempty"))
                )
                if kind == "left_semi":
                    result = result.crossJoin(n).drop("__nonempty")
                else:
                    result = result.join(
                        n, F.lit(True), "left"
                    ).filter(F.col("__nonempty").isNull()).drop("__nonempty")
                continue
            side_keys = side.select(*shared).dropDuplicates()
            nonempty = F.broadcast(
                side_keys.limit(1).select(F.lit(1).alias("__nonempty"))
            )
            parts = []
            for bound, pred in _null_mask_partitions(shared):
                part = result.filter(pred)
                if bound:
                    part = part.join(
                        side_keys.select(*bound).dropDuplicates(),
                        on=bound, how=kind,
                    )
                else:
                    # all shared unbound: compatible with EVERY side row
                    # — EXISTS keeps the row iff the group is non-empty
                    if kind == "left_semi":
                        part = part.crossJoin(nonempty).drop("__nonempty")
                    else:
                        part = part.join(
                            nonempty, F.lit(True), "left"
                        ).filter(F.col("__nonempty").isNull()).drop("__nonempty")
                parts.append(part)
            result = parts[0]
            for p_ in parts[1:]:
                result = result.unionByName(p_)
    for sub in subqueries or []:
        shared = [c for c in sub.columns if c in result.columns]
        if not shared:
            raise ValueError(
                "subquery shares no variable with the outer pattern "
                "(cartesian product)"
            )
        result = result.join(sub, on=shared, how="inner")
    for cond in filters or []:
        result = result.filter(cond)
    if select is not None:
        result = result.select(*[v.lstrip("?") for v in select])
    # zero-column results (all-constant BGP) carry 0 or 1 empty
    # solutions by construction; dropDuplicates needs >= 1 column
    return result.dropDuplicates() if distinct and result.columns else result


def _pattern_scan(triples: DataFrame, pattern: tuple[str, str, str]) -> DataFrame:
    # property-path predicate (tuple AST from paths.parse_path; string
    # predicates are always plain IRIs — IRIs contain '/' so syntax
    # sniffing is unsound): evaluate to an (s, o) pair relation via
    # operators/paths.py, then bind subj/obj against it exactly like a
    # plain triple scan
    pred = pattern[1]
    if isinstance(pred, tuple):
        if len(pattern) == 4:
            return _graph_path_scan(triples, pattern)
        from json_ld_spark.operators.paths import path_pairs

        # constant SUBJECT + CLOSURE path: seed the evaluation so the
        # fixpoint runs as frontier BFS over the reachable set (work ∝
        # what the seed reaches, not corpus size). Only closures
        # benefit — for plain seq/alt/inv paths Catalyst pushes the
        # post-hoc s=const filter through the join chain itself
        # (measured: seeding a 2-step seq was 1.6× SLOWER than letting
        # the filter push), so those stay unseeded.
        def has_closure(node) -> bool:
            if not isinstance(node, tuple):
                return False
            if node[0] in ("opt", "plus", "star"):
                return True
            return any(has_closure(c) for c in node[1:])

        subjects = None
        if not _is_var(pattern[0]) and has_closure(pred):
            subjects = triples.sparkSession.createDataFrame(
                [(pattern[0],)], "s string"
            )
        pairs = path_pairs(triples, pred, subjects=subjects)
        out_cols = {}
        df = pairs
        for col, term in zip(("s", "o"), (pattern[0], pattern[2])):
            if _is_var(term):
                name = term[1:]
                if name in out_cols:
                    df = df.filter(F.col(col) == F.col(out_cols[name]))
                else:
                    out_cols[name] = col
            else:
                df = df.filter(F.col(col) == F.lit(term))
        if not out_cols:  # fully-constant path pattern: existence gate
            return df.limit(1).select(F.lit(1).alias("__gate"))
        return df.select(*[F.col(c).alias(n) for n, c in out_cols.items()])
    df = triples
    out_cols = {}
    # 4-term patterns (s, p, o, g) are GRAPH-clause quad patterns: the
    # 4th term matches the `graph` column of a quad table. Per SPARQL
    # 13.3, GRAPH ranges over NAMED graphs only, so a graph VARIABLE
    # additionally excludes default-graph (NULL) rows; plain 3-term
    # patterns over a quad table keep union-default-graph semantics
    # (every row, whatever its graph — the common triple-table
    # deployment, same default as rdflib's union dataset).
    cols = _POS_COLS if len(pattern) == 3 else _POS_COLS + ("graph",)
    if len(pattern) == 4:
        if "graph" not in df.columns:
            raise ValueError(
                "GRAPH pattern requires a quad table with a 'graph' column"
            )
        if _is_var(pattern[3]):
            df = df.filter(F.col("graph").isNotNull())
        elif pattern[3] == "@default":
            # dataset-clause sentinel (FROM/FROM NAMED rewriting): the
            # pattern matches the DEFAULT graph only — NULL graph rows
            # (JSON-LD's own @default spelling; a real IRI can never
            # collide with a keyword-shaped string)
            df = df.filter(F.col("graph").isNull())
            pattern = pattern[:3]
            cols = _POS_COLS
    for col, term in zip(cols, pattern):
        if _is_var(term):
            name = term[1:]
            if name in out_cols:  # same var twice in one pattern
                df = df.filter(F.col(col) == F.col(out_cols[name]))
            else:
                out_cols[name] = col
        else:
            df = df.filter(F.col(col) == F.lit(term))
    return df.select(*[F.col(c).alias(n) for n, c in out_cols.items()])


def _graph_path_scan(triples: DataFrame, pattern: tuple) -> DataFrame:
    """Property path inside GRAPH (4-term path pattern): SPARQL
    evaluates the path WITHIN each graph.

    - constant graph (IRI or the FROM-rewrite "@default" sentinel):
      the path runs over that one graph's slice — the graph-equality
      filter pushes to the scan, then it is a plain 3-term path.
    - graph VARIABLE: one distributed evaluation over ALL named
      graphs at once — nodes are encoded as struct(graph, term), so
      every path join (sequence midpoints, closure frontiers,
      zero-length term enumeration) carries the graph as part of the
      join key and edges can never cross graphs. No per-graph loop,
      no graph enumeration on the driver; the closure state grows by
      one small struct field."""
    s_term, pred, o_term, g_term = pattern
    if "graph" not in triples.columns:
        raise ValueError(
            "GRAPH pattern requires a quad table with a 'graph' column"
        )
    from json_ld_spark.operators.paths import path_pairs

    if not _is_var(g_term):
        sliced = (
            triples.filter(F.col("graph").isNull())
            if g_term == "@default"
            else triples.filter(F.col("graph") == F.lit(g_term))
        )
        return _pattern_scan(sliced, (s_term, pred, o_term))

    enc = triples.filter(F.col("graph").isNotNull()).select(
        F.struct(F.col("graph").alias("g"), F.col("subj").alias("t")).alias("subj"),
        "pred",
        F.struct(F.col("graph").alias("g"), F.col("obj").alias("t")).alias("obj"),
    )
    pairs = path_pairs(enc, pred)  # (s, o) structs; s.g == o.g by construction
    out_cols: dict[str, F.Column] = {g_term[1:]: F.col("s")["g"]}
    df = pairs
    for col, term in zip(("s", "o"), (s_term, o_term)):
        if _is_var(term):
            name = term[1:]
            if name in out_cols:
                df = df.filter(F.col(col)["t"] == out_cols[name])
            else:
                out_cols[name] = F.col(col)["t"]
        else:
            df = df.filter(F.col(col)["t"] == F.lit(term))
    return df.select(*[c.alias(n) for n, c in out_cols.items()])


def bgp_ask(triples: DataFrame, patterns: list[tuple[str, str, str]], **kw) -> bool:
    """SPARQL ASK: does the pattern have at least one solution?
    Evaluates the BGP lazily and probes one row — Spark stops the scan
    at the first match (LocalLimit pushes through the join tree's
    streaming side), so an ASK never materializes the full binding
    set."""
    return not bgp_query(triples, patterns, distinct=False, **kw).isEmpty()


def bgp_construct(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    **kw,
) -> DataFrame:
    """SPARQL CONSTRUCT: instantiate `template` triple patterns once
    per solution of the WHERE block, returning a new (subj, pred, obj)
    triple table (deduplicated — CONSTRUCT produces a graph, i.e. a
    set). Template terms are either ``?var`` references into the
    binding columns or constants. Solutions leaving any template
    variable NULL (e.g. from OPTIONAL) drop that template triple, per
    spec. This is the derive-new-edges primitive: the bindings stay a
    DataFrame, instantiation is a projection, and the result unions
    into the source KG as just another triple source."""
    bindings = bgp_query(triples, patterns, **kw)
    return instantiate_template(bindings, template)


def instantiate_template(
    bindings: DataFrame, template: list[tuple[str, str, str]]
) -> DataFrame:
    """Instantiate CONSTRUCT/UPDATE template triples once per solution
    row: `?var` terms project binding columns, constants become
    literals; NULL-leaving solutions drop that template triple (spec);
    the result is a deduplicated triple set.

    Template blank nodes (``[ p o ]`` / ``_:x`` — surfaced by the
    SPARQL parser as ``?__b*`` variables never bound by WHERE) get a
    FRESH label per solution, per spec: the label is the template tag
    plus a hash of the solution's bindings, so the same template bnode
    within one solution names one node and distinct solutions get
    distinct nodes."""
    sol_hash = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in sorted(bindings.columns)
            ],
        )
    )

    def term_col(t: str) -> F.Column:
        if not _is_var(t):
            return F.lit(t)
        name = t[1:]
        if name not in bindings.columns and name.startswith("__b"):
            return F.concat(F.lit(f"_:t{name}_"), sol_hash)
        return F.col(name)

    out: DataFrame | None = None
    for s, p, o in template:
        row = bindings.select(
            *(
                term_col(t).alias(c)
                for c, t in zip(_POS_COLS, (s, p, o))
            )
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("empty triple template")
    return (
        out.where(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        ).dropDuplicates()
    )


def bgp_describe(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    var: str,
    **kw,
) -> DataFrame:
    """SPARQL DESCRIBE (concise-bounded-description style, one level):
    every triple whose subject is a binding of `var` — a LEFT SEMI join
    of the triple table against the matched node set, so the output is
    a sub-KG, not a binding table."""
    nodes = bgp_query(triples, patterns, select=[var], **kw).select(
        F.col(var.lstrip("?")).alias("subj")
    )
    return triples.join(nodes.dropDuplicates(), on="subj", how="left_semi")


def _apply_values(
    result: DataFrame,
    values: tuple[list[str], list[tuple]] | dict[str, list],
) -> DataFrame:
    """Join the inline VALUES table onto the bindings. The table is
    literal data (always small), so it is broadcast; rows containing
    UNDEF (None) fall back to a per-column compatibility predicate."""
    spark = result.sparkSession
    if isinstance(values, dict):
        (var, vals), *rest = values.items()
        if rest:
            raise ValueError(
                "dict VALUES takes exactly one variable; use "
                "(['?x', '?y'], rows) for multi-variable blocks"
            )
        names, rows = [var], [(v,) for v in vals]
    else:
        names, rows = values
    cols = [v.lstrip("?") for v in names]
    missing = [c for c in cols if c not in result.columns]
    if missing:
        raise ValueError(f"VALUES variables not bound by the BGP: {missing}")
    if not rows:
        raise ValueError("empty VALUES block")
    inline = F.broadcast(
        spark.createDataFrame(
            [tuple(r) for r in rows], schema=[f"__v_{c}" for c in cols]
        ).dropDuplicates()
    )
    # SPARQL VALUES is Join(Ω, data): per-column compatibility is
    # (either side unbound OR equal) — the result side can be NULL from
    # OPTIONAL, the inline side from UNDEF — and compatible solutions
    # MERGE their bindings (a row with unbound ?x joined to a VALUES row
    # x=5 yields x=5; against k compatible rows it yields k solutions,
    # per the spec's multiset join). The inline table is broadcast, so
    # the theta join is a broadcast nested loop over literal data only.
    cond = None
    for c in cols:
        eq = (
            F.col(c).isNull()
            | F.col(f"__v_{c}").isNull()
            | (F.col(c) == F.col(f"__v_{c}"))
        )
        cond = eq if cond is None else cond & eq
    joined = result.join(inline, cond, "inner")
    for c in cols:
        joined = joined.withColumn(c, F.coalesce(F.col(c), F.col(f"__v_{c}")))
    return joined.drop(*[f"__v_{c}" for c in cols])


def group_concat(var: str, sep: str = " ") -> str:
    """SPARQL ``GROUP_CONCAT(?var; SEPARATOR=sep)`` as a deterministic
    Spark aggregate expression. SPARQL leaves the concatenation order
    undefined; a distributed engine MUST pin it or the result differs
    run-to-run with partitioning — we sort the collected values
    (``array_sort(collect_list(...))``), which is also the only way the
    same query gives the same bytes on 1 executor and on 1000."""
    q = sep.replace("'", "\\'")
    return f"array_join(array_sort(collect_list({var.lstrip('?')})), '{q}')"


def bgp_select(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    *,
    bind: list[tuple[str, str]] | None = None,
    group_by: list[str] | None = None,
    aggregates: dict[str, str] | None = None,
    having: list[str] | None = None,
    order_by: list[str] | None = None,
    limit: int | None = None,
    offset: int | None = None,
    select: list[str] | None = None,
    distinct: bool = False,
    **bgp_kw,
) -> DataFrame:
    """Full SPARQL 1.1 SELECT over a BGP: the `bgp_query` algebra
    (OPTIONAL/FILTER/VALUES/MINUS/EXISTS via ``**bgp_kw``) followed by
    the solution-modifier pipeline in the spec's order —
    BIND/extend, GROUP BY + aggregates, HAVING, projection, DISTINCT,
    ORDER BY, OFFSET/LIMIT.

    * ``bind`` — ordered ``("?new", "expr over ?vars")`` pairs
      (SPARQL BIND/extend). The target must be unbound, per spec;
      expressions are Spark SQL with ``?var`` references substituted,
      so they stay JVM-side (whole-stage codegen), never a Python UDF.
    * ``group_by`` + ``aggregates`` — ``aggregates`` maps result alias
      to an aggregate expression over ``?vars`` (``COUNT(*)``,
      ``count(distinct ?t)``, ``sum/min/max/avg(?x)``, or
      :func:`group_concat`). An empty/None ``group_by`` with
      aggregates is SPARQL's single implicit group. Spark computes
      every aggregate with a map-side partial, so the shuffle carries
      one row per (partition, group), not per solution — the 100 TB
      behavior a naive sort-group would not have. SPARQL's SAMPLE(?x)
      is nondeterministic by spec; write ``min(?x)`` for a
      deterministic pick.
    * ``having`` — boolean expressions over group keys/aliases,
      filtered post-aggregation.
    * ``order_by`` — ``"?v"`` / ``"ASC(?v)"`` ascending,
      ``"-?v"`` / ``"DESC(?v)"`` descending. A global ORDER BY is a
      range-partitioned total sort; with a LIMIT, Catalyst rewrites it
      to TakeOrderedAndProject (per-partition top-K + single merge), so
      ``order_by + limit`` is cheap at any scale while an unbounded
      total sort of a 100 TB result is intentionally explicit.
    * ``limit`` / ``offset`` — require ``order_by`` (a page of an
      unordered distributed result is nondeterministic; SPARQL allows
      it, a reproducible engine shouldn't).
    * ``select`` — projection AFTER aggregation: group keys and
      aggregate aliases only, like SPARQL. ``distinct`` applies to the
      projected solutions. Order-by columns must survive projection.
    """
    # SPARQL scopes FILTER over the whole group INCLUDING BIND targets;
    # bgp_query evaluates pre-BIND, so filters that reference a BIND
    # target are deferred until after the extend loop below.
    bind_names = {var.lstrip("?") for var, _ in bind or []}
    deferred_filters: list[str] = []
    if bind_names and bgp_kw.get("filters"):
        pre = []
        for f in bgp_kw["filters"]:
            if any(re.search(rf"\b{re.escape(n)}\b", f) for n in bind_names):
                deferred_filters.append(f)
            else:
                pre.append(f)
        bgp_kw["filters"] = pre
    result = bgp_query(triples, patterns, distinct=False, **bgp_kw)
    for var, expr in bind or []:
        name = var.lstrip("?")
        if name in result.columns:
            raise ValueError(
                f"BIND target ?{name} is already bound (SPARQL forbids "
                "rebinding; pick a fresh variable)"
            )
        result = result.withColumn(name, F.expr(_sub_vars(expr)))
    for cond in deferred_filters:
        result = result.filter(cond)
    if aggregates:
        # SPARQL aggregation is over the DISTINCT solution multiset of
        # the group pattern only when the inner query says so; the
        # bgp_query above already ran with distinct=False, and callers
        # wanting set semantics write count(distinct ?x) etc.
        # A select expression with NO aggregate function at top level
        # (e.g. CONCAT(?a, ?b) AS ?c) is a per-solution projection, not
        # an aggregate: it extends rows (post-aggregation if grouping is
        # present, where it may legally reference keys and agg aliases).
        agg_items = {
            a: e for a, e in aggregates.items() if _AGG_FN_RE.search(e)
        }
        proj_items = {a: e for a, e in aggregates.items() if a not in agg_items}
        keys = [v.lstrip("?") for v in group_by or []]
        if agg_items:
            aggs = [
                F.expr(_sub_vars(expr)).alias(alias.lstrip("?"))
                for alias, expr in agg_items.items()
            ]
            result = (
                result.groupBy(*keys).agg(*aggs) if keys else result.agg(*aggs)
            )
        elif keys:
            # GROUP BY with only projection expressions: one row per group
            result = result.select(*keys).dropDuplicates()
        for alias, expr in proj_items.items():
            result = result.withColumn(
                alias.lstrip("?"), F.expr(_sub_vars(expr))
            )
    elif group_by:
        raise ValueError("group_by given without aggregates")
    for cond in having or []:
        result = result.filter(_sub_vars(cond))
    if select is not None:
        result = result.select(*[v.lstrip("?") for v in select])
    if distinct:
        result = result.dropDuplicates()
    if order_by:
        sort_cols = []
        for spec in order_by:
            s = spec.strip()
            desc = False
            if s.upper().startswith("DESC(") and s.endswith(")"):
                s, desc = s[5:-1].strip(), True
            elif s.upper().startswith("ASC(") and s.endswith(")"):
                s = s[4:-1].strip()
            elif s.startswith("-"):
                s, desc = s[1:].strip(), True
            col = F.col(s.lstrip("?"))
            sort_cols.append(col.desc() if desc else col.asc())
        result = result.orderBy(*sort_cols)
    if (limit is not None or offset is not None) and not order_by:
        raise ValueError(
            "LIMIT/OFFSET without ORDER BY selects a nondeterministic "
            "page of a distributed result; add order_by"
        )
    if offset is not None:
        result = result.offset(offset)
    if limit is not None:
        result = result.limit(limit)
    return result


def bgp_union(
    triples: DataFrame,
    groups: list[list[tuple[str, str, str]]],
    select: list[str] | None = None,
    distinct: bool = True,
    allow_cartesian: bool = False,
) -> DataFrame:
    """SPARQL UNION: evaluate each pattern group as its own BGP and
    union the binding tables. Groups may bind different variable sets —
    missing variables come back NULL (unionByName with
    allowMissingColumns), exactly SPARQL's unbound semantics. Each
    branch is an independent Catalyst subtree, so the branches' scans
    and joins parallelize freely and the union is a zero-shuffle
    concatenation."""
    if not groups:
        raise ValueError("empty UNION")
    branches = [
        bgp_query(
            triples, g, distinct=False, allow_cartesian=allow_cartesian
        )
        for g in groups
    ]
    result = branches[0]
    for b in branches[1:]:
        result = result.unionByName(b, allowMissingColumns=True)
    if select is not None:
        result = result.select(*[v.lstrip("?") for v in select])
    return result.dropDuplicates() if distinct else result
