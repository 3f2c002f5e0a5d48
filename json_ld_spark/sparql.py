"""SPARQL 1.1 text front end over the BGP/paths execution layer.

The reference exposes a Rust API, not a query language; this engine's
execution layer (operators/bgp.py, operators/paths.py) already covers
the SPARQL 1.1 SELECT algebra — this module adds the missing piece, a
parser, so a KG user can type an actual query:

    sparql(triples, '''
        PREFIX t: <https://example.org/transcript#>
        SELECT ?conv (COUNT(*) AS ?n)
        WHERE { ?turn t:conversation ?conv ; t:role "assistant" . }
        GROUP BY ?conv HAVING (COUNT(*) > 3)
        ORDER BY DESC(?n) LIMIT 10
    ''')

Supported subset (everything maps 1:1 onto the existing operators —
the parser introduces NO new evaluation code, so every algebra path it
emits is already oracle-tested):

- query forms: SELECT (DISTINCT, expressions ``(expr AS ?alias)``),
  ASK, CONSTRUCT, DESCRIBE ?var
- prologue: BASE, PREFIX
- group graph patterns: triple blocks with ``;`` / ``,`` lists,
  ``a`` for rdf:type, blank-node property lists ``[ p o ]`` and
  ``_:label`` terms (non-distinguished variables, SPARQL 4.1.4), RDF
  collections ``( e1 e2 )`` (expanded to the rdf:first/rest chains
  toRdf emits), property paths in predicate position (full
  paths grammar: ``^ / | ? * + !(...)`` — compiled via
  paths.parse_path), OPTIONAL, FILTER(expr), FILTER (NOT) EXISTS,
  MINUS, VALUES (inline data incl. UNDEF), BIND(expr AS ?v),
  ``{ A } UNION { B }`` (pattern-group branches), nested
  ``{ SELECT … }`` subqueries (executed bottom-up, joined on shared
  variables)
- solution modifiers: GROUP BY, HAVING, ORDER BY ASC/DESC,
  LIMIT/OFFSET
- aggregates: COUNT(*/…/DISTINCT …), SUM, MIN, MAX, AVG,
  GROUP_CONCAT(?v; SEPARATOR="…") (order-pinned — see
  bgp.group_concat), SAMPLE (mapped to MIN: SPARQL allows any
  element, a distributed engine must pick deterministically)
- FILTER/BIND/HAVING expressions compile to Spark SQL (JVM codegen,
  never Python): ``&&``/``||``/``!`` → AND/OR/NOT, ``regex`` →
  ``regexp_like``, ``bound`` → ``isnotnull``, STRSTARTS/STRENDS/
  CONTAINS/STRLEN/UCASE/LCASE/STR → startswith/endswith/contains/
  length/upper/lower/string, SUBSTR → substring (both 1-based),
  REPLACE → regexp_replace (both regex-based), HOURS/MINUTES/SECONDS
  → hour/minute/second; ABS/ROUND/CEIL/FLOOR/CONCAT/COALESCE/IF pass
  through by name, as does everything else (Spark SQL with ``?var``
  references substituted).

- ``GRAPH ?g|<iri> { … }`` over a QUAD table (a DataFrame carrying a
  ``graph`` column): contained patterns become 4-term quad patterns;
  a graph variable ranges over named graphs only (SPARQL 13.3) while
  plain patterns keep union-default-graph semantics (the common
  triple-table deployment). Property paths inside GRAPH are rejected.
- ``FROM <g>`` / ``FROM NAMED <g>`` dataset clauses: the query runs
  against a constructed dataset (SPARQL 13.2) — FROM graphs merge into
  the default graph, FROM NAMED graphs are the only ones GRAPH sees,
  plain patterns tighten to the constructed default graph.

Out of scope (raises SparqlSyntaxError): SERVICE/federated queries;
UPDATE graph-management text (the DELETE/INSERT WHERE algebra lives in
operators/maintenance.update_where).

Literals match the 3-column triple table's lexical convention: the
parser strips quotes and keeps the lexical form (``"42"`` and ``42``
both yield ``42``), dropping @lang/^^datatype suffixes — the 3-col
projection the BGP layer queries is term-lexical by design.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"


class SparqlSyntaxError(ValueError):
    pass


# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRI><[^<>"{}|^`\\\s]*>)
  | (?P<VAR>[?$][A-Za-z_]\w*)
  | (?P<STR>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<NUM>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<LANG>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<PNAME>[A-Za-z_][\w.-]*:[\w.-]*|:[\w.-]*)
  | (?P<WORD>[A-Za-z_][\w-]*)
  | (?P<OP>\^\^|&&|\|\||!=|<=|>=|[{}()\[\].,;|/^?*+!=<>-])
""",
    re.X,
)

_SIMPLE_ESC = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
               '"': '"', "'": "'", "\\": "\\"}


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(
        r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|[tbnrf\"'\\])",
        lambda m: (
            chr(int(m.group(1)[1:], 16))
            if m.group(1)[0] in "uU"
            else _SIMPLE_ESC[m.group(1)]
        ),
        body,
    )


@dataclass
class _Tok:
    kind: str
    val: str


def _tokenize(text: str) -> list[_Tok]:
    toks, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise SparqlSyntaxError(f"cannot tokenize at: {text[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "WS":
            toks.append(_Tok(kind, m.group()))
    toks.append(_Tok("EOF", ""))
    return toks


# --------------------------------------------------------------------------
# parsed structures
# --------------------------------------------------------------------------

@dataclass
class _Group:
    patterns: list = field(default_factory=list)
    optional: list = field(default_factory=list)
    filters: list = field(default_factory=list)
    minus: list = field(default_factory=list)
    exists: list = field(default_factory=list)
    not_exists: list = field(default_factory=list)
    binds: list = field(default_factory=list)
    values: Any = None
    union: list = field(default_factory=list)     # list of pattern groups
    subselects: list = field(default_factory=list)  # parsed sub-Queries


@dataclass
class _Query:
    form: str                      # select | ask | construct | describe
    group: _Group = None
    select: list = None            # ["?v", ...] or None for *
    aggregates: dict = None        # alias -> expr
    distinct: bool = False
    group_by: list = None
    having: list = None
    order_by: list = None
    limit: int = None
    offset: int = None
    template: list = None          # CONSTRUCT
    describe_var: str = None
    from_graphs: list = None       # FROM <iri> (merged default graph)
    from_named: list = None        # FROM NAMED <iri>


_FN_MAP = {
    "regex": "regexp_like", "bound": "isnotnull", "strstarts": "startswith",
    "strends": "endswith", "contains": "contains", "strlen": "length",
    "ucase": "upper", "lcase": "lower", "str": "string", "sample": "min",
    # SPARQL 17.4 builtins with direct Spark SQL equivalents: SUBSTR is
    # 1-based in both; REPLACE is regex-based in both; the datetime
    # accessors differ only in pluralization. ABS/ROUND/CEIL/FLOOR/
    # CONCAT/COALESCE/IF pass through by name.
    "substr": "substring", "replace": "regexp_replace",
    "hours": "hour", "minutes": "minute", "seconds": "second",
}
_UNSUPPORTED = {"service", "insert", "delete", "with"}


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self._bnode_n = 0

    def _fresh_bnode_var(self) -> str:
        # query blank nodes are non-distinguished variables (SPARQL
        # 4.1.4); explicit SELECT projections hide them, SELECT *
        # surfaces them as __b<N> columns
        v = f"?__b{self._bnode_n}"
        self._bnode_n += 1
        return v

    # -- token helpers ----------------------------------------------------
    def peek(self, ahead: int = 0) -> _Tok:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def kw(self, word: str) -> bool:
        t = self.peek()
        if t.kind == "WORD" and t.val.lower() == word.lower():
            self.i += 1
            return True
        return False

    def expect_op(self, op: str) -> None:
        t = self.next()
        if not (t.kind == "OP" and t.val == op):
            raise SparqlSyntaxError(f"expected {op!r}, got {t.val!r}")

    def at_op(self, op: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.val == op

    def at_kw(self, word: str) -> bool:
        t = self.peek()
        return t.kind == "WORD" and t.val.lower() == word.lower()

    # -- terms ------------------------------------------------------------
    def _expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(f"undeclared prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def term(self, position: str = "object") -> str:
        t = self.next()
        if t.kind == "VAR":
            return "?" + t.val[1:]
        if t.kind == "IRI":
            return t.val[1:-1]
        if t.kind == "PNAME":
            if t.val.startswith("_:"):
                # _:label = non-distinguished variable, consistent
                # within one query
                return "?__bn_" + t.val[2:]
            return self._expand_pname(t.val)
        if t.kind == "STR":
            val = _unquote(t.val)
            # lexical convention: drop @lang / ^^datatype suffixes
            if self.peek().kind == "OP" and self.peek().val == "^^":
                self.next()
                nxt = self.next()
                if nxt.kind not in ("IRI", "PNAME"):
                    raise SparqlSyntaxError("bad datatype after ^^")
            elif self.peek().kind == "LANG":
                self.next()
            return val
        if t.kind == "NUM":
            return t.val
        if t.kind == "WORD":
            w = t.val.lower()
            if w == "a" and position == "predicate":
                return RDF_TYPE
            if w in ("true", "false"):
                return w
            if w == "undef":
                return None
            raise SparqlSyntaxError(f"unexpected word {t.val!r} as term")
        raise SparqlSyntaxError(f"unexpected token {t.val!r} as term")

    # -- property paths ---------------------------------------------------
    def _path_primary(self) -> str:
        if self.at_op("("):
            self.next()
            inner = self._path_alt()
            self.expect_op(")")
            return f"({inner})"
        if self.at_op("!"):
            self.next()
            self.expect_op("(")
            parts = [self._path_elt_iri()]
            while self.at_op("|"):
                self.next()
                parts.append(self._path_elt_iri())
            self.expect_op(")")
            return "!(" + "|".join(parts) + ")"
        return self._path_elt_iri()

    def _path_elt_iri(self) -> str:
        inv = ""
        if self.at_op("^"):
            self.next()
            inv = "^"
        t = self.next()
        if t.kind == "IRI":
            return f"{inv}<{t.val[1:-1]}>"
        if t.kind == "PNAME":
            return f"{inv}<{self._expand_pname(t.val)}>"
        if t.kind == "WORD" and t.val == "a":
            return f"{inv}<{RDF_TYPE}>"
        raise SparqlSyntaxError(f"bad path element {t.val!r}")

    def _path_postfix(self, atom: str) -> str:
        if self.at_op("*") or self.at_op("+") or self.at_op("?"):
            return atom + self.next().val
        return atom

    def _path_seq(self) -> str:
        parts = [self._path_postfix(self._path_primary())]
        while self.at_op("/"):
            self.next()
            parts.append(self._path_postfix(self._path_primary()))
        return "/".join(parts)

    def _path_alt(self) -> str:
        parts = [self._path_seq()]
        while self.at_op("|"):
            self.next()
            parts.append(self._path_seq())
        return "|".join(parts)

    def predicate(self):
        """Plain IRI/var predicate, or a property-path AST."""
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return "?" + t.val[1:]
        path_str = self._path_alt()
        # a bare atom (no operators) stays a constant predicate string
        if re.fullmatch(r"<[^<>]*>", path_str):
            return path_str[1:-1]
        from .operators.paths import parse_path

        return parse_path(path_str)

    # -- triple blocks ----------------------------------------------------
    def _bnode_prop_list(self, out: list) -> str:
        """``[ p1 o1 ; p2 o2 ]`` — allocate a fresh non-distinguished
        variable and emit the contained patterns with it as subject;
        bare ``[]`` is just the fresh variable."""
        self.expect_op("[")
        var = self._fresh_bnode_var()
        while not self.at_op("]"):
            pred = self.predicate()
            while True:
                obj = self._term_or_bnode(out)
                out.append((var, pred, obj))
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                continue
            break
        self.expect_op("]")
        return var

    def _term_or_bnode(self, out: list, position: str = "object") -> str:
        if self.at_op("["):
            return self._bnode_prop_list(out)
        if self.at_op("("):
            return self._collection(out)
        return self.term(position)

    def _collection(self, out: list) -> str:
        """``( e1 e2 … )`` — RDF collection syntax: expands to the
        rdf:first/rdf:rest chain (fresh non-distinguished variables per
        cons cell), matching the list structures toRdf emits. ``()`` is
        rdf:nil."""
        first = RDF_NS + "first"
        rest = RDF_NS + "rest"
        nil = RDF_NS + "nil"
        self.expect_op("(")
        items = []
        while not self.at_op(")"):
            items.append(self._term_or_bnode(out))
        self.next()
        if not items:
            return nil
        head = self._fresh_bnode_var()
        node = head
        for i, item in enumerate(items):
            out.append((node, first, item))
            nxt = self._fresh_bnode_var() if i + 1 < len(items) else nil
            out.append((node, rest, nxt))
            node = nxt
        return head

    def triples_block(self, out: list) -> None:
        subj = self._term_or_bnode(out, "subject")
        if subj.startswith("?__b") and (self.at_op(".") or self.at_op("}")):
            # bare "[ ... ]" (with or without dot) — the list WAS the
            # whole statement
            if self.at_op("."):
                self.next()
            return
        while True:
            pred = self.predicate()
            while True:
                obj = self._term_or_bnode(out)
                out.append((subj, pred, obj))
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                if self.at_op(".") or self.at_op("}"):
                    break
                continue
            break
        if self.at_op("."):
            self.next()

    # -- expressions (token-level transpile to Spark SQL) -----------------
    def expr_until_balanced(self) -> str:
        """Consume a parenthesized expression (starting AT '('), return
        the Spark SQL transpilation of its inside."""
        self.expect_op("(")
        out, depth = [], 1
        while True:
            t = self.next()
            if t.kind == "EOF":
                raise SparqlSyntaxError("unterminated expression")
            if t.kind == "OP" and t.val == "(":
                depth += 1
                out.append("(")
                continue
            if t.kind == "OP" and t.val == ")":
                depth -= 1
                if depth == 0:
                    break
                out.append(")")
                continue
            out.append(self._expr_token(t))
        return " ".join(out)

    def _expr_token(self, t: _Tok) -> str:
        if t.kind == "VAR":
            return "?" + t.val[1:]
        if t.kind == "STR":
            return "'" + _unquote(t.val).replace("\\", "\\\\").replace("'", "\\'") + "'"
        if t.kind == "IRI":
            return "'" + t.val[1:-1].replace("'", "\\'") + "'"
        if t.kind == "PNAME":
            return "'" + self._expand_pname(t.val).replace("'", "\\'") + "'"
        if t.kind == "NUM":
            return t.val
        if t.kind == "OP":
            return {"&&": "AND", "||": "OR", "!": "NOT"}.get(t.val, t.val)
        if t.kind == "WORD":
            w = t.val.lower()
            if w in _FN_MAP and self.at_op("("):
                return _FN_MAP[w]
            return t.val
        raise SparqlSyntaxError(f"bad expression token {t.val!r}")

    # -- group graph pattern ----------------------------------------------
    def group_graph_pattern(self) -> _Group:
        g = _Group()
        self.expect_op("{")
        while not self.at_op("}"):
            t = self.peek()
            if t.kind == "WORD" and t.val.lower() in _UNSUPPORTED:
                raise SparqlSyntaxError(
                    f"{t.val.upper()} is outside the supported subset"
                )
            if self.kw("graph"):
                # GRAPH ?g|<iri> { patterns }: each contained triple
                # pattern becomes a 4-term quad pattern (s, p, o, g) —
                # the BGP layer matches the quad table's graph column
                # (named graphs only for a variable, SPARQL 13.3)
                gt = self.peek()
                if gt.kind == "VAR":
                    self.next()
                    gterm = "?" + gt.val[1:]
                elif gt.kind == "IRI":
                    self.next()
                    gterm = gt.val[1:-1]
                elif gt.kind == "PNAME":
                    self.next()
                    gterm = self._expand_pname(gt.val)
                else:
                    raise SparqlSyntaxError("GRAPH needs ?var or <iri>")
                sub = self.group_graph_pattern()
                self._require_patterns_only(sub, "GRAPH")
                for (ps, pp, po) in sub.patterns:
                    # property paths allowed: 4-term path patterns
                    # evaluate within each graph (bgp._graph_path_scan)
                    g.patterns.append((ps, pp, po, gterm))
            elif self.kw("optional"):
                sub = self.group_graph_pattern()
                self._require_patterns_only(sub, "OPTIONAL")
                g.optional.append(sub.patterns)
            elif self.kw("minus"):
                sub = self.group_graph_pattern()
                self._require_patterns_only(sub, "MINUS")
                g.minus.append(sub.patterns)
            elif self.kw("filter"):
                if self.kw("exists"):
                    sub = self.group_graph_pattern()
                    self._require_patterns_only(sub, "EXISTS")
                    g.exists.append(sub.patterns)
                elif self.at_kw("not"):
                    self.next()
                    if not self.kw("exists"):
                        raise SparqlSyntaxError("expected EXISTS after NOT")
                    sub = self.group_graph_pattern()
                    self._require_patterns_only(sub, "NOT EXISTS")
                    g.not_exists.append(sub.patterns)
                else:
                    g.filters.append(self.expr_until_balanced())
            elif self.kw("bind"):
                self.expect_op("(")
                # expr AS ?v — scan for the AS at depth 0
                out, depth = [], 1
                var = None
                while True:
                    t2 = self.next()
                    if t2.kind == "OP" and t2.val == "(":
                        depth += 1
                        out.append("(")
                        continue
                    if t2.kind == "OP" and t2.val == ")":
                        depth -= 1
                        if depth == 0:
                            break
                        out.append(")")
                        continue
                    if depth == 1 and t2.kind == "WORD" and t2.val.lower() == "as":
                        var = self.next()
                        if var.kind != "VAR":
                            raise SparqlSyntaxError("expected ?var after AS")
                        continue
                    out.append(self._expr_token(t2))
                if var is None:
                    raise SparqlSyntaxError("BIND needs (expr AS ?var)")
                g.binds.append(("?" + var.val[1:], " ".join(out)))
            elif self.kw("values"):
                g.values = self._values_clause()
            elif self.at_op("{"):
                # nested group: subselect, or UNION chain of groups
                if self.peek(1).kind == "WORD" and \
                        self.peek(1).val.lower() == "select":
                    self.expect_op("{")
                    g.subselects.append(self.select_query())
                    self.expect_op("}")
                else:
                    first = self.group_graph_pattern()
                    if self.at_kw("union"):
                        self._require_patterns_only(first, "UNION")
                        branches = [first.patterns]
                        while self.kw("union"):
                            b = self.group_graph_pattern()
                            self._require_patterns_only(b, "UNION")
                            branches.append(b.patterns)
                        g.union.append(branches)
                    else:
                        # plain nested group: merge (flattened semantics)
                        self._merge(g, first)
            else:
                self.triples_block(g.patterns)
        self.expect_op("}")
        return g

    @staticmethod
    def _require_patterns_only(sub: _Group, ctx: str) -> None:
        if (sub.optional or sub.filters or sub.minus or sub.exists
                or sub.not_exists or sub.binds or sub.values
                or sub.union or sub.subselects):
            raise SparqlSyntaxError(
                f"{ctx} groups support plain triple patterns only"
            )

    @staticmethod
    def _merge(g: _Group, other: _Group) -> None:
        g.patterns += other.patterns
        g.optional += other.optional
        g.filters += other.filters
        g.minus += other.minus
        g.exists += other.exists
        g.not_exists += other.not_exists
        g.binds += other.binds
        g.union += other.union
        g.subselects += other.subselects
        if other.values is not None:
            if g.values is not None:
                raise SparqlSyntaxError("multiple VALUES clauses")
            g.values = other.values

    def _values_clause(self):
        if self.peek().kind == "VAR":
            var = "?" + self.next().val[1:]
            self.expect_op("{")
            vals = []
            while not self.at_op("}"):
                vals.append(self.term())
            self.next()
            return {var: vals}
        self.expect_op("(")
        vars_ = []
        while self.peek().kind == "VAR":
            vars_.append("?" + self.next().val[1:])
        self.expect_op(")")
        self.expect_op("{")
        rows = []
        while self.at_op("("):
            self.next()
            row = []
            while not self.at_op(")"):
                row.append(self.term())
            self.next()
            if len(row) != len(vars_):
                raise SparqlSyntaxError("VALUES row arity mismatch")
            rows.append(tuple(row))
        self.expect_op("}")
        return (vars_, rows)

    # -- query forms ------------------------------------------------------
    def prologue(self) -> None:
        while True:
            if self.kw("prefix"):
                p = self.next()
                if p.kind != "PNAME" or not p.val.endswith(":"):
                    raise SparqlSyntaxError("PREFIX needs 'name:'")
                iri = self.next()
                if iri.kind != "IRI":
                    raise SparqlSyntaxError("PREFIX needs an <iri>")
                self.prefixes[p.val[:-1]] = iri.val[1:-1]
            elif self.kw("base"):
                iri = self.next()
                if iri.kind != "IRI":
                    raise SparqlSyntaxError("BASE needs an <iri>")
                self.base = iri.val[1:-1]
            else:
                return

    def select_query(self) -> _Query:
        if not self.kw("select"):
            raise SparqlSyntaxError("expected SELECT")
        q = _Query(form="select")
        q.distinct = self.kw("distinct")
        self.kw("reduced")
        sel, aggs = [], {}
        if self.at_op("*"):
            self.next()
            sel = None
        else:
            while True:
                if self.peek().kind == "VAR":
                    sel.append("?" + self.next().val[1:])
                elif self.at_op("("):
                    # (expr AS ?alias)
                    self.expect_op("(")
                    out, depth, alias = [], 1, None
                    while True:
                        t2 = self.next()
                        if t2.kind == "OP" and t2.val == "(":
                            depth += 1
                            out.append("(")
                            continue
                        if t2.kind == "OP" and t2.val == ")":
                            depth -= 1
                            if depth == 0:
                                break
                            out.append(")")
                            continue
                        if depth == 1 and t2.kind == "WORD" and \
                                t2.val.lower() == "as":
                            alias = self.next()
                            continue
                        out.append(self._sel_expr_token(t2))
                    if alias is None or alias.kind != "VAR":
                        raise SparqlSyntaxError("expected (expr AS ?alias)")
                    aggs["?" + alias.val[1:]] = " ".join(out)
                    sel.append("?" + alias.val[1:])
                else:
                    break
        q.select, q.aggregates = sel, (aggs or None)
        self._dataset_clauses(q)
        self.kw("where")
        q.group = self.group_graph_pattern()
        # modifiers
        if self.kw("group"):
            if not self.kw("by"):
                raise SparqlSyntaxError("expected BY after GROUP")
            q.group_by = []
            while self.peek().kind == "VAR":
                q.group_by.append("?" + self.next().val[1:])
            if not q.group_by:
                raise SparqlSyntaxError("GROUP BY needs variables")
        if self.kw("having"):
            q.having = [self.expr_until_balanced()]
            while self.at_op("("):
                q.having.append(self.expr_until_balanced())
        if self.kw("order"):
            if not self.kw("by"):
                raise SparqlSyntaxError("expected BY after ORDER")
            q.order_by = []
            while True:
                if self.kw("asc"):
                    self.expect_op("(")
                    v = self.next()
                    self.expect_op(")")
                    q.order_by.append("?" + v.val[1:])
                elif self.kw("desc"):
                    self.expect_op("(")
                    v = self.next()
                    self.expect_op(")")
                    q.order_by.append("DESC(?" + v.val[1:] + ")")
                elif self.peek().kind == "VAR":
                    q.order_by.append("?" + self.next().val[1:])
                else:
                    break
        if self.kw("limit"):
            q.limit = int(self.next().val)
        if self.kw("offset"):
            q.offset = int(self.next().val)
        if self.kw("limit"):       # LIMIT after OFFSET is also legal
            q.limit = int(self.next().val)
        return q

    def _sel_expr_token(self, t: _Tok) -> str:
        """SELECT-expression tokens: aggregate names pass through
        (bgp_select evaluates them as Spark aggregates); GROUP_CONCAT's
        SEPARATOR clause is rewritten; SAMPLE becomes MIN."""
        if t.kind == "WORD":
            w = t.val.lower()
            if w == "group_concat":
                return self._group_concat_expr()
            if w == "sample":
                return "min"
            if w == "separator":
                raise SparqlSyntaxError("SEPARATOR outside GROUP_CONCAT")
            return t.val
        return self._expr_token(t)

    def _group_concat_expr(self) -> str:
        from .operators.bgp import group_concat

        self.expect_op("(")
        v = self.next()
        if v.kind != "VAR":
            raise SparqlSyntaxError("GROUP_CONCAT(?var ...) only")
        sep = " "
        if self.at_op(";"):
            self.next()
            if not self.kw("separator"):
                raise SparqlSyntaxError("expected SEPARATOR")
            self.expect_op("=")
            s = self.next()
            if s.kind != "STR":
                raise SparqlSyntaxError("SEPARATOR needs a string")
            sep = _unquote(s.val)
        self.expect_op(")")
        # group_concat returns a complete expression; mark it so the
        # caller doesn't wrap further tokens
        return group_concat("?" + v.val[1:], sep)

    def _dataset_clauses(self, q: _Query) -> None:
        while self.at_kw("from"):
            self.next()
            named = self.kw("named")
            t = self.next()
            if t.kind == "IRI":
                iri = t.val[1:-1]
            elif t.kind == "PNAME":
                iri = self._expand_pname(t.val)
            else:
                raise SparqlSyntaxError("FROM needs an <iri>")
            if named:
                q.from_named = (q.from_named or []) + [iri]
            else:
                q.from_graphs = (q.from_graphs or []) + [iri]

    def parse(self) -> _Query:
        self.prologue()
        if self.at_kw("select"):
            q = self.select_query()
        elif self.kw("ask"):
            q = _Query(form="ask")
            self._dataset_clauses(q)
            self.kw("where")
            q.group = self.group_graph_pattern()
        elif self.kw("construct"):
            q = _Query(form="construct")
            q.template = []
            self.expect_op("{")
            while not self.at_op("}"):
                self.triples_block(q.template)
            self.next()
            self._dataset_clauses(q)
            if not self.kw("where"):
                raise SparqlSyntaxError("CONSTRUCT needs WHERE")
            q.group = self.group_graph_pattern()
        elif self.kw("describe"):
            q = _Query(form="describe")
            v = self.next()
            if v.kind != "VAR":
                raise SparqlSyntaxError("DESCRIBE supports a single ?var")
            q.describe_var = "?" + v.val[1:]
            self._dataset_clauses(q)
            self.kw("where")
            q.group = self.group_graph_pattern()
        else:
            raise SparqlSyntaxError(
                f"expected a query form, got {self.peek().val!r}"
            )
        if self.peek().kind != "EOF":
            raise SparqlSyntaxError(
                f"trailing input from {self.peek().val!r}"
            )
        return q


def parse_sparql(text: str) -> _Query:
    return _Parser(text).parse()


# --------------------------------------------------------------------------
# execution
# --------------------------------------------------------------------------

def sparql(triples: DataFrame, text: str, **kw) -> DataFrame | bool:
    """Parse and execute a SPARQL query against a (subj, pred, obj)
    triple table. Returns a binding/triple DataFrame, or a bool for
    ASK. ``**kw`` forwards to the underlying operators
    (e.g. ``allow_cartesian=True``)."""
    from .operators.bgp import (
        bgp_ask, bgp_construct, bgp_describe, bgp_query, bgp_select,
        bgp_union,
    )

    q = parse_sparql(text)
    triples = _apply_dataset(triples, q)
    g = q.group
    bgp_kw = dict(kw)
    if g.optional:
        bgp_kw["optional"] = g.optional
    if g.filters:
        from .operators.bgp import _sub_vars

        bgp_kw["filters"] = [_sub_vars(f) for f in g.filters]
    if g.minus:
        bgp_kw["minus"] = g.minus
    if g.exists:
        bgp_kw["exists"] = g.exists
    if g.not_exists:
        bgp_kw["not_exists"] = g.not_exists
    if g.values is not None:
        bgp_kw["values"] = g.values
    if g.subselects:
        bgp_kw["subqueries"] = [
            _execute_select(triples, sq, kw) for sq in g.subselects
        ]

    if q.form == "ask":
        if g.union:
            # ASK { {A} UNION {B} }: non-empty iff any branch is —
            # evaluated lazily branch-by-branch, so a hit in the first
            # branch never runs the second
            if g.patterns or g.binds or bgp_kw.keys() - kw.keys():
                raise SparqlSyntaxError(
                    "ASK UNION supports a single union block"
                )
            return any(
                bgp_ask(triples, branch, **kw) for branch in g.union[0]
            )
        if g.binds:
            # BIND extends solutions 1:1 — it cannot change emptiness
            # unless a FILTER references the bound var; route through
            # bgp_select (which defers such filters) and probe one row
            from .operators.bgp import bgp_select as _bs

            return not _bs(
                triples, g.patterns, bind=g.binds, **bgp_kw
            ).isEmpty()
        return bgp_ask(triples, g.patterns, **bgp_kw)
    if q.form == "construct":
        return bgp_construct(triples, g.patterns, q.template, **bgp_kw)
    if q.form == "describe":
        return bgp_describe(triples, g.patterns, q.describe_var, **bgp_kw)

    # SELECT
    if g.union:
        if (len(g.union) != 1 or g.patterns or bgp_kw.keys() - kw.keys()
                or g.binds or q.aggregates or q.group_by):
            raise SparqlSyntaxError(
                "UNION queries support a single union block with "
                "SELECT/DISTINCT/ORDER/LIMIT modifiers only"
            )
        out = bgp_union(triples, g.union[0], select=q.select,
                        distinct=q.distinct, **kw)
        return _order_page(out, q)
    return bgp_select(
        triples, g.patterns,
        bind=g.binds or None,
        group_by=q.group_by,
        aggregates=q.aggregates,
        having=q.having,
        order_by=q.order_by,
        limit=q.limit,
        offset=q.offset,
        select=q.select,
        distinct=q.distinct,
        **bgp_kw,
    )


def _apply_dataset(triples: DataFrame, q: _Query) -> DataFrame:
    """FROM / FROM NAMED (SPARQL 13.2, dataset construction): with
    either clause present the query runs against a CONSTRUCTED dataset
    — the default graph is the merge of the FROM graphs (their rows
    re-labeled NULL), the named graphs are exactly the FROM NAMED ones,
    and every plain triple pattern in the query is tightened to the
    default graph via the "@default" sentinel (without dataset
    clauses, plain patterns keep union-default-graph semantics)."""
    if q.from_graphs is None and q.from_named is None:
        return triples
    from pyspark.sql import functions as F

    if "graph" not in triples.columns:
        raise SparqlSyntaxError(
            "FROM/FROM NAMED need a quad table with a 'graph' column"
        )
    default = triples.filter(
        F.col("graph").isin(q.from_graphs or [])
    ).withColumn("graph", F.lit(None).cast("string"))
    named = triples.filter(F.col("graph").isin(q.from_named or []))
    ds = default.unionByName(named)

    def tighten(group: _Group) -> None:
        # plain patterns AND property paths both tighten to the
        # constructed default graph: 4-term path patterns evaluate the
        # path within the "@default" slice (bgp._graph_path_scan)
        group.patterns = [
            (p if len(p) == 4 else (*p, "@default")) for p in group.patterns
        ]
        group.optional = [
            [(ps, pp, po, "@default") for (ps, pp, po) in grp]
            for grp in group.optional
        ]
        group.minus = [
            [(ps, pp, po, "@default") for (ps, pp, po) in grp]
            for grp in group.minus
        ]
        group.exists = [
            [(ps, pp, po, "@default") for (ps, pp, po) in grp]
            for grp in group.exists
        ]
        group.not_exists = [
            [(ps, pp, po, "@default") for (ps, pp, po) in grp]
            for grp in group.not_exists
        ]
        group.union = [
            [[(ps, pp, po, "@default") for (ps, pp, po) in branch]
             for branch in u]
            for u in group.union
        ]

    tighten(q.group)
    for sq in q.group.subselects:
        tighten(sq.group)
    return ds


def _execute_select(triples: DataFrame, q: _Query, kw: dict) -> DataFrame:
    from .operators.bgp import bgp_select

    g = q.group
    bgp_kw = dict(kw)
    from .operators.bgp import _sub_vars

    for name, val in (("optional", g.optional),
                      ("filters", [_sub_vars(f) for f in g.filters]),
                      ("minus", g.minus), ("exists", g.exists),
                      ("not_exists", g.not_exists)):
        if val:
            bgp_kw[name] = val
    if g.values is not None:
        bgp_kw["values"] = g.values
    return bgp_select(
        triples, g.patterns, bind=g.binds or None, group_by=q.group_by,
        aggregates=q.aggregates, having=q.having, order_by=q.order_by,
        limit=q.limit, offset=q.offset, select=q.select,
        distinct=q.distinct, **bgp_kw,
    )


def _order_page(df: DataFrame, q: _Query) -> DataFrame:
    from pyspark.sql import functions as F

    if q.order_by:
        cols = []
        for o in q.order_by:
            if o.startswith("DESC("):
                cols.append(F.col(o[6:-1]).desc())
            else:
                cols.append(F.col(o.lstrip("?")).asc())
        df = df.orderBy(*cols)
    if q.offset:
        df = df.offset(q.offset)
    if q.limit is not None:
        df = df.limit(q.limit)
    return df


# --------------------------------------------------------------------------
# SPARQL UPDATE text (DELETE/INSERT WHERE)
# --------------------------------------------------------------------------

def sparql_update(triples: DataFrame, text: str, **kw) -> DataFrame:
    """Parse and apply a SPARQL 1.1 UPDATE of the form
    ``DELETE { … } INSERT { … } WHERE { … }`` (either template may be
    omitted; ``DELETE WHERE { … }`` uses the pattern block as its own
    template). Returns the updated graph via
    maintenance.update_where — bindings evaluate once, delete before
    insert. Graph-management operations (LOAD/CLEAR/DROP …) are out of
    scope."""
    from .operators.maintenance import update_where

    p = _Parser(text)
    p.prologue()
    delete = insert = None
    if p.kw("delete"):
        if p.at_kw("where"):
            # DELETE WHERE { patterns }: pattern block doubles as template
            p.next()
            g = p.group_graph_pattern()
            if p.peek().kind != "EOF":
                raise SparqlSyntaxError("trailing input after DELETE WHERE")
            return update_where(
                triples, g.patterns, delete=g.patterns,
                **_group_kw(g, kw),
            )
        delete = []
        p.expect_op("{")
        while not p.at_op("}"):
            p.triples_block(delete)
        p.next()
    if p.kw("insert"):
        insert = []
        p.expect_op("{")
        while not p.at_op("}"):
            p.triples_block(insert)
        p.next()
    if delete is None and insert is None:
        raise SparqlSyntaxError("UPDATE needs DELETE and/or INSERT")
    if not p.kw("where"):
        raise SparqlSyntaxError("UPDATE needs a WHERE block")
    g = p.group_graph_pattern()
    if p.peek().kind != "EOF":
        raise SparqlSyntaxError(f"trailing input from {p.peek().val!r}")
    return update_where(
        triples, g.patterns, insert=insert, delete=delete,
        **_group_kw(g, kw),
    )


def _group_kw(g: _Group, kw: dict) -> dict:
    from .operators.bgp import _sub_vars

    if g.union or g.binds or g.subselects:
        raise SparqlSyntaxError(
            "UPDATE WHERE supports patterns/FILTER/OPTIONAL/MINUS/"
            "EXISTS/VALUES only"
        )
    out = dict(kw)
    if g.optional:
        out["optional"] = g.optional
    if g.filters:
        out["filters"] = [_sub_vars(f) for f in g.filters]
    if g.minus:
        out["minus"] = g.minus
    if g.exists:
        out["exists"] = g.exists
    if g.not_exists:
        out["not_exists"] = g.not_exists
    if g.values is not None:
        out["values"] = g.values
    return out
