"""Distributed N-Quads source and sink.

The reference workspace consumes N-Quads through the external
``nquads-syntax`` crate in its toRdf/fromRdf test drivers
(reference: tests/to_rdf.rs:16, crates/core/src/rdf/mod.rs quad model)
and prints quads back out via ``Display``. Here both directions are
Spark-native over the engine's quad schema
``(graph, subj, pred, obj_kind, obj, datatype, lang)``:

- **sink** ``nquad_lines``: a pure-JVM projection (concat + chained
  literal ``replace`` — escaping is unambiguous in the encode
  direction, so backslash-first chaining is exact) mirroring
  ``rdf.quad_to_nquad``. One codegen stage, no Python.
- **source** ``read_nquads`` / ``parse_nquads_df``: ``spark.read.text``
  then ONE Java regex structurally splits each line into
  subject / predicate / object / graph groups (quoted literals are
  matched as a unit, so embedded ``" . "`` cannot confuse the split).
  Escape decoding (``\\n``, ``\\"``, ``\\uXXXX``, ``\\UXXXXXXXX`` …)
  runs in an Arrow-batched pandas UDF only on the term values that
  actually contain a backslash — the common crawl-scale case (IRIs and
  plain ASCII literals) never leaves the JVM.

Generalized RDF (blank-node predicates, as gated by the engine's
``produce_generalized_rdf``; reference crates/core/src/rdf/mod.rs) is
accepted on read.

At 100 TB: text-file splitting is line-oriented so the scan
parallelizes per HDFS/S3 block; the parse is a stateless projection
(no shuffle); malformed lines are counted per-partition rather than
failing the job (``mode="permissive"`` keeps them with a
``malformed`` flag, ``mode="drop"`` filters them in the same stage).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

# one structural pass: subj, pred, obj, optional graph, final dot.
# Literal objects are matched as a quoted unit ("(?:[^"\\]|\\.)*") so no
# escape processing is needed to find term boundaries.
_IRI = r"<[^>]*>"
_BNODE = r"_:[^\s]+"
_LITERAL = r'"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?'
NQ_LINE_REGEX = (
    rf"^\s*({_IRI}|{_BNODE})"
    rf"\s+({_IRI}|{_BNODE})"
    rf"\s+({_LITERAL}|{_IRI}|{_BNODE})"
    rf"(?:\s+({_IRI}|{_BNODE}))?"
    r"\s*\.\s*$"
)

# Blank / comment-only line, per the N-Quads grammar: whitespace is
# exactly tab + space ([6] WS in the spec), a comment runs from '#' to
# end of line. Defined with an explicit character class and absolute
# anchors so the Python reference (tests) and the Spark predicate agree
# byte-for-byte: Spark's trim() strips only U+0020, Java's '.' excludes
# \r while Python's doesn't, and Java's '$' matches before a trailing
# line terminator — all three diverge from str.strip(). A line made of
# other control characters (e.g. "\x1f") is NOT blank: in permissive
# mode it is emitted as a malformed row, in drop mode it is dropped.
BLANK_LINE_PATTERN = r"[ \t]*(#[^\n\r]*)?"
_BLANK_LINE_RE = re.compile(BLANK_LINE_PATTERN)


def is_blank_line(line: str) -> bool:
    """True iff the parser treats ``line`` as blank/comment (no row
    emitted in any mode). This is the single source of truth — the
    Spark-side filter in :func:`parse_nquads_df` uses the same pattern
    with absolute anchors (``\\A``/``\\z``)."""
    return _BLANK_LINE_RE.fullmatch(line) is not None


_ESCAPE_RE = re.compile(
    r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|([tbnrf\"'\\]))"
)
_SIMPLE = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
           '"': '"', "'": "'", "\\": "\\"}


def _unescape_str(s: str) -> str:
    def sub(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        return _SIMPLE[m.group(3)]

    return _ESCAPE_RE.sub(sub, s)


@F.pandas_udf(StringType())
def _unescape_udf(vals: pd.Series) -> pd.Series:
    return vals.map(lambda s: None if s is None else _unescape_str(s))


def _maybe_unescape(col: Column) -> Column:
    # JVM fast path: rows without a backslash (the overwhelming
    # majority) never enter Python; Arrow batches carry the rest.
    return F.when(col.contains("\\"), _unescape_udf(col)).otherwise(col)


# --------------------------------------------------------------------------
# sink: quads -> N-Quads lines (JVM only)
# --------------------------------------------------------------------------

def _esc(col: Column) -> Column:
    # encode direction: backslash FIRST, then the characters whose
    # escapes introduce backslashes — unambiguous, mirrors
    # rdf._nq_escape byte for byte.
    col = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    col = F.replace(col, F.lit('"'), F.lit('\\"'))
    col = F.replace(col, F.lit("\n"), F.lit("\\n"))
    col = F.replace(col, F.lit("\r"), F.lit("\\r"))
    return col


def _term(col: Column) -> Column:
    """IRI or blank-node id -> wire form."""
    return F.when(col.startswith("_:"), col).otherwise(
        F.concat(F.lit("<"), col, F.lit(">"))
    )


def nquad_lines(quads: DataFrame) -> DataFrame:
    """Quad DataFrame -> single-column ``value`` DataFrame of N-Quads
    lines (feed to ``df.write.text``). Pure JVM projection; output is
    byte-identical to ``rdf.quad_to_nquad`` per row."""
    obj = F.when(F.col("obj_kind") == "iri",
                 F.concat(F.lit("<"), F.col("obj"), F.lit(">"))) \
        .when(F.col("obj_kind") == "bnode", F.col("obj")) \
        .otherwise(
            F.concat(
                F.lit('"'), _esc(F.col("obj")), F.lit('"'),
                F.when(F.col("lang").isNotNull(),
                       F.concat(F.lit("@"), F.col("lang")))
                .when(
                    F.col("datatype").isNotNull()
                    & (F.col("datatype") != XSD_STRING),
                    F.concat(F.lit("^^<"), F.col("datatype"), F.lit(">")),
                )
                .otherwise(F.lit("")),
            )
        )
    line = F.concat(
        _term(F.col("subj")), F.lit(" "),
        _term(F.col("pred")), F.lit(" "),
        obj,
        F.when(F.col("graph").isNotNull(),
               F.concat(F.lit(" "), _term(F.col("graph"))))
        .otherwise(F.lit("")),
        F.lit(" ."),
    )
    return quads.select(line.alias("value"))


def write_nquads(quads: DataFrame, path: str, mode: str = "overwrite") -> None:
    nquad_lines(quads).write.mode(mode).text(path)


# --------------------------------------------------------------------------
# source: N-Quads lines -> quads
# --------------------------------------------------------------------------

def _decode_term(raw: Column) -> Column:
    """Wire-form IRI/bnode -> bare id (IRI brackets stripped, escapes
    decoded); NULL for empty match."""
    bare = F.when(raw.startswith("<"),
                  F.substring(raw, 2, F.length(raw) - 2)).otherwise(raw)
    return F.when(raw == "", F.lit(None).cast("string")).otherwise(
        _maybe_unescape(bare)
    )


def parse_nquads_df(
    lines: DataFrame, col: str = "value", mode: str = "drop"
) -> DataFrame:
    """Parse a DataFrame of N-Quads lines into the engine quad schema.

    ``mode="drop"`` silently drops malformed lines; ``"permissive"``
    keeps them with all terms NULL and ``malformed=true`` (blank and
    ``#`` comment lines are never emitted). No shuffle either way.
    """
    line = F.col(col)
    groups = [F.regexp_extract(line, NQ_LINE_REGEX, i) for i in (1, 2, 3, 4)]
    parsed = lines.select(
        line.alias("_line"),
        groups[0].alias("_s"), groups[1].alias("_p"),
        groups[2].alias("_o"), groups[3].alias("_g"),
    ).filter(
        # blank / comment per is_blank_line: \A/\z are absolute anchors
        # (Java '$' would also match before a trailing line terminator,
        # silently blessing " \n" / "\r" lines that Python fullmatch —
        # and hence the test reference — treats as content).
        ~F.col("_line").rlike(r"\A" + BLANK_LINE_PATTERN + r"\z")
    )

    is_literal = F.col("_o").startswith('"')
    # lexical form = quoted unit; suffix = @lang or ^^<dt> after it
    lex_q = F.regexp_extract(F.col("_o"), r'^("(?:[^"\\]|\\.)*")', 1)
    suffix = F.expr("substring(_o, length(_lexq) + 1)")
    lang = F.regexp_extract(F.col("_suffix"), r"^@([A-Za-z][A-Za-z0-9-]*)$", 1)
    dtype = F.regexp_extract(F.col("_suffix"), r"^\^\^<([^>]*)>$", 1)

    quads = (
        parsed.withColumn("_lexq", lex_q)
        .withColumn("_suffix", suffix)
        .select(
            "_line", "_s", "_p", "_o", "_g",
            F.when(F.col("_s") == "", F.lit(None).cast("string"))
            .when(is_literal, F.lit("literal"))
            .when(F.col("_o").startswith("_:"), F.lit("bnode"))
            .otherwise(F.lit("iri"))
            .alias("obj_kind"),
            F.when(
                is_literal,
                _maybe_unescape(F.expr("substring(_lexq, 2, length(_lexq) - 2)")),
            )
            .otherwise(_decode_term(F.col("_o")))
            .alias("obj"),
            F.when(is_literal & (lang != ""), lang)
            .cast("string")
            .alias("lang"),
            F.when(is_literal & (lang == ""),
                   F.when(dtype != "", _maybe_unescape(dtype))
                   .otherwise(F.lit(XSD_STRING)))
            .cast("string")
            .alias("datatype"),
        )
        .select(
            _decode_term(F.col("_g")).alias("graph"),
            _decode_term(F.col("_s")).alias("subj"),
            _decode_term(F.col("_p")).alias("pred"),
            "obj_kind", "obj", "datatype", "lang",
            (F.col("_s") == "").alias("malformed"),
        )
    )
    if mode == "drop":
        return quads.filter(~F.col("malformed")).drop("malformed")
    return quads


def read_nquads(
    spark: SparkSession, path: str, mode: str = "drop"
) -> DataFrame:
    """``spark.read.text`` + :func:`parse_nquads_df`. Line-splittable at
    the input-format level, so a 100 TB dump parallelizes per block."""
    return parse_nquads_df(spark.read.text(path), mode=mode)
