"""Deserialize JSON-LD to RDF: quad emission (API spec §8 / reference
crates/core/src/rdf/*).

Reference parity:
  - quad traversal        ↔ crates/core/src/quad.rs:30-303 (LdQuads) +
                            crates/core/src/rdf/quad.rs:156-245 (RdfQuads)
  - literal lowering      ↔ crates/core/src/rdf/mod.rs:134-288
  - i18n datatype builder ↔ rdf/mod.rs:628-635  (i18n#{lang}_{dir}, or
                            i18n#{dir} when no language; case preserved)
  - compound literals     ↔ rdf/mod.rs:95-132
  - list lowering         ↔ rdf/mod.rs:372-626 (rdf:first/rest chains,
                            empty list → rdf:nil)
  - generalized-RDF gate  ↔ rdf/quad.rs:68,105-108
  - number canonicalization: i64-representable → xsd:integer, else
    canonical xsd:double (rdf/mod.rs:246-260)

Quads are plain tuples `(graph, subj, pred, obj_kind, obj, datatype, lang)`
with graph None for the default graph and obj_kind ∈ {iri, bnode, literal}
— the flattened sum type of SURVEY.md §1.3. Document-local; the Spark layer
explodes these into the corpus triple table.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

from .canon import I64_MAX, I64_MIN, canonical_json, xsd_canonical_double
from .iri import is_absolute_iri, is_blank_node_id
from .nodemap import DEFAULT_GRAPH, BlankGen, generate_node_map

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
RDF_VALUE = RDF + "value"
RDF_LANGUAGE = RDF + "language"
RDF_DIRECTION = RDF + "direction"
RDF_JSON = RDF + "JSON"
XSD_STRING = XSD + "string"
XSD_BOOLEAN = XSD + "boolean"
XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"
I18N = "https://www.w3.org/ns/i18n#"

Quad = tuple[
    Optional[str], str, str, str, str, Optional[str], Optional[str]
]  # (graph, subj, pred, obj_kind, obj, datatype, lang)


def _valid_subject(s: str) -> bool:
    return is_blank_node_id(s) or is_absolute_iri(s)


def expanded_to_quads(
    expanded: list,
    *,
    rdf_direction: str | None = None,
    produce_generalized_rdf: bool = False,
    gen: BlankGen | None = None,
    mutate_ok: bool = False,
) -> list[Quad]:
    """expanded document → RDF quads via the node map (§8.1).

    mutate_ok: skip the node-map walk's defensive copy of `expanded`
    (callers that expand-then-discard, i.e. the pipeline stages)."""
    gen = gen or BlankGen()
    node_map = generate_node_map(expanded, gen, mutate_ok=mutate_ok)
    quads: list[Quad] = []
    for graph_name in node_map:
        graph_label: Optional[str]
        if graph_name == DEFAULT_GRAPH:
            graph_label = None
        elif _valid_subject(graph_name):
            graph_label = graph_name
        else:
            continue  # invalid graph label dropped (rdf/quad.rs:90-93)
        graph = node_map[graph_name]
        for subj in graph:
            if not _valid_subject(subj):
                continue
            node = graph[subj]
            for prop in node:
                values = node[prop]
                if prop == "@type":
                    for t in values:
                        if _valid_subject(t):
                            kind = "bnode" if is_blank_node_id(t) else "iri"
                            quads.append(
                                (graph_label, subj, RDF_TYPE, kind, t, None, None)
                            )
                    continue
                if prop.startswith("@"):
                    continue
                if is_blank_node_id(prop) and not produce_generalized_rdf:
                    continue  # rdf/quad.rs:105-108
                if not (is_absolute_iri(prop) or is_blank_node_id(prop)):
                    continue
                for item in values:
                    _object_to_rdf(
                        item, graph_label, subj, prop, quads, gen, rdf_direction
                    )
    return quads


def _object_to_rdf(
    item: dict,
    graph: Optional[str],
    subj: str,
    pred: str,
    quads: list[Quad],
    gen: BlankGen,
    rdf_direction: str | None,
) -> None:
    obj = _object_term(item, graph, quads, gen, rdf_direction)
    if obj is not None:
        quads.append((graph, subj, pred, *obj))


def _object_term(
    item: dict,
    graph: Optional[str],
    quads: list[Quad],
    gen: BlankGen,
    rdf_direction: str | None,
) -> Optional[tuple[str, str, Optional[str], Optional[str]]]:
    """Returns (obj_kind, obj, datatype, lang) or None if dropped."""
    if "@value" in item:
        return _literal_term(item, graph, quads, gen, rdf_direction)
    if "@list" in item:
        head = _list_to_rdf(item["@list"], graph, quads, gen, rdf_direction)
        return head
    node_id = item.get("@id")
    if node_id is None or not _valid_subject(node_id):
        return None  # invalid node reference dropped
    kind = "bnode" if is_blank_node_id(node_id) else "iri"
    return (kind, node_id, None, None)


def _literal_term(
    item: dict,
    graph: Optional[str],
    quads: list[Quad],
    gen: BlankGen,
    rdf_direction: str | None,
) -> Optional[tuple[str, str, Optional[str], Optional[str]]]:
    value = item["@value"]
    datatype = item.get("@type")
    language = item.get("@language")
    direction = item.get("@direction")

    if datatype == "@json":
        return ("literal", canonical_json(value), RDF_JSON, None)

    if isinstance(value, bool):
        lex = "true" if value else "false"
        return ("literal", lex, datatype or XSD_BOOLEAN, None)
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        is_int_shaped = isinstance(value, int) and I64_MIN <= value <= I64_MAX
        if is_int_shaped and datatype != XSD_DOUBLE:
            return ("literal", str(value), datatype or XSD_INTEGER, None)
        return ("literal", xsd_canonical_double(float(value)), datatype or XSD_DOUBLE, None)

    lex = value if isinstance(value, str) else str(value)
    if direction is not None and rdf_direction == "i18n-datatype":
        dt = (
            f"{I18N}{language}_{direction}"
            if language is not None
            else f"{I18N}{direction}"
        )
        return ("literal", lex, dt, None)
    if direction is not None and rdf_direction == "compound-literal":
        bnode = gen.fresh()
        quads.append((graph, bnode, RDF_VALUE, "literal", lex, XSD_STRING, None))
        if language is not None:
            quads.append(
                (graph, bnode, RDF_LANGUAGE, "literal", language, XSD_STRING, None)
            )
        quads.append(
            (graph, bnode, RDF_DIRECTION, "literal", direction, XSD_STRING, None)
        )
        return ("bnode", bnode, None, None)
    if language is not None:
        return ("literal", lex, None, language)
    return ("literal", lex, datatype or XSD_STRING, None)


def _list_to_rdf(
    items: list,
    graph: Optional[str],
    quads: list[Quad],
    gen: BlankGen,
    rdf_direction: str | None,
) -> tuple[str, str, Optional[str], Optional[str]]:
    """Lower a @list to an rdf:first/rest chain (§8.2 List Conversion).

    Empty list → rdf:nil (reference rdf/mod.rs:322-338).
    """
    terms = []
    for item in items:
        t = _object_term(item, graph, quads, gen, rdf_direction)
        if t is not None:
            terms.append(t)
    if not terms:
        return ("iri", RDF_NIL, None, None)
    bnodes = [gen.fresh() for _ in terms]
    for i, (t, b) in enumerate(zip(terms, bnodes)):
        quads.append((graph, b, RDF_FIRST, *t))
        rest: tuple[str, str] = (
            ("bnode", bnodes[i + 1]) if i + 1 < len(bnodes) else ("iri", RDF_NIL)
        )
        quads.append((graph, b, RDF_REST, rest[0], rest[1], None, None))
    return ("bnode", bnodes[0], None, None)


# --------------------------------------------------------------------------
# N-Quads debug printing (reference tests/to_rdf.rs:158-166; debug only,
# the production sink is the parquet/Iceberg triple table)
# --------------------------------------------------------------------------

def _nq_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def quad_to_nquad(q: Quad) -> str:
    graph, subj, pred, kind, obj, datatype, lang = q
    parts = []
    parts.append(subj if is_blank_node_id(subj) else f"<{subj}>")
    parts.append(pred if is_blank_node_id(pred) else f"<{pred}>")
    if kind == "iri":
        parts.append(f"<{obj}>")
    elif kind == "bnode":
        parts.append(obj)
    else:
        lit = f'"{_nq_escape(obj)}"'
        if lang is not None:
            lit += f"@{lang}"
        elif datatype is not None and datatype != XSD_STRING:
            lit += f"^^<{datatype}>"
        parts.append(lit)
    if graph is not None:
        parts.append(graph if is_blank_node_id(graph) else f"<{graph}>")
    return " ".join(parts) + " ."


def to_nquads(quads: list[Quad]) -> str:
    return "\n".join(sorted(quad_to_nquad(q) for q in quads)) + "\n"
