"""Deserialize RDF to JSON-LD (API spec §8.2 "Serialize RDF as JSON-LD").

Reference parity: crates/core/src/serialization.rs:238-392
(from_interpreted_quads_in — quad grouping, rdf:first/rest list folding
with the referenced-once rule, literal decoding) and the rendering pass
at serialization.rs:394+.

Input quads are the engine's tuples
(graph, subj, pred, obj_kind, obj, datatype, lang) with graph None for
the default graph (rdf.py). Output is an expanded JSON-LD document.

The Spark inverse stage (operators/jsonld.from_rdf_stage) groups the
corpus triple table per document and runs this per group — the exact
inverse of triples_stage.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Any, Optional

from .iri import is_blank_node_id
from .rdf import (
    I18N,
    RDF_DIRECTION,
    RDF_FIRST,
    RDF_JSON,
    RDF_LANGUAGE,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    RDF_VALUE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    Quad,
)

RDF_LIST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#List"
DEFAULT = "@default"


def _eq(a: Any, b: Any) -> bool:
    return json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)


def _add_unique(node: dict, key: str, value: Any) -> None:
    arr = node.setdefault(key, [])
    if not any(_eq(v, value) for v in arr):
        arr.append(value)


def _object_to_value(
    kind: str,
    obj: str,
    datatype: Optional[str],
    lang: Optional[str],
    rdf_direction: str | None,
    use_native_types: bool,
) -> dict:
    """RDF to Object conversion (§8.2.3 / serialization.rs literal
    decoding)."""
    if kind in ("iri", "bnode"):
        return {"@id": obj}
    if lang is not None:
        return {"@value": obj, "@language": lang}
    dt = datatype or XSD_STRING
    if dt == RDF_JSON:
        return {"@value": json.loads(obj), "@type": "@json"}
    if rdf_direction == "i18n-datatype" and dt.startswith(I18N):
        frag = dt[len(I18N):]
        language, _, direction = frag.partition("_")
        value: dict = {"@value": obj}
        if direction:
            if language:
                value["@language"] = language
            value["@direction"] = direction
        else:
            # i18n#{dir} form (no language)
            value["@direction"] = language or frag
        return value
    if use_native_types:
        if dt == XSD_BOOLEAN and obj in ("true", "false"):
            return {"@value": obj == "true"}
        if dt == XSD_INTEGER:
            try:
                return {"@value": int(obj)}
            except ValueError:
                pass
        if dt == XSD_DOUBLE:
            try:
                return {"@value": float(obj)}
            except ValueError:
                pass
    if dt == XSD_STRING:
        return {"@value": obj}
    return {"@value": obj, "@type": dt}


def from_rdf(
    quads: list[Quad],
    *,
    ordered: bool = False,
    rdf_direction: str | None = None,
    use_native_types: bool = True,
    use_rdf_type: bool = False,
) -> list:
    """quads → expanded JSON-LD document (§8.2.2)."""
    default_graph: dict[str, dict] = {}
    graph_map: dict[str, dict[str, dict]] = {DEFAULT: default_graph}
    # spec 8.2.2: referencedOnce is keyed by the blank node identifier
    # GLOBALLY (not per graph) — a bnode referenced as object in two
    # graphs is referenced twice and must not fold into a list
    referenced_once: dict[str, Any] = {}
    nil_usages: dict[str, list[dict]] = defaultdict(list)
    compound_subjects: dict[str, set[str]] = defaultdict(set)

    for graph, subj, pred, kind, obj, dt, lang in quads:
        gname = DEFAULT if graph is None else graph
        node_map = graph_map.setdefault(gname, {})
        if gname != DEFAULT:
            default_graph.setdefault(gname, {"@id": gname})
        node = node_map.setdefault(subj, {"@id": subj})
        if kind in ("iri", "bnode"):
            node_map.setdefault(obj, {"@id": obj})
        if (
            rdf_direction == "compound-literal"
            and pred == RDF_DIRECTION
            and is_blank_node_id(subj)
        ):
            compound_subjects[gname].add(subj)
        if pred == RDF_TYPE and not use_rdf_type and kind in ("iri", "bnode"):
            _add_unique(node, "@type", obj)
            continue
        value = _object_to_value(kind, obj, dt, lang, rdf_direction, use_native_types)
        _add_unique(node, pred, value)
        if kind in ("iri", "bnode"):
            usage = {"node": node, "property": pred, "value": value}
            if obj == RDF_NIL:
                nil_usages[gname].append(usage)
            elif obj in referenced_once:
                referenced_once[obj] = False
            elif kind == "bnode":
                referenced_once[obj] = usage

    # compound literals (rdf_direction == "compound-literal"):
    # replace references to bnodes carrying rdf:value/language/direction
    for gname, subjects in compound_subjects.items():
        node_map = graph_map[gname]
        for cl in subjects:
            usage = referenced_once.get(cl)
            if not isinstance(usage, dict):
                continue
            cl_node = node_map.pop(cl, None)
            if cl_node is None:
                continue
            value = usage["value"]
            value.pop("@id", None)
            value["@value"] = cl_node.get(RDF_VALUE, [{}])[0].get("@value")
            langs = cl_node.get(RDF_LANGUAGE)
            if langs:
                value["@language"] = langs[0].get("@value")
            dirs = cl_node.get(RDF_DIRECTION)
            if dirs:
                value["@direction"] = dirs[0].get("@value")

    # list folding (§8.2.2 step 4 / serialization.rs:311-350)
    for gname, usages in nil_usages.items():
        node_map = graph_map.get(gname, {})
        for usage in usages:
            node, prop, value = usage["node"], usage["property"], usage["value"]
            lst: list = []
            list_nodes: list[str] = []
            while (
                prop == RDF_REST
                and is_blank_node_id(node.get("@id", ""))
                and isinstance(referenced_once.get(node["@id"]), dict)
                and len(node.get(RDF_FIRST, [])) == 1
                and len(node.get(RDF_REST, [])) == 1
                and set(node).issubset({"@id", "@type", RDF_FIRST, RDF_REST})
                and node.get("@type", [RDF_LIST]) == [RDF_LIST]
            ):
                lst.append(node[RDF_FIRST][0])
                list_nodes.append(node["@id"])
                nxt = referenced_once[node["@id"]]
                node, prop, value = nxt["node"], nxt["property"], nxt["value"]
            value.pop("@id", None)
            value["@list"] = list(reversed(lst))
            for ln in list_nodes:
                node_map.pop(ln, None)

    # assembly (§8.2.2 steps 5-6)
    result: list = []
    subjects = sorted(default_graph) if ordered else list(default_graph)
    for subj in subjects:
        node = default_graph[subj]
        if subj in graph_map and subj != DEFAULT:
            graph_nodes = graph_map[subj]
            gsubjects = sorted(graph_nodes) if ordered else list(graph_nodes)
            node["@graph"] = [
                graph_nodes[s]
                for s in gsubjects
                if set(graph_nodes[s]) != {"@id"}
            ]
        if set(node) != {"@id"}:
            result.append(node)
    return result
