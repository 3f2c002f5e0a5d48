"""Deterministic hash-based blank-node canonicalization (URDNA2015-style
color refinement, distributed-friendly).

Replaces the reference's sequential relabel
(crates/core/src/document/expanded.rs:99-115) and the bnode-bijection
isomorphism oracle of its test harness (tests/to_rdf.rs:166-170): after
both quad sets are relabeled through this function, isomorphism reduces
to exact (s,p,o,g) set equality — the P/R join of BASELINE.md.

The same signature-iteration runs distributed in
json_ld_spark.operators.canonicalize as DataFrame joins + groupBy; this
module is the per-document (in-UDF) version.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from .iri import is_blank_node_id
from .rdf import Quad


def _h(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _quad_signature(q: Quad, labels: dict[str, str], self_label: str) -> str:
    def term(t: str | None, is_node: bool) -> str:
        if t is None:
            return "~"
        if is_node and is_blank_node_id(t):
            if t == self_label:
                return "_:self"
            return labels.get(t, "_:other")
        return t

    graph, subj, pred, kind, obj, dt, lang = q
    return "|".join(
        [
            term(graph, True),
            term(subj, True),
            term(pred, True),  # blank predicates occur in generalized RDF
            kind,
            term(obj, kind in ("bnode",)),
            dt or "~",
            lang or "~",
        ]
    )


def canonical_bnode_labels(
    quads: list[Quad], rounds: int = 4, prefix: str = "c"
) -> dict[str, str]:
    """Map each blank label in quads → deterministic canonical label.

    Iterative refinement: each bnode's hash is the hash of its sorted
    incident-quad signatures, where other bnodes appear as their
    previous-round hash. Hash ties are broken by first-occurrence order of
    the sorted signature list (deterministic on both comparison sides).
    """
    # RDF datasets are quad SETS: duplicate quads (legal in the emission
    # stream, e.g. the node-map algorithm appends @list objects without a
    # uniqueness check) must not perturb the signatures
    quads = list(dict.fromkeys(quads))
    bnodes: set[str] = set()
    incident: dict[str, list[Quad]] = defaultdict(list)
    for q in quads:
        graph, subj, pred, kind, obj, _, _ = q
        for t, is_node in (
            (graph, True), (subj, True), (pred, True), (obj, kind == "bnode")
        ):
            if t is not None and is_node and is_blank_node_id(t):
                bnodes.add(t)
                incident[t].append(q)
    if not bnodes:
        return {}

    labels = {b: "" for b in bnodes}
    for _ in range(rounds):
        new_labels = {}
        for b in bnodes:
            sigs = sorted(_quad_signature(q, labels, b) for q in incident[b])
            new_labels[b] = _h("\x1e".join(sigs) + "\x1f" + labels[b])
        if new_labels == labels:
            break
        labels = new_labels

    # disambiguate identical hashes (automorphic or colliding) by stable
    # per-hash occurrence index over sorted (hash, original-signature) order
    groups: dict[str, list[str]] = defaultdict(list)
    for b in sorted(bnodes, key=lambda b: (labels[b], sorted(
        _quad_signature(q, labels, b) for q in incident[b]
    ))):
        groups[labels[b]].append(b)
    out: dict[str, str] = {}
    for hash_val, members in groups.items():
        for i, b in enumerate(members):
            suffix = f"-{i}" if len(members) > 1 else ""
            out[b] = f"_:{prefix}{hash_val[:16]}{suffix}"
    return out


def relabel_quads(quads: list[Quad], mapping: dict[str, str]) -> list[Quad]:
    def m(t: str | None) -> str | None:
        if t is not None and is_blank_node_id(t):
            return mapping.get(t, t)
        return t

    out = []
    for graph, subj, pred, kind, obj, dt, lang in quads:
        out.append(
            (
                m(graph),
                m(subj),
                m(pred),
                kind,
                m(obj) if kind == "bnode" else obj,
                dt,
                lang,
            )
        )
    return out


def canonicalize_quads(quads: list[Quad], prefix: str = "c") -> list[Quad]:
    return relabel_quads(quads, canonical_bnode_labels(quads, prefix=prefix))


def quad_set_prf(
    emitted: list[Quad], golden: list[Quad]
) -> tuple[float, float, float]:
    """Precision/recall/F1 of canonicalized quad sets (FIXTURES.md §4)."""
    a = set(canonicalize_quads(emitted))
    b = set(canonicalize_quads(golden))
    if not a and not b:
        return 1.0, 1.0, 1.0
    inter = len(a & b)
    p = inter / len(a) if a else 0.0
    r = inter / len(b) if b else 0.0
    f = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f
