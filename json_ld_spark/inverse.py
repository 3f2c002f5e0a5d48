"""Inverse Context Creation (JSON-LD 1.1 API §4.3) — term-selection index
for compaction.

Reference parity: crates/core/src/context/inverse.rs:202-330, built
lazily via OnceCell at context/mod.rs:174 (here: cached on the
ActiveContext instance, driver-side, broadcast with it).
"""

from __future__ import annotations

from .context import ActiveContext, UNSET


def build_inverse_context(active: ActiveContext) -> dict:
    """inverse[iri][container]['@language'|'@type'|'@any'][key] = term"""
    inverse: dict = {}
    default_language = (active.default_language or "@none").lower()

    # shortest first, then lexicographic (spec: least term wins)
    for term in sorted(active.terms, key=lambda t: (len(t), t)):
        td = active.terms[term]
        if td.iri is None:
            continue
        container = "".join(sorted(td.container)) if td.container else "@none"
        container_map = inverse.setdefault(td.iri, {})
        tl = container_map.setdefault(
            container, {"@language": {}, "@type": {}, "@any": {}}
        )
        tl["@any"].setdefault("@none", term)

        if td.reverse:
            tl["@type"].setdefault("@reverse", term)
        elif td.type_mapping == "@none":
            tl["@language"].setdefault("@any", term)
            tl["@type"].setdefault("@any", term)
        elif td.type_mapping is not None:
            tl["@type"].setdefault(td.type_mapping, term)
        elif td.language is not UNSET and td.direction is not UNSET:
            lang = (td.language or "@null") if td.language is not None else "@null"
            direction = td.direction if td.direction is not None else "@null"
            if td.language is not None and td.direction is not None:
                key = f"{lang}_{direction}".lower()
            elif td.language is not None:
                key = str(lang).lower()
            elif td.direction is not None:
                key = f"_{direction}"
            else:
                key = "@null"
            tl["@language"].setdefault(key, term)
        elif td.language is not UNSET:
            key = (td.language if td.language is not None else "@null")
            tl["@language"].setdefault(str(key).lower(), term)
        elif td.direction is not UNSET:
            key = f"_{td.direction}" if td.direction is not None else "@none"
            tl["@language"].setdefault(key, term)
        elif active.default_base_direction is not None:
            tl["@language"].setdefault(
                f"{default_language}_{active.default_base_direction}", term
            )
            tl["@language"].setdefault("@none", term)
            tl["@type"].setdefault("@none", term)
        else:
            tl["@language"].setdefault(default_language, term)
            tl["@language"].setdefault("@none", term)
            tl["@type"].setdefault("@none", term)
    return inverse


def select_term(
    active: ActiveContext,
    iri: str,
    containers: list[str],
    type_language: str,
    preferred: list[str],
) -> str | None:
    """Term Selection (§6.2.3)."""
    inverse = active.inverse
    container_map = inverse.get(iri)
    if container_map is None:
        return None
    for container in containers:
        tl = container_map.get(container)
        if tl is None:
            continue
        value_map = tl[type_language]
        for item in preferred:
            if item in value_map:
                return value_map[item]
    return None
