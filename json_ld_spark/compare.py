"""Document comparison: expanded-form set equality.

Reference parity:
  - JsonLdProcessor::compare ↔ src/processor/remote_document.rs:15-43
  - ExpandedDocument Eq (order-insensitive set semantics) ↔
    crates/core/src/document/expanded.rs:294-301
  - Node/Object::equivalent ↔ crates/core/src/object/mod.rs:379-393

Arrays compare as multisets (sorted canonical form) EXCEPT @list values,
which are order-sensitive (RDF collections).
"""

from __future__ import annotations

from typing import Any

from .canon import canonical_json


def normalize_expanded(value: Any, in_list: bool = False) -> Any:
    """Canonical structure: children normalized, non-@list arrays sorted."""
    if isinstance(value, dict):
        return {
            k: normalize_expanded(v, in_list=(k == "@list"))
            for k, v in value.items()
        }
    if isinstance(value, list):
        items = [normalize_expanded(v) for v in value]
        if not in_list:
            items.sort(key=canonical_json)
        return items
    return value


def expanded_canonical_hashable(expanded: Any) -> str:
    return canonical_json(normalize_expanded(expanded))


def expanded_equals(a: Any, b: Any) -> bool:
    """Set equality of expanded documents (blank-label-sensitive, like the
    reference's Eq impl; use canonicalize.relabel for label-insensitive
    comparison)."""
    return expanded_canonical_hashable(a) == expanded_canonical_hashable(b)
