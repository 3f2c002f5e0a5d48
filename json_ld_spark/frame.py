"""JSON-LD 1.1 Framing (W3C json-ld11-framing REC): reshape a graph by
example — match nodes against a frame document, embed referenced nodes,
fill defaults, and compact against the frame's context.

BEYOND-REFERENCE surface: the reference workspace
(timothee-haudebourg/json-ld) implements expand/compact/flatten/
toRdf/fromRdf but has NO framing crate — framing is the KG-reshaping
query primitive its users reach for next (select sub-trees of the
constructed KG by pattern, materialize them as stable JSON documents).

Scope (documented subset of the REC):
- Frames evaluate over the MERGED node map (named-graph framing via
  `@graph`-in-frame is not supported; our KG pipeline frames per
  document or over the merged corpus graph).
- `@embed` (`@once` default / `@always` / `@never`; booleans map to
  `@once`/`@never`, legacy `@last` to `@once`), `@explicit`,
  `@requireAll`, `@default` (incl. `@null`), `@omitDefault` — all
  per-frame-node overridable, inherited by implicit subframes.
- Matching: `@id` (exact / set / wildcard), `@type` (exact set /
  wildcard `{}` / match-none `[]`), property presence, value patterns
  (`@value`/`@type`/`@language` each exact / set / wildcard).
- `@preserve` is not emitted: defaults are inserted directly into the
  framed output (the observable difference is array-compaction of
  framed singletons, which matches compacted-output expectations).
- `@reverse` in frames is not supported (raise).

Determinism: node and property iteration is sorted, so framed output
is byte-stable — the property every distributed stage in this repo
relies on.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from . import errors as E
from .nodemap import BlankGen, generate_node_map, merge_node_maps
from .options import JsonLdOptions

_NULL = "@null"
_FRAME_FLAG_KEYS = ("@embed", "@explicit", "@requireAll", "@omitDefault")
_FRAME_KEYS = set(_FRAME_FLAG_KEYS) | {"@default"}


def _is_value(v: Any) -> bool:
    return isinstance(v, dict) and "@value" in v


def _is_list(v: Any) -> bool:
    return isinstance(v, dict) and "@list" in v


def _is_ref(v: Any) -> bool:
    return isinstance(v, dict) and set(v.keys()) == {"@id"} and isinstance(
        v["@id"], str
    )


def _deep(v: Any) -> Any:
    return json.loads(json.dumps(v))


def _flag(frame: dict, key: str, inherited: Any) -> Any:
    if key not in frame:
        return inherited
    v = frame[key]
    if isinstance(v, list):
        v = v[0] if v else None
    if _is_value(v):
        v = v["@value"]
    return v


def _embed_flag(frame: dict, inherited: str) -> str:
    v = _flag(frame, "@embed", inherited)
    if v is True:
        return "@once"
    if v is False:
        return "@never"
    if v in ("@once", "@always", "@never"):
        return v
    if v == "@last":  # JSON-LD 1.0 legacy
        return "@once"
    raise E.JsonLdError(f"invalid @embed value: {v!r}")


class _Env:
    __slots__ = ("graph", "embed", "explicit", "require_all", "omit_default",
                 "embedded_once")

    def __init__(self, graph: dict, options: JsonLdOptions):
        self.graph = graph
        self.embed = "@once"
        self.explicit = bool(options.explicit)
        self.require_all = bool(options.require_all)
        self.omit_default = bool(options.omit_default)
        self.embedded_once: set[str] = set()


# ---------------------------------------------------------------------------
# matching
# ---------------------------------------------------------------------------


def _scalar_pattern_match(pattern: Any, value: Any) -> bool:
    """`pattern` is an expanded frame entry for @value/@type/@language:
    a wildcard `{}`, a scalar, or a list of scalars (empty = wildcard
    from `{}` at expansion)."""
    if isinstance(pattern, dict) and not pattern:
        return True
    opts = pattern if isinstance(pattern, list) else [pattern]
    if not opts:
        return True
    if any(isinstance(o, dict) and not o for o in opts):
        return True
    return value in opts


def _value_pattern_match(pattern: Any, value: Any) -> bool:
    """Does one expanded node value match a frame's value slot?"""
    if not isinstance(pattern, dict) or not pattern:
        return True  # wildcard
    if "@value" in pattern:
        if not _is_value(value):
            return False
        if not _scalar_pattern_match(pattern["@value"], value.get("@value")):
            return False
        if "@type" in pattern and not _scalar_pattern_match(
            pattern["@type"], value.get("@type")
        ):
            return False
        if "@language" in pattern:
            pat = pattern["@language"]
            lang = value.get("@language")
            if isinstance(pat, list) and pat == []:
                if lang is not None:
                    return False
            else:
                norm = (
                    [p.lower() if isinstance(p, str) else p for p in pat]
                    if isinstance(pat, list)
                    else pat
                )
                if not _scalar_pattern_match(
                    norm, lang.lower() if isinstance(lang, str) else lang
                ):
                    return False
        return True
    if _is_list(pattern):
        if not _is_list(value):
            return False
        inner = pattern["@list"]
        sub = inner[0] if isinstance(inner, list) and inner else {}
        return all(_value_pattern_match(sub, item) for item in value["@list"])
    # node subframe: any non-value, non-list node value satisfies presence
    return not _is_value(value) and not _is_list(value)


def _node_matches(node: dict, frame: dict, require_all: bool) -> bool:
    """Frame Matching (json-ld11-framing §2.2 / alg §3.2): with
    requireAll=False a node matches when ANY frame constraint matches
    (all must when True); a constraint-free frame is a wildcard."""
    n_constraints = 0
    any_matched = False

    fid = frame.get("@id")
    id_opts = [fid] if isinstance(fid, str) else (fid if isinstance(fid, list) else None)
    if id_opts:  # non-empty, non-wildcard id constraint
        concrete = [i for i in id_opts if isinstance(i, str)]
        if concrete and len(concrete) == len(id_opts):
            n_constraints += 1
            ok = node.get("@id") in concrete
            if ok:
                any_matched = True
            elif require_all:
                return False

    if "@type" in frame:
        ftypes = frame["@type"]
        if not isinstance(ftypes, list):
            ftypes = [ftypes]
        node_types = node.get("@type", [])
        if not isinstance(node_types, list):
            node_types = [node_types]
        if ftypes == []:
            ok = not node_types  # match none: node must be untyped
        elif any(isinstance(t, dict) for t in ftypes):
            ok = bool(node_types)  # wildcard {}: any typed node
        else:
            ok = bool(set(ftypes) & set(node_types))
        n_constraints += 1
        if ok:
            any_matched = True
        elif require_all:
            return False

    for prop in sorted(frame):
        if prop.startswith("@"):
            if prop == "@reverse":
                raise E.JsonLdError("@reverse in frames is not supported")
            continue
        pv = frame[prop]
        sub = pv[0] if isinstance(pv, list) and pv and isinstance(pv[0], dict) else pv
        has_default = isinstance(sub, dict) and "@default" in sub
        vals = node.get(prop, [])
        if pv == []:  # match none: property must be absent
            ok = not vals
        elif has_default:
            ok = True  # @default makes the property optional
        elif not vals:
            ok = False
        else:
            ok = any(_value_pattern_match(sub, v) for v in vals)
        n_constraints += 1
        if ok:
            any_matched = True
        elif require_all:
            return False

    if n_constraints == 0:
        return True
    return True if require_all else any_matched


# ---------------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------------


def _subframe_for(pv: Any) -> dict:
    """The frame to apply to values of a property (first node-object
    entry of the frame's value, else the implicit wildcard frame)."""
    if isinstance(pv, list):
        for item in pv:
            if isinstance(item, dict) and "@value" not in item:
                return item
        return {}
    if isinstance(pv, dict) and "@value" not in pv:
        return pv
    return {}


def _frame_value(env: _Env, v: Any, subframe: dict, flags: dict,
                 stack: tuple[str, ...]) -> Any:
    """Frame one expanded value: embed node refs per flags, recurse into
    lists, deep-copy values."""
    if _is_ref(v) and v["@id"] in env.graph:
        out: list = []
        _frame_nodes(env, [v["@id"]], subframe, out, flags, stack)
        return out[0] if out else {"@id": v["@id"]}
    if _is_list(v):
        inner = subframe.get("@list") if subframe else None
        inner_sub = _subframe_for(inner) if inner is not None else {}
        return {
            "@list": [
                _frame_value(env, item, inner_sub, flags, stack)
                for item in v["@list"]
            ]
        }
    return _deep(v)


def _frame_nodes(env: _Env, subjects: list[str], frame: dict, output: list,
                 inherited: dict, stack: tuple[str, ...],
                 top: bool = False) -> None:
    flags = {
        "embed": _embed_flag(frame, inherited["embed"]),
        "explicit": bool(_flag(frame, "@explicit", inherited["explicit"])),
        "require_all": bool(_flag(frame, "@requireAll", inherited["require_all"])),
        "omit_default": bool(_flag(frame, "@omitDefault", inherited["omit_default"])),
    }
    matched = [
        sid for sid in subjects
        if sid in env.graph and _node_matches(env.graph[sid], frame, flags["require_all"])
    ]
    for sid in sorted(matched):
        node = env.graph[sid]
        if (
            # @never governs REFERENCED nodes; top-level matches embed
            (flags["embed"] == "@never" and not top)
            or sid in stack  # circular reference: always a ref
            or (flags["embed"] == "@once" and sid in env.embedded_once)
        ):
            output.append({"@id": sid})
            continue
        env.embedded_once.add(sid)
        sub_stack = stack + (sid,)
        out: dict[str, Any] = {"@id": sid}
        if "@type" in node:
            out["@type"] = list(node["@type"])
        for prop in sorted(node):
            if prop in ("@id", "@type"):
                continue
            if prop.startswith("@"):
                out[prop] = _deep(node[prop])  # @index etc.
                continue
            if flags["explicit"] and prop not in frame:
                continue
            subframe = _subframe_for(frame.get(prop))
            out[prop] = [
                _frame_value(env, v, subframe, flags, sub_stack)
                for v in node[prop]
            ]
        # defaults for frame properties the node lacks
        for prop in sorted(frame):
            if prop.startswith("@") or prop in out:
                continue
            sub = _subframe_for(frame.get(prop))
            prop_omit = bool(_flag(sub, "@omitDefault", flags["omit_default"]))
            if prop_omit or "@default" not in sub:
                continue
            default = sub["@default"]
            out[prop] = _deep(default if isinstance(default, list) else [default])
        output.append(out)


# ---------------------------------------------------------------------------
# cleanup + entry point
# ---------------------------------------------------------------------------


def _collect_embedded(element: Any, acc: set[str]) -> None:
    if isinstance(element, list):
        for item in element:
            _collect_embedded(item, acc)
    elif isinstance(element, dict):
        if isinstance(element.get("@id"), str) and len(element) > 1:
            acc.add(element["@id"])
        for v in element.values():
            _collect_embedded(v, acc)


def _count_bnode_ids(element: Any, counts: dict[str, int]) -> None:
    if isinstance(element, list):
        for item in element:
            _count_bnode_ids(item, counts)
    elif isinstance(element, dict):
        v = element.get("@id")
        if isinstance(v, str) and v.startswith("_:"):
            counts[v] = counts.get(v, 0) + 1
        for val in element.values():
            _count_bnode_ids(val, counts)


def _prune_bnodes(element: Any, counts: dict[str, int]) -> None:
    if isinstance(element, list):
        for item in element:
            _prune_bnodes(item, counts)
    elif isinstance(element, dict):
        v = element.get("@id")
        if isinstance(v, str) and v.startswith("_:") and counts.get(v) == 1:
            del element["@id"]
        for val in element.values():
            _prune_bnodes(val, counts)


def _replace_null(element: Any) -> Any:
    """Post-compaction: `@null` sentinels (from `"@default": null`)
    become JSON null, and arrays collapsing to a lone null stay null."""
    if isinstance(element, list):
        out = [_replace_null(v) for v in element]
        if out == [None]:
            return None
        return out
    if isinstance(element, dict):
        return {k: _replace_null(v) for k, v in element.items()}
    if element == _NULL:
        return None
    return element


def frame_expanded(
    expanded: list,
    expanded_frame: list | dict,
    options: JsonLdOptions | None = None,
) -> list:
    """Frame already-expanded input against an already-frame-expanded
    frame; returns the framed output in expanded form (deterministic
    order). This is the kernel the distributed stage batches."""
    options = options or JsonLdOptions()
    node_map = generate_node_map(expanded, gen=BlankGen(prefix="f"))
    graph = merge_node_maps(node_map)
    env = _Env(graph, options)
    if isinstance(expanded_frame, list):
        frame_obj = expanded_frame[0] if expanded_frame else {}
    else:
        frame_obj = expanded_frame
    if not isinstance(frame_obj, dict):
        raise E.JsonLdError("frame must be a JSON object")
    inherited = {
        "embed": env.embed,
        "explicit": env.explicit,
        "require_all": env.require_all,
        "omit_default": env.omit_default,
    }
    output: list = []
    _frame_nodes(env, sorted(graph.keys()), frame_obj, output, inherited, (),
                 top=True)
    # drop top-level bare refs to nodes already embedded anywhere in the
    # output tree (they matched the frame but @once placed them deeper)
    embedded_ids: set[str] = set()
    _collect_embedded(output, embedded_ids)
    output = [
        o for o in output
        if not (_is_ref(o) and o["@id"] in embedded_ids)
    ]
    if options.prune_blank_node_identifiers:
        counts: dict[str, int] = {}
        _count_bnode_ids(output, counts)
        _prune_bnodes(output, counts)
    return output


def finalize_framed(
    framed: list,
    frame_ctx: Any,
    options: JsonLdOptions,
    base_url: str | None = None,
) -> dict:
    """Compact framed (expanded-form) output against the frame's
    context, replace `@null` sentinels, and apply omitGraph — the
    shared tail of `frame` and the distributed frame stage."""
    from .compact import compact_document

    compacted = compact_document(framed, frame_ctx, options, base_url)
    result = _replace_null(compacted)
    omit_graph = (
        options.omit_graph
        if options.omit_graph is not None
        else options.processing_mode != "json-ld-1.0"
    )
    if not omit_graph and "@graph" not in result:
        ctx = result.pop("@context", None)
        wrapped: dict[str, Any] = {}
        if ctx is not None:
            wrapped["@context"] = ctx
        wrapped["@graph"] = [result] if result else []
        return wrapped
    return result


def frame(
    document: Any,
    frame_doc: Any,
    options: JsonLdOptions | None = None,
    base_url: str | None = None,
) -> dict:
    """JsonLdProcessor.frame: expand both inputs (the frame with
    frame-expansion tolerances), frame, compact against the frame's
    context, then replace `@null` sentinels."""
    from .api import expand

    options = options or JsonLdOptions()
    expanded = expand(document, options, base_url)
    frame_ctx = frame_doc.get("@context") if isinstance(frame_doc, dict) else None
    expanded_frame = expand(
        frame_doc, options.with_(frame_expansion=True), base_url
    )
    framed = frame_expanded(expanded, expanded_frame, options)
    return finalize_framed(framed, frame_ctx, options, base_url)
