"""Compaction Algorithm (JSON-LD 1.1 API §6) — expanded → compact JSON.

Reference parity:
  - compact_full / document     ↔ crates/compaction/src/document.rs:33-120
  - compact_iri (term selection, prefix synthesis, base-relative)
                                ↔ crates/compaction/src/iri.rs:88-505
  - node compaction             ↔ crates/compaction/src/node.rs:17-449
  - property placement (@nest, container maps, as_array)
                                ↔ crates/compaction/src/property.rs:16-786
  - value compaction            ↔ crates/compaction/src/value.rs:10-303
  - array compaction            ↔ crates/compaction/src/lib.rs:449-507
  - add_value helper            ↔ crates/compaction/src/lib.rs:400-432

Secondary for the KG goal (SURVEY.md §2-F): runs driver-side or inside
the compaction pandas-UDF stage (operators/jsonld-compatible shape).
"""

from __future__ import annotations

from typing import Any, Optional

from .context import KEYWORDS, ActiveContext, UNSET, process_context
from .inverse import select_term
from .iri import is_absolute_iri, is_blank_node_id, split_iri
from .options import JsonLdOptions

_GEN_DELIMS = ":/?#[]@"


def _is_keyword(v: Any) -> bool:
    return isinstance(v, str) and v in KEYWORDS


def compact_document(
    expanded: list,
    context: Any,
    options: JsonLdOptions | None = None,
    base_url: str | None = None,
) -> dict:
    """Full compaction incl. @context embedding (document.rs:33-120)."""
    options = options or JsonLdOptions()
    base = options.base if options.base is not None else base_url
    active = ActiveContext(base_iri=base, original_base_url=base)
    ctx_value = context
    if isinstance(ctx_value, dict) and "@context" in ctx_value:
        ctx_value = ctx_value["@context"]
    if ctx_value is not None:
        active = process_context(
            active, ctx_value, base,
            loader=options.loader, processing_mode=options.processing_mode,
        )
    result = compact_element(expanded, active, None, options)
    if isinstance(result, list):
        if not result:
            result = {}
        else:
            result = {compact_iri(active, "@graph", vocab=True, options=options): result}
    if not isinstance(result, dict):
        result = {}
    if ctx_value not in (None, {}, []):
        result = {"@context": ctx_value, **result}
    return result


def compact_element(
    element: Any,
    active: ActiveContext,
    active_property: Optional[str],
    options: JsonLdOptions,
    compact_arrays: bool | None = None,
) -> Any:
    """Compaction Algorithm §6.1.2."""
    if compact_arrays is None:
        compact_arrays = options.compact_arrays

    if element is None or isinstance(element, (str, int, float, bool)):
        return element

    if isinstance(element, list):
        result = [
            c
            for c in (
                compact_element(item, active, active_property, options)
                for item in element
            )
            if c is not None
        ]
        td = active.terms.get(active_property) if active_property else None
        container = td.container if td is not None else frozenset()
        # reference compact_collection_with (lib.rs:485-505): keep the
        # array only for @list/@set CONTAINERS or the @graph/@set active
        # PROPERTIES — a @graph container still unwraps its single graph
        # entry (round-1 wrongly kept the array there)
        if (
            len(result) == 1
            and compact_arrays
            and not container & {"@list", "@set"}
            and active_property not in ("@graph", "@set")
        ):
            return result[0]
        return result

    assert isinstance(element, dict)

    # previous-context revert for value/reference positions
    if active.previous_context is not None:
        if "@value" not in element and list(element.keys()) != ["@id"]:
            active = active.previous_context

    td = active.terms.get(active_property) if active_property else None
    if td is not None and td.context is not None:
        active = process_context(
            active, td.context[0], td.context[1],
            loader=options.loader, processing_mode=options.processing_mode,
            override_protected=True,
        )

    if "@value" in element or ("@id" in element and set(element.keys()) == {"@id"}):
        compacted = compact_value(element, active, active_property, options)
        if not isinstance(compacted, (dict, list)):
            return compacted
        if set(element.keys()) == {"@id"}:
            # couldn't collapse to a string; fall through to map compaction
            pass
        else:
            element = None or element  # keep going with map form below
            if isinstance(compacted, dict):
                return compacted

    if _is_list_object(element) and td is not None and "@list" in td.container:
        lst = compact_element(
            element["@list"], active, active_property, options, compact_arrays=False
        )
        return lst

    inside_reverse = active_property == "@reverse"
    result: dict[str, Any] = {}

    # type-scoped contexts apply when compacting properties of a node
    # whose @type selects them
    if "@type" in element:
        types = element["@type"] if isinstance(element["@type"], list) else [element["@type"]]
        compacted_types = sorted(
            compact_iri(active, t, vocab=True, options=options) for t in types
        )
        for ct in compacted_types:
            tdef = active.terms.get(ct)
            if tdef is not None and tdef.context is not None:
                active = process_context(
                    active, tdef.context[0], tdef.context[1],
                    loader=options.loader, processing_mode=options.processing_mode,
                    propagate=False,
                )

    for expanded_property in _ordered(element, options):
        expanded_value = element[expanded_property]

        if expanded_property == "@id":
            if isinstance(expanded_value, str):
                cv = compact_iri(
                    active, expanded_value, vocab=False, options=options
                )
            else:
                cv = expanded_value
            alias = compact_iri(active, "@id", vocab=True, options=options)
            result[alias] = cv
            continue

        if expanded_property == "@type":
            types = (
                expanded_value if isinstance(expanded_value, list) else [expanded_value]
            )
            compacted = [
                compact_iri(active, t, vocab=True, options=options) for t in types
            ]
            alias = compact_iri(active, "@type", vocab=True, options=options)
            result[alias] = (
                compacted[0]
                if len(compacted) == 1 and options.compact_arrays
                else compacted
            )
            continue

        if expanded_property == "@reverse":
            compacted_rev = compact_element(expanded_value, active, "@reverse", options)
            if isinstance(compacted_rev, dict):
                for prop in list(compacted_rev.keys()):
                    ptd = active.terms.get(prop)
                    if ptd is not None and ptd.reverse:
                        value = compacted_rev.pop(prop)
                        use_array = ("@set" in ptd.container) or not options.compact_arrays
                        _add_value(result, prop, value, as_array=use_array)
                if compacted_rev:
                    alias = compact_iri(active, "@reverse", vocab=True, options=options)
                    result[alias] = compacted_rev
            continue

        if expanded_property == "@preserve":
            continue

        if expanded_property == "@index" and td is not None and "@index" in td.container:
            continue

        if expanded_property in ("@direction", "@index", "@language", "@value"):
            alias = compact_iri(active, expanded_property, vocab=True, options=options)
            result[alias] = expanded_value
            continue

        if expanded_property == "@included":
            compacted = compact_element(expanded_value, active, "@included", options)
            alias = compact_iri(active, "@included", vocab=True, options=options)
            result[alias] = compacted
            continue

        if expanded_property == "@graph":
            compacted = compact_element(expanded_value, active, "@graph", options)
            alias = compact_iri(active, "@graph", vocab=True, options=options)
            result[alias] = compacted
            continue

        # empty array
        if expanded_value == []:
            item_active_prop = compact_iri(
                active, expanded_property, value=None, vocab=True, reverse=inside_reverse,
                options=options,
            )
            nest_result = _nest_target(active, item_active_prop, result)
            _add_value(nest_result, item_active_prop, [], as_array=True)
            continue

        for expanded_item in expanded_value:
            item_active_prop = compact_iri(
                active, expanded_property, value=expanded_item, vocab=True,
                reverse=inside_reverse, options=options,
            )
            nest_result = _nest_target(active, item_active_prop, result)
            ptd = active.terms.get(item_active_prop)
            container = ptd.container if ptd is not None else frozenset()
            # reference select_nest_result (property.rs:369-379): @set in
            # container OR the active property being @graph/@list forces
            # arrays; otherwise follow compactArrays. (Round-1 wrongly
            # suppressed the @set force under @graph containers and
            # never applied the @graph/@list-property force — a simple
            # "@container": "@graph" single graph failed to unwrap.)
            as_array = (
                "@set" in container
                or item_active_prop in ("@graph", "@list")
                or not options.compact_arrays
            )

            inner = (
                expanded_item["@list"]
                if _is_list_object(expanded_item)
                else expanded_item["@graph"]
                if _is_graph_object_full(expanded_item)
                else expanded_item
            )
            compacted_item = compact_element(inner, active, item_active_prop, options)

            if _is_list_object(expanded_item):
                if not isinstance(compacted_item, list):
                    compacted_item = [compacted_item]
                if "@list" not in container:
                    wrapped = {
                        compact_iri(active, "@list", vocab=True, options=options): compacted_item
                    }
                    if "@index" in expanded_item:
                        wrapped[
                            compact_iri(active, "@index", vocab=True, options=options)
                        ] = expanded_item["@index"]
                    compacted_item = wrapped
                    _add_value(nest_result, item_active_prop, compacted_item, as_array=as_array)
                else:
                    nest_result[item_active_prop] = compacted_item
                continue

            if _is_graph_object_full(expanded_item):
                # reference compact_property_graph (property.rs:101-300)
                simple = "@id" not in expanded_item
                if "@graph" in container and "@id" in container:
                    key = expanded_item.get("@id")
                    key = (
                        compact_iri(active, key, vocab=False, options=options)
                        if key
                        else compact_iri(active, "@none", vocab=True, options=options)
                    )
                    map_obj = nest_result.setdefault(item_active_prop, {})
                    _add_value(map_obj, key, compacted_item, as_array=as_array)
                elif "@graph" in container and "@index" in container and simple:
                    key = expanded_item.get("@index", "@none")
                    if key == "@none":
                        key = compact_iri(active, "@none", vocab=True, options=options)
                    map_obj = nest_result.setdefault(item_active_prop, {})
                    _add_value(map_obj, key, compacted_item, as_array=as_array)
                elif "@graph" in container and simple:
                    if isinstance(compacted_item, list) and len(compacted_item) > 1:
                        compacted_item = {
                            compact_iri(active, "@included", vocab=True, options=options): compacted_item
                        }
                    _add_value(nest_result, item_active_prop, compacted_item, as_array=as_array)
                else:
                    # no usable @graph container: keep graph-ness explicit —
                    # {alias(@graph): value} (+ compacted @id, + @index)
                    # (property.rs:235-297)
                    wrapped = {
                        compact_iri(active, "@graph", vocab=True, options=options): compacted_item
                    }
                    if "@id" in expanded_item:
                        wrapped[
                            compact_iri(active, "@id", vocab=True, options=options)
                        ] = compact_iri(
                            active, expanded_item["@id"], vocab=False, options=options
                        )
                    if "@index" in expanded_item:
                        wrapped[
                            compact_iri(active, "@index", vocab=True, options=options)
                        ] = expanded_item["@index"]
                    _add_value(nest_result, item_active_prop, wrapped, as_array=as_array)
                continue

            if container & {"@language", "@index", "@id", "@type"} and "@graph" not in container:
                map_obj = nest_result.setdefault(item_active_prop, {})
                if "@language" in container:
                    key = expanded_item.get("@language", "@none")
                    if isinstance(compacted_item, dict) and "@value" in expanded_item:
                        compacted_item = expanded_item["@value"]
                elif "@index" in container:
                    index_key = ptd.index if ptd is not None and ptd.index else "@index"
                    if index_key == "@index":
                        key = expanded_item.get("@index", "@none")
                    else:
                        # property-based index
                        idx_iri = None
                        from .context import expand_iri as _exp

                        idx_iri = _exp(active, index_key, vocab=True)
                        key_vals = expanded_item.get(idx_iri, []) if idx_iri else []
                        key = "@none"
                        if key_vals:
                            first = key_vals[0]
                            if isinstance(first, dict) and "@value" in first:
                                key = str(first["@value"])
                            remaining = key_vals[1:]
                            ei = dict(expanded_item)
                            if remaining:
                                ei[idx_iri] = remaining
                            else:
                                ei.pop(idx_iri, None)
                            compacted_item = compact_element(
                                ei, active, item_active_prop, options
                            )
                elif "@id" in container:
                    key_alias = compact_iri(active, "@id", vocab=True, options=options)
                    if isinstance(compacted_item, dict):
                        key = compacted_item.pop(key_alias, "@none")
                        if len(compacted_item) == 0 and options.compact_arrays:
                            pass
                    else:
                        key = "@none"
                else:  # @type
                    key_alias = compact_iri(active, "@type", vocab=True, options=options)
                    key = "@none"
                    if isinstance(compacted_item, dict):
                        tv = compacted_item.get(key_alias)
                        if tv:
                            tv_list = tv if isinstance(tv, list) else [tv]
                            key = tv_list[0]
                            rest = tv_list[1:]
                            if rest:
                                compacted_item[key_alias] = (
                                    rest[0] if len(rest) == 1 and options.compact_arrays else rest
                                )
                            else:
                                compacted_item.pop(key_alias, None)
                            if (
                                options.compact_arrays
                                and list(compacted_item.keys())
                                == [compact_iri(active, "@id", vocab=True, options=options)]
                            ):
                                compacted_item = compact_element(
                                    {"@id": expanded_item["@id"]},
                                    active,
                                    item_active_prop,
                                    options,
                                )
                    if key == "@none":
                        key = compact_iri(active, "@none", vocab=True, options=options)
                _add_value(map_obj, key, compacted_item, as_array=as_array)
                continue

            _add_value(nest_result, item_active_prop, compacted_item, as_array=as_array)

    return result


def _ordered(element: dict, options: JsonLdOptions):
    return sorted(element.keys()) if True else element.keys()


def _nest_target(active: ActiveContext, prop: str, result: dict) -> dict:
    td = active.terms.get(prop)
    if td is not None and td.nest is not None:
        nest_term = td.nest
        # compaction-side @nest validation (ref property.rs:313-326):
        # a nest term other than the literal @nest must be a term that
        # EXPANDS to @nest — anything else is invalid @nest value at
        # compact time (definition time only rejects other keywords)
        if nest_term != "@nest":
            nest_td = active.terms.get(nest_term)
            if nest_td is None or nest_td.iri != "@nest":
                from . import errors as E

                raise E.InvalidNestValue(nest_term)
        return result.setdefault(nest_term, {})
    return result


def _is_list_object(v: Any) -> bool:
    return isinstance(v, dict) and "@list" in v


def _is_graph_object_full(v: Any) -> bool:
    return isinstance(v, dict) and "@graph" in v


def _add_value(obj: dict, key: str, value: Any, as_array: bool = False) -> None:
    """lib.rs:400-432."""
    if as_array and key not in obj:
        obj[key] = []
    if key in obj:
        existing = obj[key]
        if not isinstance(existing, list):
            obj[key] = [existing]
        if isinstance(value, list):
            obj[key].extend(value)
        else:
            obj[key].append(value)
    else:
        obj[key] = value


def compact_iri(
    active: ActiveContext,
    iri: Optional[str],
    value: Any = None,
    vocab: bool = False,
    reverse: bool = False,
    options: JsonLdOptions | None = None,
) -> Optional[str]:
    """IRI Compaction §6.2.2."""
    options = options or JsonLdOptions()
    if iri is None:
        return None
    if vocab and iri in active.inverse:
        containers = []
        type_language = "@language"
        type_language_value = "@null"

        if isinstance(value, dict) and "@index" in value and not _is_graph_object_full(value):
            containers += ["@index", "@index@set"]
        if reverse:
            type_language = "@type"
            type_language_value = "@reverse"
            containers.append("@set")
        elif _is_list_object(value):
            if "@index" not in value:
                containers.append("@list")
            lst = value["@list"]
            common_type = None
            common_lang = None if lst else ("@null")
            for item in lst:
                item_lang, item_type = "@none", "@none"
                if isinstance(item, dict) and "@value" in item:
                    if "@direction" in item:
                        item_lang = f"{item.get('@language','')}_{item['@direction']}".lower()
                    elif "@language" in item:
                        item_lang = item["@language"].lower()
                    elif "@type" in item:
                        item_type = item["@type"]
                    else:
                        item_lang = "@null"
                else:
                    item_type = "@id"
                common_lang = item_lang if common_lang is None else (
                    common_lang if common_lang == item_lang else "@none"
                )
                common_type = item_type if common_type is None else (
                    common_type if common_type == item_type else "@none"
                )
            common_lang = common_lang or "@none"
            common_type = common_type or "@none"
            if common_type != "@none":
                type_language = "@type"
                type_language_value = common_type
            else:
                type_language_value = common_lang
        elif isinstance(value, dict) and "@graph" in value:
            if "@index" in value:
                containers += ["@graph@index", "@graph@index@set"]
            if "@id" in value:
                containers += ["@graph@id", "@graph@id@set"]
            containers += ["@graph", "@graph@set", "@set"]
            if "@index" not in value:
                containers += ["@graph@index", "@graph@index@set"]
            if "@id" not in value:
                containers += ["@graph@id", "@graph@id@set"]
            containers += ["@index", "@index@set"]
            type_language = "@type"
            type_language_value = "@id"
        else:
            if isinstance(value, dict) and "@value" in value:
                if "@direction" in value and "@index" not in value:
                    type_language_value = (
                        f"{value.get('@language','')}_{value['@direction']}".lower()
                    )
                    containers += ["@language", "@language@set"]
                elif "@language" in value and "@index" not in value:
                    type_language_value = value["@language"].lower()
                    containers += ["@language", "@language@set"]
                elif "@type" in value:
                    type_language = "@type"
                    type_language_value = value["@type"]
            else:
                type_language = "@type"
                type_language_value = "@id"
                containers += ["@id", "@id@set", "@type", "@set@type"]
            containers.append("@set")
        containers.append("@none")
        if isinstance(value, dict) and "@index" not in value:
            containers += ["@index", "@index@set"]
        if isinstance(value, dict) and set(value.keys()) == {"@value"}:
            containers += ["@language", "@language@set"]

        preferred = []
        if type_language_value == "@reverse":
            preferred.append("@reverse")
        if (
            type_language_value in ("@id", "@reverse")
            and isinstance(value, dict)
            and "@id" in value
        ):
            compacted_id = compact_iri(active, value["@id"], vocab=True, options=options)
            ctd = active.terms.get(compacted_id)
            if ctd is not None and ctd.iri == value["@id"]:
                preferred += ["@vocab", "@id", "@none"]
            else:
                preferred += ["@id", "@vocab", "@none"]
        else:
            preferred += [type_language_value, "@none"]
            if _is_list_object(value) and not value["@list"]:
                type_language = "@any"
        preferred.append("@any")
        # 1.1: _<direction> fallbacks
        for p in list(preferred):
            if isinstance(p, str) and "_" in p and not p.startswith("_"):
                preferred.append("_" + p.split("_", 1)[1])
        term = select_term(active, iri, containers, type_language, preferred)
        if term is not None:
            return term

    if vocab and active.vocab is not None:
        if iri.startswith(active.vocab) and len(iri) > len(active.vocab):
            suffix = iri[len(active.vocab):]
            if suffix not in active.terms:
                return suffix

    # compact IRI (prefix:suffix) synthesis
    candidate = None
    for term, td in active.terms.items():
        if (
            td.iri is None
            or not td.prefix
            or td.iri == iri
            or not iri.startswith(td.iri)
        ):
            continue
        cand = term + ":" + iri[len(td.iri):]
        if candidate is None or (len(cand), cand) < (len(candidate), candidate):
            # spec §6.2.2 step 9.4: a candidate colliding with an
            # existing term is usable ONLY when that term maps to the
            # same IRI AND value is null — i.e. for bare-IRI positions
            # (types, @id values, aliases); for property KEYS with a
            # value present the existing term's coercions could change
            # the round-trip, so the candidate is rejected
            # (ref iri.rs:449-455: `candidate_def.value() == Some(var)
            # && value.is_none()`)
            existing = active.terms.get(cand)
            if existing is None or (existing.iri == iri and value is None):
                candidate = cand
    if candidate is not None:
        return candidate

    # IRI confused with prefix check
    head, _, rest = iri.partition(":")
    td = active.terms.get(head)
    if td is not None and td.prefix and not rest.startswith("//"):
        from . import errors as E

        raise E.JsonLdError(iri, code="IRI confused with prefix")

    if not vocab and options.compact_to_relative and active.base_iri:
        rel = make_relative_iri(active.base_iri, iri)
        if rel is not None:
            return rel
    return iri


def make_relative_iri(base: str, iri: str) -> Optional[str]:
    """Base-relative compaction (iri.rs base-relative branch)."""
    if not is_absolute_iri(iri) or is_blank_node_id(iri):
        return None
    b_scheme, b_auth, b_path, b_query, _ = split_iri(base)
    i_scheme, i_auth, i_path, i_query, i_frag = split_iri(iri)
    if b_scheme != i_scheme or b_auth != i_auth:
        return None
    b_segs = b_path.split("/")
    i_segs = i_path.split("/")
    b_dir, b_file = b_segs[:-1], b_segs[-1]
    i_dir, i_file = i_segs[:-1], i_segs[-1]
    common = 0
    while common < len(b_dir) and common < len(i_dir) and b_dir[common] == i_dir[common]:
        common += 1
    ups = len(b_dir) - common
    parts = [".."] * ups + i_dir[common:] + [i_file]
    rel = "/".join(parts)
    if rel == "":
        rel = i_file or "./"
    if i_query is not None:
        rel += "?" + i_query
    if i_frag is not None:
        rel += "#" + i_frag
    if rel == "":
        rel = "./"
    if rel.split("/", 1)[0].find(":") != -1:
        rel = "./" + rel
    return _disambiguate_keyword(rel)


def _disambiguate_keyword(rel: str) -> str:
    """A relative IRI that LOOKS like a keyword (``@`` + alphas, e.g.
    ``@foo``) would be dropped as an unknown keyword on re-expansion;
    prefix ``./`` so the round trip preserves it (ref
    iri.rs:505-511 ``disambiguate_keyword`` / syntax is_keyword_like:
    len > 1, '@', then alphas only). True keywords can never reach
    here (they are not IRIs), but keep the reference's exact guard."""
    from .context import KEYWORDS

    if (
        len(rel) > 1
        and rel[0] == "@"
        and rel[1:].isalpha()
        and rel[1:].isascii()
        and rel not in KEYWORDS
    ):
        return "./" + rel
    return rel


def compact_value(
    value: dict,
    active: ActiveContext,
    active_property: Optional[str],
    options: JsonLdOptions,
) -> Any:
    """Value Compaction §6.3 (value.rs:10-303)."""
    td = active.terms.get(active_property) if active_property else None
    language = active.default_language
    direction = active.default_base_direction
    if td is not None and td.language is not UNSET:
        language = td.language
    if td is not None and td.direction is not UNSET:
        direction = td.direction

    if set(value.keys()) == {"@id"}:
        if td is not None and td.type_mapping == "@id":
            return compact_iri(active, value["@id"], vocab=False, options=options)
        if td is not None and td.type_mapping == "@vocab":
            return compact_iri(active, value["@id"], vocab=True, options=options)
        result = {
            compact_iri(active, "@id", vocab=True, options=options): compact_iri(
                active, value["@id"], vocab=False, options=options
            )
        }
        return result

    v = value.get("@value")
    type_mapping = td.type_mapping if td is not None else None
    if "@index" in value and td is not None and "@index" in td.container:
        value = {k: x for k, x in value.items() if k != "@index"}

    if value.get("@type") is not None and value["@type"] == type_mapping:
        return v
    if type_mapping == "@none" or "@type" in value:
        out = {}
        for k, x in value.items():
            alias = compact_iri(active, k, vocab=True, options=options)
            if k == "@type":
                x = compact_iri(active, x, vocab=True, options=options)
            out[alias] = x
        return out
    # §12 step 9: a string value compacts to the bare string iff BOTH
    # the language and the direction of the value match the active
    # mappings — null matching null, values matching case-insensitively
    # (language) / exactly (direction). A direction-only value (e.g.
    # {"@value": "x", "@direction": "rtl"} under a term with
    # @direction: rtl) therefore compacts too.
    val_lang = value.get("@language")
    val_dir = value.get("@direction")
    lang_match = (val_lang is None and language is None) or (
        isinstance(val_lang, str)
        and isinstance(language, str)
        and val_lang.lower() == language.lower()
    )
    dir_match = (val_dir is None and direction is None) or (
        val_dir is not None and val_dir == direction
    )
    if isinstance(v, str):
        if lang_match and dir_match and "@index" not in value:
            return v
    elif "@index" not in value:
        return v
    out = {}
    for k, x in value.items():
        alias = compact_iri(active, k, vocab=True, options=options)
        out[alias] = x
    return out
