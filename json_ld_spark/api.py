"""Processor facade: expand / flatten / to_rdf / compare on single
documents — the pure-Python core the Spark operators batch over.

Reference parity: JsonLdProcessor trait entry points
(src/processor/mod.rs:327; remote_document.rs:45,162; mod.rs:1481).
"""

from __future__ import annotations

from typing import Any, Optional

from .canonicalize import canonicalize_quads
from .compare import expanded_equals
from .context import ActiveContext, process_context
from .expand import expand_document
from .nodemap import BlankGen, flatten_expanded, generate_node_map
from .options import JsonLdOptions
from .rdf import Quad, expanded_to_quads


# processed expand_context cache: calling expand() per document with the
# same options reprocessed the context every call (measured 34% of the
# standalone expand+toRdf path; the Spark stages already cache via
# operators/jsonld._active_context). ActiveContext reuse across
# documents is the established contract there — the expand_iri memo
# mutating in place is a feature (it warms across documents).
_INITIAL_CTX_CACHE: dict = {}


def _initial_context(
    options: JsonLdOptions, base_url: str | None
) -> ActiveContext:
    import json as _json

    base = options.base if options.base is not None else base_url
    if options.expand_context is None:
        return ActiveContext(base_iri=base, original_base_url=base)
    ec = options.expand_context
    if isinstance(ec, dict) and "@context" in ec:
        ec = ec["@context"]
    from .context import no_loader

    key = None
    if options.loader is no_loader:
        # only the loader-free path is cacheable: keying on id(loader)
        # would be unsound (ids are reused after GC) and loaders can
        # serve different content per call
        try:
            key = (
                _json.dumps(ec, sort_keys=True), base,
                options.processing_mode,
            )
        except TypeError:  # unserializable context value: skip the cache
            key = None
    if key is not None:
        got = _INITIAL_CTX_CACHE.get(key)
        if got is not None:
            return got
    active = process_context(
        ActiveContext(base_iri=base, original_base_url=base), ec, base,
        loader=options.loader, processing_mode=options.processing_mode,
    )
    if key is not None:
        if len(_INITIAL_CTX_CACHE) > 64:
            _INITIAL_CTX_CACHE.clear()
        _INITIAL_CTX_CACHE[key] = active
    return active


def expand(
    document: Any,
    options: JsonLdOptions | None = None,
    base_url: str | None = None,
) -> list:
    """RemoteDocument::expand_full (remote_document.rs:45)."""
    options = options or JsonLdOptions()
    active = _initial_context(options, base_url)
    expanded, _warnings = expand_document(document, active, options, base_url or options.base)
    return expanded


def expand_url(
    url: str,
    options: JsonLdOptions | None = None,
    http: "Any" = None,
) -> list:
    """RemoteDocumentReference::expand_full (remote_document.rs:236 →
    45-95): dereference `url` with the HTTP loader, then expand with

    1. the caller's `expand_context` (remote_document.rs:59-76), then
    2. the HTTP ``Link rel=json-ld#context`` context URL delivered with
       a non-ld+json response (remote_document.rs:78-95),

    in that order, against the document's final URL as base. The HTTP
    loader also serves any remote contexts referenced inside the
    document (chained after any loader already configured)."""
    from .context import chain_loader
    from .httploader import HttpLoader

    http = http or HttpLoader()
    rd = http.load(url)
    opts = options or JsonLdOptions()
    # chain: configured loader first (registry/mount wins), HTTP fallback
    opts = opts.with_(loader=chain_loader(opts.loader, http.context_loader()))
    active = _initial_context(opts, rd.url)
    if rd.context_url is not None:
        active = process_context(
            active, rd.context_url, rd.url,
            loader=opts.loader, processing_mode=opts.processing_mode,
        )
    expanded, _warnings = expand_document(rd.document, active, opts, rd.url)
    return expanded


def expand_with_warnings(
    document: Any,
    options: JsonLdOptions | None = None,
    base_url: str | None = None,
) -> tuple[list, list[str]]:
    options = options or JsonLdOptions()
    active = _initial_context(options, base_url)
    return expand_document(document, active, options, base_url or options.base)


def flatten(
    document: Any,
    options: JsonLdOptions | None = None,
    base_url: str | None = None,
    ordered: bool = True,
) -> list:
    """RemoteDocument::flatten_full (remote_document.rs:162): expand →
    node map → flat node list."""
    expanded = expand(document, options, base_url)
    return flatten_expanded(expanded, ordered=ordered, gen=BlankGen())


def to_rdf(
    document: Any,
    options: JsonLdOptions | None = None,
    base_url: str | None = None,
    canonicalize: bool = False,
) -> list[Quad]:
    """JsonLdProcessor::to_rdf_full (src/processor/mod.rs:1481)."""
    options = options or JsonLdOptions()
    expanded = expand(document, options, base_url)
    quads = expanded_to_quads(
        expanded,
        rdf_direction=options.rdf_direction,
        produce_generalized_rdf=options.produce_generalized_rdf,
        gen=BlankGen(),
    )
    if canonicalize:
        quads = canonicalize_quads(quads)
    return quads


def compact(
    document: Any,
    context: Any,
    options: JsonLdOptions | None = None,
    base_url: str | None = None,
) -> dict:
    """JsonLdProcessor::compact (src/processor/mod.rs:1876-1930):
    expand → compact against the target context."""
    from .compact import compact_document

    options = options or JsonLdOptions()
    expanded = expand(document, options, base_url)
    return compact_document(expanded, context, options, base_url)


def from_rdf(
    quads: list[Quad],
    options: JsonLdOptions | None = None,
) -> list:
    """JsonLdProcessor::from_rdf (§8.2; serialization.rs:238-392):
    RDF quads → expanded JSON-LD, folding well-formed rdf:first/rest
    chains into @list and decoding native literals."""
    from .fromrdf import from_rdf as _from_rdf

    options = options or JsonLdOptions()
    return _from_rdf(
        quads,
        ordered=options.ordered,
        rdf_direction=options.rdf_direction,
        use_native_types=options.use_native_types,
        use_rdf_type=options.use_rdf_type,
    )


def compare(
    doc1: Any,
    doc2: Any,
    options: JsonLdOptions | None = None,
    base_url: str | None = None,
) -> bool:
    """JsonLdProcessor::compare (remote_document.rs:15-43): expanded-form
    set equality."""
    return expanded_equals(
        expand(doc1, options, base_url), expand(doc2, options, base_url)
    )
