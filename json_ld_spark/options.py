"""Processing options, mirroring the reference's Options struct
(src/processor/mod.rs:17-81) plus expansion policy
(crates/expansion/src/options.rs:39-75).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from .context import Loader, no_loader

# expansion policy for invalid (non-IRI, non-keyword) properties
POLICY_STANDARD = "standard"   # drop silently (spec behavior)
POLICY_KEEP = "keep"           # keep invalid term as property (ref Keep)
POLICY_REJECT = "reject"       # raise (ref Strictest/Reject)


@dataclass
class JsonLdOptions:
    base: Optional[str] = None
    processing_mode: str = "json-ld-1.1"
    ordered: bool = False
    compact_arrays: bool = True
    compact_to_relative: bool = True
    expand_context: Any = None
    rdf_direction: Optional[str] = None  # None | "i18n-datatype" | "compound-literal"
    produce_generalized_rdf: bool = False
    use_native_types: bool = True   # fromRdf: decode xsd int/bool/double
    use_rdf_type: bool = False      # fromRdf: keep rdf:type as property
    policy: str = POLICY_STANDARD
    # reference Policy.vocab (expansion/src/options.rs:53-63): action for
    # terms expanded by CONCATENATING the @vocab mapping — "keep"
    # (default), "drop" (term vanishes), "reject" (ForbiddenVocab; the
    # reference CLI's --no-vocab)
    policy_vocab: str = "keep"
    # reference Policy.allow_undefined: when False, a key that would be
    # silently dropped (no IRI mapping) raises KeyExpansionFailed (the
    # reference CLI's --no-undef)
    allow_undefined: bool = True
    loader: Loader = field(default=no_loader)
    # framing (json-ld11-framing; see frame.py)
    frame_expansion: bool = False   # expansion tolerances for frame docs
    explicit: bool = False          # only frame-listed properties in output
    require_all: bool = False       # all frame constraints must match
    omit_default: bool = False      # suppress @default fill-ins
    omit_graph: Optional[bool] = None  # None: per processing mode (1.1: True)
    prune_blank_node_identifiers: bool = True

    def with_(self, **kw) -> "JsonLdOptions":
        from dataclasses import replace

        return replace(self, **kw)


def options_payload(opts: JsonLdOptions) -> dict:
    """Picklable field dict (the loader excluded — it is rebuilt
    executor-side from the shipped context registry) for sending
    options into Arrow-stage closures. Shipping the WHOLE dataclass
    means newly added option fields flow into the distributed path
    automatically instead of being dropped by hand-copied subsets
    (which is exactly what happened to the round-3 policy knobs before
    this helper existed)."""
    from dataclasses import fields as _fields

    return {
        f.name: getattr(opts, f.name)
        for f in _fields(JsonLdOptions)
        if f.name != "loader"
    }
