"""JSON-LD error codes, mirroring the reference's error enums.

Reference parity: crates/expansion/src/error.rs, crates/context-processing
(error variants), src/processor/mod.rs:232 (FlattenError::ConflictingIndexes).
Error codes use the official JSON-LD 1.1 API spec strings so negative-test
fixtures can assert on them.
"""

from __future__ import annotations


class JsonLdError(Exception):
    """Base error carrying the spec error code string."""

    code = "jsonld error"

    def __init__(self, message: str = "", code: str | None = None):
        if code is not None:
            self.code = code
        super().__init__(f"{self.code}: {message}" if message else self.code)


class InvalidContextNullification(JsonLdError):
    """invalid context nullification (api §4.1.2 step 5.1): a null
    context may not clear protected term definitions."""


class InvalidContext(JsonLdError):
    code = "invalid local context"


class InvalidContextEntry(JsonLdError):
    """invalid context entry: 1.1-only context keywords (@import,
    @propagate, @direction) in json-ld-1.0 mode, and @import inside an
    imported context (reference
    crates/context-processing/src/algorithm/mod.rs:96,222,255,346)."""

    code = "invalid context entry"


class InvalidBaseIri(JsonLdError):
    code = "invalid base IRI"


class InvalidVocabMapping(JsonLdError):
    code = "invalid vocab mapping"


class InvalidDefaultLanguage(JsonLdError):
    code = "invalid default language"


class InvalidBaseDirection(JsonLdError):
    code = "invalid base direction"


class InvalidVersionValue(JsonLdError):
    code = "invalid @version value"


class ProcessingModeConflict(JsonLdError):
    code = "processing mode conflict"


class InvalidImportValue(JsonLdError):
    code = "invalid @import value"


class InvalidRemoteContext(JsonLdError):
    code = "invalid remote context"


class ContextOverflow(JsonLdError):
    # spec name: "context overflow" (recursive context inclusion)
    code = "context overflow"


class LoadingRemoteContextFailed(JsonLdError):
    code = "loading remote context failed"


class LoadingDocumentFailed(JsonLdError):
    code = "loading document failed"


class CyclicIriMapping(JsonLdError):
    code = "cyclic IRI mapping"


class KeywordRedefinition(JsonLdError):
    code = "keyword redefinition"


class InvalidTermDefinition(JsonLdError):
    code = "invalid term definition"


class InvalidIriMapping(JsonLdError):
    code = "invalid IRI mapping"


class ForbiddenVocab(JsonLdError):
    # reference expansion Policy.vocab = Reject
    # (context-processing/src/algorithm/iri.rs:168 Error::ForbiddenVocab)
    code = "forbidden vocab"


class KeyExpansionFailed(JsonLdError):
    # reference expansion Policy.allow_undefined = false
    # (expansion/src/node.rs:997 Error::KeyExpansionFailed)
    code = "key expansion failed"


class InvalidReverseProperty(JsonLdError):
    code = "invalid reverse property"


class InvalidContainerMapping(JsonLdError):
    code = "invalid container mapping"


class InvalidScopedContext(JsonLdError):
    code = "invalid scoped context"


class ProtectedTermRedefinition(JsonLdError):
    code = "protected term redefinition"


class InvalidTypeMapping(JsonLdError):
    code = "invalid type mapping"


class InvalidLanguageMapping(JsonLdError):
    code = "invalid language mapping"


class InvalidNestValue(JsonLdError):
    code = "invalid @nest value"


class InvalidPrefixValue(JsonLdError):
    code = "invalid @prefix value"


class InvalidPropagateValue(JsonLdError):
    code = "invalid @propagate value"


class InvalidKeywordAlias(JsonLdError):
    code = "invalid keyword alias"


class InvalidProtectedValue(JsonLdError):
    code = "invalid @protected value"


# --- expansion errors ----------------------------------------------------

class InvalidIdValue(JsonLdError):
    code = "invalid @id value"


class InvalidTypeValue(JsonLdError):
    code = "invalid type value"


class InvalidValueObject(JsonLdError):
    code = "invalid value object"


class InvalidValueObjectValue(JsonLdError):
    code = "invalid value object value"


class InvalidLanguageTaggedString(JsonLdError):
    code = "invalid language-tagged string"


class InvalidLanguageTaggedValue(JsonLdError):
    code = "invalid language-tagged value"


class InvalidTypedValue(JsonLdError):
    code = "invalid typed value"


class InvalidIndexValue(JsonLdError):
    code = "invalid @index value"


class InvalidSetOrListObject(JsonLdError):
    code = "invalid set or list object"


class InvalidLanguageMapValue(JsonLdError):
    code = "invalid language map value"


class InvalidReversePropertyMap(JsonLdError):
    code = "invalid reverse property map"


class InvalidReversePropertyValue(JsonLdError):
    code = "invalid reverse property value"


class InvalidReverseValue(JsonLdError):
    code = "invalid @reverse value"


class CollidingKeywords(JsonLdError):
    code = "colliding keywords"


class InvalidBaseDirectionValue(JsonLdError):
    code = "invalid base direction"


class InvalidLanguageValue(JsonLdError):
    code = "invalid language value"


# --- flatten / toRdf ------------------------------------------------------

class ConflictingIndexes(JsonLdError):
    # reference: crates/core/src/flattening/node_map.rs:179-206
    code = "conflicting indexes"


class InvalidForbiddenValue(JsonLdError):
    code = "invalid forbidden value"
