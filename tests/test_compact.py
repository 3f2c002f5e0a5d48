"""Compaction tests (reference tests/compact.rs harness model). The
primary correctness criterion is the round-trip law the reference's
golden suite implies: expand(compact(expand(doc), ctx)) == expand(doc).
"""

import pytest

from json_ld_spark import JsonLdOptions, compact, expand
from json_ld_spark.compare import expanded_equals


def roundtrip(doc, ctx, **opts):
    options = JsonLdOptions(**opts) if opts else None
    expanded = expand(doc, options)
    compacted = compact(doc, ctx, options)
    re_expanded = expand(compacted, options)
    assert expanded_equals(re_expanded, expanded), (
        f"\ncompacted: {compacted}\nre-expanded: {re_expanded}\nwant: {expanded}"
    )
    return compacted


def test_simple_term_compaction():
    ctx = {"name": "http://schema.org/name"}
    out = roundtrip(
        {"@id": "http://n/1", "http://schema.org/name": "Alice"}, ctx
    )
    assert out == {"@context": ctx, "@id": "http://n/1", "name": "Alice"}


def test_prefix_compaction():
    ctx = {"schema": "http://schema.org/"}
    out = roundtrip(
        {"@id": "http://n/1", "http://schema.org/name": "Alice"}, ctx
    )
    assert out["schema:name"] == "Alice"


def test_vocab_compaction():
    ctx = {"@vocab": "http://v/"}
    out = roundtrip({"@id": "http://n/1", "http://v/p": 5}, ctx)
    assert out["p"] == 5


def test_type_coercion_id():
    ctx = {"knows": {"@id": "http://s/knows", "@type": "@id"}}
    out = roundtrip(
        {"@id": "http://n/1", "http://s/knows": {"@id": "http://n/2"}}, ctx
    )
    assert out["knows"] == "http://n/2"


def test_typed_literal_compaction():
    ctx = {
        "age": {
            "@id": "http://s/age",
            "@type": "http://www.w3.org/2001/XMLSchema#integer",
        }
    }
    out = roundtrip(
        {
            "@id": "http://n/1",
            "http://s/age": {
                "@value": 30,
                "@type": "http://www.w3.org/2001/XMLSchema#integer",
            },
        },
        ctx,
    )
    assert out["age"] == 30


def test_language_map_reconstruction():
    ctx = {"label": {"@id": "http://s/label", "@container": "@language"}}
    out = roundtrip(
        {
            "@id": "http://n/1",
            "http://s/label": [
                {"@value": "hi", "@language": "en"},
                {"@value": "hallo", "@language": "de"},
            ],
        },
        ctx,
    )
    assert out["label"] == {"en": "hi", "de": "hallo"}


def test_list_container():
    ctx = {"seq": {"@id": "http://s/seq", "@container": "@list"}}
    out = roundtrip(
        {
            "@id": "http://n/1",
            "http://s/seq": {"@list": [{"@value": 1}, {"@value": 2}]},
        },
        ctx,
    )
    assert out["seq"] == [1, 2]


def test_explicit_list_without_container():
    out = roundtrip(
        {
            "@id": "http://n/1",
            "http://s/p": {"@list": [{"@value": 1}]},
        },
        {"p": "http://s/p"},
    )
    assert out["p"] == {"@list": [1]}


def test_index_map():
    ctx = {"p": {"@id": "http://s/p", "@container": "@index"}}
    out = roundtrip(
        {
            "@id": "http://n/1",
            "http://s/p": [
                {"@value": "a", "@index": "i1"},
                {"@value": "b", "@index": "i2"},
            ],
        },
        ctx,
    )
    assert out["p"] == {"i1": "a", "i2": "b"}


def test_reverse_property_compaction():
    ctx = {"children": {"@reverse": "http://s/parent"}}
    out = roundtrip(
        {
            "@id": "http://n/dad",
            "@reverse": {"http://s/parent": [{"@id": "http://n/kid"}]},
        },
        ctx,
    )
    # no @type:@id coercion on the reverse term → node reference stays a map
    assert out["children"] == {"@id": "http://n/kid"}


def test_keyword_aliases():
    ctx = {"id": "@id", "type": "@type"}
    out = roundtrip(
        {"@id": "http://n/1", "@type": ["http://t/T"]},
        ctx,
    )
    assert out["id"] == "http://n/1" and out["type"] == "http://t/T"


def test_compact_arrays_false():
    out = compact(
        {"@id": "http://n/1", "http://s/p": "x"},
        {"p": "http://s/p"},
        JsonLdOptions(compact_arrays=False),
    )
    # compactArrays=false keeps the top-level array → wrapped under @graph
    node = out["@graph"][0]
    assert node["p"] == ["x"]


def test_base_relative_compaction():
    out = roundtrip(
        {"@id": "http://ex.com/dir/doc", "http://s/p": {"@id": "http://ex.com/dir/other"}},
        {"p": {"@id": "http://s/p", "@type": "@id"}},
        base="http://ex.com/dir/",
    )
    assert out["@id"] == "doc" and out["p"] == "other"


def test_set_container_keeps_array():
    ctx = {"tags": {"@id": "http://s/tag", "@container": "@set"}}
    out = roundtrip(
        {"@id": "http://n/1", "http://s/tag": [{"@value": "a"}]},
        ctx,
    )
    assert out["tags"] == ["a"]


def test_multiple_values_stay_array():
    out = roundtrip(
        {"@id": "http://n/1", "http://s/p": [{"@value": "a"}, {"@value": "b"}]},
        {"p": "http://s/p"},
    )
    assert sorted(out["p"]) == ["a", "b"]


def test_graph_roundtrip():
    roundtrip(
        {
            "@id": "http://g/1",
            "@graph": [{"@id": "http://n/a", "http://s/p": "x"}],
        },
        {"p": "http://s/p"},
    )


def test_nested_node_roundtrip():
    roundtrip(
        {
            "@id": "http://n/1",
            "http://s/p": {"@id": "http://n/2", "http://s/q": "deep"},
        },
        {"@vocab": "http://s/"},
    )


def test_json_literal_roundtrip():
    roundtrip(
        {
            "@id": "http://n/1",
            "http://s/p": {"@value": {"a": [1, 2]}, "@type": "@json"},
        },
        {"p": {"@id": "http://s/p", "@type": "@json"}},
    )


def test_shortest_term_wins():
    ctx = {"longname": "http://s/p", "p": "http://s/p"}
    out = roundtrip({"@id": "http://n/1", "http://s/p": "x"}, ctx)
    assert "p" in out and "longname" not in out


def test_compact_graph_object_without_graph_container():
    """Graph objects under a term with NO usable @graph container keep
    graph-ness explicit: {alias(@graph): ..., @id?, @index?}
    (reference property.rs:235-297)."""
    from json_ld_spark.api import compact, expand

    ctx = {"@vocab": "http://ex/"}
    expanded = [{"http://ex/claims": [
        {"@graph": [{"http://ex/a": [{"@value": "b"}]}], "@index": "i1"}
    ]}]
    c = compact(expanded, ctx)
    assert c["claims"] == {"@graph": {"a": "b"}, "@index": "i1"}
    # plain term → roundtrips through expansion
    assert expand(c) == expanded


def test_compact_named_graph_object_wrapped_with_id():
    from json_ld_spark.api import compact, expand

    ctx = {"@vocab": "http://ex/"}
    expanded = [{"http://ex/claims": [
        {"@id": "http://g/1", "@graph": [{"http://ex/a": [{"@value": "b"}]}]}
    ]}]
    c = compact(expanded, ctx)
    assert c["claims"]["@id"] == "http://g/1"
    assert c["claims"]["@graph"] == {"a": "b"}
    assert expand(c) == expanded


def test_compact_graph_id_container_requires_simple_check():
    """@graph@index container only maps SIMPLE graphs into the index map;
    a named graph under it takes the wrap path (property.rs:169-235)."""
    from json_ld_spark.api import compact, expand

    ctx = {"@vocab": "http://ex/",
           "claims": {"@id": "http://ex/claims", "@container": ["@graph", "@index"]}}
    expanded = [{"http://ex/claims": [
        {"@id": "http://g/1", "@graph": [{"http://ex/a": [{"@value": "b"}]}]}
    ]}]
    c = compact(expanded, ctx)
    # the single inner graph entry UNWRAPS: the collection-unwrap guard
    # looks at @list/@set containers and the @graph/@set ACTIVE PROPERTY
    # (here "claims"), not the term's @graph container
    # (lib.rs:485-505; round-1 asserted the opposite and was wrong)
    assert c["claims"] == {"@graph": {"a": "b"}, "@id": "http://g/1"}
