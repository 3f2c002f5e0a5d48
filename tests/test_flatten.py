"""Flattening / node-map tests (reference tests/flatten.rs harness model;
node map semantics from crates/core/src/flattening/node_map.rs)."""

import pytest

from json_ld_spark import expand, flatten
from json_ld_spark import errors as E
from json_ld_spark.compare import expanded_equals
from json_ld_spark.nodemap import (
    BlankGen,
    flatten_expanded,
    generate_node_map,
    merge_node_maps,
)


def test_flatten_merges_duplicate_nodes():
    doc = [
        {"@id": "http://n/1", "http://ex/p": [{"@value": "a"}]},
        {
            "@id": "http://n/1",
            "http://ex/p": [{"@value": "a"}, {"@value": "b"}],
            "@type": ["http://t/T"],
        },
    ]
    flat = flatten_expanded(doc, ordered=True)
    assert flat == [
        {
            "@id": "http://n/1",
            "http://ex/p": [{"@value": "a"}, {"@value": "b"}],
            "@type": ["http://t/T"],
        }
    ]


def test_flatten_assigns_bnode_labels_deterministically():
    doc = [
        {"http://ex/p": [{"http://ex/q": [{"@value": "x"}]}]},
    ]
    flat = flatten_expanded(doc, ordered=True)
    # two anonymous nodes -> b0 (parent), b1 (child), sorted by id
    assert flat == [
        {"@id": "_:b0", "http://ex/p": [{"@id": "_:b1"}]},
        {"@id": "_:b1", "http://ex/q": [{"@value": "x"}]},
    ]


def test_flatten_relabels_existing_bnodes():
    doc = [
        {"@id": "_:z", "http://ex/p": [{"@id": "_:z"}]},
    ]
    flat = flatten_expanded(doc, ordered=True)
    assert flat == [{"@id": "_:b0", "http://ex/p": [{"@id": "_:b0"}]}]


def test_named_graphs_become_graph_nodes():
    doc = [
        {
            "@id": "http://g/1",
            "@graph": [{"@id": "http://n/a", "http://ex/p": [{"@value": 1}]}],
            "http://ex/meta": [{"@value": "m"}],
        }
    ]
    flat = flatten_expanded(doc, ordered=True)
    assert flat == [
        {
            "@id": "http://g/1",
            "http://ex/meta": [{"@value": "m"}],
            "@graph": [{"@id": "http://n/a", "http://ex/p": [{"@value": 1}]}],
        }
    ]


def test_reverse_properties_inverted():
    doc = expand(
        {
            "@id": "http://n/dad",
            "@reverse": {"http://ex/parent": {"@id": "http://n/kid"}},
        }
    )
    flat = flatten_expanded(doc, ordered=True)
    assert flat == [
        {"@id": "http://n/kid", "http://ex/parent": [{"@id": "http://n/dad"}]},
    ]


def test_conflicting_indexes():
    doc = [
        {"@id": "http://n/1", "@index": "a", "http://ex/p": [{"@value": 1}]},
        {"@id": "http://n/1", "@index": "b", "http://ex/q": [{"@value": 2}]},
    ]
    with pytest.raises(E.ConflictingIndexes):
        flatten_expanded(doc)


def test_included_nodes_lifted():
    doc = expand(
        {
            "@context": {"@vocab": "http://v/"},
            "@id": "http://n/1",
            "p": "v",
            "@included": [{"@id": "http://n/2", "p": "w"}],
        }
    )
    flat = flatten_expanded(doc, ordered=True)
    assert flat == [
        {"@id": "http://n/1", "http://v/p": [{"@value": "v"}]},
        {"@id": "http://n/2", "http://v/p": [{"@value": "w"}]},
    ]


def test_list_preserved_in_node_map():
    doc = expand(
        {
            "@id": "http://n/1",
            "http://ex/p": {"@list": [{"@id": "http://n/2", "http://ex/q": "x"}, "lit"]},
        }
    )
    flat = flatten_expanded(doc, ordered=True)
    assert flat == [
        {
            "@id": "http://n/1",
            "http://ex/p": [
                {"@list": [{"@id": "http://n/2"}, {"@value": "lit"}]}
            ],
        },
        {"@id": "http://n/2", "http://ex/q": [{"@value": "x"}]},
    ]


def test_merge_node_maps_unions_graphs():
    doc = [
        {"@id": "http://n/1", "http://ex/p": [{"@value": "default"}]},
        {
            "@id": "http://g/1",
            "@graph": [
                {"@id": "http://n/1", "http://ex/p": [{"@value": "named"}]}
            ],
        },
    ]
    nm = generate_node_map(doc, BlankGen())
    merged = merge_node_maps(nm)
    node = merged["http://n/1"]
    values = sorted(v["@value"] for v in node["http://ex/p"])
    assert values == ["default", "named"]


def test_dedup_on_identical_values():
    doc = [
        {"@id": "http://n/1", "http://ex/p": [{"@value": "a"}, {"@value": "a"}]},
    ]
    flat = flatten_expanded(doc)
    assert flat[0]["http://ex/p"] == [{"@value": "a"}]


def test_flatten_via_api():
    out = flatten(
        {
            "@context": {"@vocab": "http://v/"},
            "@id": "http://n/1",
            "p": {"q": "deep"},
        }
    )
    assert expanded_equals(
        out,
        [
            {"@id": "_:b0", "http://v/q": [{"@value": "deep"}]},
            {"@id": "http://n/1", "http://v/p": [{"@id": "_:b0"}]},
        ],
    )
