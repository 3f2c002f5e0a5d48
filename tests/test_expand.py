"""Expansion golden tests, modeled on the reference's W3C-suite harness
(/root/reference/tests/expand.rs) — one case per coverage bucket from
FIXTURES.md §2. Comparison is expanded-form set equality
(order-insensitive), like crates/core/src/document/expanded.rs:294-301.
"""

import pytest

from json_ld_spark import JsonLdOptions, expand
from json_ld_spark import errors as E
from json_ld_spark.compare import expanded_equals
from json_ld_spark.context import dict_loader


def check(doc, expected, **opts):
    got = expand(doc, JsonLdOptions(**opts) if opts else None)
    assert expanded_equals(got, expected), f"\n got: {got}\nwant: {expected}"


def test_plain_node_typed_values():
    check(
        {
            "@context": {
                "ex": "http://example.org/",
                "age": {"@id": "http://example.org/age", "@type": "http://www.w3.org/2001/XMLSchema#integer"},
            },
            "@id": "ex:node",
            "ex:name": "n",
            "age": 5,
        },
        [
            {
                "@id": "http://example.org/node",
                "http://example.org/name": [{"@value": "n"}],
                "http://example.org/age": [
                    {"@value": 5, "@type": "http://www.w3.org/2001/XMLSchema#integer"}
                ],
            }
        ],
    )


def test_relative_iri_resolution():
    check(
        {"@id": "child", "http://ex.org/p": {"@id": "../sibling"}},
        [
            {
                "@id": "http://example.com/dir/child",
                "http://ex.org/p": [{"@id": "http://example.com/sibling"}],
            }
        ],
        base="http://example.com/dir/doc",
    )


def test_vocab_vs_id_expansion():
    check(
        {
            "@context": {"@vocab": "http://vocab/", "@base": "http://base/"},
            "@id": "x",
            "@type": "T",
            "p": {"@id": "y"},
        },
        [
            {
                "@id": "http://base/x",
                "@type": ["http://vocab/T"],
                "http://vocab/p": [{"@id": "http://base/y"}],
            }
        ],
    )


def test_type_array_and_type_scoped_context():
    check(
        {
            "@context": {
                "@vocab": "http://v/",
                "B": {"@id": "http://v/B", "@context": {"p": "http://scoped/p"}},
                "A": "http://v/A",
            },
            "@type": ["B", "A"],
            "p": "val",
            "@id": "http://n/1",
        },
        [
            {
                "@id": "http://n/1",
                "@type": ["http://v/B", "http://v/A"],
                "http://scoped/p": [{"@value": "val"}],
            }
        ],
    )


def test_language_map():
    check(
        {
            "@context": {
                "label": {"@id": "http://ex/label", "@container": "@language"}
            },
            "@id": "http://n/1",
            "label": {"en": "hi", "de": ["hallo", "tag"], "@none": "plain"},
        },
        [
            {
                "@id": "http://n/1",
                "http://ex/label": [
                    {"@value": "hi", "@language": "en"},
                    {"@value": "hallo", "@language": "de"},
                    {"@value": "tag", "@language": "de"},
                    {"@value": "plain"},
                ],
            }
        ],
    )


def test_index_map():
    check(
        {
            "@context": {"p": {"@id": "http://ex/p", "@container": "@index"}},
            "@id": "http://n/1",
            "p": {"i1": "a", "i2": ["b", "c"]},
        },
        [
            {
                "@id": "http://n/1",
                "http://ex/p": [
                    {"@value": "a", "@index": "i1"},
                    {"@value": "b", "@index": "i2"},
                    {"@value": "c", "@index": "i2"},
                ],
            }
        ],
    )


def test_id_map():
    check(
        {
            "@context": {
                "@vocab": "http://v/",
                "p": {"@id": "http://ex/p", "@container": "@id"},
            },
            "p": {"http://n/a": {"label": "A"}, "http://n/b": {"label": "B"}},
            "@id": "http://n/root",
        },
        [
            {
                "@id": "http://n/root",
                "http://ex/p": [
                    {"@id": "http://n/a", "http://v/label": [{"@value": "A"}]},
                    {"@id": "http://n/b", "http://v/label": [{"@value": "B"}]},
                ],
            }
        ],
    )


def test_type_map():
    check(
        {
            "@context": {
                "@vocab": "http://v/",
                "p": {"@id": "http://ex/p", "@container": "@type"},
            },
            "@id": "http://n/root",
            "p": {"http://t/A": {"@id": "http://n/a"}},
        },
        [
            {
                "@id": "http://n/root",
                "http://ex/p": [{"@id": "http://n/a", "@type": ["http://t/A"]}],
            }
        ],
    )


def test_list_and_nested_and_empty():
    check(
        {
            "@context": {"p": {"@id": "http://ex/p", "@container": "@list"}},
            "@id": "http://n/1",
            "p": [1, 2],
            "http://ex/q": {"@list": []},
            "http://ex/r": {"@list": [["a", "b"]]},
        },
        [
            {
                "@id": "http://n/1",
                "http://ex/p": [{"@list": [{"@value": 1}, {"@value": 2}]}],
                "http://ex/q": [{"@list": []}],
                # raw nested arrays inside an explicit @list flatten unless
                # the property has a @list container (reference
                # expansion/src/array.rs:9-68 extends results)
                "http://ex/r": [{"@list": [{"@value": "a"}, {"@value": "b"}]}],
            }
        ],
    )


def test_set_unwrap():
    check(
        {"@id": "http://n/1", "http://ex/p": {"@set": ["a", "b"]}},
        [
            {
                "@id": "http://n/1",
                "http://ex/p": [{"@value": "a"}, {"@value": "b"}],
            }
        ],
    )


def test_reverse_property():
    check(
        {
            "@context": {
                "children": {"@reverse": "http://ex/parent"},
            },
            "@id": "http://n/dad",
            "children": [{"@id": "http://n/kid"}],
        },
        [
            {
                "@id": "http://n/dad",
                "@reverse": {"http://ex/parent": [{"@id": "http://n/kid"}]},
            }
        ],
    )


def test_reverse_keyword():
    check(
        {
            "@id": "http://n/dad",
            "@reverse": {"http://ex/parent": {"@id": "http://n/kid"}},
        },
        [
            {
                "@id": "http://n/dad",
                "@reverse": {"http://ex/parent": [{"@id": "http://n/kid"}]},
            }
        ],
    )


def test_nest():
    check(
        {
            "@context": {
                "@vocab": "http://v/",
                "meta": "@nest",
            },
            "@id": "http://n/1",
            "meta": {"p": "v", "q": "w"},
        },
        [
            {
                "@id": "http://n/1",
                "http://v/p": [{"@value": "v"}],
                "http://v/q": [{"@value": "w"}],
            }
        ],
    )


def test_named_graph_and_graph_container():
    check(
        {
            "@context": {
                "@vocab": "http://v/",
                "claims": {"@id": "http://v/claims", "@container": "@graph"},
            },
            "@id": "http://n/g1",
            "@graph": [{"@id": "http://n/a", "p": "x"}],
            "claims": {"p": "y"},
        },
        [
            {
                "@id": "http://n/g1",
                "@graph": [
                    {"@id": "http://n/a", "http://v/p": [{"@value": "x"}]}
                ],
                "http://v/claims": [
                    {"@graph": [{"http://v/p": [{"@value": "y"}]}]}
                ],
            }
        ],
    )


def test_included():
    check(
        {
            "@context": {"@vocab": "http://v/"},
            "@id": "http://n/1",
            "p": "v",
            "@included": [{"@id": "http://n/2", "p": "w"}],
        },
        [
            {
                "@id": "http://n/1",
                "http://v/p": [{"@value": "v"}],
                "@included": [
                    {"@id": "http://n/2", "http://v/p": [{"@value": "w"}]}
                ],
            }
        ],
    )


def test_json_literal():
    check(
        {
            "@context": {"p": {"@id": "http://ex/p", "@type": "@json"}},
            "@id": "http://n/1",
            "p": {"b": [1, 2.5], "a": None},
        },
        [
            {
                "@id": "http://n/1",
                "http://ex/p": [
                    {"@value": {"b": [1, 2.5], "a": None}, "@type": "@json"}
                ],
            }
        ],
    )


def test_language_and_direction():
    check(
        {
            "@context": {"@language": "en", "@direction": "rtl"},
            "@id": "http://n/1",
            "http://ex/p": "hello",
            "http://ex/q": {"@value": "x", "@language": "ar-EG", "@direction": "ltr"},
        },
        [
            {
                "@id": "http://n/1",
                "http://ex/p": [
                    {"@value": "hello", "@language": "en", "@direction": "rtl"}
                ],
                "http://ex/q": [
                    {"@value": "x", "@language": "ar-EG", "@direction": "ltr"}
                ],
            }
        ],
    )


def test_anonymous_and_shared_bnodes():
    check(
        {
            "@id": "_:shared",
            "http://ex/p": [{"http://ex/q": "inner"}, {"@id": "_:shared2"}],
        },
        [
            {
                "@id": "_:shared",
                "http://ex/p": [
                    {"http://ex/q": [{"@value": "inner"}]},
                    {"@id": "_:shared2"},
                ],
            }
        ],
    )


def test_free_floating_values_dropped():
    check(
        [
            "scalar",
            {"@value": "free"},
            {"@list": ["x"]},
            {"@id": "http://n/1", "http://ex/p": "kept"},
            {"@id": "http://n/orphan"},
        ],
        [{"@id": "http://n/1", "http://ex/p": [{"@value": "kept"}]}],
    )


def test_scoped_property_context():
    check(
        {
            "@context": {
                "@vocab": "http://v/",
                "p": {"@id": "http://v/p", "@context": {"q": "http://inner/q"}},
            },
            "@id": "http://n/1",
            "p": {"q": "deep"},
        },
        [
            {
                "@id": "http://n/1",
                "http://v/p": [{"http://inner/q": [{"@value": "deep"}]}],
            }
        ],
    )


def test_propagate_false_reverts():
    # a type-scoped context does not propagate to nested nodes by default
    check(
        {
            "@context": {
                "@vocab": "http://v/",
                "T": {"@id": "http://v/T", "@context": {"p": "http://scoped/p"}},
            },
            "@type": "T",
            "@id": "http://n/1",
            "p": {"@id": "http://n/2", "p": "inner"},
        },
        [
            {
                "@id": "http://n/1",
                "@type": ["http://v/T"],
                "http://scoped/p": [
                    {
                        "@id": "http://n/2",
                        "http://v/p": [{"@value": "inner"}],
                    }
                ],
            }
        ],
    )


def test_protected_term_redefinition_rejected():
    with pytest.raises(E.ProtectedTermRedefinition):
        expand(
            {
                "@context": [
                    {"@protected": True, "p": "http://a/p"},
                    {"p": "http://b/p"},
                ],
                "p": "x",
            }
        )


def test_protected_term_same_redefinition_ok():
    check(
        {
            "@context": [
                {"@protected": True, "p": "http://a/p"},
                {"p": "http://a/p"},
            ],
            "@id": "http://n/1",
            "p": "x",
        },
        [{"@id": "http://n/1", "http://a/p": [{"@value": "x"}]}],
    )


def test_remote_context_loader():
    loader = dict_loader(
        {
            "http://ctx.example/v1": {
                "@context": {"name": "http://schema.org/name"}
            }
        }
    )
    check(
        {
            "@context": "http://ctx.example/v1",
            "@id": "http://n/1",
            "name": "Alice",
        },
        [{"@id": "http://n/1", "http://schema.org/name": [{"@value": "Alice"}]}],
        loader=loader,
    )


def test_import_context():
    loader = dict_loader(
        {
            "http://ctx.example/base": {
                "@context": {"name": "http://schema.org/name", "x": "http://a/x"}
            }
        }
    )
    check(
        {
            "@context": {"@import": "http://ctx.example/base", "x": "http://b/x"},
            "@id": "http://n/1",
            "name": "A",
            "x": "y",
        },
        [
            {
                "@id": "http://n/1",
                "http://schema.org/name": [{"@value": "A"}],
                "http://b/x": [{"@value": "y"}],
            }
        ],
        loader=loader,
    )


def test_recursive_context_overflow():
    loader = dict_loader(
        {
            "http://ctx/a": {"@context": ["http://ctx/b"]},
            "http://ctx/b": {"@context": ["http://ctx/a"]},
        }
    )
    with pytest.raises(E.ContextOverflow):
        expand({"@context": "http://ctx/a", "http://p/x": 1}, JsonLdOptions(loader=loader))


def test_invalid_keys_dropped_with_policy():
    doc = {"@id": "http://n/1", "invalid": "dropped", "http://ex/p": "kept"}
    check(doc, [{"@id": "http://n/1", "http://ex/p": [{"@value": "kept"}]}])
    with pytest.raises(E.InvalidIriMapping):
        expand(doc, JsonLdOptions(policy="reject"))


def test_null_drops():
    check(
        {
            "@context": {"dropped": None, "p": "http://ex/p"},
            "@id": "http://n/1",
            "dropped": "gone",
            "p": None,
            "http://ex/q": {"@value": None},
        },
        # after all entries drop, the lone-@id node is itself dropped at
        # the top level (expansion step 19)
        [],
    )


def test_colliding_keywords():
    with pytest.raises(E.CollidingKeywords):
        expand(
            {
                "@context": {"id": "@id"},
                "id": "http://n/1",
                "@id": "http://n/2",
                "http://ex/p": "x",
            }
        )


def test_invalid_value_object():
    with pytest.raises(E.InvalidValueObject):
        expand({"http://ex/p": {"@value": "x", "@language": "en", "@type": "http://t"}})


def test_invalid_language_tagged_value():
    with pytest.raises(E.InvalidLanguageTaggedValue):
        expand({"http://ex/p": {"@value": 5, "@language": "en"}})


def test_keyword_like_terms_ignored():
    check(
        {
            "@context": {"@ignoreMe": "http://x/"},
            "@id": "http://n/1",
            "@ignoreMe": "gone",
            "http://ex/p": "kept",
        },
        [{"@id": "http://n/1", "http://ex/p": [{"@value": "kept"}]}],
    )


def test_prefix_expansion_and_term_roundtrip():
    check(
        {
            "@context": {
                "ex": "http://example.org/",
                "ex:prop": {"@type": "@id"},
            },
            "@id": "ex:n",
            "ex:prop": "http://target/",
        },
        [
            {
                "@id": "http://example.org/n",
                "http://example.org/prop": [{"@id": "http://target/"}],
            }
        ],
    )


def test_expand_context_option():
    check(
        {"@id": "http://n/1", "name": "A"},
        [{"@id": "http://n/1", "http://schema.org/name": [{"@value": "A"}]}],
        expand_context={"@context": {"name": "http://schema.org/name"}},
    )


def test_graph_keyword_top_level_unwrapped():
    check(
        {"@graph": [{"@id": "http://n/1", "http://ex/p": "x"}]},
        [{"@id": "http://n/1", "http://ex/p": [{"@value": "x"}]}],
    )


def test_double_reverse():
    # @reverse inside @reverse flips back to a forward property
    check(
        {
            "@context": {
                "rev": {"@reverse": "http://ex/p"},
            },
            "@id": "http://n/1",
            "@reverse": {"http://ex/q": {"@id": "http://n/2", "rev": {"@id": "http://n/3"}}},
        },
        [
            {
                "@id": "http://n/1",
                "@reverse": {
                    "http://ex/q": [
                        {
                            "@id": "http://n/2",
                            "@reverse": {"http://ex/p": [{"@id": "http://n/3"}]},
                        }
                    ]
                },
            }
        ],
    )


def test_policy_vocab_and_allow_undefined():
    """Reference expansion Policy parity (expansion/src/options.rs:53-63,
    CLI --no-vocab / --no-undef)."""
    import pytest

    from json_ld_spark import errors as E
    from json_ld_spark.api import expand
    from json_ld_spark.options import JsonLdOptions

    doc = {"@context": {"@vocab": "http://v/", "t": "http://t/t"},
           "name": "x", "t": "y", "@type": "Thing"}

    # keep (default): vocab concat applies
    out = expand(doc)
    assert "http://v/name" in out[0] and out[0]["@type"] == ["http://v/Thing"]

    # drop: vocab-mapped keys and types vanish; defined terms survive
    out = expand(doc, JsonLdOptions(policy_vocab="drop"))
    assert out == [{"http://t/t": [{"@value": "y"}]}]

    # reject: ForbiddenVocab
    with pytest.raises(E.ForbiddenVocab):
        expand(doc, JsonLdOptions(policy_vocab="reject"))
    # a document not touching @vocab passes under reject
    ok = expand({"@context": {"t": "http://t/t"}, "t": "y"},
                JsonLdOptions(policy_vocab="reject"))
    assert ok == [{"http://t/t": [{"@value": "y"}]}]

    # allow_undefined=False: dropped keys become errors
    und = {"@context": {"t": "http://t/t"}, "t": "y", "undefined_key": 1}
    assert expand(und) == [{"http://t/t": [{"@value": "y"}]}]
    with pytest.raises(E.KeyExpansionFailed):
        expand(und, JsonLdOptions(allow_undefined=False))

    # drop + allow_undefined=False: the dropped vocab key errors
    # (reference flow: Ok(None) then the undefined check fires)
    with pytest.raises(E.KeyExpansionFailed):
        expand(doc, JsonLdOptions(policy_vocab="drop", allow_undefined=False))


def test_cli_no_vocab_no_undef(tmp_path, capsys):
    import json

    import pytest

    from json_ld_spark.__main__ import main

    p = tmp_path / "d.json"
    p.write_text(json.dumps({"@context": {"@vocab": "http://v/"}, "k": 1}))
    rc = main(["expand", str(p)])
    assert rc == 0 and "http://v/k" in capsys.readouterr().out

    from json_ld_spark import errors as E
    with pytest.raises(E.ForbiddenVocab):
        main(["expand", str(p), "--no-vocab"])

    p2 = tmp_path / "u.json"
    p2.write_text(json.dumps({"undefined": 1, "@id": "http://n/1",
                              "@type": "http://t/T"}))
    with pytest.raises(E.KeyExpansionFailed):
        main(["expand", str(p2), "--no-undef"])
