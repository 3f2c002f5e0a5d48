"""JSON-LD 1.1 Framing (frame.py) — beyond-reference surface.

Cases follow the W3C json-ld11-framing spec examples; the reference
workspace has no framing crate, so parity is against the REC itself.
"""

from __future__ import annotations

import json

import pytest

from json_ld_spark.frame import frame, frame_expanded
from json_ld_spark.options import JsonLdOptions

CTX = {"@vocab": "http://example.org/"}

LIBRARY = {
    "@context": CTX,
    "@graph": [
        {"@id": "http://example.org/library", "@type": "Library",
         "contains": {"@id": "http://example.org/library/the-republic"}},
        {"@id": "http://example.org/library/the-republic", "@type": "Book",
         "creator": "Plato", "title": "The Republic",
         "contains": {"@id": "http://example.org/library/the-republic#introduction"}},
        {"@id": "http://example.org/library/the-republic#introduction",
         "@type": "Chapter",
         "description": "An introductory chapter on The Republic.",
         "title": "The Introduction"},
    ],
}


def test_library_example_nested_embedding():
    out = frame(LIBRARY, {
        "@context": CTX,
        "@type": "Library",
        "contains": {"@type": "Book", "contains": {"@type": "Chapter"}},
    })
    assert out["@type"] == "Library"
    book = out["contains"]
    assert book["@type"] == "Book" and book["creator"] == "Plato"
    chapter = book["contains"]
    assert chapter["@type"] == "Chapter"
    assert chapter["title"] == "The Introduction"


def test_empty_frame_is_wildcard():
    out = frame(LIBRARY, {"@context": CTX})
    # all three nodes match; with @once embedding they nest under the
    # root, so the output collapses to the single top object
    assert out["@type"] == "Library"
    assert out["contains"]["@type"] == "Book"


def test_id_match():
    out = frame(LIBRARY, {
        "@context": CTX, "@id": "http://example.org/library/the-republic"})
    assert out["@id"] == "http://example.org/library/the-republic"
    assert out["@type"] == "Book"


def test_id_set_match():
    out = frame(LIBRARY, {
        "@context": CTX,
        "@id": ["http://example.org/library",
                "http://example.org/library/the-republic"],
    })
    ids = {o["@id"] for o in out["@graph"]} if "@graph" in out else {out["@id"]}
    assert "http://example.org/library" in ids


def test_type_wildcard_and_match_none():
    untyped = {
        "@context": CTX,
        "@graph": [
            {"@id": "http://example.org/a", "@type": "T", "p": "x"},
            {"@id": "http://example.org/b", "p": "y"},
        ],
    }
    any_typed = frame(untyped, {"@context": CTX, "@type": {}})
    assert any_typed["@id"] == "http://example.org/a"
    untyped_only = frame(untyped, {"@context": CTX, "@type": []})
    assert untyped_only["@id"] == "http://example.org/b"


def test_property_presence_match():
    out = frame(LIBRARY, {"@context": CTX, "creator": {}})
    assert out["@id"] == "http://example.org/library/the-republic"


def test_value_pattern_match():
    out = frame(LIBRARY, {"@context": CTX, "creator": {"@value": "Plato"}})
    assert out["@id"] == "http://example.org/library/the-republic"
    none = frame(LIBRARY, {"@context": CTX, "creator": {"@value": "Homer"}})
    assert none.get("@graph", []) == [] and "creator" not in none


def test_require_all():
    doc = {
        "@context": CTX,
        "@graph": [
            {"@id": "http://example.org/1", "@type": "T", "a": "1"},
            {"@id": "http://example.org/2", "@type": "T"},
            {"@id": "http://example.org/3", "a": "3"},
        ],
    }
    # match-any: all three nodes match (type OR property)
    any_out = frame(doc, {"@context": CTX, "@type": "T", "a": {}})
    assert len(any_out["@graph"]) == 3
    # requireAll: only the node with both
    all_out = frame(doc, {"@context": CTX, "@type": "T", "a": {},
                          "@requireAll": True})
    assert all_out["@id"] == "http://example.org/1"


def test_explicit_drops_unlisted_properties():
    # requireAll pins the match to the Book (match-any would also
    # admit the Chapter via its title)
    out = frame(LIBRARY, {
        "@context": CTX, "@type": "Book", "title": {},
        "@explicit": True, "@requireAll": True})
    assert out["title"] == "The Republic"
    assert "creator" not in out
    assert "contains" not in out


def test_default_fill_and_omit_default():
    fr = {"@context": CTX, "@type": "Book",
          "edition": {"@default": "first"}}
    out = frame(LIBRARY, fr)
    assert out["edition"] == "first"
    omitted = frame(LIBRARY, {**fr, "@omitDefault": True})
    assert "edition" not in omitted


def test_default_null():
    out = frame(LIBRARY, {
        "@context": CTX, "@type": "Book", "edition": {"@default": None}})
    assert "edition" in out and out["edition"] is None


def test_embed_never_keeps_refs():
    out = frame(LIBRARY, {
        "@context": CTX, "@type": "Library", "@embed": "@never"})
    assert out["contains"] == {"@id": "http://example.org/library/the-republic"}


def test_embed_always_duplicates():
    doc = {
        "@context": CTX,
        "@graph": [
            {"@id": "http://example.org/p1", "@type": "P",
             "knows": {"@id": "http://example.org/shared"}},
            {"@id": "http://example.org/p2", "@type": "P",
             "knows": {"@id": "http://example.org/shared"}},
            {"@id": "http://example.org/shared", "name": "S"},
        ],
    }
    once = frame(doc, {"@context": CTX, "@type": "P"})
    objs = once["@graph"]
    embedded = [o for o in objs if isinstance(o.get("knows"), dict)
                and "name" in o["knows"]]
    assert len(embedded) == 1  # @once: second occurrence is a ref
    always = frame(doc, {"@context": CTX, "@type": "P", "@embed": "@always"})
    embedded = [o for o in always["@graph"]
                if isinstance(o.get("knows"), dict) and "name" in o["knows"]]
    assert len(embedded) == 2


def test_circular_reference_becomes_ref():
    doc = {
        "@context": CTX,
        "@graph": [
            {"@id": "http://example.org/a", "@type": "T",
             "next": {"@id": "http://example.org/b"}},
            {"@id": "http://example.org/b",
             "next": {"@id": "http://example.org/a"}},
        ],
    }
    out = frame(doc, {"@context": CTX, "@type": "T", "@embed": "@always"})
    assert out["next"]["next"] == {"@id": "http://example.org/a"}


def test_blank_node_pruning():
    doc = {
        "@context": CTX,
        "@type": "T",
        "child": {"name": "anon"},  # blank node referenced once
    }
    out = frame(doc, {"@context": CTX, "@type": "T"})
    assert out["child"]["name"] == "anon"
    assert "@id" not in out["child"]


def test_blank_node_kept_when_shared():
    doc = {
        "@context": CTX,
        "@graph": [
            {"@id": "_:shared", "name": "anon"},
            {"@id": "http://example.org/x", "@type": "T",
             "a": {"@id": "_:shared"}, "b": {"@id": "_:shared"}},
        ],
    }
    out = frame(doc, {"@context": CTX, "@type": "T"})
    # embedded once + referenced again: the id is load-bearing
    ids = [v.get("@id") for v in (out["a"], out["b"])]
    assert any(i for i in ids)


def test_list_values_framed():
    doc = {
        "@context": {"@vocab": "http://example.org/",
                     "items": {"@container": "@list"}},
        "@id": "http://example.org/l", "@type": "T",
        "items": ["a", "b", "c"],
    }
    out = frame(doc, {"@context": {"@vocab": "http://example.org/",
                                   "items": {"@container": "@list"}},
                      "@type": "T"})
    assert out["items"] == ["a", "b", "c"]


def test_omit_graph_false_wraps():
    out = frame(LIBRARY, {"@context": CTX, "@type": "Library"},
                JsonLdOptions(omit_graph=False))
    assert isinstance(out["@graph"], list) and len(out["@graph"]) == 1


def test_frame_expanded_deterministic():
    from json_ld_spark.api import expand

    opts = JsonLdOptions()
    expanded = expand(LIBRARY)
    fr = expand({"@context": CTX, "@type": "Library"},
                opts.with_(frame_expansion=True))
    a = frame_expanded(expanded, fr, opts)
    b = frame_expanded(list(reversed(expanded)), fr, opts)
    assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)


def test_reverse_in_frame_rejected():
    with pytest.raises(Exception, match="@reverse"):
        frame(LIBRARY, {"@context": CTX,
                        "@reverse": {"contains": {"@type": "Library"}}})


def test_language_pattern():
    doc = {
        "@context": CTX,
        "@graph": [
            {"@id": "http://example.org/en", "@type": "T",
             "label": {"@value": "hello", "@language": "en"}},
            {"@id": "http://example.org/de", "@type": "T",
             "label": {"@value": "hallo", "@language": "de"}},
        ],
    }
    out = frame(doc, {
        "@context": CTX,
        "label": {"@value": {}, "@language": "en"},
    })
    assert out["@id"] == "http://example.org/en"


def test_frame_stage_distributed(spark):
    import json as _json

    from json_ld_spark.operators.jsonld import frame_stage

    doc = {
        "@context": {"@vocab": "http://example.org/"},
        "@graph": [
            {"@id": "http://example.org/t1", "@type": "Turn",
             "role": "assistant", "text": "hi",
             "conversation": {"@id": "http://example.org/c1"}},
            {"@id": "http://example.org/c1", "@type": "Conversation",
             "name": "c1"},
        ],
    }
    rows = [("d1", _json.dumps(doc)), ("bad", "{nope")]
    df = spark.createDataFrame(rows, "doc_id string, doc string")
    out = frame_stage(df, {
        "@context": {"@vocab": "http://example.org/"},
        "@type": "Turn",
        "conversation": {"@embed": "@always"},
    })
    got = {r["doc_id"]: r for r in out.collect()}
    assert got["bad"]["error"] is not None
    framed = _json.loads(got["d1"]["framed"])
    assert framed["@type"] == "Turn"
    assert framed["conversation"]["name"] == "c1"
    # determinism across partitionings
    out2 = frame_stage(df.repartition(4), {
        "@context": {"@vocab": "http://example.org/"},
        "@type": "Turn",
        "conversation": {"@embed": "@always"},
    })
    got2 = {r["doc_id"]: r["framed"] for r in out2.collect()}
    assert got2["d1"] == got["d1"]["framed"]


def test_cli_frame(tmp_path, capsys):
    import json as _json

    from json_ld_spark.__main__ import main

    doc_p = tmp_path / "doc.json"
    frame_p = tmp_path / "frame.json"
    doc_p.write_text(_json.dumps(LIBRARY))
    frame_p.write_text(_json.dumps({
        "@context": CTX, "@type": "Library",
        "contains": {"@type": "Book"},
    }))
    assert main(["frame", str(doc_p), "--frame", str(frame_p)]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["@type"] == "Library"
    assert out["contains"]["@type"] == "Book"


def test_frame_stage_shared_context(spark):
    """Docs WITHOUT inline @context expand against the stage-level
    shared context (same contract as expand_stage)."""
    import json as _json

    from json_ld_spark.operators.jsonld import frame_stage

    ctx = {"@vocab": "http://example.org/"}
    doc = {"@id": "http://example.org/n1", "@type": "Thing", "name": "x"}
    df = spark.createDataFrame([("d1", _json.dumps(doc))],
                               "doc_id string, doc string")
    out = frame_stage(df, {"@context": ctx, "@type": "Thing"}, context=ctx)
    framed = _json.loads(out.collect()[0]["framed"])
    assert framed["@type"] == "Thing" and framed["name"] == "x"
