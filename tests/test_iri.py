from json_ld_spark.iri import (
    is_absolute_iri,
    is_blank_node_id,
    remove_dot_segments,
    resolve_iri,
)


def test_is_absolute():
    assert is_absolute_iri("http://example.com/a")
    assert is_absolute_iri("urn:uuid:1234")
    assert is_absolute_iri("tag:example,2024:x")
    assert is_absolute_iri("ex:")
    assert not is_absolute_iri("relative/path")
    assert not is_absolute_iri("/abs/path")
    assert not is_absolute_iri("#frag")
    assert not is_absolute_iri("has space:x")


def test_blank():
    assert is_blank_node_id("_:b0")
    assert not is_blank_node_id("b0")


def test_remove_dot_segments():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"


BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 normal examples
RFC_CASES = {
    "g": "http://a/b/c/g",
    "./g": "http://a/b/c/g",
    "g/": "http://a/b/c/g/",
    "/g": "http://a/g",
    "//g": "http://g",
    "?y": "http://a/b/c/d;p?y",
    "g?y": "http://a/b/c/g?y",
    "#s": "http://a/b/c/d;p?q#s",
    "g#s": "http://a/b/c/g#s",
    ";x": "http://a/b/c/;x",
    "g;x": "http://a/b/c/g;x",
    "": "http://a/b/c/d;p?q",
    ".": "http://a/b/c/",
    "./": "http://a/b/c/",
    "..": "http://a/b/",
    "../": "http://a/b/",
    "../g": "http://a/b/g",
    "../..": "http://a/",
    "../../": "http://a/",
    "../../g": "http://a/g",
    # abnormal
    "../../../g": "http://a/g",
    "../../../../g": "http://a/g",
    "/./g": "http://a/g",
    "/../g": "http://a/g",
    "g.": "http://a/b/c/g.",
    ".g": "http://a/b/c/.g",
    "g..": "http://a/b/c/g..",
    "..g": "http://a/b/c/..g",
    "./../g": "http://a/b/g",
    "./g/.": "http://a/b/c/g/",
    "g/./h": "http://a/b/c/g/h",
    "g/../h": "http://a/b/c/h",
    "g;x=1/./y": "http://a/b/c/g;x=1/y",
    "g;x=1/../y": "http://a/b/c/y",
    "http:g": "http:g",  # strict parsers keep the scheme
}


def test_rfc3986_resolution():
    for ref, expected in RFC_CASES.items():
        assert resolve_iri(BASE, ref) == expected, ref


def test_resolve_unknown_scheme():
    assert resolve_iri("tag:example,2024:base/x", "y") == "tag:example,2024:base/y"
    assert resolve_iri(None, "rel") == "rel"
