"""HTTP loader (reference ReqwestLoader parity, reqwest/mod.rs:85-248)
with a fake transport — no network. Covers accept-header profile
quoting, Link alternate indirection + bound, Link context side-channel,
profile params, caching, chain integration, and end-to-end expansion
through a remote @context."""

import pytest

from json_ld_spark import errors as E
from json_ld_spark.context import chain_loader, dict_loader
from json_ld_spark.httploader import (
    HttpLoader,
    parse_content_type,
    parse_link,
)


class FakeFetch:
    """Transport double: url -> (status, headers, body); counts calls."""

    def __init__(self, responses):
        self.responses = responses
        self.calls = []

    def __call__(self, url, headers):
        self.calls.append((url, dict(headers)))
        if url not in self.responses:
            return 404, [("Content-Type", "text/plain")], b"not found"
        return self.responses[url]


def _ld(body: bytes, extra_headers=()):
    return 200, [("Content-Type", "application/ld+json"), *extra_headers], body


def test_parse_content_type():
    ct = parse_content_type('application/json; profile="http://a http://b"; q=1')
    assert ct.media_type == "application/json"
    assert ct.profiles() == ["http://a", "http://b"]
    assert parse_content_type("application/ld+json").is_json_ld
    assert not parse_content_type("text/html").is_json_ld
    assert parse_content_type("garbage") is None


def test_parse_link():
    link = parse_link('<ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context"')
    assert link.href == "ctx.jsonld"
    assert link.rel() == "http://www.w3.org/ns/json-ld#context"
    assert parse_link("no-brackets") is None


def test_accept_header_profile_quoting():
    # reqwest/mod.rs:104-124: single profile unquoted, multiple quoted
    assert (
        HttpLoader().accept_header
        == "application/ld+json, application/json"
    )
    assert (
        HttpLoader(request_profile=["http://p1"]).accept_header
        == "application/ld+json; profile=http://p1, application/json"
    )
    assert (
        HttpLoader(request_profile=["http://p1", "http://p2"]).accept_header
        == 'application/ld+json; profile="http://p1 http://p2", application/json'
    )


def test_load_ld_json():
    fetch = FakeFetch({"http://ex/ctx": _ld(b'{"@context": {"name": "http://ex/name"}}')})
    doc = HttpLoader(fetch=fetch).load("http://ex/ctx")
    assert doc.document == {"@context": {"name": "http://ex/name"}}
    assert doc.content_type == "application/ld+json"
    assert doc.context_url is None
    # the accept header actually went out
    assert fetch.calls[0][1]["Accept"].startswith("application/ld+json")


def test_context_link_header_on_plain_json():
    # reqwest/mod.rs:176-194: only non-ld+json responses get a context URL
    fetch = FakeFetch({
        "http://ex/data": (
            200,
            [
                ("Content-Type", 'application/json; profile="http://ex/prof"'),
                ("Link", '<ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context"'),
            ],
            b'{"name": "x"}',
        )
    })
    doc = HttpLoader(fetch=fetch).load("http://ex/data")
    assert doc.context_url == "http://ex/ctx.jsonld"  # resolved against url
    assert doc.profile == {"http://ex/prof"}


def test_multiple_context_links_error():
    fetch = FakeFetch({
        "http://ex/data": (
            200,
            [
                ("Content-Type", "application/json"),
                ("Link", '<a.jsonld>; rel="http://www.w3.org/ns/json-ld#context"'),
                ("Link", '<b.jsonld>; rel="http://www.w3.org/ns/json-ld#context"'),
            ],
            b"{}",
        )
    })
    with pytest.raises(E.LoadingRemoteContextFailed, match="multiple context link"):
        HttpLoader(fetch=fetch).load("http://ex/data")


def test_ld_json_ignores_context_link():
    fetch = FakeFetch({
        "http://ex/doc": (
            200,
            [
                ("Content-Type", "application/ld+json"),
                ("Link", '<a.jsonld>; rel="http://www.w3.org/ns/json-ld#context"'),
            ],
            b"{}",
        )
    })
    assert HttpLoader(fetch=fetch).load("http://ex/doc").context_url is None


def test_alternate_link_redirection():
    # reqwest/mod.rs:225-241: text/html + rel=alternate → follow
    fetch = FakeFetch({
        "http://ex/page": (
            200,
            [
                ("Content-Type", "text/html"),
                ("Link", '<real.jsonld>; rel=alternate; type="application/ld+json"'),
            ],
            b"<html/>",
        ),
        "http://ex/real.jsonld": _ld(b'{"ok": true}'),
    })
    doc = HttpLoader(fetch=fetch).load("http://ex/page")
    assert doc.document == {"ok": True}
    assert doc.url == "http://ex/real.jsonld"  # final URL, not requested


def test_redirection_bound():
    fetch = FakeFetch({
        "http://ex/a": (
            200,
            [("Content-Type", "text/html"),
             ("Link", '<a>; rel=alternate; type="application/ld+json"')],
            b"",
        )
    })
    with pytest.raises(E.LoadingRemoteContextFailed, match="too many"):
        HttpLoader(fetch=fetch, max_redirections=3).load("http://ex/a")
    # 1 initial + 3 allowed redirections + the one that trips the bound
    assert len(fetch.calls) == 4


def test_no_media_type_no_alternate_fails():
    fetch = FakeFetch({"http://ex/x": (200, [("Content-Type", "text/plain")], b"hi")})
    with pytest.raises(E.LoadingRemoteContextFailed, match="invalid content type"):
        HttpLoader(fetch=fetch).load("http://ex/x")


def test_non_200_fails():
    fetch = FakeFetch({})
    with pytest.raises(E.LoadingRemoteContextFailed, match="status code 404"):
        HttpLoader(fetch=fetch).load("http://ex/missing")


def test_cache_fetches_once():
    fetch = FakeFetch({"http://ex/ctx": _ld(b"{}")})
    loader = HttpLoader(fetch=fetch)
    loader.load("http://ex/ctx")
    loader.load("http://ex/ctx")
    assert len(fetch.calls) == 1
    uncached = HttpLoader(fetch=FakeFetch({"http://ex/ctx": _ld(b"{}")}), cache=False)
    uncached.load("http://ex/ctx")
    uncached.load("http://ex/ctx")
    assert len(uncached.fetch.calls) == 2


def test_chain_integration_registry_wins():
    fetch = FakeFetch({"http://ex/remote": _ld(b'{"@context": {}}')})
    http = HttpLoader(fetch=fetch)
    chain = chain_loader(
        dict_loader({"http://ex/local": {"@context": {"a": "http://ex/a"}}}),
        http.context_loader(),
    )
    assert chain("http://ex/local")[0] == {"@context": {"a": "http://ex/a"}}
    assert fetch.calls == []  # registry hit: no network
    assert chain("http://ex/remote")[0] == {"@context": {}}
    assert len(fetch.calls) == 1


def test_expand_with_remote_context():
    """End-to-end: a document whose @context is a remote IRI expands
    through the HTTP loader (context-processing remote branch,
    algorithm/mod.rs:150-175)."""
    from json_ld_spark.api import expand
    from json_ld_spark.options import JsonLdOptions

    fetch = FakeFetch({
        "http://ex/ctx.jsonld": _ld(
            b'{"@context": {"name": "http://xmlns.com/foaf/0.1/name"}}'
        )
    })
    http = HttpLoader(fetch=fetch)
    doc = {"@context": "http://ex/ctx.jsonld", "name": "alice"}
    out = expand(doc, JsonLdOptions(loader=http.context_loader()))
    assert out == [{"http://xmlns.com/foaf/0.1/name": [{"@value": "alice"}]}]
    # cached: expanding again fetches nothing new
    expand(doc, JsonLdOptions(loader=http.context_loader()))
    assert len(fetch.calls) == 1


def test_cli_http_flag(tmp_path, monkeypatch, capsys):
    """--http wires the HTTP loader into the CLI chain (transport
    monkeypatched — no network)."""
    import json as _json

    from json_ld_spark import httploader as hl
    from json_ld_spark.__main__ import main

    def fake_fetch(url, headers):
        assert url == "http://ex/ctx.jsonld"
        return 200, [("Content-Type", "application/ld+json")], _json.dumps(
            {"@context": {"name": "http://ex/name"}}
        ).encode()

    monkeypatch.setattr(hl, "urllib_fetch", fake_fetch)
    doc = tmp_path / "doc.json"
    doc.write_text(_json.dumps({"@context": "http://ex/ctx.jsonld", "name": "alice"}))
    assert main(["expand", str(doc), "--http"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out == [{"http://ex/name": [{"@value": "alice"}]}]


def test_expand_url_with_header_context():
    """RemoteDocumentReference::expand_full parity (remote_document.rs:
    78-95): an application/json response's Link context header supplies
    the context; the final URL is the base for relative @ids."""
    from json_ld_spark.api import expand_url

    fetch = FakeFetch({
        "http://ex/dir/data": (
            200,
            [
                ("Content-Type", "application/json"),
                ("Link", '<ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context"'),
            ],
            b'{"@id": "item", "name": "alice"}',
        ),
        "http://ex/dir/ctx.jsonld": _ld(
            b'{"@context": {"name": "http://ex/name"}}'
        ),
    })
    out = expand_url("http://ex/dir/data", http=HttpLoader(fetch=fetch))
    assert out == [{
        "@id": "http://ex/dir/item",
        "http://ex/name": [{"@value": "alice"}],
    }]
    # both the document and the header context were fetched
    assert [u for u, _ in fetch.calls] == ["http://ex/dir/data", "http://ex/dir/ctx.jsonld"]


def test_expand_url_ld_json_ignores_header_context():
    from json_ld_spark.api import expand_url

    fetch = FakeFetch({
        "http://ex/doc": (
            200,
            [
                ("Content-Type", "application/ld+json"),
                ("Link", '<ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context"'),
            ],
            b'{"@context": {"name": "http://ex/inline"}, "name": "x"}',
        ),
    })
    out = expand_url("http://ex/doc", http=HttpLoader(fetch=fetch))
    assert out == [{"http://ex/inline": [{"@value": "x"}]}]
    assert len(fetch.calls) == 1  # header context never dereferenced


def test_cli_expand_url(monkeypatch, capsys):
    import json as _json

    from json_ld_spark import httploader as hl
    from json_ld_spark.__main__ import main

    def fake_fetch(url, headers):
        return 200, [("Content-Type", "application/ld+json")], _json.dumps(
            {"@context": {"name": "http://ex/name"}, "name": "bob"}
        ).encode()

    monkeypatch.setattr(hl, "urllib_fetch", fake_fetch)
    assert main(["expand", "http://ex/doc.jsonld", "--http"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out == [{"http://ex/name": [{"@value": "bob"}]}]


def test_reference_header_cases_pinned():
    """The reference's own unit cases, string-for-string
    (crates/core/src/loader/reqwest/content_type.rs:127-190,
    link.rs:103-130): unquoted + quoted profile values, trailing
    params, and a bare link with no params."""
    for value in (
        "application/ld+json;profile=http://www.w3.org/ns/json-ld#expanded",
        "application/ld+json; profile=http://www.w3.org/ns/json-ld#expanded",
        "application/ld+json; profile=http://www.w3.org/ns/json-ld#expanded; q=1",
        'application/ld+json; profile="http://www.w3.org/ns/json-ld#expanded"; q=1',
    ):
        ct = parse_content_type(value)
        assert ct is not None, value
        assert ct.media_type == "application/ld+json"
        assert ct.profiles() == ["http://www.w3.org/ns/json-ld#expanded"], value

    for value in (
        '<http://www.example.org/context>; rel="context"; type="application/ld+json"',
        '<http://www.example.org/context>; rel="context"; type="application/ld+json"; foo="bar"',
    ):
        link = parse_link(value)
        assert link is not None, value
        assert link.href == "http://www.example.org/context"
        assert link.rel() == "context"
    bare = parse_link("<http://www.example.org/context>")
    assert bare is not None and bare.href == "http://www.example.org/context"
