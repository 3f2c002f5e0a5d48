"""Driver-side HTTP document/context loader.

Mirrors the reference ReqwestLoader's observable behavior
(crates/core/src/loader/reqwest/mod.rs:85-248):

- ``Accept: application/ld+json[; profile=...], application/json`` with
  the single/multiple request-profile quoting rules of
  ``ReqwestLoader::new_using`` (reqwest/mod.rs:103-130);
- only ``application/ld+json`` / ``application/json`` count as JSON-LD
  media types (content_type.rs ``is_json_ld``);
- non-ld+json responses carry an optional
  ``Link rel="http://www.w3.org/ns/json-ld#context"`` side-channel
  context URL; more than one such header is an error
  (reqwest/mod.rs:176-194);
- responses without a JSON-LD media type follow a
  ``Link rel=alternate type=application/ld+json`` indirection, bounded
  by ``max_redirections`` (reqwest/mod.rs:225-241, default 8);
- content-type ``profile`` parameters are split on spaces and collected
  (reqwest/mod.rs:196-207);
- any non-200 status fails the load (reqwest/mod.rs:244).

Deliberate differences (documented design, SURVEY.md §1.3 Loader row):

- **Driver-side only.** Executors never touch the network; this loader
  resolves remote contexts once on the driver and feeds the broadcast
  context registry.
- **Caching.** The reference re-queries on every load
  (reqwest/mod.rs:83-84); at 10^12 documents re-fetching per load is
  not an option, so resolved URLs are cached by requested IRI.
- **Injectable transport.** ``fetch(url, headers) -> (status, headers,
  body)`` is a constructor argument; the default is a stdlib urllib
  transport (no third-party HTTP dependency), and unit tests inject a
  fake transport — no network in CI.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Optional

from . import errors as E
from .iri import resolve_iri

JSON_LD_CONTEXT_REL = "http://www.w3.org/ns/json-ld#context"

# fetch(url, headers) -> (status_code, [(header_name, header_value)], body_bytes)
Fetch = Callable[[str, dict[str, str]], tuple[int, list[tuple[str, str]], bytes]]


def urllib_fetch(url: str, headers: dict[str, str]) -> tuple[int, list[tuple[str, str]], bytes]:
    """Default transport: stdlib urllib (plain HTTP redirects are handled
    by urllib itself, like reqwest handles them for the reference)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
            return resp.status, list(resp.getheaders()), resp.read()
    except urllib.error.HTTPError as ex:  # non-2xx still has headers/status
        return ex.code, list(ex.headers.items()), ex.read()
    except urllib.error.URLError as ex:
        raise E.LoadingRemoteContextFailed(f"{url}: {ex.reason}") from ex


@dataclass(frozen=True)
class ContentType:
    media_type: str
    params: dict[str, str] = field(default_factory=dict)

    @property
    def is_json_ld(self) -> bool:
        # content_type.rs:105-107 — exactly these two media types
        return self.media_type in ("application/json", "application/ld+json")

    def profiles(self) -> list[str]:
        p = self.params.get("profile")
        return [x for x in p.split(" ") if x] if p else []


def parse_content_type(value: str) -> Optional[ContentType]:
    """media-type[; key=value]* with optional double-quoted values
    (content_type.rs state machine, simplified to the same outcomes)."""
    parts = value.split(";")
    media = parts[0].strip().lower()
    if not media or "/" not in media:
        return None
    params: dict[str, str] = {}
    for raw in parts[1:]:
        if "=" not in raw:
            return None
        k, v = raw.split("=", 1)
        v = v.strip()
        if v.startswith('"') and v.endswith('"') and len(v) >= 2:
            v = v[1:-1]
        params[k.strip().lower()] = v
    return ContentType(media, params)


@dataclass(frozen=True)
class LinkHeader:
    href: str
    params: dict[str, str]

    def rel(self) -> Optional[str]:
        return self.params.get("rel")

    def type_(self) -> Optional[str]:
        return self.params.get("type")


def parse_link(value: str) -> Optional[LinkHeader]:
    """``<href>[; key=value]*`` (link.rs state machine; one link per
    header value, exactly like the reference — no comma splitting)."""
    value = value.strip()
    if not value.startswith("<"):
        return None
    end = value.find(">")
    if end < 0:
        return None
    href = value[1:end]
    params: dict[str, str] = {}
    rest = value[end + 1:].strip()
    if rest:
        if not rest.startswith(";"):
            return None
        for raw in rest[1:].split(";"):
            if "=" not in raw:
                return None
            k, v = raw.split("=", 1)
            v = v.strip()
            if v.startswith('"') and v.endswith('"') and len(v) >= 2:
                v = v[1:-1]
            params[k.strip().lower()] = v
    return LinkHeader(href, params)


@dataclass(frozen=True)
class RemoteDocument:
    """Loaded document + metadata (reference RemoteDocument::new_full,
    reqwest/mod.rs:217-223)."""

    document: Any
    url: str
    content_type: str
    context_url: Optional[str] = None
    profile: frozenset[str] = frozenset()


def _headers(headers: list[tuple[str, str]], name: str) -> list[str]:
    n = name.lower()
    return [v for k, v in headers if k.lower() == n]


class HttpLoader:
    """Driver-side HTTP loader with Link/profile semantics and a cache.

    ``request_profile``: IRIs sent as the Accept profile parameter.
    ``max_redirections``: Link-header (rel=alternate) indirection bound.
    ``fetch``: transport; defaults to stdlib urllib.
    """

    def __init__(
        self,
        request_profile: Iterable[str] = (),
        max_redirections: int = 8,
        fetch: Optional[Fetch] = None,
        cache: bool = True,
    ) -> None:
        self.max_redirections = max_redirections
        # None = resolve the module-level urllib transport at CALL time
        # (so tests can monkeypatch json_ld_spark.httploader.urllib_fetch)
        self._fetch = fetch
        self._cache: Optional[dict[str, RemoteDocument]] = {} if cache else None
        profiles = list(request_profile)
        params = ""
        if profiles:
            # reqwest/mod.rs:104-124: quote only when multiple profiles
            body = " ".join(profiles)
            if len(profiles) > 1:
                body = f'"{body}"'
            params = f"; profile={body}"
        self.accept_header = f"application/ld+json{params}, application/json"

    def load(self, url: str) -> RemoteDocument:
        if self._cache is not None and url in self._cache:
            return self._cache[url]
        doc = self._load_uncached(url)
        if self._cache is not None:
            self._cache[url] = doc
        return doc

    @property
    def fetch(self) -> Fetch:
        return self._fetch if self._fetch is not None else urllib_fetch

    def _load_uncached(self, requested: str) -> RemoteDocument:
        url = requested
        redirections = 0
        while True:
            if redirections > self.max_redirections:
                raise E.LoadingRemoteContextFailed(
                    f"{requested}: too many Link redirections"
                )
            status, headers, body = self.fetch(url, {"Accept": self.accept_header})
            if status != 200:
                raise E.LoadingRemoteContextFailed(f"{url}: status code {status}")
            content_types = [
                ct
                for ct in (parse_content_type(v) for v in _headers(headers, "content-type"))
                if ct is not None
            ]
            ct = next((c for c in content_types if c.is_json_ld), None)
            if ct is not None:
                context_url: Optional[str] = None
                if ct.media_type != "application/ld+json":
                    for raw in _headers(headers, "link"):
                        link = parse_link(raw)
                        if link is not None and link.rel() == JSON_LD_CONTEXT_REL:
                            if context_url is not None:
                                raise E.LoadingRemoteContextFailed(
                                    f"{url}: multiple context link headers"
                                )
                            context_url = resolve_iri(url, link.href)
                try:
                    document = json.loads(body.decode("utf-8"))
                except (UnicodeDecodeError, ValueError) as ex:
                    raise E.LoadingRemoteContextFailed(f"{url}: {ex}") from ex
                return RemoteDocument(
                    document=document,
                    url=url,
                    content_type=ct.media_type,
                    context_url=context_url,
                    profile=frozenset(ct.profiles()),
                )
            # no JSON-LD media type: follow rel=alternate ld+json links
            # (reqwest/mod.rs:225-241)
            for raw in _headers(headers, "link"):
                link = parse_link(raw)
                if (
                    link is not None
                    and link.rel() == "alternate"
                    and link.type_() == "application/ld+json"
                ):
                    url = resolve_iri(url, link.href)
                    redirections += 1
                    break
            else:
                raise E.LoadingRemoteContextFailed(f"{url}: invalid content type")

    def context_loader(self) -> Callable[[str], tuple[Any, str]]:
        """Adapter to the ``Loader`` signature used by the context
        registry / chain machinery (context.py): iri -> (json, final_url).
        Plug into ``chain_loader(dict_loader(...), http.context_loader())``
        so pre-registered contexts win and the network is the fallback."""

        def load(iri: str) -> tuple[Any, str]:
            doc = self.load(iri)
            return doc.document, doc.url

        return load
