"""Deterministic URL normalization + relative-reference resolution.

Stdlib-only (urllib.parse), shared verbatim between the Spark Arrow UDF and
the pytest oracle. Canonical form:
- resolve relative hrefs against the page url (RFC 3986 via urljoin)
- scheme + host lowercased
- fragment stripped
- empty path -> "/"
- default ports stripped (http:80 / https:443)
- only http/https survive; anything else (mailto:, javascript:, data:) -> None
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def normalize_url(href: str | None, base_url: str | None = None) -> str | None:
    if href is None:
        return None
    href = href.strip()
    if not href:
        return None
    try:
        absolute = urljoin(base_url, href) if base_url else href
        parts = urlsplit(absolute)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    if netloc.endswith(_DEFAULT_PORT[scheme]):
        netloc = netloc[: -len(_DEFAULT_PORT[scheme])]
    if not netloc:
        return None
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))
