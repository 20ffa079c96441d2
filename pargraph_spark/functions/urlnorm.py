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


# ---- URL template mining (page-type detection) ----------------------------
# Spark-side column builders (JVM regexp_replace chains — no Python in the
# hot path); url_template_col is the per-row kernel, url_templates the
# rollup. Pairs with operators/wl.py role colors: template = syntactic page
# type from the URL alone, WL color = structural page type from the graph.

def url_template_expr(col):
    """Column: the URL with volatile path/query parts generalized —
    /post/8412?page=3 -> /post/{n}?page={n}; 32+-hex and uuid-shaped
    segments -> {hex}; digit runs -> {n}. Deterministic, pure
    regexp_replace chain."""
    from pyspark.sql import functions as F

    c = F.lower(col)
    # strip scheme for grouping; keep host
    c = F.regexp_replace(c, r"^https?://", "")
    # uuid-shaped segments
    c = F.regexp_replace(
        c, r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
        "{uuid}",
    )
    # long hex ids (8+ hex chars with at least one digit — don't eat words)
    c = F.regexp_replace(c, r"\b(?=[0-9a-f]*[0-9])[0-9a-f]{8,}\b", "{hex}")
    # digit runs
    c = F.regexp_replace(c, r"[0-9]+", "{n}")
    return c


def url_templates(
    df, url_col: str = "url", min_pages: int = 2
):
    """Template rollup (template, host, n_pages): URL-template clusters
    with at least `min_pages` members — the syntactic page-type census
    of a crawl (calendar traps, faceted-search explosions and
    pagination families surface as huge n_pages; crawl-budget input for
    frontier_waves' host_budget). One hash aggregate; partial-combines.
    """
    from pyspark.sql import functions as F

    t = df.select(
        url_template_expr(F.col(url_col)).alias("template"),
        F.regexp_extract(
            F.regexp_replace(F.lower(F.col(url_col)), r"^https?://", ""),
            r"^([^/]+)", 1,
        ).alias("host"),
    )
    return (
        t.groupBy("template", "host")
        .agg(F.count("*").alias("n_pages"))
        .where(F.col("n_pages") >= min_pages)
    )
