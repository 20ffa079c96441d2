"""Inbound anchor-text aggregation — the classic web-search signal.

The anchor text other pages use when linking to a url is the strongest
compact description of that url (it names the TARGET, written by
third parties): search ranking, entity naming, and link-spam detection
all consume the per-target inbound anchor profile. This operator
aggregates it at graph scale: (dst_url, anchor, n_pages) with the top-k
anchors per target by distinct linking pages.

Extraction shares the engine's pinned pure-function discipline
(functions.extract.extract_anchors beside the byte-identical
extract_text_and_links — reference frame: pargraph does parsing inside
opaque task nodes, e.g. /root/reference/examples/taxi.py:15; we hoist it
into a vectorized first-class operator), href resolution is the same
urlnorm.normalize_url as edge_urls, so anchor rows join the link graph
verbatim.

Scale shape: one Arrow crossing for extraction; the per-(dst, anchor)
count is a distinct-source aggregate with map-side partial combine; the
per-target top-k cut compiles to WindowGroupLimit (map-side partial
top-k below the window shuffle — hubs with millions of inbound anchors
ship k rows per mapper, not their full profile). Counting DISTINCT
linking pages (not raw links) makes the signal sybil-resistant per page
and keeps rows bounded by the deduped edge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pargraph_spark.functions.extract import extract_anchors
from pargraph_spark.functions.urlnorm import normalize_url

ANCHOR_SCHEMA = "src_url string, dst_url string, anchor string"


def _anchor_batches(batches):
    import pandas as pd

    for pdf in batches:
        src, dst, anch = [], [], []
        for url, html in zip(pdf["url"], pdf["html"]):
            for href, text in extract_anchors(html):
                u = normalize_url(href, url)
                if u is None or u == url:
                    continue
                src.append(url)
                dst.append(u)
                anch.append(text)
        yield pd.DataFrame({"src_url": src, "dst_url": dst, "anchor": anch})


def anchor_edges(pages: DataFrame) -> DataFrame:
    """(url, html, ...) → (src_url, dst_url, anchor). Input should be
    latest-crawl-deduped (sources.pages.latest_pages), matching
    extract_links. Self-links dropped; hrefs resolved+normalized with
    the same policy as the edge table."""
    return pages.select("url", "html").mapInPandas(
        _anchor_batches, schema=ANCHOR_SCHEMA
    )


def inbound_anchor_topk(anchors: DataFrame, k: int = 5) -> DataFrame:
    """(src_url, dst_url, anchor) → (dst_url, anchor, n_pages, rn):
    the top-k inbound anchors per target by DISTINCT linking pages,
    ties broken by anchor string ascending (total, deterministic).
    rn <= k compiles to WindowGroupLimit: map-side partial top-k."""
    per = (
        anchors.dropDuplicates(["src_url", "dst_url", "anchor"])
        .groupBy("dst_url", "anchor")
        .agg(F.count("*").alias("n_pages"))
    )
    w = Window.partitionBy("dst_url").orderBy(
        F.col("n_pages").desc(), F.col("anchor").asc()
    )
    return (
        per.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(k))
        .select("dst_url", "anchor", "n_pages", "rn")
    )
