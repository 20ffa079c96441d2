"""O2/O3 — vectorized HTML → (text, outlinks) extraction (SURVEY.md §2.3).

The reference runs arbitrary Python per task node on a process pool
(/root/reference/pargraph/engine/engine.py:116-117); the Spark-first
re-expression is ONE Arrow-batched mapInPandas crossing per partition — no
per-row Python UDFs anywhere (BASELINE.json input_hint). The extraction
kernel itself (functions/extract.py, functions/urlnorm.py) is the exact
function the pytest oracle calls, so text is byte-identical by construction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from pargraph_spark.functions.extract import extract_text_and_links
from pargraph_spark.functions.urlnorm import normalize_url

EXTRACTED_SCHEMA = "url string, text string, links array<string>, lang string"


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts: list[str] = []
        links_col: list[list[str]] = []
        for url, html in zip(pdf["url"], pdf["html"]):
            text, raw = extract_text_and_links(html)
            texts.append(text)
            norm: list[str] = []
            for href in raw:
                u = normalize_url(href, url)
                if u is not None:
                    norm.append(u)
            links_col.append(norm)
        yield pd.DataFrame(
            {"url": pdf["url"], "text": texts, "links": links_col, "lang": pdf["lang"]}
        )


def extract_links(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, html, text, lang) → (url, text, links, lang).

    Input should already be latest-crawl-deduped (sources.pages.latest_pages).
    Raw in-page duplicate links are preserved here; dedupe happens at the
    distinct edge table (operators.edges) where it is a set semantic, not a
    parsing artifact.
    """
    return pages.select("url", "html", "lang").mapInPandas(
        _extract_batches, schema=EXTRACTED_SCHEMA
    )
