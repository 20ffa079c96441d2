"""Pages-table source: scan + latest-crawl dedupe (SURVEY.md §2.3 O1).

At 100 TB the pages table is Iceberg-partitioned by crawl date; the reader
here takes any path spark.read understands (parquet locally, ``iceberg``
catalog tables on a cluster) and always applies the same dedupe: one row per
url, the row with max(warc_ts).

Scale notes: the dedupe is a single hash shuffle on ``url`` carrying the html
blob once (max_by avoids the sort a window-rank would add, and AQE coalesces
the post-shuffle partitions). Column pruning matters at this width — callers
that only need (url, html) should select before calling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "parquet":
        return spark.read.parquet(path)
    return spark.read.format(fmt).load(path)


def latest_pages(pages: DataFrame) -> DataFrame:
    """One row per url: the latest crawl by warc_ts.

    Single wide shuffle on url; ties broken by the larger html payload so the
    result is deterministic even if two crawl rows share a timestamp.
    """
    payload = F.struct("warc_ts", "html", "text", "lang")
    return (
        pages.groupBy("url")
        .agg(F.max(payload).alias("_p"))
        .select("url", "_p.warc_ts", "_p.html", "_p.text", "_p.lang")
    )
