"""Crawl-frontier politeness scheduling: turn a scored URL frontier into
deterministic per-host fetch WAVES so that no host ever sees more than
`per_host_concurrency` simultaneous fetches and consecutive waves to the
same host are `crawl_delay` ticks apart — the scheduling half of the O1
ingest path (sources/pages.py reads what a fetcher following these waves
writes; reference pargraph has no crawl surface — engine extension for
the webtext tier).

Semantics per host:

  - URLs are ranked by (priority DESC, url ASC) — a pure function of the
    frontier, so the schedule is stable under repartitioning/resume (the
    deterministic-sampling discipline);
  - rank r (1-based) fetches in wave ((r-1) div per_host_concurrency) *
    crawl_delay — hosts with a robots crawl-delay just stretch their own
    wave sequence, they never block other hosts;
  - an optional `host_budget` drops ranks beyond the per-crawl page cap
    for the host (webmaster-friendly recrawl caps).

Scale shape: ONE host-keyed shuffle. A hot host (the skew key of any
real frontier) is bounded by the budget cap, and the rank <= budget
filter compiles to WindowGroupLimit — Spark's map-side per-group top-k
— so excess hot-host URLs are cut BEFORE the exchange, the O10 skew
discipline (operators/skew.py). Wave arithmetic is row-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frontier_waves(
    frontier: DataFrame,
    per_host_concurrency: int = 1,
    host_budget: int | None = None,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str = "priority",
    delay_col: str | None = None,
) -> DataFrame:
    """Schedule `frontier` (url, host, priority[, crawl_delay]) into
    (url, host, priority, host_rank, wave). `delay_col` names an
    integer per-host crawl-delay column (ticks between that host's
    waves), default 1 tick.
    """
    if per_host_concurrency < 1:
        raise ValueError(
            f"per_host_concurrency must be >= 1, got {per_host_concurrency}"
        )
    if host_budget is not None and host_budget < 1:
        raise ValueError(f"host_budget must be >= 1, got {host_budget}")
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    ranked = frontier.withColumn("host_rank", F.row_number().over(w))
    if host_budget is not None:
        # rank <= k on a row_number window -> WindowGroupLimit: the hot
        # host is cut map-side, before its rows cross the exchange
        ranked = ranked.where(F.col("host_rank") <= host_budget)
    # a NULL delay (host absent from robots.txt) must mean "no extra
    # delay", not a NULL wave that silently drops the host's URLs from
    # any wave-ordered fetch
    delay = (
        F.coalesce(F.col(delay_col).cast("long"), F.lit(1))
        if delay_col is not None
        else F.lit(1)
    )
    return ranked.select(
        url_col, host_col, priority_col, "host_rank",
        (
            F.expr(f"(host_rank - 1) div {per_host_concurrency}") * delay
        ).alias("wave"),
    )


def wave_histogram(schedule: DataFrame, host_col: str = "host") -> DataFrame:
    """Fetches per wave (wave, n_urls, n_hosts) — the fetcher's load
    profile; its max row is the cluster-width requirement. `host_col`
    must match the one given to frontier_waves."""
    return schedule.groupBy("wave").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct(host_col).alias("n_hosts"),
    )
