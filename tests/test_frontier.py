from __future__ import annotations

from pargraph_spark.operators.frontier import frontier_waves, wave_histogram

ROWS = [
    # (url, host, priority, crawl_delay)
    ("a.com/1", "a.com", 9.0, 1),
    ("a.com/2", "a.com", 7.0, 1),
    ("a.com/3", "a.com", 7.0, 1),
    ("a.com/4", "a.com", 1.0, 1),
    ("b.org/x", "b.org", 5.0, 3),
    ("b.org/y", "b.org", 8.0, 3),
    ("b.org/z", "b.org", 2.0, 3),
    ("c.net/only", "c.net", 0.5, 1),
]


def _brute(rows, conc, budget=None, use_delay=False):
    by_host: dict[str, list] = {}
    for u, h, p, d in rows:
        by_host.setdefault(h, []).append((u, p, d))
    out = {}
    for h, urls in by_host.items():
        urls.sort(key=lambda t: (-t[1], t[0]))
        for r, (u, p, d) in enumerate(urls, start=1):
            if budget is not None and r > budget:
                continue
            out[u] = (h, p, r, ((r - 1) // conc) * (d if use_delay else 1))
    return out


def _collect(df):
    return {
        r["url"]: (r["host"], r["priority"], r["host_rank"], r["wave"])
        for r in df.collect()
    }


def test_frontier_waves_matches_brute(spark):
    f = spark.createDataFrame(
        ROWS, "url string, host string, priority double, crawl_delay int"
    )
    got = _collect(frontier_waves(f, per_host_concurrency=2))
    assert got == _brute(ROWS, 2)
    # ties (a.com/2 vs /3 at 7.0) break on url asc: /2 ranks first
    assert got["a.com/2"][2] < got["a.com/3"][2]


def test_frontier_budget_and_delay(spark):
    f = spark.createDataFrame(
        ROWS, "url string, host string, priority double, crawl_delay int"
    )
    got = _collect(
        frontier_waves(
            f, per_host_concurrency=1, host_budget=2, delay_col="crawl_delay"
        )
    )
    assert got == _brute(ROWS, 1, budget=2, use_delay=True)
    # budget dropped a.com ranks 3,4 and b.org rank 3
    assert "a.com/4" not in got and "b.org/z" not in got
    # b.org's crawl_delay=3 stretches its waves: ranks 1,2 -> waves 0,3
    assert got["b.org/y"][3] == 0 and got["b.org/x"][3] == 3
    hist = {
        r["wave"]: (r["n_urls"], r["n_hosts"])
        for r in wave_histogram(
            frontier_waves(f, 1, host_budget=2, delay_col="crawl_delay")
        ).collect()
    }
    assert hist[0] == (3, 3)  # one lead URL per host


def test_frontier_budget_compiles_to_window_group_limit(spark):
    f = spark.createDataFrame(
        ROWS, "url string, host string, priority double, crawl_delay int"
    )
    plan = (
        frontier_waves(f, 1, host_budget=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_frontier_stable_under_repartition(spark):
    f = spark.createDataFrame(
        ROWS, "url string, host string, priority double, crawl_delay int"
    )
    a = _collect(frontier_waves(f, 2))
    b = _collect(frontier_waves(f.repartition(7), 2))
    assert a == b


def test_frontier_null_delay_defaults_to_one(spark):
    rows = [("a.com/1", "a.com", 9.0, None), ("a.com/2", "a.com", 7.0, None)]
    f = spark.createDataFrame(
        rows, "url string, host string, priority double, crawl_delay int"
    )
    got = _collect(frontier_waves(f, 1, delay_col="crawl_delay"))
    # NULL robots delay = no extra delay, never a NULL wave
    assert got["a.com/1"][3] == 0 and got["a.com/2"][3] == 1
