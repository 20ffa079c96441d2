from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from pargraph_spark.operators.events import (
    props_stats,
    sessionize,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"
T0 = datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


def test_windowed_counts_against_pandas(spark, events):
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value6"])
        for r in windowed_event_counts(events, "1 hour").collect()
    }
    pdf = events.toPandas()
    pdf["w"] = pdf["ts"].dt.floor("h")
    ref = pdf.groupby(["w", "event_type"]).agg(
        n=("event_id", "count"), s=("value", "sum")
    )
    assert len(got) == len(ref)
    for (w, et), row in ref.iterrows():
        n, s6 = got[(w.to_pydatetime(), et)]
        assert n == row["n"]
        assert abs(s6 - round(row["s"], 6)) < 1e-9
    # windows tile exactly: total events preserved
    assert sum(n for n, _ in got.values()) == events.count()


def _py_sessionize(rows, gap_minutes=30):
    """Pure-Python oracle: gap-based sessions per user."""
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    out = {}
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        sid, start, last, n, total = 0, rs[0]["ts"], rs[0]["ts"], 0, 0.0
        for r in rs:
            if n > 0 and (r["ts"] - last) > timedelta(minutes=gap_minutes):
                out[(uid, sid)] = (start, last, n, round(total, 6))
                sid, start, n, total = sid + 1, r["ts"], 0, 0.0
            last = max(last, r["ts"])
            n += 1
            total += r["value"]
        out[(uid, sid)] = (start, last, n, round(total, 6))
    return out


def test_sessionize_against_python_oracle(spark, events):
    ref = _py_sessionize(events.collect())
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"], r["total_value6"],
        )
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert set(got) == set(ref)
    for k, (start, end, n, total) in ref.items():
        gs, ge, gn, gt = got[k]
        assert (gs, ge, gn) == (start, end, n), k
        assert abs(gt - total) < 1e-9, k


def test_props_stats_exact(spark, events):
    import json as _json

    got = {r["event_type"]: r for r in props_stats(events).collect()}
    rows = events.collect()
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(_json.loads(r["props"])["k"])
    assert set(got) == set(by_type)
    for et, ks in by_type.items():
        g = got[et]
        assert (g["n_events"], g["k_sum"], g["k_min"], g["k_max"]) == (
            len(ks), sum(ks), min(ks), max(ks),
        )


# --------------------------------------------------------------------------
# streaming
# --------------------------------------------------------------------------

def _write_drop(spark, path: str, rows, mtime: float) -> None:
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    df.coalesce(1).write.parquet(path)
    for name in os.listdir(path):
        os.utime(os.path.join(path, name), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def _ev(eid, minutes, uid=1, et="click", value=1.0):
    return (eid, T0 + timedelta(minutes=minutes), uid, et, value, "{}")


def test_stream_windowed_counts_drops_late_beyond_watermark(spark, tmp_path):
    """mtime-ordered single-file batches (Spark's one-sided guarantee: a
    late row is guaranteed dropped only once its window has been FINALIZED
    by a prior batch's watermark):
      f1: events at 00:10, 01:10, 05:00        (batch 0, watermark 1970)
      f2: advancer at 05:30                    (batch 1, watermark 03:00
          -> finalizes+emits windows 00:00 and 01:00)
      f3: LATE event at 00:20 (window already finalized -> dropped) and an
          in-watermark event at 03:30          (batch 2, watermark 03:30)
      f4: far-future advancer                  (finalizes the rest)
    Expected: each window exactly once; 00:00 stays 1 (late row neither
    merged nor re-emitted); 03:30 row accepted; 05:00 window = 2."""
    from pargraph_spark.streaming.events import (
        read_event_stream,
        stream_windowed_counts,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    base = 1_700_000_000
    far = 60 * 24 * 10  # +10 days
    _write_drop(spark, f"{in_dir}/f1",
                [_ev(1, 10), _ev(2, 70), _ev(3, 300)], base)
    _write_drop(spark, f"{in_dir}/f2", [_ev(4, 330)], base + 100)
    _write_drop(spark, f"{in_dir}/f3", [_ev(5, 20), _ev(6, 210)], base + 200)
    _write_drop(spark, f"{in_dir}/f4", [_ev(7, far)], base + 300)

    stream = stream_windowed_counts(
        read_event_stream(spark, f"{in_dir}/f*", max_files_per_trigger=1),
        window="1 hour", watermark="2 hours",
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.read.parquet(out_dir).collect()
    got = {r["window_start"]: r["n_events"] for r in rows}
    assert got.get(T0 + timedelta(hours=0)) == 1   # late 00:20 row dropped
    assert got.get(T0 + timedelta(hours=1)) == 1
    assert got.get(T0 + timedelta(minutes=180)) == 1  # in-watermark 03:30 row
    assert got.get(T0 + timedelta(hours=5)) == 2   # 05:00 + 05:30
    # each window finalized exactly once (a non-dropped late row would
    # re-create state and re-emit its window)
    assert len(got) == len(rows)


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Sessions emitted by the stateful streaming operator equal the batch
    sessionize over the same (non-sentinel) events once the watermark has
    closed every session."""
    from pargraph_spark.streaming.events import (
        read_event_stream,
        streaming_sessionize,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    data = [
        _ev(1, 0, uid=1, value=1.5), _ev(2, 10, uid=1, value=2.0),
        _ev(3, 100, uid=1, value=3.0),           # new session (gap 90m)
        _ev(4, 5, uid=2, value=1.0), _ev(5, 50, uid=2, value=4.0),  # gap 45m
    ]
    base = 1_700_000_000
    far = 60 * 24 * 10
    _write_drop(spark, f"{in_dir}/f1", data, base)
    _write_drop(spark, f"{in_dir}/f2", [_ev(90, far, uid=999)], base + 100)
    _write_drop(spark, f"{in_dir}/f3", [_ev(91, far + 60, uid=999)], base + 200)

    stream = streaming_sessionize(
        read_event_stream(spark, f"{in_dir}/f*", max_files_per_trigger=1),
        gap_minutes=30, watermark="2 hours",
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["total_value"], 6))
        for r in spark.read.parquet(out_dir).collect()
        if r["user_id"] != 999
    }
    batch = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    ref = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value6"])
        for r in sessionize(batch, gap_minutes=30).collect()
    }
    assert got == ref


def test_value_quantiles_rank_tolerance(spark):
    # GK guarantee is on RANKS: the returned q for prob p must sit at a
    # true rank within relative_error * n of p * n
    from pargraph_spark.operators.events import value_quantiles

    import random

    rng = random.Random(13)
    vals = sorted(rng.expovariate(0.01) for _ in range(20_000))
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    eps = 0.01
    got = {r["p"]: r["q"] for r in
           value_quantiles(df, "x", probs=(0.1, 0.5, 0.9, 0.99),
                           relative_error=eps).collect()}
    import bisect

    n = len(vals)
    for p, q in got.items():
        lo = bisect.bisect_left(vals, q)
        hi = bisect.bisect_right(vals, q)
        # true rank interval of q must intersect [p*n - 2*eps*n, p*n + 2*eps*n]
        assert lo <= p * n + 2 * eps * n and hi >= p * n - 2 * eps * n, (p, q)

    exact = {r["p"]: r["q"] for r in
             value_quantiles(df, "x", probs=(0.5,), exact=True).collect()}
    med = exact[0.5]
    assert abs(med - (vals[n // 2 - 1] + vals[n // 2]) / 2) < 1e-6 or \
        vals[int(0.5 * (n - 1))] - 1e-9 <= med <= vals[int(0.5 * (n - 1)) + 1] + 1e-9


def test_value_quantiles_grouped(spark):
    from pargraph_spark.operators.events import value_quantiles

    rows = [(g, float(v)) for g in ("a", "b") for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {(r["g"], r["p"]): r["q"] for r in
           value_quantiles(df, "x", group_col="g", probs=(0.5,),
                           exact=True).collect()}
    assert set(g for g, _ in got) == {"a", "b"}
    for g in ("a", "b"):
        assert 49.0 <= got[(g, 0.5)] <= 51.0
