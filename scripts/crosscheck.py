"""Local replica of the driver's correctness gate: run every queries()[name]
on Spark and oracle_sql()[name] on DuckDB at sf0.01, compare row count +
column names + order-insensitive values (exact, including float bits).

Usage: PYTHONPATH=/root/repo python scripts/crosscheck.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from pargraph_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    ca, cb = canon(a), canon(b)
    for c in ca.columns:
        va, vb = ca[c].to_numpy(), cb[c].to_numpy()
        if va.dtype != vb.dtype:
            problems.append(f"dtype[{c}]: spark={va.dtype} duck={vb.dtype}")
        if np.issubdtype(va.dtype, np.floating):
            neq = ~((va == vb) | (np.isnan(va) & np.isnan(vb)))
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(
                    f"float[{c}]: {int(neq.sum())}/{len(va)} differ, e.g. "
                    f"{va[i]!r} vs {vb[i]!r} (diff {abs(va[i]-vb[i])})"
                )
        else:
            neq = va != vb
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(
                    f"value[{c}]: {int(neq.sum())}/{len(va)} differ, e.g. "
                    f"{va[i]!r} vs {vb[i]!r}"
                )
    return problems


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    spark = get_spark("crosscheck", cores=8, shuffle_partitions=16,
                      extra_conf={"spark.ui.enabled": "false"})
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            # a typo'd name must not produce a false-green "FAILED: none"
            # gate run that executed nothing (review r5)
            print(f"FAILED: unknown query names {unknown}")
            sys.exit(2)
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, sf).toPandas()
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows ({t_spark:.1f}s spark)")
            if len(sdf) == 0 and name != "ann_lsh":
                failed.append(name)
            continue
        t0 = time.monotonic()
        ddf = con.sql(oracles[name]).df()
        t_duck = time.monotonic() - t0
        try:
            problems = compare(name, sdf, ddf)
        except Exception as e:  # a compare crash is a FAIL, not a gate abort
            problems = [f"compare crashed: {type(e).__name__}: {e}"]
        status = "OK " if not problems else "FAIL"
        print(f"{name:24s} {status} rows={len(sdf)} ({t_spark:.1f}s spark, {t_duck:.1f}s duck)")
        for p in problems:
            print(f"    {p}")
        if problems:
            failed.append(name)
    spark.stop()
    print("\nFAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
