"""Task-graph front-end: tracing, memoized execution, JSON round-trip.

Mirrors the reference's test behaviors (test_graph_generation.py):
DAG generation from decorated functions, operator overloads, and the
serialize -> deserialize -> execute round-trip.
"""

from __future__ import annotations

import json

from pargraph_spark.graphapi import Delayed, TaskGraph, compute, delayed


@delayed
def _add(a, b):
    return a + b


@delayed
def _mul(a, b):
    return a * b


def test_trace_builds_dag_without_executing():
    calls = []

    @delayed
    def probe(x):
        calls.append(x)
        return x

    node = _add(probe(1), probe(2))
    assert isinstance(node, Delayed)
    assert calls == []  # nothing ran at trace time
    assert node.compute() == 3
    assert sorted(calls) == [1, 2]


def test_diamond_dependency_runs_once():
    calls = []

    @delayed
    def base():
        calls.append("base")
        return 10

    b = base()
    out = _add(_mul(b, 2), _mul(b, 3))  # diamond: b shared by two parents
    assert out.compute() == 50
    assert calls == ["base"]  # memoized per compute


def test_schedulers_agree():
    b = _add(1, 2)
    g = _mul(_add(b, 4), _add(b, 5))
    assert compute(g, scheduler="sync") == compute(g, scheduler="threads")
    assert g.compute() == 7 * 8


def test_operator_overloads():
    n = _add(2, 3)          # 5
    assert ((n + 1) * 2).compute() == 12
    assert (10 - n).compute() == 5
    assert (n / 2).compute() == 2.5
    assert (_add([1, 2], [3])[2]).compute() == 3


def test_json_round_trip_executes():
    k = 7  # captured constant rides through cloudpickle

    @delayed
    def scale(x):
        return x * k

    g = TaskGraph([_add(scale(3), _mul(2, scale(4)))])
    s = g.to_json()
    json.loads(s)  # plain JSON artifact
    rebuilt = TaskGraph.from_json(s)
    assert rebuilt.compute() == g.compute() == [21 + 2 * 28]


def test_json_round_trip_preserves_sharing():
    @delayed
    def base():
        return 2

    b = base()
    g = TaskGraph([_add(b, b)])
    rebuilt = TaskGraph.from_json(g.to_json())
    # the shared dependency stayed ONE node through serialization
    root = rebuilt.roots[0]
    assert root.args[0] is root.args[1]
    assert rebuilt.compute() == [4]


def test_to_dot_renders_edges():
    g = TaskGraph([_add(_mul(1, 2), 3)])
    dot = g.to_dot()
    assert "digraph" in dot and "->" in dot and "_add" in dot


def test_compute_on_spark_dataframes(spark):
    from pyspark.sql import functions as F

    @delayed
    def nums():
        return spark.range(100).withColumn("v", F.col("id") * 2)

    @delayed
    def total(df):
        return df.agg(F.sum("v")).first()[0]

    n = nums()
    got = compute(total(n), total(n.compute().where("id < 10")))
    assert got[0] == 9900
    assert got[1] == 90
