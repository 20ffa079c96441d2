"""Thin task-graph front-end: ``@delayed`` tracing, topological execution,
JSON round-trip — the reference's primary UX re-expressed for Spark.

Parity target (behavior, not mechanism):
- ``@delayed`` tracing and composition of pure Python functions
  (/root/reference/pargraph/graph/decorators.py:106-322);
- operator overloads on traced values (decorators.py:374-517);
- executable-graph serialization with pickled callables —
  ``to_json``/``from_json`` (objects.py:358-498, 264-273).

Design stance (SURVEY.md §7.0): the reference needs a scheduler because
its tasks ARE the computation; here a task's body is usually a DataFrame
program, so the CLUSTER does the heavy lifting and the "backend" is a
driver-side thread pool that submits independent Spark jobs concurrently
(threads share the SparkSession; separate scheduler pools would give
fairness if needed). There is no dict-graph IR, no rewrite engine —
Catalyst culls/fuses each node's plan; this module only orders node
execution and memoizes shared dependencies (the diamond in a DAG runs
once, like the reference's ref-counted futures, engine.py:42-129).

Example::

    @delayed
    def edges(spark):   return build_edges(...)
    @delayed
    def ranks(e):       return pagerank(spark, e).ranks
    @delayed
    def top(r, k):      return r.orderBy(F.desc("rank")).limit(k)

    top(ranks(edges(spark)), 10).compute()          # traced DAG -> result
    g = task.to_graph(); s = g.to_json()            # portable artifact
    TaskGraph.from_json(s).compute()                # replay anywhere
"""

from __future__ import annotations

import base64
import functools
import json
import operator
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable

from pyspark import cloudpickle


class Delayed:
    """A traced call: ``fn(*args, **kwargs)`` whose arguments may be other
    Delayed nodes. Building is free; nothing executes until compute()."""

    __slots__ = ("fn", "args", "kwargs", "name")

    def __init__(self, fn: Callable, args: tuple, kwargs: dict, name: str | None = None):
        self.fn = fn
        self.args = args
        self.kwargs = kwargs
        self.name = name or getattr(fn, "__name__", "task")

    # ---- execution ------------------------------------------------------
    def compute(self, scheduler: str = "threads", max_workers: int = 8) -> Any:
        return compute(self, scheduler=scheduler, max_workers=max_workers)[0]

    def to_graph(self) -> "TaskGraph":
        return TaskGraph([self])

    # ---- ergonomics: operator overloads build further Delayed nodes -----
    def _binop(self, op, other, swap=False):
        if swap:
            return Delayed(op, (other, self), {}, name=op.__name__)
        return Delayed(op, (self, other), {}, name=op.__name__)

    def __add__(self, o):
        return self._binop(operator.add, o)

    def __radd__(self, o):
        return self._binop(operator.add, o, swap=True)

    def __sub__(self, o):
        return self._binop(operator.sub, o)

    def __rsub__(self, o):
        return self._binop(operator.sub, o, swap=True)

    def __mul__(self, o):
        return self._binop(operator.mul, o)

    def __rmul__(self, o):
        return self._binop(operator.mul, o, swap=True)

    def __truediv__(self, o):
        return self._binop(operator.truediv, o)

    def __rtruediv__(self, o):
        return self._binop(operator.truediv, o, swap=True)

    def __getitem__(self, k):
        return self._binop(operator.getitem, k)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Delayed({self.name})"


def delayed(fn: Callable) -> Callable:
    """Decorator: calls build Delayed nodes instead of executing. Pure
    functions only (same contract as the reference's @delayed)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        return Delayed(fn, args, kwargs)

    wrapper.__wrapped__ = fn
    return wrapper


def _walk(roots: list[Delayed]) -> list[Delayed]:
    """Deterministic post-order over the DAG (dependencies first), each
    node once (by identity — a shared dependency is a single node)."""
    order: list[Delayed] = []
    seen: set[int] = set()

    def visit(node: Delayed) -> None:
        if id(node) in seen:
            return
        seen.add(id(node))
        for dep in list(node.args) + list(node.kwargs.values()):
            if isinstance(dep, Delayed):
                visit(dep)
        order.append(node)

    for r in roots:
        visit(r)
    return order


def compute(*roots: Delayed, scheduler: str = "threads", max_workers: int = 8) -> list[Any]:
    """Execute the DAG under the given roots; returns one result per root.

    scheduler="threads" runs independent ready nodes concurrently in a
    driver thread pool (concurrent Spark job submission — the idiomatic
    Spark counterpart of the reference's process backends, which would
    only add pickling overhead around JVM-side work).
    scheduler="sync" runs nodes sequentially in topological order.
    Shared nodes are computed exactly once (memoized per compute call)."""
    if scheduler not in ("threads", "sync"):
        raise ValueError(f"unknown scheduler {scheduler!r}")
    order = _walk(list(roots))
    results: dict[int, Any] = {}

    def resolve(v):
        return results[id(v)] if isinstance(v, Delayed) else v

    def run(node: Delayed):
        args = [resolve(a) for a in node.args]
        kwargs = {k: resolve(v) for k, v in node.kwargs.items()}
        return node.fn(*args, **kwargs)

    if scheduler == "sync":
        for node in order:
            results[id(node)] = run(node)
    else:
        # wave-style: peel ready nodes, run each wave in the pool
        remaining = list(order)
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            while remaining:
                ready = [
                    n for n in remaining
                    if all(
                        id(d) in results
                        for d in list(n.args) + list(n.kwargs.values())
                        if isinstance(d, Delayed)
                    )
                ]
                futures = {id(n): pool.submit(run, n) for n in ready}
                for n in ready:
                    results[id(n)] = futures[id(n)].result()
                remaining = [n for n in remaining if id(n) not in results]
    return [results[id(r)] for r in roots]


class TaskGraph:
    """A set of root Delayed nodes with a portable JSON form.

    to_json pickles each node's callable (pyspark's cloudpickle — the
    same serializer the reference uses for Const/graph round-trips,
    objects.py:264-273) and every non-Delayed argument, base64-wrapped in
    a plain-JSON node list; from_json rebuilds an executable graph.
    SECURITY: from_json executes pickled code on compute — only load
    artifacts you wrote (same trust model as the reference's from_json).
    """

    def __init__(self, roots: list[Delayed]):
        self.roots = roots

    def compute(self, scheduler: str = "threads", max_workers: int = 8) -> list[Any]:
        return compute(*self.roots, scheduler=scheduler, max_workers=max_workers)

    # ---- serialization --------------------------------------------------
    def to_json(self) -> str:
        order = _walk(self.roots)
        ids = {id(n): i for i, n in enumerate(order)}

        def enc_val(v) -> dict:
            if isinstance(v, Delayed):
                return {"ref": ids[id(v)]}
            return {"pickle": base64.b64encode(cloudpickle.dumps(v)).decode()}

        nodes = [
            {
                "id": ids[id(n)],
                "name": n.name,
                "fn": base64.b64encode(cloudpickle.dumps(n.fn)).decode(),
                "args": [enc_val(a) for a in n.args],
                "kwargs": {k: enc_val(v) for k, v in n.kwargs.items()},
            }
            for n in order
        ]
        return json.dumps(
            {"version": 1, "nodes": nodes, "roots": [ids[id(r)] for r in self.roots]}
        )

    @classmethod
    def from_json(cls, s: str) -> "TaskGraph":
        doc = json.loads(s)
        built: dict[int, Delayed] = {}

        def dec_val(v: dict):
            if "ref" in v:
                return built[v["ref"]]
            return cloudpickle.loads(base64.b64decode(v["pickle"]))

        for nd in doc["nodes"]:  # nodes are stored dependencies-first
            fn = cloudpickle.loads(base64.b64decode(nd["fn"]))
            args = tuple(dec_val(a) for a in nd["args"])
            kwargs = {k: dec_val(v) for k, v in nd["kwargs"].items()}
            built[nd["id"]] = Delayed(fn, args, kwargs, name=nd["name"])
        return cls([built[i] for i in doc["roots"]])

    def to_dot(self) -> str:
        """GraphViz rendering of the task DAG (the reference's to_dot
        counterpart; plans/jobspec.py renders the physical side)."""
        order = _walk(self.roots)
        ids = {id(n): i for i, n in enumerate(order)}
        lines = ["digraph tasks {", "  rankdir=LR;"]
        for n in order:
            lines.append(f'  n{ids[id(n)]} [label="{n.name}"];')
            for d in list(n.args) + list(n.kwargs.values()):
                if isinstance(d, Delayed):
                    lines.append(f"  n{ids[id(d)]} -> n{ids[id(n)]};")
        lines.append("}")
        return "\n".join(lines)
