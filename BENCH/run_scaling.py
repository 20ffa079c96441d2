"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per the session protocol
(BASELINE.md) the N→4N-executor criterion is evidenced by running the SAME
job on the SAME deterministic input at two local parallelism levels in
separate processes, with spark.sql.shuffle.partitions scaled with cores and
everything else identical.

Job: PageRank (both modes) over the synthetic pages link graph
(pargraph_spark.synth, seed 42 — identical rows at any parallelism), fixed
superstep count, per-superstep edges/sec; warm-up supersteps discarded.

Usage:
  python BENCH/run_scaling.py                  # full comparison → BENCH/BASELINE.md
  python BENCH/run_scaling.py --pages 200000 --pairs 8:32 2:8
  python BENCH/run_scaling.py --worker --cores 8 --pages 200000  # one level (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARMUP = 2
SUPERSTEPS = 8


def run_worker(cores: int, pages: int, mode: str) -> dict:
    from pargraph_spark.operators.edges import build_edges
    from pargraph_spark.operators.extract_links import extract_links
    from pargraph_spark.operators.pagerank import pagerank
    from pargraph_spark.session import get_spark
    from pargraph_spark.sources.pages import latest_pages
    from pargraph_spark.synth import generate_pages_spark

    shuffle = 2 * cores
    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=shuffle,
                      extra_conf={"spark.ui.enabled": "false"})
    pages_df = generate_pages_spark(spark, pages, seed=42, num_partitions=shuffle)
    edges = build_edges(extract_links(latest_pages(pages_df)), num_partitions=shuffle).persist()
    n_edges = edges.count()
    res = pagerank(spark, edges, tol=0.0, max_iter=SUPERSTEPS, mode=mode,
                   num_partitions=shuffle)
    steps = [m.to_dict() for m in res.metrics.supersteps]
    measured = steps[WARMUP:]
    eps = [s["edges_per_sec"] for s in measured]
    out = {
        "cores": cores,
        "mode": mode,
        "pages": pages,
        "edges": n_edges,
        "shuffle_partitions": shuffle,
        "supersteps": steps,
        "edges_per_sec": {
            "mean": sum(eps) / len(eps),
            "min": min(eps),
            "max": max(eps),
        },
    }
    spark.stop()
    return out


def spawn(cores: int, pages: int, mode: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO, PYTHONUNBUFFERED="1")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--cores", str(cores), "--pages", str(pages), "--mode", mode],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"worker cores={cores} failed:\n{proc.stderr[-3000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--mode", default="dataframe")
    ap.add_argument("--modes", nargs="*", default=["dataframe", "csr"])
    ap.add_argument("--pairs", nargs="*", default=["8:32"],
                    help="N:4N core pairs, e.g. 8:32 2:8")
    args = ap.parse_args()

    if args.worker:
        print(json.dumps(run_worker(args.cores, args.pages, args.mode)))
        return

    results = []
    for mode in args.modes:
        for pair in args.pairs:
            n, n4 = (int(x) for x in pair.split(":"))
            lo = spawn(n, args.pages, mode)
            hi = spawn(n4, args.pages, mode)
            eff = hi["edges_per_sec"]["mean"] / ((n4 / n) * lo["edges_per_sec"]["mean"])
            results.append({"mode": mode, "n": n, "n4": n4, "lo": lo, "hi": hi,
                            "efficiency": eff})
            print(f"[{mode}] {n}->{n4} cores: "
                  f"{lo['edges_per_sec']['mean']:.0f} -> {hi['edges_per_sec']['mean']:.0f} "
                  f"edges/s, efficiency {eff:.2f}")

    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump({"pages": args.pages, "warmup": WARMUP,
                   "supersteps": SUPERSTEPS, "results": results}, f, indent=2)

    lines = [
        "# BENCH/BASELINE — measured scaling evidence",
        "",
        f"Job: PageRank, {SUPERSTEPS} supersteps (first {WARMUP} discarded as warm-up), "
        f"synthetic pages graph seed=42, {args.pages} pages "
        f"({results[0]['lo']['edges']} edges), shuffle partitions = 2x cores, "
        "all other config identical. Each level runs in a fresh process "
        "(fresh JVM) on the same input.",
        "",
        "| mode | cores N | cores 4N | edges/s @N (mean) | edges/s @4N (mean) | efficiency T4N/(4·TN) |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['mode']} | {r['n']} | {r['n4']} | "
            f"{r['lo']['edges_per_sec']['mean']:.0f} | "
            f"{r['hi']['edges_per_sec']['mean']:.0f} | {r['efficiency']:.2f} |"
        )
    lines += [
        "",
        "Caveat: single-machine core scaling (shared memory bus, no network "
        "shuffle) is an optimistic-but-honest proxy for multi-executor "
        "scaling; per-superstep fixed costs (job scheduling, Arrow batch "
        "setup) are the dominant anti-scaling term at this input size.",
        "",
        "Raw per-superstep numbers: BENCH/scaling.json",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCH/BASELINE.md, BENCH/scaling.json")


if __name__ == "__main__":
    main()
