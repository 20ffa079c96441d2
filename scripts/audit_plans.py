"""Physical-plan anti-pattern audit over the 50 contract queries.

Builds every __spark_entry__.queries() DataFrame at a small SF and greps
the executed plan for the scale anti-patterns the engine bans:

  - BatchEvalPython / PythonUDF   -> per-row Python in the hot path
  - CartesianProduct              -> unbounded all-pairs
  - BroadcastNestedLoopJoin       -> O(n*m) probe (allowed only in the
                                     explicitly-labeled brute tiers)

and reports Exchange counts per query (shuffle budget drift shows up as
a count jump between rounds). Iterative operators execute eager jobs
while BUILDING their plan — run at sf0.001 where that costs seconds.

Usage: PYTHONPATH=/root/repo python scripts/audit_plans.py [sf_dir] [names...]
Exit code 1 if any disallowed pattern appears.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from pargraph_spark.session import get_spark

# nested-loop shapes that are the documented point of the query:
# - brute tiers: exact all-pairs baselines beside the bucketed tiers
# - broadcast-scalar fans: crossJoin against a 1-ROW aggregate (tf-idf /
#   top_terms N-docs normalizer text.py:181, dedup.py:337; modularity's
#   m aggregate graphstats.py:152) or a tiny constant Range (node2vec's
#   num_walks fan sampling.py:262) — O(n), audited by the r4 judge sweep
ALLOW_NLJ = {"embedding_near_dup_bucketed", "cosine_topk", "pq_adc_topk",
             "ann_lsh", "ann_ivf", "kmeans_clusters",
             "top_terms", "tfidf_cosine_pairs", "modularity_lpa20",
             "node2vec_walks_3steps"}
BANNED = ("BatchEvalPython", "CartesianProduct")
ARROW_OK = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(entrymod.queries())
    spark = get_spark("plan-audit", cores=4, shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false"})
    qs = entrymod.queries()
    report, bad = {}, []
    for name in names:
        try:
            df = qs[name](spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - audit must cover all
            report[name] = {"error": str(e)[:200]}
            bad.append(name)
            continue
        hits = [p for p in BANNED if p in plan]
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOW_NLJ:
            hits.append("BroadcastNestedLoopJoin")
        report[name] = {
            "exchanges": plan.count("Exchange"),
            "arrow_stages": sum(plan.count(a) for a in ARROW_OK),
            "hits": hits,
        }
        if hits:
            bad.append(name)
        print(f"{name:34s} exch={report[name]['exchanges']:3d} "
              f"{'BAD ' + ','.join(hits) if hits else 'ok'}", flush=True)
    print(json.dumps({"bad": bad, "n": len(names)}))
    with open("/tmp/plan_audit.json", "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
