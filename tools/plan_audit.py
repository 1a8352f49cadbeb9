"""Physical-plan audit: build EVERY registered query at a small SF
and flag scale anti-patterns in the planned (not executed) physical
plan — the compile-time complement to scale_probe's runtime probes.

Checks per query:
- CartesianProduct: an unconditioned big-big join (always a bug at
  scale; broadcast one-row scalar attachment plans as
  BroadcastNestedLoopJoin and is NOT flagged).
- BroadcastNestedLoopJoin with a non-trivial condition: usually an
  inequality join that silently degenerated (informational).

Queries that are quadratic BY DESIGN and guarded (documented
baselines) are whitelisted below.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

# documented quadratic baselines / bounded-corpus verification
# queries — kept only as recall yardsticks, excluded from bench,
# guarded by row caps (see VERDICT r5 / operators' docstrings)
WHITELIST = {
    "cosine_near_dups",
    "ngram_jaccard",
    "tfidf_pairs",
    "prefix_jaccard",
    "snm_pairs",
    "dedup_method_recall",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from joblink_etl_spark.plans import registry
    from joblink_etl_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    flagged, info, errors = {}, {}, {}
    qs = registry.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            errors[name] = str(e).splitlines()[0][:200]
            continue
        if "CartesianProduct" in plan and name not in WHITELIST:
            flagged[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in WHITELIST:
            # one-row scalar attachments are fine; record for review
            info[name] = plan.count("BroadcastNestedLoopJoin")
        print(".", end="", flush=True)
    print()
    print(json.dumps({"flagged": flagged, "bnlj_info": info, "errors": errors}))


if __name__ == "__main__":
    main()
