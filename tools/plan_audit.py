"""Physical-plan audit: build EVERY registered query at a small SF
and flag scale anti-patterns in the planned (not executed) physical
plan — the compile-time complement to scale_probe's runtime probes.

Checks per query:
- CartesianProduct: an unconditioned big-big join (always a bug at
  scale; broadcast one-row scalar attachment plans as
  BroadcastNestedLoopJoin and is NOT flagged).
- BroadcastNestedLoopJoin with a non-trivial condition: usually an
  inequality join that silently degenerated (informational).
- GLOBAL window (a Window node with no partition spec — every row
  through one task): flagged unless the query is in
  GLOBAL_WINDOW_OK, the allowlist of windows proven bounded by
  construction (input is an aggregate of ≤ ~100 rows).

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

# global (unpartitioned) windows that are bounded BY CONSTRUCTION:
# the window's input is a post-aggregate / post-limit relation whose
# row count cannot scale with the corpus — audited r8, see
# each query/operator docstring
GLOBAL_WINDOW_OK: set[str] = {
    "zipf_fit",            # lag over <= 64 log2-rank bucket rows
    "vocab_growth",        # cumulative over 10 decile-bucket rows
    "waterfill_alloc",     # bracket windows over |domains| rows
    "cluster_sample",      # waterfill over <= k_cap cluster rows
    "dedup_ttl_decay",     # cumulative over ~10 magnitude buckets
    "merged_quantiles",    # global rank over the 512-row summary
    "embedding_outliers",  # rank over the top-N candidate aggregate
    "priority_sample",     # row_number AFTER .limit(k+1) (21 rows)
    "histogram_quantiles", # cumulative over histogram bucket rows
    "feature_bins",        # bin-boundary window over bin rows
    "skew_report",         # rank over per-group aggregate rows
    "ingestion_islands",   # lead over island summaries (#gaps rows)
}


def _global_window_lines(plan: str) -> int:
    """Count Window nodes with NO partition clause. Spark's simple
    mode prints `Window [fns], [part], [order]` (3 groups,
    partitioned+ordered), `Window [fns], [part]` (2 groups,
    partitioned unordered), or `Window [fns], [order]` (2 groups,
    GLOBAL ordered — every row through one task). The global case is
    the 2-group form whose LAST group is a pure ordering (ASC/DESC
    tokens); partitioned-unordered windows have a bare column list
    there and are fine."""
    n = 0
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *")
        if not s.startswith("Window "):
            continue
        depth, groups, cur = 0, [], []
        for ch in s:
            if ch == "[":
                if depth == 0:
                    cur = []
                depth += 1
                if depth == 1:
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                    continue
            if depth >= 1:
                cur.append(ch)
        if len(groups) == 2 and (" ASC" in groups[-1] or " DESC" in groups[-1]):
            n += 1
    return n


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
        gw = _global_window_lines(plan)
        if gw and name not in GLOBAL_WINDOW_OK:
            flagged[name] = f"global_window x{gw}"
        print(".", end="", flush=True)
    print()
    print(json.dumps({"flagged": flagged, "bnlj_info": info, "errors": errors}))


if __name__ == "__main__":
    main()
