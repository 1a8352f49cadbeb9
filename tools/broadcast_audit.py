"""Implicit-broadcast audit: find misestimated corpus-scale
broadcasts of the class that aborts at cluster scale.

Catalyst's size estimate of a relation downstream of an explode
(Generate) is a guess — the actual row count is data-dependent and
the estimator has no cardinality for it. When such a relation is
CORPUS-SCALE and the guess lands under the auto-broadcast threshold,
the planner emits BroadcastExchange and the job dies collecting the
hashed relation at real data sizes (observed: the incremental
substring-dedup index at x100, >1 GiB vs spark.driver.maxResultSize;
r12 also caught nb_classify's exploded feature re-join and
interval_join_binned's exploded interval side this way).

This tool builds each registered query's physical plan against a
LARGE corpus (the cached x100 scratch replica by default — at small
SFs the same structural pattern is often a legitimately-small
broadcast) and flags every BroadcastExchange whose subtree contains
a Generate with no bounding operator (aggregate / limit /
TakeOrdered) between the explode and the exchange. Whitelisted
entries are bounded by PRODUCTION CONTRACT rather than by plan
shape, with the reason recorded.

Filter/scan-class broadcasts (no explode) are NOT flagged: their
estimates track file sizes, so the planner flips them to sort-merge
as data grows — that class is self-correcting.

Usage: python tools/broadcast_audit.py [sf_dir] [query ...]
Exit 1 on any non-whitelisted generate-class broadcast.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOUND_NODES = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "GlobalLimit",
    "TakeOrderedAndProject",
    "CollectLimit",
)

# (query, reason) — generate-class broadcasts bounded by production
# contract, not plan shape. Keep each reason checkable.
WHITELIST = {
    # bench/benchmark side of decontamination: constant-size in
    # production (the held-out eval suite); the testdata synthesizes
    # it as a corpus modulus, which is what the auditor sees.
    "semantic_decontam": "broadcast side is the benchmark embedding set "
    "(constant in production; testdata synthesizes it as vec_id % 46)",
    # corpus capped at doc_id < 60 BY DESIGN (dense synthetic
    # vocabulary; the production lever is max_gram_df) — documented
    # in the plan docstring and confirmed N-independent by the x100
    # probe (factor 0.56x).
    "containment_pairs": "constant-capped corpus (doc_id < 60) by design",
}


def generate_class_broadcasts(plan: str) -> int:
    lines = plan.split("\n")
    bad = 0
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        indent = len(ln) - len(ln.lstrip(" :+-"))
        sub = []
        for nxt in lines[i + 1:]:
            nind = len(nxt) - len(nxt.lstrip(" :+-"))
            if nind <= indent and nxt.strip():
                break
            sub.append(nxt)
        subtxt = "\n".join(sub)
        if "Generate" in subtxt and not any(b in subtxt for b in BOUND_NODES):
            bad += 1
    return bad


def main() -> None:
    default_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "sf1x100p",
    )
    args = sys.argv[1:]
    sf_dir = args[0] if args else default_dir
    only = set(args[1:])

    from joblink_etl_spark.plans import registry
    from joblink_etl_spark.session import get_spark

    try:
        sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
            ),
        )
        from test_plans import CONSTRUCTION_JOB_EXEMPT as EXEMPT
    except ImportError:
        EXEMPT = frozenset()

    spark = get_spark("broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")

    flagged, whitelisted, errors, skipped = {}, {}, {}, []
    for name, fn in registry.queries().items():
        if only and name not in only:
            continue
        if not only and name in EXEMPT:
            # iterative builders run bounded construction jobs that
            # are expensive against the x100 corpus; their index
            # state is bounded by construction and runtime-probed at
            # x100 instead (PERF.md)
            skipped.append(name)
            continue
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .explainString(mode)
            )
        except Exception as e:  # noqa: BLE001 — audit must not die on one query
            errors[name] = str(e)[:150]
            continue
        n = generate_class_broadcasts(plan)
        if n:
            (whitelisted if name in WHITELIST else flagged)[name] = n
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "flagged": flagged,
                "whitelisted": {k: WHITELIST[k] for k in whitelisted},
                "errors": errors,
                "n_skipped_exempt": len(skipped),
            }
        )
    )
    sys.exit(1 if flagged or errors else 0)


if __name__ == "__main__":
    main()
