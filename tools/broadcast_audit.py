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

SCAN MODE (r14, closing the r12 detection-limit caveat): the scan
reads the 'formatted' explain string, which prints the main plan
tree AND every subquery plan tree (the `===== Subqueries =====`
sections) in the same indentation grammar — a generate-class
broadcast living only inside a scalar/IN subquery is classified,
not excused in prose (tests/test_tools.py pins a synthetic
scalar-subquery catch). Empirical note recorded while making the
switch: on THIS Spark (4.1.2) 'simple' mode also inlines subquery
subtrees as innerChildren (`:  +- Subquery ...`), so the r12-era
blind-spot description was already stale for this version; the
formatted grammar is kept because it prints each tree exactly once
in one uniform shape (no `:`-prefixed inner-children variant to
special-case) and makes the subquery coverage explicit rather than
version-dependent. ReusedExchange remains sound: the defining
subtree of every reused exchange is printed (and scanned) exactly
once, at its first occurrence in whichever tree owns it. The
operator-detail sections below each tree ('(6) BroadcastExchange'
etc.) start at column 0, so the indentation-subtree walk terminates
before them and they contribute no phantom matches
(tests/test_tools.py). Treat this scan as structural triage, with
the x100 runtime probes (PERF.md) as the executable backstop.

CONSTRUCTION_JOB_EXEMPT queries (iterative builders whose plan
CONSTRUCTION runs Spark jobs) are not planned in the standing run —
but since r13 every one of them carries an explicit per-query
disposition, printed in the output:
  * probe      — the query has an x100 RUNTIME probe row in PERF.md
                 (tools/scale_probe.py family): it was executed at
                 x100, where a misestimated broadcast aborts loudly
                 (exactly how incremental_repeat_spans was caught).
  * x100-audit — `--exempt-audit` built it (capped where noted)
                 against the x100 replica this round: construction
                 jobs executed at x100 + final-plan scan; banked as
                 AUDIT_EXEMPT_r13.json.
  * bound      — a documented reason the constructed state is
                 size-bounded independent of corpus scale.
tests/test_plans.py enforces that the disposition table covers the
exempt set exactly, so a new exempt query fails until dispositioned.

Usage:
  python tools/broadcast_audit.py [--round N] [sf_dir] [query ...]
  python tools/broadcast_audit.py --exempt-audit [--round N] [sf_dir] [query ...]
Exit 1 on any non-whitelisted generate-class broadcast (or, in
--exempt-audit mode, on any exempt query that errors or flags).
A designed quadratic-guard refusal (the cosine_near_dups max_rows
ValueError) is status 'guard_refusal_by_design' — a verified
contract, not a failure — and does NOT fail the gate (ADVICE r13).
--round stamps the artifact's `round` field (default: latest
CORRECTNESS_r*.json round + 1) so the banked AUDIT_EXEMPT_r{N}.json
is reproducible from this committed tool.
"""

from __future__ import annotations

import json
import os
import sys
import time

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

# Exempt queries whose constructed/loop state is bounded independent
# of corpus scale — the "bound" disposition kind. Everything exempt
# that is neither here nor covered by a scale_probe x100 family is
# expected to appear in the banked --exempt-audit artifact.
EXEMPT_BOUNDS = {
    "cosine_near_dups": "the O(N²) all-pairs baseline REFUSES corpus-scale "
    "input by contract (cosine_near_dup_pairs max_rows guard — verified "
    "live by the r13 x100 exempt-audit run, which recorded the designed "
    "refusal); bench excludes it as the labeled quadratic baseline",
    "lrs_exact_fixed": "runs on the SF-INVARIANT enum vocabulary (61 "
    "strings: nation/region names + part type/brand enums) — the corpus "
    "never scales with SF (plans/ext_q.py docstring); also in the r13 "
    "exempt-audit artifact",
    "web_curation_pipeline": "synthetic crawl capped at max_docs=20 by "
    "construction (pin census: bounded); also in the r13 exempt-audit "
    "artifact",
    "fetch_cascade": "operates on a fetch BATCH (batch_size=40 contract, "
    "SURVEY §2.9 A2 head-N) — never corpus-scale; also in the r13 "
    "exempt-audit artifact",
}

# Capped construction variants for --exempt-audit: same operators and
# plan shapes, fewer iterations/probe rounds, so the x100 build cost
# stays bounded while every per-round plan shape (the dangerous gram/
# vocab joins) still executes once against the replica.
def _capped_lrs(spark, sf_dir):
    from joblink_etl_spark.operators import suffix as SX
    from joblink_etl_spark.plans.ext_q import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # min_len=256: one-to-few doubling probes; each probe runs the full
    # corpus-scale gram aggregation + join (the shape that aborted in
    # r12's incremental_repeat_spans) at x100.
    L, text, occ = SX.longest_repeated_substring(docs, min_count=2, min_len=256)
    return spark.createDataFrame([(L, occ)], "lrs_len BIGINT, occurrences BIGINT")


def _capped_bpe_merges(spark, sf_dir):
    from joblink_etl_spark.operators import bpe as B
    from joblink_etl_spark.plans.ext_q import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # 2 merges instead of 8: the per-merge argmax job over the
    # persisted corpus-scale vocab (the risky relation) runs twice.
    merges = B.train_bpe(docs, n_merges=2)
    return spark.createDataFrame(
        merges, "rank BIGINT, left_sym STRING, right_sym STRING, pair_count BIGINT"
    )


def _capped_bpe_encode(spark, sf_dir):
    from joblink_etl_spark.operators import bpe as B
    from joblink_etl_spark.plans.ext_q import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = B.train_bpe(docs, n_merges=2)
    return B.bpe_encode(docs, merges)


CAPPED_RUNNERS = {
    "lrs_exact": _capped_lrs,
    "bpe_merges": _capped_bpe_merges,
    "bpe_merges_fixed": None,  # enum-vocab trainer: cheap, run as-is
    "bpe_encode": _capped_bpe_encode,
}
CAPPED_RUNNERS = {k: v for k, v in CAPPED_RUNNERS.items() if v is not None}


def exempt_dispositions(exempt) -> dict[str, str]:
    """name -> 'kind: detail' for every exempt query. probe-kind is
    derived from tools/scale_probe.py's FAMILIES map (the queries with
    x100 runtime rows in PERF.md), bound-kind from EXEMPT_BOUNDS, and
    the remainder cites the banked --exempt-audit artifact."""
    from scale_probe import FAMILIES

    probed = {q: f for f, q in FAMILIES.items()}
    out = {}
    for name in sorted(exempt):
        if name in probed:
            out[name] = (
                f"probe: x100 runtime probe row (PERF.md, scale_probe "
                f"family '{probed[name]}')"
            )
        elif name in EXEMPT_BOUNDS:
            out[name] = f"bound: {EXEMPT_BOUNDS[name]}"
        else:
            capped = " (capped construction)" if name in CAPPED_RUNNERS else ""
            out[name] = (
                f"x100-audit: built against the x100 replica{capped} — "
                f"{_latest_exempt_artifact()}"
            )
    return out


def _latest_exempt_artifact() -> str:
    import glob

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    banked = sorted(
        glob.glob(os.path.join(root, "AUDIT_EXEMPT_r*.json")),
        key=lambda f: int("".join(c for c in os.path.basename(f) if c.isdigit())),
    )
    return os.path.basename(banked[-1]) if banked else "AUDIT_EXEMPT (unbanked)"


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


def _default_round() -> int:
    """Latest banked CORRECTNESS round + 1 — the round being built."""
    import glob
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    ]
    return (max(rounds) + 1) if rounds else 0


def _is_guard_refusal(exc: Exception) -> bool:
    """The designed O(N²) quadratic-guard refusal (similarity.py's
    cosine_near_dup_pairs max_rows contract) — a verified refusal of
    corpus-scale input, not an audit failure."""
    return isinstance(exc, ValueError) and "allow_quadratic" in str(exc)


def _exempt_set():
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
        ),
    )
    try:
        from test_plans import CONSTRUCTION_JOB_EXEMPT as EXEMPT
    except ImportError:
        EXEMPT = frozenset()
    return EXEMPT


def main() -> None:
    default_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "sf1x100p",
    )
    args = sys.argv[1:]
    exempt_mode = "--exempt-audit" in args
    args = [a for a in args if a != "--exempt-audit"]
    round_no = None
    if "--round" in args:
        i = args.index("--round")
        round_no = int(args[i + 1])
        del args[i : i + 2]
    if round_no is None:
        round_no = _default_round()
    sf_dir = args[0] if args else default_dir
    only = set(args[1:])

    from joblink_etl_spark.plans import registry
    from joblink_etl_spark.session import get_spark

    EXEMPT = _exempt_set()
    dispositions = exempt_dispositions(EXEMPT)

    spark = get_spark("broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # 'formatted' prints subquery plan trees too — see SCAN MODE above.
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    if exempt_mode:
        # build every exempt query (capped where registered) against the
        # replica: construction jobs EXECUTE at x100 (an abort here is a
        # real catch), then the final plan gets the structural scan.
        results = {}
        for name in sorted(EXEMPT):
            if only and name not in only:
                continue
            fn = CAPPED_RUNNERS.get(name) or registry.queries()[name]
            t0 = time.perf_counter()
            try:
                plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
                results[name] = {
                    "status": "ok",
                    "generate_class": generate_class_broadcasts(plan),
                    "capped": name in CAPPED_RUNNERS,
                    "sec": round(time.perf_counter() - t0, 2),
                }
            except Exception as e:  # noqa: BLE001
                if _is_guard_refusal(e):
                    results[name] = {
                        "status": "guard_refusal_by_design",
                        "detail": "cosine_near_dup_pairs max_rows guard "
                        "refused the x100 corpus — the documented contract "
                        "for the labeled quadratic baseline",
                        "sec": round(time.perf_counter() - t0, 2),
                    }
                else:
                    results[name] = {
                        "status": "error",
                        "err": str(e)[:200],
                        "capped": name in CAPPED_RUNNERS,
                        "sec": round(time.perf_counter() - t0, 2),
                    }
            spark.catalog.clearCache()
            print(
                f"[exempt-audit] {name}: {results[name]['status']} "
                f"gc={results[name].get('generate_class')} "
                f"({results[name]['sec']}s)",
                file=sys.stderr,
                flush=True,
            )
        bad = {
            n: r
            for n, r in results.items()
            if r["status"] not in ("ok", "guard_refusal_by_design")
            or (r.get("generate_class") and n not in WHITELIST)
        }
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "round": round_no,
                    "what": "every CONSTRUCTION_JOB_EXEMPT query built "
                    "(capped where noted) against the x100 perturbed "
                    "replica: construction jobs executed at x100 + "
                    "structural scan of the final plan "
                    "(tools/broadcast_audit.py --exempt-audit)",
                    "scan_mode": "formatted",
                    "n_ok": sum(
                        1 for r in results.values() if r["status"] == "ok"
                    ),
                    "n_guard_refusal": sum(
                        1
                        for r in results.values()
                        if r["status"] == "guard_refusal_by_design"
                    ),
                    "exempt_results": results,
                    "bad": bad,
                }
            )
        )
        sys.exit(1 if bad else 0)

    flagged, whitelisted, errors = {}, {}, {}
    statuses = {}
    for name, fn in registry.queries().items():
        if only and name not in only:
            continue
        if not only and name in EXEMPT:
            statuses[name] = dispositions[name]
            continue
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .explainString(mode)
            )
        except Exception as e:  # noqa: BLE001 — audit must not die on one query
            errors[name] = str(e)[:150]
            statuses[name] = "error"
            continue
        n = generate_class_broadcasts(plan)
        if n:
            (whitelisted if name in WHITELIST else flagged)[name] = n
            statuses[name] = (
                f"whitelisted ({n} generate-class)" if name in WHITELIST
                else f"FLAGGED ({n} generate-class)"
            )
        else:
            statuses[name] = "clean"
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "round": round_no,
                "scan_mode": "formatted",
                "flagged": flagged,
                "whitelisted": {k: WHITELIST[k] for k in whitelisted},
                "errors": errors,
                "exempt_dispositions": {
                    n: dispositions[n] for n in sorted(EXEMPT)
                },
                "queries": statuses,
                "n_queries": len(statuses),
            }
        )
    )
    sys.exit(1 if flagged or errors else 0)


if __name__ == "__main__":
    main()
