"""Registry-wide SortAggregate scan (r14/r15 sweep).

A SortAggregate in a declared plan usually means an aggregate whose
buffer carries an array/struct/string payload (first()-buffered
non-key columns, array-typed carry-throughs): the whole input rides a
per-partition SORT instead of hash aggregation — the minhash
`first(shingles)` / span_unit_repeats / record_linkage class fixed in
r14-r15. Keyless GLOBAL aggregates also plan as SortAggregate and are
fine (nothing to hash-partition by).

Builds every registered query's physical plan (sf0.001 — aggregate
strategy is type-driven, not stats-driven) and prints the queries
whose plans contain SortAggregate. Expected steady state: only
repeat_profile (keyless global aggregates by design).

Usage: python tools/sortagg_scan.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from joblink_etl_spark.plans import registry
    from joblink_etl_spark.session import get_spark

    spark = get_spark("sortagg-scan")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    hits: dict[str, int] = {}
    errs: dict[str, str] = {}
    for n, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            c = plan.count("SortAggregate")
            if c:
                hits[n] = c
        except Exception as e:  # noqa: BLE001 — survey tool, report and move on
            errs[n] = repr(e)[:120]
        spark.catalog.clearCache()
    print("SORTAGG HITS:", hits)
    print("ERRORS:", errs)
    print("scanned", len(qs))
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
