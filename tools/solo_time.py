"""Solo-warm timing for one or more registered queries.

Usage: python tools/solo_time.py <sf_dir> <query> [query ...] [--n 3]

Mirrors bench.py's measurement (noop sink, clearCache + GC between
runs) but runs only the named queries, each n times after one warm
pass, and prints min/median — the re-probe tool for confirming a
suspected regression or pinning an optimization outside full-bench
tail contention.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    # both `--n=3` and `--n 3` are accepted; the value token after a
    # space-separated `--n` must NOT fall through into the query list
    args, n, skip = [], 3, False
    for i, a in enumerate(sys.argv[1:], start=1):
        if skip:
            skip = False
            continue
        if a.startswith("--n"):
            if "=" in a:
                n = int(a.split("=")[1])
            else:
                n = int(sys.argv[i + 1])
                skip = True
        elif not a.startswith("--"):
            args.append(a)
    sf_dir, names = args[0], args[1:]

    from joblink_etl_spark.plans import registry
    from joblink_etl_spark.session import get_spark

    spark = get_spark("solo_time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        print(
            f"{name}: min={min(ts):.2f}s median={statistics.median(ts):.2f}s "
            f"runs={[round(t, 2) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
