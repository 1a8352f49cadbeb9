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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=")[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
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
