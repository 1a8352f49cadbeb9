"""scene_cuts positional-artifact experiment (r11 verdict item 5).

In every r11 bench attempt scene_cuts ran 2.1-2.5 s IN-RUN but
re-probed at 0.7-0.9 s — a deterministic positional artifact that
appeared when the r11 window rotation moved it into a new
predecessor neighborhood. This probe isolates the mechanism:

  phase solo    — scene_cuts alone (clearCache+gc between reps), the
                  true level.
  phase neigh   — replay the N registry-order predecessors, then time
                  scene_cuts exactly as bench does. Inflation here
                  reproduces the artifact under controlled conditions.
  phase bisect  — halve the predecessor list to find the minimal
                  inflating prefix (which query's shadow it is).
  phase fence   — same neighborhood, but between the predecessor and
                  the timed query run a FENCE: a trivial job + short
                  sleep after clearCache+System.gc(), absorbing async
                  ContextCleaner block removal / concurrent GC tail /
                  deferred JIT recompilation outside the timed window.

Usage: python tools/fence_probe.py [query] [n_predecessors] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FENCE_SLEEP_SEC = 0.3


def _run(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def _cleanup(spark) -> None:
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def _fence(spark) -> None:
    # a tiny job forces a scheduler round-trip so async cleanup
    # (ContextCleaner unpersists, shuffle file deletion) queued by the
    # predecessor drains before the timed window opens; the sleep
    # lets concurrent GC cycles started by System.gc() finish.
    spark.range(100_000).selectExpr("sum(id)").collect()
    time.sleep(FENCE_SLEEP_SEC)


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "scene_cuts"
    n_pred = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from joblink_etl_spark.plans import registry
    from joblink_etl_spark.session import get_spark

    spark = get_spark("fence-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = list(qs)
    idx = names.index(target)
    preds = names[max(0, idx - n_pred):idx]

    out: dict = {"target": target, "predecessors": preds, "sf_dir": sf_dir}

    # warm
    _run(qs[target], spark, sf_dir)
    _cleanup(spark)

    out["solo"] = [
        (_run(qs[target], spark, sf_dir), _cleanup(spark))[0] for _ in range(reps)
    ]

    def neighborhood(pred_list, fence: bool) -> list[float]:
        times = []
        for _ in range(reps):
            for p in pred_list:
                _run(qs[p], spark, sf_dir)
                _cleanup(spark)
            if fence:
                _fence(spark)
            times.append(_run(qs[target], spark, sf_dir))
            _cleanup(spark)
        return times

    out["neigh"] = neighborhood(preds, fence=False)
    solo_med = sorted(out["solo"])[len(out["solo"]) // 2]
    neigh_med = sorted(out["neigh"])[len(out["neigh"]) // 2]
    out["inflation"] = round(neigh_med / max(solo_med, 1e-9), 2)

    if out["inflation"] > 1.5 and len(preds) > 1:
        # bisect: first vs second half of the predecessor list
        half = len(preds) // 2
        out["bisect_first_half"] = neighborhood(preds[:half], fence=False)
        out["bisect_second_half"] = neighborhood(preds[half:], fence=False)

    out["fenced"] = neighborhood(preds, fence=True)
    fenced_med = sorted(out["fenced"])[len(out["fenced"]) // 2]
    out["fenced_inflation"] = round(fenced_med / max(solo_med, 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
