"""Streaming throughput benchmark (r11 verdict item 6): the ST1-ST7
claims get the same artifact treatment as batch.

Drains five representative streaming pipelines with
trigger(availableNow) over file sources built from the sf tables
(10 source files, maxFilesPerTrigger=1 → ~10 micro-batches each, so
the per-micro-batch latency distribution is real, not a single-batch
artifact):

  * enqueue          — the reference front end (ST1+ST4: URL filter +
                       watermarked keyed dedup) over a link stream
                       synthesized from the events table (100k rows
                       at sf0.1).
  * windowed_counts  — native watermarked tumbling-window aggregation
                       over the events stream.
  * band_registry    — custom stateful near-dup gate (MinHash band
                       buckets as keyed state) over the documents
                       stream.
  * k_anon_gate      — custom stateful k-anonymity release gate over
                       the events stream (QI = event_type x user
                       cohort).
  * t_closeness_gate — custom stateful t-closeness release gate, same
                       QI classes, value-decile buckets vs a frozen
                       reference distribution (derived offline from
                       the batch corpus — the production pattern).

Prints ONE JSON line: per-pipeline input rows, drain wall-clock,
rows/sec, micro-batch count, and p50/p95 micro-batch execution time
from the query's recentProgress. Source builds, schema setup, and the
reference-distribution derivation are NOT timed (they are offline
steps in production).

Since r13 each pipeline runs TWO ARMS — maxFilesPerTrigger=1 (~10
micro-batches, the adversarial per-batch state-commit floor) and
maxFilesPerTrigger=5 (~2 micro-batches, 5x rows per batch) — so the
batch-size amortization of the state-commit floor is MEASURED, not
asserted (r12 verdict item 4).

`--x100-gates` mode (r12 verdict item 6) instead drives the custom
stateful gates (band_registry, band_registry_ttl60, k_anon_gate)
through availableNow drains of the x10 and x100 scratch replicas
(tools/scale_probe.py builds them) and records rows/sec plus the
state-store footprint from the progress stateOperators (rows in
state, memory bytes, bytes/state-row) — the executable check of the
gates' documented bounded-keyed-state claims. The ttl60 arm (r14)
shows the TTL bound in action: with the TTL shorter than the drain,
state stays ~one batch's buckets instead of the r13-measured 454 MB
linear growth.

Usage: python bench_streaming.py [--x100-gates]
(env: SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SOURCE_FILES = 10


def _drain_timed(df, sink_dir: str, ckpt_dir: str) -> dict:
    """availableNow drain returning wall-clock + per-batch stats."""
    t0 = time.perf_counter()
    q = (
        df.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = [
        p
        for p in (q.recentProgress or [])
        if p.get("numInputRows", 0) > 0
    ]
    durs = sorted(
        p["durationMs"]["triggerExecution"]
        for p in batches
        if "durationMs" in p and "triggerExecution" in p["durationMs"]
    )
    rows = sum(p["numInputRows"] for p in batches)
    out = {
        "rows": int(rows),
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
        "n_batches": len(batches),
    }
    if durs:
        out["batch_p50_ms"] = int(statistics.median(durs))
        out["batch_p95_ms"] = int(durs[min(len(durs) - 1, int(0.95 * len(durs)))])
    # state-store footprint from the LAST progress with state info:
    # rows held in the store + memory bytes (HDFSBackedStateStore
    # reports loaded-map size) -> bytes per state row
    state = None
    for p in reversed(batches):
        ops = p.get("stateOperators") or []
        if ops:
            state = {
                "state_rows": int(sum(o.get("numRowsTotal", 0) for o in ops)),
                "state_bytes": int(
                    sum(o.get("memoryUsedBytes", 0) for o in ops)
                ),
            }
            if state["state_rows"]:
                state["bytes_per_state_row"] = round(
                    state["state_bytes"] / state["state_rows"], 1
                )
            break
    if state:
        out.update(state)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from joblink_etl_spark.session import get_spark
    from joblink_etl_spark.sources import table
    from joblink_etl_spark.streaming.pipeline import (
        read_link_stream,
        streaming_band_registry,
        streaming_enqueue,
        streaming_k_anon_gate,
        streaming_t_closeness_gate,
        windowed_event_counts,
    )

    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="bench_streaming_")
    results: dict[str, dict] = {}

    try:
        # ---- source builds (offline, untimed) --------------------------
        ev = table(spark, sf_dir, "events")
        links_src = os.path.join(scratch, "links")
        ev.select(
            F.col("event_type").alias("sheet_name"),
            F.col("event_id").cast("long").alias("row_index"),
            F.concat(
                F.lit("https://jobs.lever.co/"),
                F.col("user_id").cast("string"),
                F.lit("/"),
                F.col("event_id").cast("string"),
            ).alias("url"),
            F.col("ts").alias("edited_at"),
        ).repartition(N_SOURCE_FILES).write.parquet(links_src)

        ev_src = os.path.join(scratch, "events")
        ev_cols = ev.select(
            "event_id", "ts", "user_id", "event_type", F.col("value").cast("double")
        )
        ev_cols.repartition(N_SOURCE_FILES).write.parquet(ev_src)
        ev_schema = spark.read.parquet(ev_src).schema

        docs_src = os.path.join(scratch, "docs")
        docs = table(spark, sf_dir, "documents").select("doc_id", "text")
        docs.repartition(N_SOURCE_FILES).write.parquet(docs_src)
        docs_schema = spark.read.parquet(docs_src).schema

        # privacy-gate projection: QI = (event_type, user cohort),
        # bucket = integer value decile band
        priv_src = os.path.join(scratch, "priv")
        priv = ev.select(
            F.col("event_id").cast("long"),
            F.col("event_type").alias("qi_type"),
            (F.col("user_id") % 50).cast("string").alias("qi_cohort"),
            (
                F.least(F.floor(F.col("value").cast("double") / 100.0), F.lit(9))
            ).cast("long").alias("b"),
        )
        priv.repartition(N_SOURCE_FILES).write.parquet(priv_src)
        priv_schema = spark.read.parquet(priv_src).schema
        # frozen reference distribution: the corpus-global histogram
        # (yesterday's offline aggregate gates today's stream)
        ref_dist = [
            (int(r["b"]), int(r["n"]))
            for r in spark.read.parquet(priv_src)
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]

        def pipelines(mft: int):
            def src_stream(path, schema):
                return (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", mft)
                    .parquet(path)
                )

            return {
                "enqueue": lambda: streaming_enqueue(
                    read_link_stream(spark, links_src, max_files_per_trigger=mft)
                ),
                "windowed_counts": lambda: windowed_event_counts(
                    src_stream(ev_src, ev_schema)
                ),
                "band_registry": lambda: streaming_band_registry(
                    src_stream(docs_src, docs_schema)
                ),
                "k_anon_gate": lambda: streaming_k_anon_gate(
                    src_stream(priv_src, priv_schema),
                    ["qi_type", "qi_cohort"],
                    k=5,
                ),
                "t_closeness_gate": lambda: streaming_t_closeness_gate(
                    src_stream(priv_src, priv_schema),
                    ["qi_type", "qi_cohort"],
                    "b",
                    ref_dist,
                    t_bp_max=2000,
                ),
            }

        # two arms: mft=1 (per-batch state-commit floor dominates) vs
        # mft=5 (5x rows/batch) — the amortization curve, measured
        for arm, mft in (("mft1", 1), ("mft5", 5)):
            for name, build in pipelines(mft).items():
                sink = os.path.join(scratch, f"sink_{name}_{arm}")
                ckpt = os.path.join(scratch, f"ckpt_{name}_{arm}")
                results.setdefault(name, {})[arm] = _drain_timed(
                    build(), sink, ckpt
                )
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
        for name, arms in results.items():
            a, b = arms.get("mft1", {}), arms.get("mft5", {})
            if a.get("rows_per_sec") and b.get("rows_per_sec"):
                arms["amortization_x"] = round(
                    b["rows_per_sec"] / a["rows_per_sec"], 2
                )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    print(
        json.dumps(
            {
                "metric": "streaming_drain_throughput",
                "unit": "rows_per_sec",
                "sf": float(m.group(1)) if m else None,
                "n_source_files": N_SOURCE_FILES,
                "arms": {"mft1": 1, "mft5": 5},
                "queries": results,
            }
        )
    )


def x100_gates() -> None:
    """r12 verdict item 6: drive the two custom stateful gates through
    availableNow drains of the x10 and x100 scratch replicas and
    record throughput + state-store footprint, confirming the
    documented bounded-keyed-state claims with numbers. The gates'
    docstring bounds (streaming/pipeline.py): band_registry state =
    one row per (band, bucket) with a bounded member list; k_anon_gate
    state = one counter row per QI class (pending rows spill to the
    output side, not state)."""
    from pyspark.sql import functions as F

    from joblink_etl_spark.session import get_spark
    from joblink_etl_spark.streaming.pipeline import (
        streaming_band_registry,
        streaming_k_anon_gate,
    )

    repo = os.path.dirname(os.path.abspath(__file__))
    replicas = {
        "x10": os.path.join(repo, ".scratch", "sf1x10"),
        "x100": os.path.join(repo, ".scratch", "sf1x100p"),
    }
    spark = get_spark("bench-streaming-x100")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="bench_streaming_x100_")
    results: dict[str, dict] = {}
    try:
        for scale, rep_dir in replicas.items():
            if not os.path.isdir(rep_dir):
                results[scale] = {"error": f"missing replica {rep_dir}"}
                continue
            docs_src = os.path.join(scratch, f"docs_{scale}")
            spark.read.parquet(os.path.join(rep_dir, "documents.parquet")).select(
                "doc_id", "text"
            ).repartition(N_SOURCE_FILES).write.parquet(docs_src)
            docs_schema = spark.read.parquet(docs_src).schema

            priv_src = os.path.join(scratch, f"priv_{scale}")
            spark.read.parquet(os.path.join(rep_dir, "events.parquet")).select(
                F.col("event_id").cast("long"),
                F.col("event_type").alias("qi_type"),
                (F.col("user_id") % 50).cast("string").alias("qi_cohort"),
                (
                    F.least(F.floor(F.col("value").cast("double") / 100.0), F.lit(9))
                ).cast("long").alias("b"),
            ).repartition(N_SOURCE_FILES).write.parquet(priv_src)
            priv_schema = spark.read.parquet(priv_src).schema

            def src_stream(path, schema):
                return (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(path)
                )

            results[scale] = {}
            # band_registry_ttl60 (r14, r13 What's-wrong #3): same gate
            # under a 60 s TTL — shorter than the drain (x100 batches
            # alone run ~90 s), so buckets from batch N are expired and
            # silent by the time batch N+1 commits, and the state store
            # holds ~one batch's distinct buckets instead of the whole
            # corpus's. The drain disables noDataMicroBatches: under
            # ProcessingTimeTimeout shouldRunAnotherBatch() is always
            # true and an availableNow drain otherwise NEVER terminates
            # (see streaming_band_registry's DRAIN CAVEAT).
            for name, build, ttl in (
                (
                    "band_registry",
                    lambda: streaming_band_registry(
                        src_stream(docs_src, docs_schema)
                    ),
                    False,
                ),
                (
                    "band_registry_ttl60",
                    lambda: streaming_band_registry(
                        src_stream(docs_src, docs_schema), ttl_seconds=60
                    ),
                    True,
                ),
                (
                    "k_anon_gate",
                    lambda: streaming_k_anon_gate(
                        src_stream(priv_src, priv_schema),
                        ["qi_type", "qi_cohort"],
                        k=5,
                    ),
                    False,
                ),
            ):
                sink = os.path.join(scratch, f"sink_{name}_{scale}")
                ckpt = os.path.join(scratch, f"ckpt_{name}_{scale}")
                conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"
                prior_conf = spark.conf.get(conf_key, "true")
                if ttl:
                    spark.conf.set(conf_key, "false")
                try:
                    results[scale][name] = _drain_timed(build(), sink, ckpt)
                finally:
                    spark.conf.set(conf_key, prior_conf)
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "streaming_gate_state_scaling",
                "unit": "rows_per_sec+state_bytes",
                "n_source_files": N_SOURCE_FILES,
                "scales": results,
            }
        )
    )


if __name__ == "__main__":
    if "--x100-gates" in sys.argv[1:]:
        x100_gates()
    else:
        main()
