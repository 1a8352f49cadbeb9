"""SparkSession factory with scale-aware defaults.

Local tests run on ``local[N]``; the configs below are chosen so the
same code transplants to a 1000-executor cluster: AQE on (runtime
partition coalescing + skew-join splitting), explicit broadcast
threshold for dimension tables, Arrow for every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "joblink-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # At cluster scale this would be sized from input bytes
        # (~input_size / 128MB); locally 2x cores keeps every core busy
        # through AQE coalescing without tiny-partition overhead.
        shuffle_partitions = max(cpus * 2, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # a ~100-query single-JVM run compiles thousands of
        # whole-stage-codegen classes; the JVM's default 240 MB code
        # cache fills late in the run and HOF-heavy queries silently
        # fall back to the interpreter (observed: consensus_near_dups
        # 4.9 s solo vs 53 s as query ~90 of a bench run). A larger
        # reserved cache + explicit flushing keeps the JIT alive for
        # the whole run. Driver-only: executors in local mode share
        # the driver JVM.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
