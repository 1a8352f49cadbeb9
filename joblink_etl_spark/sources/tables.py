"""Parquet source layer.

The reference reads row-oriented sheet tabs addressed by header name
(getHeaderMap_, reference apps-scripts/code-LLM-intergration.js:74-79).
Here every table is a parquet dataset; column pruning and predicate
pushdown reach the scan for free via Catalyst (verify with
``df.explain('formatted')`` → PushedFilters / ReadSchema).

``rename_map`` reproduces the reference's header-aliasing layer
(HEADERS_PER_SHEET, code-Extractor-withoutLLM.js:14-31): a logical→
physical column-name dict applied at read time, so downstream plans
always see canonical names.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# path → StructType | None. `spark.read.parquet` without a schema
# launches a footer-read Spark job PER CALL; reading the footer once
# driver-side via pyarrow (pure metadata, no job) and passing the
# schema explicitly keeps plan construction fully action-free.
_SCHEMA_CACHE: dict = {}


def _parquet_schema(path: str):
    """Driver-side parquet schema (memoized); None if unconvertible
    (caller falls back to Spark's own inference)."""
    if path not in _SCHEMA_CACHE:
        try:
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            _SCHEMA_CACHE[path] = from_arrow_schema(pq.read_schema(path))
        except Exception:
            _SCHEMA_CACHE[path] = None
    return _SCHEMA_CACHE[path]


def _read(spark: SparkSession, path: str) -> DataFrame:
    schema = _parquet_schema(path)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(path)


def parallelize(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for compute-heavy narrow stages.

    Small parquet files arrive as a single scan partition, which
    serializes regex/UDF-heavy projections onto one core. At cluster
    scale the scan is already split (and this is a no-op); locally a
    one-time round-robin shuffle of a small input buys full-core
    parallelism for the expensive map work."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    rename_map: dict[str, str] | None = None,
) -> DataFrame:
    """Read one parquet table; optionally apply a header-alias map."""
    if name == "events":
        # events.parquet has shipped with two physical `ts` types:
        # TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
        # read as raw int64 nanos and rebuild a micro-precision
        # timestamp) and plain TIMESTAMP(MICROS) (read natively).
        # Branch on the resolved dtype so both vintages load.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        path = os.path.join(sf_dir, "events.parquet")
        schema = _parquet_schema(path)
        if schema is not None and dict((f.name, f) for f in schema).get("ts"):
            # nanos physical type reads as bigint under nanosAsLong;
            # patch the driver-inferred schema to match before handing
            # it to the reader (from_arrow_schema has no nanos notion)
            try:
                import pyarrow as pa
                import pyarrow.parquet as pq
                from pyspark.sql.types import LongType, StructField, StructType

                ats = pq.read_schema(path).field("ts").type
                if pa.types.is_timestamp(ats) and ats.unit == "ns":
                    schema = StructType(
                        [
                            StructField("ts", LongType(), f.nullable)
                            if f.name == "ts"
                            else f
                            for f in schema.fields
                        ]
                    )
            except Exception:
                schema = None
        df = (spark.read.schema(schema) if schema is not None else spark.read).parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div — a double round-trip would wobble ±1 µs at
            # 2024-epoch nanos magnitudes (double ulp there is 256 ns)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dict(df.dtypes).get("ts") == "timestamp_ntz":
            # session tz is pinned to UTC, so NTZ → TIMESTAMP is a
            # pure relabel; downstream code (unix_micros, window)
            # expects the TIMESTAMP family
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    df = _read(spark, os.path.join(sf_dir, f"{name}.parquet"))
    if rename_map:
        physical_to_logical = {v: k for k, v in rename_map.items()}
        present = {c: physical_to_logical[c] for c in df.columns if c in physical_to_logical}
        if present:
            df = df.withColumnsRenamed(present)
    return df
