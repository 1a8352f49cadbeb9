"""Multi-format source/sink layer: CSV, JSON-lines, ORC, and parquet
with the same header-aliasing and schema-heal semantics as the
parquet path (`sources/tables.py`, `schemas.py`).

The reference's storage is header-addressed sheet tabs (reference
apps-scripts/code-LLM-intergration.js:74-79); its real-world
equivalents are CSV exports and JSON event feeds, so the engine
accepts all of them behind one `read_table` call.

Scale rules encoded here:
- **Schemas are always explicit.** `inferSchema` (CSV) / schema
  inference (JSON) is a full extra pass over 100 TB before the real
  read — callers pass a StructType (or a sample-derived one from
  `infer_once`) so the scan happens exactly once. Explicit schemas
  also keep corrupt records visible (`_corrupt_record`) instead of
  silently widening types.
- **Column pruning still applies to CSV/JSON** (the text must be
  parsed, but only requested fields are materialized); parquet/ORC
  additionally push predicates to row-group/stripe skipping.
- **Writers default to snappy parquet**, optionally
  `partitionBy` (partition pruning for downstream readers) and
  `bucketBy` (exchange-free joins — see tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..schemas import apply_aliases, validate_or_heal

_READ_OPTS = {
    "csv": {"header": "true", "mode": "PERMISSIVE", "escape": '"'},
    "json": {"mode": "PERMISSIVE"},
    "parquet": {},
    "orc": {},
}

_WRITE_OPTS = {
    "csv": {"header": "true", "escape": '"'},
    "json": {},
    "parquet": {},
    "orc": {},
}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    rename_map: dict[str, str] | None = None,
    heal_to: StructType | None = None,
    **options: str,
) -> DataFrame:
    """Read one logical table from any supported format.

    `rename_map` applies the header-alias layer (logical→physical
    names); `heal_to` re-validates/repairs the result against a
    canonical schema (the reference's NotesQueue header self-heal,
    code-LLM-intergration.js:111-119)."""
    if fmt not in _READ_OPTS:
        raise ValueError(f"unsupported format: {fmt!r}")
    reader = spark.read.format(fmt).options(**{**_READ_OPTS[fmt], **options})
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    if rename_map:
        df = apply_aliases(df, rename_map)
    if heal_to is not None:
        df = validate_or_heal(df, heal_to)
    return df


def infer_once(
    spark: SparkSession, path: str, fmt: str, sample_rows: int = 10_000, **options: str
) -> StructType:
    """Derive a schema from a bounded sample so the full read is
    single-pass: infer on `limit(sample_rows)` of one file, then pass
    the result to `read_table`. At 100 TB, inference over the full
    dataset is a second complete scan — never do it implicitly."""
    sample = (
        spark.read.format(fmt)
        .options(**{**_READ_OPTS[fmt], **options}, inferSchema="true")
        .load(path)
        .limit(sample_rows)
    )
    return sample.schema


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, str] | None = None,
    table_name: str | None = None,
    **options: str,
) -> None:
    """Write one logical table.

    `partition_by` lays out hive-style directories (downstream
    partition pruning); `bucket_by=(n, key)` pre-shuffles on the join
    key at write time (requires `table_name` — bucketing metadata
    lives in the catalog) so every later join on that key is
    exchange-free."""
    writer = df.write.format(fmt).mode(mode).options(
        **{**_WRITE_OPTS.get(fmt, {}), **options}
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        if table_name is None:
            raise ValueError("bucket_by requires table_name (catalog-backed)")
        n, key = bucket_by
        writer.bucketBy(n, key).sortBy(key).option("path", path).saveAsTable(table_name)
        return
    writer.save(path)


def optimize_layout(df: DataFrame, cols: list[str], n_partitions: int | None = None) -> DataFrame:
    """Range-partition + sort the data by `cols` before writing:
    downstream range scans and merge joins on those columns read
    contiguous, min/max-prunable files (parquet row-group stats skip
    whole groups when the data is clustered). The range exchange
    samples bounds once — one shuffle now buys every later scan.
    Clusters on the LEADING column first — for balanced multi-column
    pruning use zorder_layout."""
    if n_partitions:
        out = df.repartitionByRange(n_partitions, *cols)
    else:
        out = df.repartitionByRange(*cols)
    return out.sortWithinPartitions(*cols)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 10) -> DataFrame:
    """Append a Morton (Z-order) key interleaving `cols`: each column
    is binned into 2^bits buckets between its in-plan min/max (one
    broadcast one-row aggregate — no driver action), and the bucket
    bits interleave into a single bigint `z_key`. Rows close in ALL
    dimensions get close keys, so clustering by z_key makes parquet
    row-group min/max stats prunable on EVERY interleaved column at
    once — the multi-column counterpart of optimize_layout's
    lexicographic clustering (the same trick behind Delta/Iceberg
    Z-ORDER). bits × len(cols) must fit a signed 64-bit key
    (≤ 63 interleaved bits).

    The bin arithmetic is plain double math on (value, min, max), so
    an engine-neutral oracle can replay the key exactly; NULLs and
    degenerate (min == max) columns bin to 0.
    """
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds a 63-bit key")
    n_bins = 1 << bits
    bounds = df.select(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    )
    t = df.join(F.broadcast(bounds))
    bin_cols = {}
    for c in cols:
        lo, hi = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        scaled = F.floor(
            (F.col(c).cast("double") - lo) / (hi - lo) * F.lit(float(n_bins))
        )
        bin_cols[f"_bin_{c}"] = (
            F.when(F.col(c).isNull() | (hi <= lo), F.lit(0))
            .otherwise(F.least(scaled, F.lit(n_bins - 1)))
            .cast("bigint")
        )
    t = t.withColumns(bin_cols)
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for k, c in enumerate(cols):
            bit = F.shiftright(F.col(f"_bin_{c}"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * len(cols) + k))
    return t.withColumn("z_key", z).drop(
        *[f"_lo_{c}" for c in cols],
        *[f"_hi_{c}" for c in cols],
        *bin_cols.keys(),
    )


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 10, n_partitions: int | None = None
) -> DataFrame:
    """Z-order clustering for writes: compute z_key, then
    range-partition + sort by it so every interleaved column is
    row-group-prunable. One shuffle (the range exchange), same cost
    shape as optimize_layout."""
    keyed = zorder_key(df, cols, bits)
    if n_partitions:
        out = keyed.repartitionByRange(n_partitions, "z_key")
    else:
        out = keyed.repartitionByRange("z_key")
    return out.sortWithinPartitions("z_key")


def compact_dir(
    spark,
    src: str,
    dst: str,
    fmt: str = "parquet",
    target_files: int | None = None,
    sort_cols: list[str] | None = None,
    **options: str,
) -> None:
    """Small-file compaction (the maintenance job every long-running
    ingest needs): rewrite a directory of many small files into
    `target_files` larger ones, optionally range-clustered by
    `sort_cols` so the compacted files are also min/max-prunable.

    Shape: coalesce (no shuffle) when only merging files;
    repartitionByRange (one shuffle that buys every later scan) when
    clustering. Writes to `dst` — compaction is a rewrite-and-swap
    protocol, and the swap (atomic dir rename / metastore pointer
    flip) belongs to the table format layer, so this function never
    overwrites its own input."""
    # Alias-proof the in-place guard for local paths: trailing slash,
    # relative-vs-absolute, and symlinks all name the same directory,
    # and a lazy read followed by overwrite(dst) would truncate the
    # directory being scanned. Non-local URIs (s3://, hdfs://) keep
    # the literal comparison after slash-normalization.
    def _canon(p: str) -> str:
        stripped = p.rstrip("/") or "/"
        if "://" in stripped and not stripped.startswith("file://"):
            return stripped
        local = stripped.removeprefix("file://")
        return os.path.realpath(local)

    if _canon(src) == _canon(dst):
        raise ValueError("compact_dir writes a NEW directory; swap is the caller's job")
    df = spark.read.format(fmt).options(**options).load(src)
    if sort_cols:
        out = optimize_layout(df, sort_cols, n_partitions=target_files)
    elif target_files:
        out = df.coalesce(target_files)
    else:
        out = df
    out.write.format(fmt).mode("overwrite").save(dst)


def snapshot_diff(
    old,
    new,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
):
    """CDC-style diff of two table snapshots by primary key: each key
    is 'added' (new only), 'removed' (old only), 'changed' (both,
    differing row hash), or 'unchanged'. One full-outer hash join on
    the keys; row content compares by an md5 over the
    null-sentineled, separator-joined compare columns (identical
    spelling in the DuckDB oracle, so diffs are engine-exact).

    Returns key columns + status + old_hash/new_hash. Scale: the
    standard snapshot-reconciliation shape — both sides shuffle once
    on the key; at 100 TB you'd partition both snapshots identically
    (or bucket them) and the join is exchange-free per partition.
    """
    from pyspark.sql import functions as F

    def row_hash(df):
        cols = compare_cols or [c for c in df.columns if c not in key_cols]
        parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
        return F.md5(F.concat_ws("\x01", *parts))

    o = old.select(*key_cols, row_hash(old).alias("old_hash"))
    n = new.select(*key_cols, row_hash(new).alias("new_hash"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, status.alias("status"), "old_hash", "new_hash")


def hilbert_key(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append a 2-D Hilbert-curve key over `cols` (exactly two):
    the stronger multi-column clustering alternative to zorder_key —
    the Hilbert curve has no Morton "seams" (consecutive keys are
    ALWAYS grid-adjacent), so range-clustered files get strictly
    better min/max locality on both columns (the layout used by
    recent Iceberg/Delta clustering work).

    Binning is identical to zorder_key (2^bits buckets between the
    in-plan min/max, one broadcast one-row aggregate). The curve
    index is the classic xy2d bit transform (per level: quadrant
    digit + conditional reflect/swap rotation), unrolled `bits`
    times as pure integer CASE arithmetic — engine-neutral, so the
    oracle replays it bit-for-bit. Adds `h_key`.
    """
    if len(cols) != 2:
        raise ValueError("hilbert_key is 2-D: pass exactly two columns")
    n_bins = 1 << bits
    bounds = df.select(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    )
    t = df.join(F.broadcast(bounds))
    bin_cols = {}
    for c in cols:
        lo, hi = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        scaled = F.floor(
            (F.col(c).cast("double") - lo) / (hi - lo) * F.lit(float(n_bins))
        )
        bin_cols[f"_bin_{c}"] = (
            F.when(F.col(c).isNull() | (hi <= lo), F.lit(0))
            .otherwise(F.least(scaled, F.lit(n_bins - 1)))
            .cast("bigint")
        )
    t = t.withColumns(bin_cols).withColumns(
        {
            "_hx": F.col(f"_bin_{cols[0]}"),
            "_hy": F.col(f"_bin_{cols[1]}"),
            "_hd": F.lit(0).cast("bigint"),
        }
    )
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        # quadrant digit (3*rx) XOR ry spelled as a CASE table
        quad = (
            F.when((rx == 1) & (ry == 0), F.lit(3))
            .when((rx == 1) & (ry == 1), F.lit(2))
            .when((rx == 0) & (ry == 1), F.lit(1))
            .otherwise(F.lit(0))
        )
        t = t.withColumns({"_rx": rx, "_ry": ry})
        refl = F.col("_ry") == 0
        neg = refl & (F.col("_rx") == 1)
        t = t.withColumns(
            {
                "_hd": F.col("_hd") + F.lit(s * s).cast("bigint") * quad.cast("bigint"),
                "_hx": F.when(
                    neg, F.lit(n_bins - 1) - F.col("_hy")
                ).when(refl, F.col("_hy")).otherwise(F.col("_hx")),
                "_hy": F.when(
                    neg, F.lit(n_bins - 1) - F.col("_hx")
                ).when(refl, F.col("_hx")).otherwise(F.col("_hy")),
            }
        )
    return t.withColumn("h_key", F.col("_hd")).drop(
        "_hx", "_hy", "_hd", "_rx", "_ry",
        *[f"_lo_{c}" for c in cols],
        *[f"_hi_{c}" for c in cols],
        *bin_cols.keys(),
    )


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE read split into (good, quarantine) — the dead-letter
    ingestion pattern for web-scale JSONL/CSV corpora, where some
    fraction of lines is ALWAYS malformed and silently dropping (or
    failing the job on) them are both wrong. Parseable rows come back
    with the caller's schema; unparseable lines land verbatim in the
    quarantine frame for re-processing.

    The returned frames share one cached PERMISSIVE scan (Spark
    refuses a filter that references only the internal corrupt-record
    column on an uncached frame — the documented contract); callers
    unpersist after materializing both sides.
    """
    if fmt not in ("csv", "json"):
        raise ValueError(f"quarantine read supports csv/json, not {fmt!r}")
    full = StructType(schema.fields + [StructField(corrupt_col, StringType())])
    df = read_table(
        spark,
        path,
        fmt,
        schema=full,
        columnNameOfCorruptRecord=corrupt_col,
        **options,
    ).cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_record")
    )
    return good, bad
