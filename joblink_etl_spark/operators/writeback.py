"""Write-back MERGE (SURVEY.md §2.1 S13-S15).

The reference writes Canonical/Company/Role into the tracker row and
appends a parse provenance token (writeBack_,
code-LLM-intergration.js:821-853); Status is set separately
(updateStatusCell_, :932-941). Parquet has no MERGE, so this is a
join-based read-modify-write: tracker LEFT JOIN parsed on the key,
then per-column conditional overwrite. Only matched rows change;
unmatched tracker rows pass through bit-identical.

At 100 TB the tracker side would be partitioned by key and the
parsed batch is small → broadcast join, and the rewrite touches only
the partitions containing matched keys (partition-scoped RMW).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.provenance import append_source_token
from ..functions.text import format_conf

TRACKER_KEY = ["sheet_name", "row_index"]


def merge_writeback(tracker: DataFrame, parsed: DataFrame) -> DataFrame:
    """Apply parsed results to the tracker.

    parsed columns: sheet_name, row_index, canonical, company, role,
    conf, decision, provider. Parse fields OVERWRITE (the reference
    writes them unconditionally, :834-840); the Source column gets a
    replace-by-kind parse token; Status becomes 'ok' (:914).
    """
    p = parsed.select(
        *TRACKER_KEY,
        F.col("canonical").alias("_new_canonical"),
        F.col("company").alias("_new_company"),
        F.col("role").alias("_new_role"),
        F.col("conf").alias("_new_conf"),
        F.col("decision").alias("_new_decision"),
        F.col("provider").alias("_new_provider"),
        F.lit(True).alias("_matched"),
    )
    joined = tracker.join(F.broadcast(p), TRACKER_KEY, "left")
    matched = F.coalesce(F.col("_matched"), F.lit(False))

    parse_token_source = append_source_token(
        F.col("source"),
        "parse",
        {
            "provider": F.coalesce(F.col("_new_provider"), F.lit("direct")),
            "signals": F.coalesce(F.col("_new_decision"), F.lit("heuristic")),
            "conf": format_conf(F.coalesce(F.col("_new_conf"), F.lit(0.0))),
        },
    )
    out = joined.withColumns(
        {
            "canonical_link": F.when(matched, F.col("_new_canonical")).otherwise(F.col("canonical_link")),
            "company_auto": F.when(matched, F.col("_new_company")).otherwise(F.col("company_auto")),
            "role_auto": F.when(matched, F.col("_new_role")).otherwise(F.col("role_auto")),
            "status": F.when(matched, F.lit("ok")).otherwise(F.col("status")),
            "source": F.when(matched, parse_token_source).otherwise(F.col("source")),
        }
    )
    return out.drop(
        "_new_canonical", "_new_company", "_new_role",
        "_new_conf", "_new_decision", "_new_provider", "_matched",
    )


def merge_writeback_incremental(
    spark,
    tracker_path: str,
    parsed: DataFrame,
    partition_col: str = "sheet_name",
) -> list:
    """Partition-scoped incremental MERGE against a parquet tracker
    dataset partitioned by ``partition_col`` (SURVEY §4
    "fill-blanks-only MERGE"; reference writeBack_,
    code-LLM-intergration.js:821-853 — the reference touches only the
    sheet rows of the batch; here the unit of rewrite is a partition).

    Read-modify-write that touches ONLY the partitions containing
    batch keys:

    1. the batch's distinct partition values are collected — bounded
       by the batch size (reference BATCH_SIZE=12), so this is a
       small driver list, not a table scan;
    2. the tracker read is filtered to those partitions — Catalyst
       turns that into partition pruning, so unaffected partitions
       are never even SCANNED (assert via PartitionFilters in the
       plan);
    3. the merged result is pinned (eager localCheckpoint — bounded:
       affected partitions only) to cut lineage back to the source
       files, then written with per-write dynamic partition
       overwrite, which replaces ONLY the partitions present in the
       result. Unaffected partitions' files are never rewritten.

    At 100 TB: a 12-row batch touches ≤12 partitions of a
    10k-partition tracker — the rewrite is O(batch), not O(table).

    Returns the affected partition values (for audit/logging).
    """
    affected = [
        r[0] for r in parsed.select(partition_col).distinct().collect()
    ]
    tracker = spark.read.parquet(tracker_path).filter(
        F.col(partition_col).isin(affected)
    )
    merged = merge_writeback(tracker, parsed).localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(tracker_path)
    )
    return affected


def fill_blanks_only(existing, new):
    """The fill-blanks-only rule (SURVEY §1.4): keep a non-blank
    existing value, else take the new one. Used for the notes columns
    (:1097-1100) and LLM rescue fills (:758-759)."""
    return F.when(F.trim(F.coalesce(existing, F.lit(""))) != "", existing).otherwise(new)


def mark_errors(tracker: DataFrame, errors: DataFrame, message_col: str = "error") -> DataFrame:
    """Dead-letter write (ST5, :915-918): Status='error' plus a
    truncated message; rows still leave the queue (single-attempt)."""
    e = errors.select(
        *TRACKER_KEY,
        F.substring(F.col(message_col), 1, 300).alias("_err"),
        F.lit(True).alias("_matched"),
    )
    joined = tracker.join(F.broadcast(e), TRACKER_KEY, "left")
    matched = F.coalesce(F.col("_matched"), F.lit(False))
    return (
        joined.withColumn(
            "status",
            F.when(matched, F.concat(F.lit("error: "), F.col("_err"))).otherwise(F.col("status")),
        )
        .drop("_err", "_matched")
    )
