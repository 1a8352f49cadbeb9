"""Enqueue with anti-join idempotency (SURVEY.md §2.3 J2, §2.1 S5).

The reference scans existing queue rows and skips candidates whose
(sheet_name, row_index) is already queued/processing
(code-LLM-intergration.js:185-195, 237-248). In Spark the existence
check is a LEFT ANTI join — at scale the queue side is small relative
to the candidate table, so it broadcasts; no full shuffle of the
candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.predicates import is_valid_url

QUEUE_KEY = ["sheet_name", "row_index"]
PENDING_STATUSES = ["queued", "processing"]


def enqueue(
    candidates: DataFrame,
    queue: DataFrame,
    url_col: str = "url",
    now=None,
) -> DataFrame:
    """Rows to append to the queue: URL-valid candidates whose key is
    not already pending. Output matches the queue schema (§1.1):
    sheet_name, row_index, url, status, tries, enqueued_at,
    next_attempt_at, last_error — tries/next_attempt_at mirror the
    reference's vestigial single-attempt semantics (ST6).
    """
    pending = (
        queue.filter(F.col("status").isin(PENDING_STATUSES))
        .select(*QUEUE_KEY)
        .dropDuplicates(QUEUE_KEY)
    )
    fresh = (
        candidates.filter(is_valid_url(F.col(url_col)))
        .join(F.broadcast(pending), QUEUE_KEY, "left_anti")
    )
    ts = now if now is not None else F.current_timestamp()
    return fresh.select(
        "sheet_name",
        "row_index",
        F.col(url_col).alias("url"),
        F.lit("queued").alias("status"),
        F.lit(0).alias("tries"),
        ts.alias("enqueued_at"),
        F.lit("").alias("next_attempt_at"),
        F.lit("").alias("last_error"),
    )


def select_batch(queue: DataFrame, batch_size: int) -> DataFrame:
    """FIFO batch selection (reference O1/A2, :876-885): oldest
    queued items first, deterministic tie-break on the key. limit()
    executes as TakeOrdered — per-partition heap, no global sort."""
    return (
        queue.filter(F.col("status") == "queued")
        .orderBy("enqueued_at", "sheet_name", "row_index")
        .limit(batch_size)
    )


def dequeue(queue: DataFrame, processed: DataFrame) -> DataFrame:
    """Remove processed rows — the Spark spelling of the reference's
    bottom-up positional delete (S6, :924): an anti-join rewrite."""
    return queue.join(
        F.broadcast(processed.select(*QUEUE_KEY).dropDuplicates(QUEUE_KEY)),
        QUEUE_KEY,
        "left_anti",
    )
