"""Unit tests for pipeline operators not fully covered by the oracle
queries (batch selection, dequeue, dead-lettering)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from joblink_etl_spark.operators.enqueue import dequeue, select_batch
from joblink_etl_spark.operators.writeback import fill_blanks_only, mark_errors


def _queue(spark, rows):
    return spark.createDataFrame(
        rows, "sheet_name string, row_index long, status string, enqueued_at timestamp"
    )


def test_select_batch_fifo(spark):
    q = _queue(
        spark,
        [
            ("S", 1, "queued", datetime(2024, 1, 3)),
            ("S", 2, "queued", datetime(2024, 1, 1)),
            ("S", 3, "processing", datetime(2024, 1, 1)),
            ("S", 4, "queued", datetime(2024, 1, 2)),
        ],
    )
    got = [r["row_index"] for r in select_batch(q, 2).collect()]
    assert got == [2, 4]  # oldest first, processing excluded


def test_dequeue_anti_join(spark):
    q = _queue(
        spark,
        [
            ("S", 1, "queued", datetime(2024, 1, 1)),
            ("S", 2, "queued", datetime(2024, 1, 1)),
            ("T", 1, "queued", datetime(2024, 1, 1)),
        ],
    )
    done = spark.createDataFrame([("S", 1)], "sheet_name string, row_index long")
    left = {(r["sheet_name"], r["row_index"]) for r in dequeue(q, done).collect()}
    assert left == {("S", 2), ("T", 1)}


def test_fill_blanks_only(spark):
    df = spark.createDataFrame(
        [("existing", "new"), ("", "new"), ("  ", "new"), (None, "new")],
        "old string, new string",
    )
    got = [r["out"] for r in df.select(fill_blanks_only(F.col("old"), F.col("new")).alias("out")).collect()]
    assert got == ["existing", "new", "new", "new"]


def test_mark_errors_truncates(spark):
    tracker = spark.createDataFrame(
        [("S", 1, "queued"), ("S", 2, "queued")],
        "sheet_name string, row_index long, status string",
    )
    errors = spark.createDataFrame(
        [("S", 1, "boom " * 100)], "sheet_name string, row_index long, error string"
    )
    rows = {r["row_index"]: r["status"] for r in mark_errors(tracker, errors).collect()}
    assert rows[2] == "queued"
    assert rows[1].startswith("error: boom")
    assert len(rows[1]) <= 300 + len("error: ")


def test_interval_join_binned_matches_theta(spark):
    """Binned decomposition == brute-force containment, including
    boundary points, multi-bin-spanning intervals, and points in
    zero/many intervals."""
    from joblink_etl_spark.operators.asof import interval_join_binned

    points = spark.createDataFrame(
        [(1, 0), (2, 10), (3, 99), (4, 100), (5, 5000), (6, 1023), (7, 1024)],
        "pid BIGINT, p BIGINT",
    )
    intervals = spark.createDataFrame(
        [(10, 0, 0),        # single point at origin
         (11, 5, 99),       # within one bin
         (12, 90, 2000),    # spans three bins
         (13, 4000, 6000),  # isolated
         (14, 10, 10)],     # exact single point
        "iid BIGINT, s BIGINT, e BIGINT",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join_binned(points, intervals, "p", "s", "e", bin_size=1024).collect()
    }
    want = set()
    for pid, p in [(1, 0), (2, 10), (3, 99), (4, 100), (5, 5000), (6, 1023), (7, 1024)]:
        for iid, s, e in [(10, 0, 0), (11, 5, 99), (12, 90, 2000), (13, 4000, 6000), (14, 10, 10)]:
            if s <= p <= e:
                want.add((pid, iid))
    assert got == want
