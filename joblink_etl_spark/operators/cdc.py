"""Change-data-capture apply: fold an ordered changelog into a
snapshot (the inverse of sources/io.snapshot_diff, which DERIVES a
changelog from two snapshots).

Semantics are the standard CDC merge used by lakehouse MERGE/upsert
pipelines: the changelog carries (key, seq, op ∈ {I, U, D}, payload);
per key only the HIGHEST-seq entry decides the outcome (last writer
wins), applied against the base snapshot:

  - final op I/U  → the key exists in the new snapshot with the
    changelog payload (insert-or-replace — upsert),
  - final op D    → the key is absent from the new snapshot,
  - key untouched → the base row carries over unchanged.

Scale design: one window (or max_by) over the changelog keyed by the
primary key — the changelog is delta-sized, never the table — then a
single full-outer join against the base keyed the same way. With the
base bucketed by key the join is exchange-free; the whole apply is
O(|delta|) + one co-partitioned pass over the base, which is exactly
the cost profile a 100 TB nightly CDC ingest needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changelog(
    base: DataFrame,
    changelog: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply (key, seq, op, payload…) changes onto base; returns the
    new snapshot with base's columns. Payload columns must match
    base's non-key columns by name. Ties on seq are broken by
    preferring the later op in lexicographic (op) order so the result
    is deterministic under duplicate sequence numbers."""
    payload = [c for c in base.columns if c != key]
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc(), F.col(op_col).desc())
    last = (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key, op_col, *payload)
    )
    joined = base.alias("b").join(last.alias("c"), key, "full_outer")
    keep_base = F.col(f"c.{op_col}").isNull()
    deleted = F.col(f"c.{op_col}") == "D"
    return (
        joined.filter(~deleted | keep_base)
        .select(
            F.col(key),
            *[
                F.when(keep_base, F.col(f"b.{c}"))
                .otherwise(F.col(f"c.{c}"))
                .alias(c)
                for c in payload
            ],
        )
    )
