"""Algebraic materialized-view maintenance: keep an aggregate fresh
by MERGING partial states instead of recomputing from the full
history — the generalization of the reference's incremental
write-back semantics (fill-only MERGE over changed rows,
reference apps-scripts/code-LLM-intergration.js:821-853) from cell
updates to whole aggregation views.

Scale design (100 TB): a nightly/continuous pipeline never re-scans
the historical corpus to refresh a dashboard aggregate. count/sum/
min/max are algebraic — partial states merge by (add, add, min, max)
— so the refresh cost is O(delta) + O(|view|): one partial agg over
the new batch, one merge keyed by the view's group keys. avg (and
anything derived) is computed at READ time from the merged state,
never stored, so it stays exact under merging. The same shapes power
Spark's own map-side combine; this operator lifts them to the
storage boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_aggs(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Mergeable partial state per key: (keys…, n, sum_v, min_v,
    max_v). One map-side-combinable shuffle over the input — run it
    over a delta batch, never the full history."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_partial_aggs(state: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial states: counts and sums add, min/max
    combine. Associative + commutative, so any merge tree (per-batch,
    per-day, per-region) produces the same view. The shuffle is keyed
    by the view keys and carries |view| + |delta-keys| rows — never
    the underlying data."""
    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def finalize_view(merged: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time projection of the merged state: rounded sum, derived
    avg (rounded-sum / count, the engine-portable spelling — see
    plans/events_q.py on midpoint wobble), min/max as stored."""
    return merged.select(
        *keys,
        F.col("n"),
        F.round(F.col("sum_v"), 2).alias("sum_value"),
        F.round(F.round(F.col("sum_v"), 2) / F.col("n"), 4).alias("avg_value"),
        F.col("min_v").alias("min_value"),
        F.col("max_v").alias("max_value"),
    )
