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
    """Mergeable partial state per key: (keys…, n, sum_cents, min_v,
    max_v). One map-side-combinable shuffle over the input — run it
    over a delta batch, never the full history.

    The sum is kept as INTEGER CENTS (floor(v*100+0.5) per row) so
    partial/merge accumulation is exact bigint arithmetic — merge
    order across batches/partitions can never wobble the stored
    state (same idiom as plans/events_q.time_weighted_avg)."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(cents).alias("sum_cents"),
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
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def join_view_delta(
    a_old: DataFrame,
    d_a: DataFrame,
    b_old: DataFrame,
    d_b: DataFrame,
    key: str,
) -> DataFrame:
    """Incremental maintenance of a JOIN view V = A ⋈ B under inserts.

    The delta algebra:  Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    (insert-only deltas; deletes would subtract symmetric terms).
    Refresh cost is O(|ΔA|·fanout + |ΔB|·fanout) — the old relations
    are only ever the PROBE side of a delta-keyed join, never
    re-joined against each other. At scale A and B live bucketed by
    the join key, so each delta term is an exchange-free lookup; the
    deltas themselves are small enough to broadcast.

    Returns the delta rows only; the maintained view is
    old_view ∪ delta (the caller appends — same contract as
    merge_partial_aggs)."""
    return (
        d_a.join(b_old, key)
        .unionByName(a_old.join(d_b, key))
        .unionByName(d_a.join(d_b, key))
    )


def finalize_view(merged: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time projection of the merged state: doubles appear only
    HERE — the stored sum is exact integer cents, so the division is
    a single deterministic float op per key (no rounded-float-sum
    midpoint wobble; see plans/events_q.py)."""
    sum_v = F.col("sum_cents").cast("double") / F.lit(100.0)
    return merged.select(
        *keys,
        F.col("n"),
        sum_v.alias("sum_value"),
        F.round(sum_v / F.col("n"), 4).alias("avg_value"),
        F.col("min_v").alias("min_value"),
        F.col("max_v").alias("max_value"),
    )
