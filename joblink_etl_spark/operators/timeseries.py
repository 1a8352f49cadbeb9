"""Time-series regularization: resample irregular event streams onto
a fixed grid with last-observation-carried-forward (LOCF) fill — the
hypertable/time-bucket gap-fill operator of TSDBs, re-expressed as
DataFrame algebra.

Scale design: the grid is generated PER KEY from that key's own
[min, max] bucket span (sequence + explode — no driver loop, no
cross join against a global calendar), observations collapse to one
row per (key, bucket) via a deterministic last-in-bucket window, and
the fill is a running `last(ignorenulls)` over the per-key bucket
order — one shuffle on the key, state one row deep. Values ride as
integer cents so the filled series is bit-reproducible; the ONE
float division happens at projection time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill_locf(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    cents_col: str,
    bucket_us: int,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Resample to `bucket_us` buckets per key with LOCF fill.

    Input rows: (key, ts_us, cents, *order_cols). Within a bucket the
    LAST observation wins, ordered by (ts_us, *order_cols) — pass a
    unique tiebreaker (event id) for full determinism. Returns
    (key, bucket, cents, is_observed) for every bucket in the key's
    observed span; leading buckets before the first observation
    cannot occur (the span starts at an observation).
    """
    bucket = F.expr(f"{ts_us_col} div {bucket_us}").alias("bucket")
    obs = df.select(F.col(key_col), bucket, F.col(ts_us_col), F.col(cents_col), *order_cols)
    w_last = Window.partitionBy(key_col, "bucket").orderBy(
        *[F.col(c).desc() for c in (ts_us_col, *order_cols)]
    )
    per_bucket = (
        obs.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select(key_col, "bucket", F.col(cents_col).alias("_obs_cents"))
    )
    span = obs.groupBy(key_col).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = span.select(
        key_col, F.explode(F.sequence("_b0", "_b1")).alias("bucket")
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.last("_obs_cents", ignorenulls=True).over(w_fill).alias(cents_col),
            F.col("_obs_cents").isNotNull().alias("is_observed"),
        )
    )
