"""Deterministic distinct-count sketching (KMV — k minimum values).

Spark's production path for approximate cardinality is the built-in
HLL++ `approx_count_distinct`, but its estimate is engine-internal
and not reproducible across engines, so it can't be oracle-verified.
KMV is the classic alternative whose state IS a pure function of the
data: keep the k smallest (md5) hash values per group; if the k-th
smallest normalized hash is u, the group has ≈ (k-1)/u distinct
values (Bar-Yossef et al. 2002, "Counting distinct elements in a
data stream"). Every byte of the sketch derives from md5, so DuckDB
replays the estimate bit-for-bit.

Scale design (100 TB):
- The per-group distinct on (group, hash) is a map-side-combinable
  HashAggregate — the shuffle carries one row per distinct value at
  most, and AQE coalesces.
- The rank-filter (row_number ≤ k) then reduces each group to k
  rows; the final agg is over |groups| × k rows, trivially small.
- For extreme cardinality per group, swap the exact distinct for a
  per-partition top-k pre-combine (sort each partition's hashes and
  keep k) — same estimate, bounded shuffle; the built-in
  approx_count_distinct remains the right default when cross-engine
  determinism isn't required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int

HASH_SPACE = float(1 << 60)  # md5_int range: [0, 2^60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str | Column,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash
    values. Exact (= n_seen) when a group has fewer than k distinct
    values; otherwise (k-1) / (kth_smallest_hash / 2^60).

    Returns (group_col, n_seen, est_distinct) with est_distinct
    rounded to 4 decimals identically in the DuckDB oracle.
    """
    from pyspark.sql import Window

    value = F.col(value_col) if isinstance(value_col, str) else value_col
    hashes = df.select(
        group_col, md5_int(value.cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = topk.groupBy(group_col).agg(
        F.max("rn").alias("n_seen"), F.max("h").alias("kth")
    )
    est = F.when(F.col("n_seen") < k, F.col("n_seen").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("kth").cast("double") / F.lit(HASH_SPACE))
    )
    return agg.select(
        group_col, "n_seen", F.round(est, 4).alias("est_distinct")
    )


def make_geo_mean_udaf():
    """Grouped-aggregate pandas UDF (the Spark UDAF form): geometric
    mean — the right average for heavy-tailed per-document quality/
    size metrics, and a builtin Spark lacks. Arrow ships each group's
    column once; numpy reduces it vectorized. Usable in groupBy().agg
    and as a window function.

    Scale caveat (why this is the demo, not the default): grouped-agg
    pandas UDFs have no partial aggregation — each group's values
    ship whole to one worker, so keys must have bounded group sizes.
    For algebraic aggregates prefer built-ins (exp(avg(ln(x))) here)
    which combine map-side.

    Note: ``pd``/``np`` must be module-level imports — with
    ``from __future__ import annotations`` the hint strings resolve
    against module globals, and a function-local import leaves the
    grouped-agg signature (Series -> float) uninferable."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        a = v.dropna().to_numpy(dtype="float64")
        a = a[a > 0]
        if a.size == 0:
            return float("nan")
        return float(np.exp(np.log(a).mean()))

    return geo_mean
