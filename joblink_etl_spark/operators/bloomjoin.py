"""Bloom-filtered semi-join: a runtime-filter operator.

The classic distributed-join optimization (Spark's own runtime row
filters, Trino's dynamic filtering): build a FIXED-size Bloom bitmap
from the build side's join keys, broadcast it, and drop probe-side
rows scan-side before any exchange. The exact semi-join then runs
only over the admitted rows — Bloom has no false negatives, so the
result is IDENTICAL to the plain semi-join (the oracle proves it),
while the shuffle/join input shrinks by the filter's selectivity.

Why it matters at 100 TB: a selective dimension predicate ("parts of
brand X") reduces a fact-table join to a sliver, but the fact scan
still pays a full shuffle in the naive plan. The 8 KiB bitmap rides
to every scan task and cuts the exchanged bytes to ~selectivity ×
fact size, with membership as pure codegen'd bitwise math (reuses
operators/decontam's bitmap primitives — same geometry, same
portable md5 positions, so the DuckDB oracle replays bit-for-bit).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .decontam import BLOOM_BITS, BLOOM_SEEDS, _bloom_from_grams, _bloom_pos


def _member_via_pos_cols(df: DataFrame, k: int) -> Column:
    """All-bits-set test over precomputed `_bp{i}` position columns
    (shiftleft's bit count must be an expr, not a Column — same
    pattern as decontam.bloom_decontam)."""
    bits = [
        F.coalesce(
            F.element_at(F.col("bloom"), F.floor(F.col(f"_bp{i}") / 64).cast("int")),
            F.lit(0).cast("bigint"),
        ).bitwiseAND(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_bp{i} % 64 AS INT))")
        )
        != 0
        for i in range(k)
    ]
    return reduce(lambda a, b: a & b, bits)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    m: int = BLOOM_BITS,
    k: int = BLOOM_SEEDS,
) -> DataFrame:
    """fact LEFT SEMI JOIN dim, with a Bloom prefilter on the scan.

    Result rows are exactly the plain semi-join's (no false
    negatives); the bitmap only decides how many rows reach the
    exact join. Keys are hashed via their string form so any
    key type works identically across engines."""
    dim_key = dim_key or fact_key
    keys = dim.select(F.col(dim_key).cast("string").alias("gram")).distinct()
    bloom = _bloom_from_grams(keys, m, k)
    probed = fact.crossJoin(F.broadcast(bloom)).withColumns(
        {
            f"_bp{i}": _bloom_pos(F.col(fact_key).cast("string"), i, m)
            for i in range(k)
        }
    )
    admitted = probed.filter(_member_via_pos_cols(probed, k)).drop(
        "bloom", *[f"_bp{i}" for i in range(k)]
    )
    dim_keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return admitted.join(dim_keys, fact_key, "left_semi")
