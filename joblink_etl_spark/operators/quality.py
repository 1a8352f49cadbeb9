"""Declarative data-quality constraints — the dbt-test / Deequ-style
validation gate a pipeline runs before promoting a batch.

check_constraints evaluates a rule set over a table in as few passes
as the rules allow: all row-local rules (not_null, range, regex,
accepted values) fold into ONE conditional aggregation over a single
scan; uniqueness adds one keyed aggregate; referential integrity adds
one broadcast anti-join count per foreign key. Output is one row per
rule with its violation count — the shape a CI gate asserts on.

Scale: row-local rules are map-side-combined counters (no shuffle
beyond the final one-row agg); unique/referential rules shuffle only
their key columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    not_null: tuple[str, ...] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, tuple[str, ...]] | None = None,
    unique: tuple[tuple[str, ...], ...] = (),
    references: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Returns (rule, col, n_violations) sorted by rule name."""
    spark = df.sparkSession
    aggs = []
    labels: list[tuple[str, str]] = []
    for c in not_null:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint"))
        labels.append(("not_null", c))
    for c, (lo, hi) in sorted((ranges or {}).items()):
        aggs.append(
            F.sum(
                F.when(
                    F.col(c).isNull() | (F.col(c) < lo) | (F.col(c) > hi), 1
                ).otherwise(0)
            ).cast("bigint")
        )
        labels.append(("range", c))
    for c, vals in sorted((accepted or {}).items()):
        aggs.append(
            F.sum(F.when(~F.col(c).isin(*vals), 1).otherwise(0)).cast("bigint")
        )
        labels.append(("accepted_values", c))
    rows = []
    if aggs:
        vals = df.agg(*[a.alias(f"_v{i}") for i, a in enumerate(aggs)]).collect()[0]
        rows += [
            (rule, col, int(vals[i] or 0)) for i, (rule, col) in enumerate(labels)
        ]
    for key in unique:
        dup = (
            df.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("_d"))
            .collect()[0]["_d"]
        )
        rows.append(("unique", ",".join(key), int(dup)))
    for c, (dim, dim_key) in sorted((references or {}).items()):
        orphans = (
            df.select(F.col(c))
            .filter(F.col(c).isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_key).alias(c)).distinct()),
                c,
                "left_anti",
            )
            .count()
        )
        rows.append(("references", c, int(orphans)))
    return spark.createDataFrame(
        sorted(rows), "rule STRING, col STRING, n_violations BIGINT"
    )
