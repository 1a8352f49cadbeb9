"""Privacy auditing for training-data release: k-anonymity /
l-diversity over quasi-identifier tuples.

Complements the PII scrub (functions/pii.py) and the user purge
audit (user_purge_audit): after direct identifiers are redacted,
re-identification risk lives in QUASI-identifiers — attribute
combinations rare enough to single a person out (the classic
zip/birthdate/sex result, Sweeney 2002, "k-Anonymity: A Model for
Protecting Privacy"). A release gate checks every QI equivalence
class has ≥ k members (k-anonymity) and ≥ l distinct sensitive
values (l-diversity, Machanavajjhala et al. 2007 — size alone is
not enough when everyone in the class shares the sensitive value).

Scale (100 TB): one groupBy on the QI tuple — partial aggregation
is map-side-combinable for the size count; the distinct-sensitive
count is Spark's standard two-phase count_distinct expansion. No
Python, no window over the full table, no driver state. Skewed QI
tuples (a dominant equivalence class) are by definition the SAFE
ones — the audit's interesting rows are the small classes, which
never skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """Per-equivalence-class privacy audit.

    Output: one row per distinct QI tuple with
    - group_n: class size,
    - l_distinct: distinct sensitive values in the class,
    - is_k_anonymous: group_n ≥ k,
    - is_l_diverse: l_distinct ≥ l_div,
    - suppressed_rows: group_n where the class fails EITHER test
      (the rows a suppression-based anonymizer would drop), else 0.

    Callers generalize (bin / truncate) the QI columns BEFORE the
    call — generalization is a scan-side projection, and re-running
    the audit per generalization level is how the usual
    coarsen-until-k loop is driven.
    """
    if not qi_cols:
        raise ValueError("k_anonymity needs at least one quasi-identifier column")
    ok = F.col("is_k_anonymous") & F.col("is_l_diverse")
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_n"),
            F.count_distinct(F.col(sensitive_col)).cast("bigint").alias("l_distinct"),
        )
        .withColumn("is_k_anonymous", F.col("group_n") >= k)
        .withColumn("is_l_diverse", F.col("l_distinct") >= l_div)
        .withColumn(
            "suppressed_rows",
            F.when(~ok, F.col("group_n")).otherwise(F.lit(0)).cast("bigint"),
        )
    )


def sensitive_homogeneity(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 2,
    max_share_bp: int = 8000,
) -> DataFrame:
    """Homogeneity-attack audit — the known weakness of plain
    l-diversity: a class can hold l distinct sensitive values while
    one value covers 95% of rows, so an attacker still learns the
    sensitive attribute with high confidence. Per equivalence class
    this reports the TOP sensitive value's share in basis points
    (round-half-up integer division, the engine-portable quotient
    spelling) and gates release on k-anonymity AND l-diversity AND
    the share cap — the practical t-closeness-lite gate.

    Output per QI tuple: group_n, l_distinct, top_n, top_share_bp,
    safe.

    Scale: two map-side-combinable shuffles — (QI, sensitive) counts
    then a QI rollup; no window, no distinct-join, no driver state.
    """
    if not qi_cols:
        raise ValueError("sensitive_homogeneity needs at least one QI column")
    per_value = df.groupBy(*qi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_vn")
    )
    out = per_value.groupBy(*qi_cols).agg(
        F.sum("_vn").cast("bigint").alias("group_n"),
        F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
        F.max("_vn").cast("bigint").alias("top_n"),
    )
    return out.select(
        *qi_cols,
        "group_n",
        "l_distinct",
        "top_n",
        F.expr("(2 * top_n * 10000 + group_n) div (2 * group_n)").alias(
            "top_share_bp"
        ),
    ).withColumn(
        "safe",
        (F.col("group_n") >= k)
        & (F.col("l_distinct") >= l_div)
        & (F.col("top_share_bp") <= max_share_bp),
    )
