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


def t_closeness(
    df: DataFrame,
    qi_cols: Sequence[str],
    bucket_col: str,
    t_bp_max: int = 2000,
) -> DataFrame:
    """t-closeness audit over an ORDERED sensitive attribute (Li,
    Li & Venkatasubramanian, ICDE 2007) — the third rung of the
    release-gate ladder after k_anonymity and sensitive_homogeneity:
    a class passes only if its sensitive-value DISTRIBUTION stays
    within Earth Mover's Distance t of the global distribution, so
    skewed-but-diverse classes (which fool l-diversity) are caught.

    For an ordered attribute with m buckets, EMD is the normalized
    sum of absolute cumulative differences:
        EMD = (1/(m-1)) * Σ_b |P_cum(b) − Q_cum(b)|.
    Everything here stays EXACT INTEGER until the final basis-point
    division: with C_gb = the class's cumulative count through
    bucket b, CN_b = the global cumulative count, n_g = class size
    and N = corpus size, the per-bucket term is
    |N·C_gb − n_g·CN_b| (a bigint), the scaled EMD is their sum,
    and t in basis points is the round-half-up integer quotient
    against den = n_g·N·(m−1) — partition-order-proof, so the
    driver hash is engine-exact.

    Callers pre-bin the sensitive attribute into the INTEGER
    `bucket_col` (binning is a scan-side projection, as with
    k_anonymity's generalization contract).

    Output per QI tuple: group_n, m_buckets, emd_scaled, t_bp,
    is_t_close.

    Scale: the bucket relation is tiny (m rows — its cumulative
    counts come from an m² self-join, no global window); the grid is
    classes × m rows; the class-cumulative join is QI-equi with a
    bucket range predicate (fan-out ≤ m per row). Two corpus-sized
    map-side-combinable shuffles total — the (QI, bucket) count and
    the QI rollup; everything else is broadcast-sized.
    """
    if not qi_cols:
        raise ValueError("t_closeness needs at least one QI column")
    qi = list(qi_cols)
    pv = df.groupBy(*qi, bucket_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_nb")
    )
    # global per-bucket counts + cumulative (m rows; m² self-join
    # instead of a global ordered window)
    gb = df.groupBy(bucket_col).agg(F.count(F.lit(1)).cast("bigint").alias("_Nb"))
    ga = gb.agg(
        F.sum("_Nb").cast("bigint").alias("_N"),
        F.count(F.lit(1)).cast("bigint").alias("m_buckets"),
    )
    lo = gb.select(F.col(bucket_col).alias("_b"), F.col("_Nb").alias("_Nb_lo"))
    cum_global = (
        gb.join(F.broadcast(lo), F.col("_b") <= F.col(bucket_col))
        .groupBy(bucket_col)
        .agg(F.sum("_Nb_lo").cast("bigint").alias("_CNb"))
        .crossJoin(F.broadcast(ga))
    )
    groups = pv.groupBy(*qi).agg(F.sum("_nb").cast("bigint").alias("group_n"))
    grid = groups.crossJoin(F.broadcast(cum_global))
    # class cumulative count through each bucket (left join keeps the
    # zero-prefix buckets a class has no rows in)
    pv2 = pv.select(
        *[F.col(c).alias(f"_q_{c}") for c in qi],
        F.col(bucket_col).alias("_pb"),
        "_nb",
    )
    on = [grid[c] == pv2[f"_q_{c}"] for c in qi] + [
        pv2["_pb"] <= grid[bucket_col]
    ]
    joined = grid.join(pv2, on, "left")
    cum = joined.groupBy(
        *qi, bucket_col, "group_n", "_CNb", "_N", "m_buckets"
    ).agg(F.coalesce(F.sum("_nb"), F.lit(0)).cast("bigint").alias("_Cgb"))
    per_bucket = cum.withColumn(
        "_term", F.abs(F.col("_N") * F.col("_Cgb") - F.col("group_n") * F.col("_CNb"))
    )
    out = per_bucket.groupBy(*qi, "group_n", "_N", "m_buckets").agg(
        F.sum("_term").cast("bigint").alias("emd_scaled")
    )
    return out.select(
        *qi,
        "group_n",
        "m_buckets",
        "emd_scaled",
        F.expr(
            "CASE WHEN m_buckets > 1 THEN"
            " (2 * emd_scaled * 10000 + group_n * _N * (m_buckets - 1))"
            " div (2 * group_n * _N * (m_buckets - 1)) ELSE 0 END"
        ).alias("t_bp"),
    ).withColumn("is_t_close", F.col("t_bp") <= t_bp_max)
