"""Probabilistic record linkage (Fellegi & Sunter, JASA 1969 — the
public-domain methodology behind every dedupe/master-data tool):
candidate pairs from a BLOCKING stage, per-field agreement weights
(integer log-odds surrogates), a summed match weight, and the
three-way match / possible / non-match decision.

Spark-first shape: blocking is the deletion-neighborhood equi-join
(operators/fuzzyjoin.py — linear, no all-pairs), scoring is one
narrow projection over the candidates, and the decision is a CASE.
Weights are integer milli-log-odds so the sum is exact and
cross-engine; a trained m/u model swaps in by changing the weight
expressions, not the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_score(
    candidates: DataFrame,
    weights: dict[str, Column],
    match_min: int = 60,
    possible_min: int = 20,
) -> DataFrame:
    """Attach per-field weights, their exact integer sum, and the
    Fellegi-Sunter three-way verdict to a candidate-pair relation.

    `weights` maps output column name → integer weight expression
    (already encoding agree/disagree values for that field).
    Verdict: total ≥ match_min → 'match'; ≥ possible_min →
    'possible' (clerical-review band); else 'non_match'.

    One projection — no shuffle beyond whatever produced the
    candidates."""
    if not weights:
        raise ValueError("fs_score needs at least one field weight")
    out = candidates
    for name, w in weights.items():
        out = out.withColumn(name, w.cast("bigint"))
    total = None
    for name in weights:
        c = F.col(name)
        total = c if total is None else total + c
    out = out.withColumn("total_weight", total.cast("bigint"))
    return out.withColumn(
        "verdict",
        F.when(F.col("total_weight") >= match_min, F.lit("match"))
        .when(F.col("total_weight") >= possible_min, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )
