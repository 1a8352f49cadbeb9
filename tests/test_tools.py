"""Tests for the audit tools themselves (tools/broadcast_audit.py).

r14 switched the scan from 'simple' to 'formatted' explain mode so
subquery plan trees (`===== Subqueries =====` sections) are scanned
under one explicit, version-independent grammar — the r12 verdict's
documented caveat was that subquery plans might escape the
structural scan. (Empirically, Spark 4.1.2's simple mode ALSO
inlines subquery subtrees as innerChildren, so both modes cover
them on this version; formatted makes the coverage explicit and
uniform.) These tests pin: (a) a synthetic generate-class broadcast
living inside a scalar subquery is caught in the formatted scan,
(b) the operator-detail sections of formatted output produce no
phantom matches, (c) the designed quadratic-guard refusal is
classified as such, not as an audit error.
"""

from __future__ import annotations

import os
import sys

import pytest

import joblink_etl_spark

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(joblink_etl_spark.__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))

from broadcast_audit import (  # noqa: E402
    WHITELIST,
    _is_guard_refusal,
    generate_class_broadcasts,
)


def _explain(spark, df, mode_name):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode_name
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture()
def subquery_broadcast_plan(spark):
    """A scalar subquery whose OWN plan tree carries a generate-class
    broadcast: inside the subquery, an exploded (Generate) relation
    is the build side of a BroadcastHashJoin with no bounding
    aggregate/limit between the explode and the exchange. The outer
    query itself has no broadcast at all."""
    df = spark.range(100).selectExpr(
        "id", "array(id, id + 1, id + 2) AS arr"
    )
    df.createOrReplaceTempView("bt")
    return spark.sql(
        """
        SELECT bt.id,
               (SELECT max(t2.id + e.x)
                FROM bt t2
                JOIN (SELECT explode(arr) AS x FROM bt) e
                  ON t2.id = e.x) AS mx
        FROM bt
        """
    )


def test_formatted_mode_catches_subquery_broadcast(spark, subquery_broadcast_plan):
    """The r14 scan mode: the subquery tree is printed inline and the
    generate-class broadcast inside it is counted."""
    plan = _explain(spark, subquery_broadcast_plan, "formatted")
    assert "===== Subqueries =====" in plan
    assert "BroadcastExchange" in plan
    assert generate_class_broadcasts(plan) >= 1


def test_formatted_mode_detail_sections_no_phantom_matches(spark):
    """The operator-detail sections of formatted output ('(6)
    BroadcastExchange' + 'Input [...]' lines at column 0) must not
    produce phantom generate-class counts: a broadcast whose subtree
    has NO explode scans clean even though 'Generate' appears
    elsewhere in the same formatted string."""
    small = spark.range(5).selectExpr("id AS k")
    big = spark.range(1000).selectExpr(
        "id", "explode(array(id, id + 1)) AS k"
    )
    # The explode is on the STREAM side; the broadcast side (small)
    # is explode-free — formatted detail sections print both nodes'
    # details, but the tree-subtree walk must keep them apart.
    joined = big.join(small.hint("broadcast"), "k")
    plan = _explain(spark, joined, "formatted")
    assert "BroadcastExchange" in plan and "Generate" in plan
    assert generate_class_broadcasts(plan) == 0


def test_guard_refusal_classifier():
    """--exempt-audit classifies the designed quadratic-guard
    ValueError (cosine_near_dup_pairs max_rows contract) as
    'guard_refusal_by_design', not 'error' (ADVICE r13 medium)."""
    designed = ValueError(
        "cosine_near_dup_pairs is the O(N²) all-pairs baseline and the "
        "input has > max_rows=5000 rows; use cosine_near_dup_pairs_blocked "
        "/ cosine_near_dup_pairs_lsh for real corpora, or pass "
        "allow_quadratic=True to force it"
    )
    assert _is_guard_refusal(designed)
    assert not _is_guard_refusal(ValueError("some other failure"))
    assert not _is_guard_refusal(RuntimeError("allow_quadratic mentioned"))


def test_whitelist_entries_still_registered():
    from joblink_etl_spark.plans import registry

    qs = registry.queries()
    for name in WHITELIST:
        assert name in qs
