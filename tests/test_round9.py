"""Round-9 fixes: fuzzy-join row-identifier dedup (ADVICE r8 medium)
and the ancestor_rollup convergence guard (ADVICE r8 low)."""

from __future__ import annotations

import pytest

from joblink_etl_spark.operators.fuzzyjoin import fuzzy_key_join
from joblink_etl_spark.operators.graph import ancestor_rollup


def test_fuzzy_join_dedup_keys_keeps_duplicate_left_keys(spark):
    # two DISTINCT left rows that share a key — the record-linkage
    # collision class (custkey 49 / 70049 both deleting to
    # 'Customer#00000049'). With dedup on the row identifiers both
    # pairs survive; the legacy key-based dedup collapses them to
    # one arbitrary carrier row.
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corp")], "lid BIGINT, lkey STRING"
    )
    right = spark.createDataFrame([(10, "acme c0rp")], "rid BIGINT, rkey STRING")
    out = fuzzy_key_join(
        left, right, "lkey", "rkey", dedup_keys=["lid", "rid"]
    ).collect()
    assert sorted((r["lid"], r["rid"]) for r in out) == [(1, 10), (2, 10)]
    # default (join-key dedup) documents the collapse: one carrier row
    legacy = fuzzy_key_join(left, right, "lkey", "rkey").collect()
    assert len(legacy) == 1


def test_ancestor_rollup_raises_when_rounds_too_small(spark):
    # depth-12 chain but rounds=3 caps at 2^3=8: the loop would
    # silently return a non-root 'root' — the guard must raise.
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 13)]
    nodes = spark.createDataFrame(rows, "id bigint, parent bigint")
    with pytest.raises(ValueError, match="unresolved"):
        ancestor_rollup(nodes, rounds=3)
    # and the silent mode is still reachable when explicitly waived
    out = {
        r.id: r
        for r in ancestor_rollup(nodes, rounds=3, check_convergence=False).collect()
    }
    assert out[12].root != 0 or out[12].depth != 12
