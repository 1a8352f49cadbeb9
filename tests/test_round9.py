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


def test_t_closeness_hand_computed(spark):
    # global buckets: b0 -> 3 rows, b1 -> 1 row (N=4, m=2).
    # group A sits entirely in b0: P=(1,0) vs Q=(0.75,0.25) ->
    # EMD = |1-0.75|/(m-1) = 0.25 exactly; group B is (0.5,0.5) ->
    # cum diffs |0.5-0.75| = 0.25 too. Integer spelling:
    # emd_scaled = |N*Cgb - n_g*CNb| summed = 2, den = 2*4*1 = 8.
    from joblink_etl_spark.operators.privacy import t_closeness

    df = spark.createDataFrame(
        [("A", 0), ("A", 0), ("B", 0), ("B", 1)], "g STRING, b BIGINT"
    )
    out = {r.g: r for r in t_closeness(df, ["g"], "b", t_bp_max=2500).collect()}
    assert out["A"].group_n == 2 and out["A"].m_buckets == 2
    assert out["A"].emd_scaled == 2 and out["A"].t_bp == 2500
    assert out["B"].emd_scaled == 2 and out["B"].t_bp == 2500
    assert out["A"].is_t_close and out["B"].is_t_close
    strict = {r.g: r for r in t_closeness(df, ["g"], "b", t_bp_max=2000).collect()}
    assert not strict["A"].is_t_close


def test_debug_helpers_mirror_reference_shapes(spark):
    # debugRenderer() (:1203-1209) and debugNotesOnce() (:1212-1214)
    # analogues: same summary dict shape / one-small-batch behavior.
    from joblink_etl_spark.clients.fakes import FakeRendererClient
    from joblink_etl_spark.debug import debug_notes_once, debug_renderer

    ok = debug_renderer(FakeRendererClient(), "https://boards.greenhouse.io/acme/jobs/1")
    assert ok["ok"] and set(ok) == {"ok", "status", "final", "first200"}
    assert len(ok["first200"] or "") <= 200
    off = debug_renderer(FakeRendererClient(enabled=False), "https://x.test/")
    assert off == {"ok": False, "status": None, "final": None, "first200": None}

    tracker = spark.createDataFrame(
        [
            (1, "Acme", "Engineer", "", ""),
            (2, "Mega", "Analyst", "", ""),
            (3, "Done", "PM", "KEEP", "KEEP"),
        ],
        "row_id BIGINT, company_auto STRING, role_auto STRING, "
        "li_invite STRING, li_followup STRING",
    )
    rows = debug_notes_once(spark, tracker, {"headline": "builder"}, limit=1)
    assert len(rows) == 1
    assert rows[0]["li_invite"].startswith("Hi there — I applied for")
    assert "builder" in rows[0]["li_invite"]
