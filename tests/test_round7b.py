"""Round-7 batch-5 unit tests: normalization-fingerprint dedup,
symbol-density routing, k-anonymity audit, blocklist rate gate.

The oracle gate (tools/oracle_check.py) proves whole-query parity;
these tests pin the operator-level semantics the oracle can't single
out — threshold boundaries, precedence, degenerate inputs, and the
argument contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_normalized_duplicates_collapse_punct_and_case(spark):
    from joblink_etl_spark.operators.dedup import normalized_duplicates

    df = spark.createDataFrame(
        [
            (1, "Foo, bar!"),
            (2, "foo bar"),
            (3, "foo  bar"),  # whitespace-only mutation: ALSO exact-dup normal form
            (4, "foobar"),  # no separator — distinct
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in normalized_duplicates(df).collect()}
    # 1, 2, 3 share the normalized fingerprint; canonical is min id
    assert rows[1].canonical_id == 1 and not rows[1].is_duplicate
    assert rows[2].is_duplicate and rows[2].canonical_id == 1
    assert rows[3].is_duplicate and rows[3].canonical_id == 1
    assert not rows[4].is_duplicate
    # 2 vs 3 differ only in whitespace → exact (normalize_text) dedup
    # already catches 3; the punctuated 1 is fuzzy-only territory
    assert not rows[2].is_exact_duplicate  # min of the exact group {2,3}
    assert rows[3].is_exact_duplicate
    assert not rows[1].is_exact_duplicate


def test_symbol_density_routing_precedence_and_empty(spark):
    from joblink_etl_spark.operators.textstats import symbol_density_routing

    df = spark.createDataFrame(
        [
            (1, "plain words only here"),
            (2, "x = 1 + 2 * 3 / 4"),  # digits+ops dense → math
            (3, "if (x) { y(); } ; () {}"),  # brace dense → code
            (4, "{ 1 + 2 } ; ( 3 * 4 ) = { 5 }"),  # both → code wins
            (5, ""),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in symbol_density_routing(df).collect()}
    assert rows[1].route == "prose"
    assert rows[2].route == "math"
    assert rows[3].route == "code"
    assert rows[4].route == "code"  # precedence: code beats math
    assert rows[5].route == "prose"
    assert rows[5].n_chars == 0 and rows[5].digit_bp == 0 and rows[5].code_bp == 0


def test_k_anonymity_flags_and_suppression(spark):
    from joblink_etl_spark.operators.privacy import k_anonymity

    # group A: size 3 (fails k=3? no — k=3 passes), 1 sensitive value
    # (fails l=2); group B: size 2 (fails k=3), 2 sensitive values
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 10), ("a", 1, 10), ("b", 2, 10), ("b", 2, 11)],
        "qi string, qi2 int, user bigint",
    )
    out = {
        r.qi: r
        for r in k_anonymity(df, ["qi", "qi2"], "user", k=3, l_div=2).collect()
    }
    a, b = out["a"], out["b"]
    assert a.group_n == 3 and a.is_k_anonymous and not a.is_l_diverse
    assert a.suppressed_rows == 3  # l-diversity failure suppresses too
    assert b.group_n == 2 and not b.is_k_anonymous and b.is_l_diverse
    assert b.suppressed_rows == 2


def test_k_anonymity_requires_qi_cols(spark):
    from joblink_etl_spark.operators.privacy import k_anonymity

    df = spark.createDataFrame([("a", 1)], "qi string, user bigint")
    with pytest.raises(ValueError, match="quasi-identifier"):
        k_anonymity(df, [], "user")


def test_blocklist_hits_rate_gate_and_empty_doc(spark):
    from joblink_etl_spark.operators.curate import blocklist_hits

    docs = spark.createDataFrame(
        [
            (1, "bad word bad apple"),  # 3/4 blocked = 75% → drop
            (2, "bad a b c d e f g h i"),  # 1/10 = exactly 10% → keep (<=)
            (3, "clean text"),
            (4, ""),  # zero tokens → keep, zero counts
        ],
        "doc_id bigint, text string",
    )
    bl = spark.createDataFrame([("bad",), ("word",)], "word string")
    out = {
        r.id: r for r in blocklist_hits(docs, bl, max_rate_bp=1000).collect()
    }
    assert out[1].n_blocked == 3 and out[1].n_blocked_types == 2 and not out[1].keep
    assert out[2].n_blocked == 1 and out[2].keep  # boundary: 10000*1 == 1000*10
    assert out[3].n_blocked == 0 and out[3].keep
    assert out[4].n_tokens == 0 and out[4].n_blocked == 0 and out[4].keep


def test_top_frequency_blocklist_ties_alphabetical(spark):
    from joblink_etl_spark.operators.curate import top_frequency_blocklist

    docs = spark.createDataFrame(
        [(1, "zz zz aa aa bb")], "doc_id bigint, text string"
    )
    words = [r.word for r in top_frequency_blocklist(docs, top_n=2).collect()]
    assert words == ["aa", "zz"]  # count desc, then word asc


def test_retrieval_metrics_exact_fractions(spark):
    from joblink_etl_spark.operators.tfidf import retrieval_metrics

    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)],
        "query_id bigint, doc_id bigint, rank int",
    )
    truth = spark.createDataFrame(
        # q1: 2 relevant, both retrieved (ranks 2, 3); q2: 2 relevant,
        # none retrieved; q3: relevant but q3 absent from ranking
        [(1, 11), (1, 12), (2, 30), (2, 31), (3, 40)],
        "query_id bigint, doc_id bigint",
    )
    out = {r.query_id: r for r in retrieval_metrics(ranked, truth).collect()}
    assert out[1].n_hits_at_k == 2 and out[1].recall_bp == 10000
    assert out[1].first_rel_rank == 2 and out[1].rr_ppm == 500000
    assert out[2].n_hits_at_k == 0 and out[2].recall_bp == 0 and out[2].rr_ppm == 0
    assert out[3].n_relevant == 1 and out[3].n_hits_at_k == 0


def test_waterfill_allocation_brackets(spark):
    from joblink_etl_spark.operators.sampling import waterfill_allocation

    rows = [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 7 + [("d",)] * 1
    df = spark.createDataFrame(rows, "grp string")

    def run(b):
        return {
            r.grp: r.alloc for r in waterfill_allocation(df, "grp", budget=b).collect()
        }

    # interior bracket: T=4, exact fit
    assert run(12) == {"a": 4, "b": 3, "c": 4, "d": 1}
    # remainder +1 goes to the largest capped group first
    assert run(13) == {"a": 5, "b": 3, "c": 4, "d": 1}
    # budget below group count: flat floor T=0, top-up by size desc
    assert run(3) == {"a": 1, "b": 1, "c": 1, "d": 0}
    # budget above corpus: everything allocated, surplus unused
    assert run(100) == {"a": 10, "b": 3, "c": 7, "d": 1}


def test_quantile_normalize_endpoints_and_singleton(spark):
    from joblink_etl_spark.operators.select import quantile_normalize

    # group a: 3 rows spanning ranks; group b: singleton → pooled median
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 50), (3, "a", 90), (4, "b", 999)],
        "doc_id bigint, source string, n_chars bigint",
    )
    out = {r.id: r for r in quantile_normalize(df).collect()}
    # pooled sorted: 10, 50, 90, 999 (N=4)
    # a's rank 1 -> p=1 (pooled min), rank 3 -> p=1+(2*3)div 2=4 (pooled max)
    assert out[1].norm_score == 10
    assert out[3].norm_score == 999
    # a's rank 2 -> p = 1 + (1*3) div 2 = 2 -> 50
    assert out[2].norm_score == 50
    # singleton b -> median position (4+1) div 2 = 2 -> 50
    assert out[4].norm_score == 50 and out[4].src_rank == 1


def test_containment_pairs_subset_doc_and_stop_gram_knob(spark):
    from joblink_etl_spark.operators.dedup import containment_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, "alpha beta gamma delta epsilon"),  # prefix quote of 1
            (3, "totally different words here now"),
        ],
        "doc_id bigint, text string",
    )
    rows = {(r.id_a, r.id_b): r for r in containment_pairs(df, ngram=3).collect()}
    # quote's 3 trigrams all inside base's 8 -> contain_a=10000, b=3750
    assert set(rows) == {(1, 2)}
    r = rows[(1, 2)]
    assert (r.n_a, r.n_b, r.inter) == (8, 3, 3)
    assert r.contain_b_bp == 10000 and r.contain_a_bp == 3750

    # stop-gram knob: a shingle shared by all three docs fans the
    # gram join; capping df excludes it from intersection AND sizes
    footer = " shared footer line"
    df2 = spark.createDataFrame(
        [(1, base + footer), (2, "alpha beta gamma delta epsilon" + footer),
         (3, "totally different words here now" + footer)],
        "doc_id bigint, text string",
    )
    # without the cap doc 3 becomes a candidate via footer grams
    uncapped = containment_pairs(df2, ngram=3, min_containment_bp=0)
    assert {(r.id_a, r.id_b) for r in uncapped.collect()} >= {(1, 3), (2, 3)}
    # df cap 2 drops the ubiquitous footer gram (df=3) -> doc 3 has
    # no shared grams left at all; the quote pair keeps only its
    # genuine prefix grams (3 of doc 2's remaining 5: the two
    # footer-bridge grams differ between the docs)
    capped = {
        (r.id_a, r.id_b): r
        for r in containment_pairs(
            df2, ngram=3, min_containment_bp=0, max_gram_df=2
        ).collect()
    }
    assert set(capped) == {(1, 2)}
    r2 = capped[(1, 2)]
    assert (r2.inter, r2.n_b, r2.contain_b_bp) == (3, 5, 6000)


def test_source_suppression_evidence_floor(spark):
    from joblink_etl_spark.operators.curate import source_suppression

    rows = (
        [(i, "bad", False) for i in range(12)]           # 0% pass, 12 docs
        + [(100 + i, "thin", False) for i in range(3)]   # 0% pass, 3 docs
        + [(200 + i, "good", i % 4 != 0) for i in range(12)]  # 75% pass
    )
    df = spark.createDataFrame(rows, "doc_id bigint, source string, pass_gopher boolean")
    out = {r.source: r for r in source_suppression(df, min_docs=10, min_pass_bp=5000).collect()}
    assert out["bad"].suppressed and out["bad"].pass_bp == 0
    # thin evidence: never suppressed wholesale
    assert not out["thin"].suppressed and out["thin"].n_docs == 3
    assert not out["good"].suppressed and out["good"].pass_bp == 7500


def test_distinct_ngram_diversity_mode_collapse_signature(spark):
    from joblink_etl_spark.operators.textstats import distinct_ngram_diversity

    df = spark.createDataFrame(
        [
            # varied: 6 tokens all distinct, 4 distinct bigrams of 4
            ("varied", "a b c"), ("varied", "d e f"),
            # template: same words reshuffled -> unigram diversity ok,
            # but every doc is the SAME bigram chain -> bigram collapse
            ("tmpl", "x y x y"), ("tmpl", "x y x y"), ("tmpl", "x y x y"),
        ],
        "source string, text string",
    )
    out = {(r.grp, r.n): r for r in distinct_ngram_diversity(df).collect()}
    assert out[("varied", 1)].distinct_bp == 10000
    assert out[("varied", 2)].distinct_bp == 10000
    # tmpl: 12 unigrams 2 distinct; 9 bigrams 3 distinct ("x y","y x")
    assert out[("tmpl", 1)].total_grams == 12 and out[("tmpl", 1)].distinct_grams == 2
    assert out[("tmpl", 2)].total_grams == 9 and out[("tmpl", 2)].distinct_grams == 2
    assert out[("tmpl", 2)].distinct_bp == 2222


def test_cluster_balanced_sample_quotas_and_determinism(spark):
    from joblink_etl_spark.operators.sampling import cluster_balanced_sample

    # cells: a=10, b=3, c=1 rows; budget 8 -> waterfill T=... quotas
    rows = [(i, "a") for i in range(10)] + [(100 + i, "b") for i in range(3)] + [(200, "c")]
    df = spark.createDataFrame(rows, "vec_id bigint, cluster_id string")
    out = cluster_balanced_sample(df, budget=8, cell_col="cluster_id").collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cluster_id, []).append(r)
    # small cells keep everything; the big cell caps at the water level
    assert len(by_cell["c"]) == 1 and len(by_cell["b"]) == 3
    assert len(by_cell["a"]) == 4 and sum(len(v) for v in by_cell.values()) == 8
    assert all(r.alloc == 4 and r.cell_n == 10 for r in by_cell["a"])
    # deterministic: same draw on re-run, ranks are 1..alloc
    again = cluster_balanced_sample(df, budget=8, cell_col="cluster_id").collect()
    assert sorted(r.vec_id for r in out) == sorted(r.vec_id for r in again)
    assert sorted(r.pick_rank for r in by_cell["a"]) == [1, 2, 3, 4]


def test_preference_cycles_kinds_and_canonicalization(spark):
    from joblink_etl_spark.operators.select import preference_cycles

    prefs = spark.createDataFrame(
        [
            (1, 2), (2, 1),          # 2-cycle
            (3, 4), (4, 5), (5, 3),  # 3-cycle
            (6, 7), (7, 8), (6, 8),  # transitive triangle: NOT a cycle
            (9, 9),                  # self-pair: ignored
            (3, 4),                  # duplicate edge: collapsed
        ],
        "winner_id bigint, loser_id bigint",
    )
    rows = sorted(map(tuple, preference_cycles(prefs).collect()))
    # each cycle reported exactly once, 3-cycle anchored at min node
    assert rows == [("2cycle", 1, 2, 0), ("3cycle", 3, 4, 5)]


def test_embedding_drift_detects_planted_shift(spark):
    from joblink_etl_spark.operators.similarity import embedding_drift

    a = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(4)], "vec_id bigint, embedding array<double>"
    )
    # snapshot b shifts dim 1 up to the scale max; dim 0 unchanged
    b = spark.createDataFrame(
        [(i, [1.0, 127.0]) for i in range(2)], "vec_id bigint, embedding array<double>"
    )
    rows = {r.dim: r for r in embedding_drift(a, b).collect()}
    # shared scale = 127/127 = 1.0 -> codes are the raw values
    d0, d1 = rows[0], rows[1]
    assert (d0.n_a, d0.n_b, d0.sum_a, d0.sum_b) == (4, 2, 4, 2)
    assert d0.shift_sign == 0 and d0.shift_abs_milli == 0
    # dim 1: mean_a=0, mean_b=127 -> shift = -127000 milli-codes
    assert d1.shift_sign == -1 and d1.shift_abs_milli == 127000


def test_chunk_salvage_verdict_classes(spark, sf_dir_001="/root/testdata/sf0.001"):
    from joblink_etl_spark.plans.ext_q import chunk_salvage_q

    rows = chunk_salvage_q(spark, sf_dir_001).collect()
    planted = [r for r in rows if r.doc_id >= 800000]
    normal = [r for r in rows if r.doc_id < 800000]
    # all three verdicts occur; planted junk-tail docs never 'keep'
    assert {r.verdict for r in rows} == {"keep", "salvage", "drop"}
    assert all(r.verdict != "keep" for r in planted)
    # a salvage verdict means strictly-partial pass, bp consistent
    for r in rows:
        if r.verdict == "salvage":
            assert 0 < r.n_pass_chunks < r.n_chunks
            assert r.salvage_bp == (10000 * r.n_pass_chunks) // r.n_chunks
    # long planted docs keep their clean chunks
    assert any(r.verdict == "salvage" for r in planted)
    assert any(r.verdict == "keep" for r in normal)


def test_grouped_priority_sample_caps_and_weights(spark):
    from joblink_etl_spark.operators.sampling import grouped_priority_sample

    rows = [(i, "a", 10) for i in range(20)] + [(100 + i, "b", 10) for i in range(3)]
    # one heavyweight doc in group a should (almost surely) be picked:
    # weight 1e6 vs 10 — priority ratio overwhelms any u draw
    rows.append((999, "a", 1_000_000))
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars bigint")
    out = grouped_priority_sample(df, "lang", "n_chars", k=5, id_col="doc_id")
    got = out.collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r.grp, []).append(r)
    assert len(by_grp["a"]) == 5          # capped at k
    assert len(by_grp["b"]) == 3          # below k: whole group
    assert any(r.doc_id == 999 for r in by_grp["a"])  # weight dominates
    assert sorted(r.pick_rank for r in by_grp["a"]) == [1, 2, 3, 4, 5]
    # deterministic across runs
    again = grouped_priority_sample(df, "lang", "n_chars", k=5, id_col="doc_id")
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))


def test_triangle_counts_degree_ordered_exact(spark):
    from joblink_etl_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4}: 4 triangles, each node in exactly 3; node 5
    # hangs off node 1 (no triangle); duplicate + reversed edges
    # collapse; self-loop ignored
    edges = [(i, j) for i in range(1, 5) for j in range(1, 5) if i < j]
    edges += [(2, 1), (1, 5), (3, 3), (1, 2)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    out = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_regex_token_stats_gpt2_space_fusion(spark):
    from joblink_etl_spark.operators.textstats import regex_token_stats

    df = spark.createDataFrame(
        [
            (1, "hello world"),     # [hello][ world] -> 2 regex, 2 ws
            (2, "x=1, y=22"),       # [x][=][1][,][ y][=][22] -> 7
            (3, "a  b"),            # [a][<space>][ b]: double space splits
            (4, ""),                # empty -> all zero
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in regex_token_stats(df).collect()}
    assert (rows[1].n_ws_tokens, rows[1].n_regex_tokens) == (2, 2)
    assert rows[2].n_regex_tokens == 7 and rows[2].n_ws_tokens == 2
    assert rows[2].fertility_bp == 35000
    assert rows[3].n_regex_tokens == 3  # "a", " " (lone), " b"
    assert rows[4].n_regex_tokens == 0 and rows[4].fertility_bp == 0


def test_patch_grid_clipping_and_coverage(spark):
    from joblink_etl_spark.operators.multimodal import patch_grid

    df = spark.createDataFrame(
        [(1, 33, 17), (2, 16, 16), (3, 0, 0)],
        "doc_id bigint, width int, height int",
    )
    rows = [r for r in patch_grid(df, patch=16).collect()]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 33x17 -> 3 cols x 2 rows = 6 patches; edge clipped to 1px
    assert len(by_doc[1]) == 6
    edge = {(r.patch_row, r.patch_col): (r.pw, r.ph) for r in by_doc[1]}
    assert edge[(0, 0)] == (16, 16) and edge[(0, 2)] == (1, 16)
    assert edge[(1, 0)] == (16, 1) and edge[(1, 2)] == (1, 1)
    # exact 16x16 -> single full patch
    assert len(by_doc[2]) == 1 and by_doc[2][0].pw == 16 and by_doc[2][0].ph == 16
    # zero-area -> no patches (the sequence(0,-1) trap)
    assert 3 not in by_doc
    # patch area sums to image area
    assert sum(r.pw * r.ph for r in by_doc[1]) == 33 * 17


def test_merged_quantile_summary_error_bound(spark):
    from joblink_etl_spark.operators.sketches import merged_quantile_summary

    # values 1..1000: true q-th percentile is ~10*q; summary answers
    # must sit within the guaranteed rank error (N/k per shard,
    # summed over shards at the merge: <= n_shards * N / (k * ...)
    # — use the loose practical bound N/k total here)
    n, shards, k = 1000, 8, 25
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, n + 1)], "event_id bigint, value double"
    )
    out = {
        r.q_pct: r
        for r in merged_quantile_summary(
            df, "value", "event_id", n_shards=shards, k_per_shard=k
        ).collect()
    }
    for q in (10, 25, 50, 75, 90):
        true_rank = -(-q * n // 100)
        approx_rank = out[q].approx_value  # values ARE their ranks
        assert abs(approx_rank - true_rank) <= shards * (n / shards / k) + shards
    # determinism
    again = {
        r.q_pct: r.approx_value
        for r in merged_quantile_summary(
            df, "value", "event_id", n_shards=shards, k_per_shard=k
        ).collect()
    }
    assert again == {q: r.approx_value for q, r in out.items()}


def test_ab_assignment_deterministic_and_exposure_sized(spark):
    from joblink_etl_spark.operators.sampling import ab_assignment_report

    rows = [(u, float(u % 7)) for u in range(2000) for _ in range(2)]
    df = spark.createDataFrame(rows, "user_id bigint, value double")
    out = {r.arm: r for r in ab_assignment_report(df, exposure_bp=4000).collect()}
    # holdout + 2 arms, exposure ~40% of units (md5-uniform)
    assert set(out) == {-1, 0, 1}
    exposed = out[0].n_units + out[1].n_units
    assert abs(exposed - 800) < 80
    # every event counted exactly once across arms
    assert sum(r.n_events for r in out.values()) == len(rows)
    # same user never splits across arms: unit totals match distinct users
    assert sum(r.n_units for r in out.values()) == 2000
    # deterministic re-run
    again = {r.arm: r.n_units for r in ab_assignment_report(df, exposure_bp=4000).collect()}
    assert again == {a: r.n_units for a, r in out.items()}


def test_engagement_ratios_exact_small_case(spark):
    from joblink_etl_spark.plans.events_q import engagement_ratios
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = []
    # user 1 active days 0 and 3; user 2 active day 3 only
    for u, d in ((1, 0), (1, 3), (2, 3)):
        rows.append((u * 100 + d, base + dt.timedelta(days=d), u))
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint")
    df.createOrReplaceTempView("_eng")
    import joblink_etl_spark.plans.events_q as EVQ
    from pyspark.sql import functions as F

    ev = df.select(F.expr("unix_micros(ts) div 86400000000").alias("day_n"), "user_id")
    ud = ev.distinct()
    dau = ud.groupBy("day_n").agg(F.count_distinct("user_id").alias("dau"))
    wau = (
        ud.select(F.explode(F.sequence(F.col("day_n"), F.col("day_n") + 6)).alias("day_n"), "user_id")
        .groupBy("day_n").agg(F.count_distinct("user_id").alias("wau"))
    )
    out = {r.day_n: r for r in dau.join(wau, "day_n").collect()}
    days = sorted(out)
    d0, d3 = days[0], days[1]
    assert out[d0].dau == 1 and out[d0].wau == 1          # only user 1 so far
    assert out[d3].dau == 2 and out[d3].wau == 2          # day0 user still in window


def test_bitmap_overlap_exact_under_capacity(spark):
    from joblink_etl_spark.operators.sketches import bitmap_overlap

    # small disjoint + overlapping groups, well under 1024 buckets:
    # bucket collisions are possible but deterministic; assert the
    # relational identities instead of raw set sizes
    rows = (
        [("a", i) for i in range(50)]
        + [("b", i) for i in range(25, 75)]   # 25 shared with a
        + [("c", i) for i in range(1000, 1020)]  # disjoint
    )
    df = spark.createDataFrame(rows, "grp string, id bigint")
    out = {(r.grp_a, r.grp_b): r for r in bitmap_overlap(df, "grp", "id").collect()}
    ab = out[("a", "b")]
    # overlap bounded by the smaller side; disjoint pairs near zero
    assert 0 < ab.common_buckets <= min(ab.buckets_a, ab.buckets_b)
    assert ab.jaccard_bp > out.get(("a", "c"), ab).jaccard_bp or ("a", "c") not in out
    # mergeable-by-OR sanity: union group equals OR of members
    rows2 = rows + [("u", i) for i in range(75)]  # u = a ∪ b
    df2 = spark.createDataFrame(rows2, "grp string, id bigint")
    out2 = {(r.grp_a, r.grp_b): r for r in bitmap_overlap(df2, "grp", "id").collect()}
    au = out2[("a", "u")]
    assert au.common_buckets == au.buckets_a  # a ⊆ u exactly, bucket-wise
