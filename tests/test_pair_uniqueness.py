"""Uniqueness guards for every pair generator feeding a single-pass
n_found/n_hit left-join (dedup_method_recall_q, ann_method_recall_q,
minhash_band_sweep_q — plans/ext_q.py).

Those queries count hits as `count(_t)` over `found LEFT JOIN truth`:
the arithmetic equals the old truth-side semi-join count ONLY while
both pair sets are duplicate-free (and, for the dedup generators,
canonically ordered id_a < id_b so a truth pair can't also appear
reversed). That precondition used to live only in a comment; these
properties make a future generator that starts emitting duplicated or
unordered pairs fail loudly instead of silently inflating recall.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _assert_unique_ordered_pairs(pairs, a="id_a", b="id_b", ordered=True):
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(a, b).alias("n_distinct"),
        F.sum(F.when(F.col(a) >= F.col(b), 1).otherwise(0)).alias("n_unordered"),
    ).first()
    assert agg.n > 0, "generator produced no pairs — property is vacuous"
    assert agg.n == agg.n_distinct, f"{agg.n - agg.n_distinct} duplicate pairs"
    if ordered:
        assert agg.n_unordered == 0, f"{agg.n_unordered} pairs with {a} >= {b}"


def _planted_docs(spark):
    from joblink_etl_spark.plans.ext_q import _docs_with_neardups
    from joblink_etl_spark.sources import parallelize, table

    return _docs_with_neardups(parallelize(table(spark, SF, "documents")))


def test_minhash_candidate_pairs_unique_ordered(spark):
    from joblink_etl_spark.operators import dedup as D

    _assert_unique_ordered_pairs(
        D.minhash_candidate_pairs(_planted_docs(spark), min_jaccard=0.5)
    )


def test_prefix_filter_jaccard_pairs_unique_ordered(spark):
    from joblink_etl_spark.operators import dedup as D

    docs = _planted_docs(spark).filter((F.col("doc_id") % 10000) < 80)
    _assert_unique_ordered_pairs(
        D.prefix_filter_jaccard_pairs(docs, min_jaccard=0.5)
    )


def test_ngram_jaccard_pairs_unique_ordered(spark):
    from joblink_etl_spark.operators import dedup as D

    docs = _planted_docs(spark).filter((F.col("doc_id") % 10000) < 60)
    _assert_unique_ordered_pairs(D.ngram_jaccard_pairs(docs, min_jaccard=0.3))


def test_band_sweep_candidates_unique_ordered(spark):
    # the exact candidate construction minhash_band_sweep_q uses,
    # for every band config it sweeps
    from joblink_etl_spark.operators import dedup as D
    from joblink_etl_spark.plans.ext_q import _BAND_CONFIGS

    _sh, sigs, _ = D.minhash_base_and_bands(_planted_docs(spark))
    for bands, rpb in _BAND_CONFIGS:
        banded = sigs.select(
            "id", F.explode(D.band_hashes(F.col("sig"), bands, rpb)).alias("bh")
        ).select(
            "id", F.col("bh.band").alias("band"), F.col("bh.bucket").alias("bucket")
        )
        left, right = banded.alias("l"), banded.alias("r")
        cand = (
            left.join(
                right,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        _assert_unique_ordered_pairs(cand)


def test_ann_pair_sets_unique(spark):
    """knn_bruteforce (the pinned truth side), knn_ivf and knn_ivfpq
    (the found sides) must emit each (query_id, neighbor_id) at most
    once — ann_method_recall_q's indicator join depends on it. ANN
    pairs are query->neighbor, not canonically ordered."""
    from joblink_etl_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivf,
        knn_ivfpq,
        quantize_embeddings_global,
    )
    from joblink_etl_spark.sources import parallelize, table

    emb = parallelize(table(spark, SF, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    codes = quantize_embeddings_global(emb).select("vec_id", "q_codes")
    qcodes = codes.filter(F.col("vec_id") < 5)
    sides = [
        knn_bruteforce(emb, queries, k=10),
        knn_ivf(emb, queries, k=10, nprobe=3, every=25),
        knn_ivfpq(
            codes, qcodes, k=10, nprobe=3, coarse_every=25,
            n_sub=4, k_every=50, iters=2, k_cap=100,
        ),
    ]
    for pairs in sides:
        _assert_unique_ordered_pairs(
            pairs.select("query_id", "neighbor_id"),
            a="query_id",
            b="neighbor_id",
            ordered=False,
        )


def test_recall_truth_pairs_unique(spark):
    # the planted ground truth both recall queries join against
    from joblink_etl_spark.sources import table

    truth = (
        table(spark, SF, "documents")
        .filter(F.col("doc_id") % 4 == 0)
        .select(
            F.col("doc_id").alias("id_a"), (F.col("doc_id") + 10000).alias("id_b")
        )
    )
    _assert_unique_ordered_pairs(truth)
