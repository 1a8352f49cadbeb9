"""Model-based quality classification — the fastText-shaped linear
classifier inference stage of modern pretraining pipelines (the
DCLM / FineWeb-Edu recipe: score every document with a cheap linear
model over hashed n-gram features, keep the top slice). Rule-based
gates (textstats.gopher_quality) catch structural junk; the learned
scorer ranks fluency/educational value — production corpora run both.

Spark-first shape: featurization is one scan-side bigram explode +
a modular bucket hash; the MODEL IS A RELATION — (bucket, weight)
rows broadcast into the feature join, exactly how a trained
fastText/logistic model's sparse weights ship to executors. Scoring
is one map-side-combinable groupBy(doc). No Python, no UDF; at
100 TB the only shuffle is the per-doc sum.

The repo's weight table is SYNTHETIC (md5-derived integers, so the
whole inference path is engine-replayable and oracle-checked
bit-for-bit) — swap in real trained weights by substituting the
relation; every plan shape stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import md5_int
from .lmscore import _doc_bigrams


def synthetic_weights(
    spark: SparkSession, n_buckets: int = 256, salt: str = "w"
) -> DataFrame:
    """Deterministic stand-in for a trained weight vector: bucket →
    integer milli-weight in [-1000, 1000], derived from md5 so the
    DuckDB oracle rebuilds it exactly. One row per bucket — always
    broadcastable (a real fastText quality model is ~100k-2M hashed
    buckets: still a broadcast)."""
    return spark.range(n_buckets).select(
        F.col("id").cast("bigint").alias("bucket"),
        (
            md5_int(F.concat(F.lit(salt + ":"), F.col("id").cast("string"))) % 2001
            - 1000
        )
        .cast("bigint")
        .alias("w_milli"),
    )


def hashed_linear_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 256,
    threshold_milli: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score each document with a linear model over hashed token-
    bigram features: bucket = md5(bigram) mod n_buckets, score =
    Σ weight[bucket] over the doc's bigram OCCURRENCES (fastText
    sums, not dedups). keep ⇔ mean feature weight exceeds the
    threshold, spelled without division: score_milli >
    threshold_milli · n_feats (exact bigints; empty docs have no
    evidence and are rejected).

    Output: (id_col, n_feats, score_milli, keep).

    Scale: bigram explode is scan-side (the lmscore chain); the
    weight join broadcasts; the per-doc sum is one map-side-combined
    shuffle on the doc key. Nothing quadratic, no Python."""
    bgs = _doc_bigrams(docs, text_col, id_col)
    feats = bgs.select(
        "id",
        (F.conv(F.substring("bg", 1, 15), 16, 10).cast("bigint") % n_buckets).alias(
            "bucket"
        ),
    )
    per_doc = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("w_milli").cast("bigint").alias("score_milli"),
        )
    )
    nf = F.coalesce("n_feats", F.lit(0)).cast("bigint")
    sm = F.coalesce("score_milli", F.lit(0)).cast("bigint")
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("id"), "left")
        .select(
            id_col,
            nf.alias("n_feats"),
            sm.alias("score_milli"),
            ((nf > 0) & (sm > F.lit(threshold_milli) * nf)).alias("keep"),
        )
    )
