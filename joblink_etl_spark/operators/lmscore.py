"""Corpus n-gram LM scoring — the perplexity-style quality filter of
a training-data pipeline (a la CCNet/KenLM gating), made
engine-exact.

A real KenLM score is a float log-prob sum — unverifiable across
engines (log and sum order both wobble). This operator keeps the
ranking signal but swaps the arithmetic for exact integers: a
bigram's "information" is floor(log2(count)) computed via the length
of the count's binary representation (identical in Spark `bin()` and
DuckDB `format('{:b}', …)`), summed per doc as a bigint. Frequent
bigrams ⇒ high sum ⇒ fluent-under-corpus; rare/unseen bigrams add 0.
The per-token normalization is ONE exact-integer division at the end
(a single IEEE division is bit-identical everywhere).

Plan shape (corpus-linear, two shuffles):
1. scan-side per-doc bigram explode (tokenizer evaluated once per
   doc via a HOF binding);
2. the bigram LM: groupBy(bigram) count — map-side combinable,
   md5-keyed (uniform);
3. doc-bigrams ⋈ LM on the bigram hash (the LM is Zipf-compact; at
   real scale it can be broadcast after a min-count cut), then one
   map-side-combined per-doc sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import with_tokens


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, bg = md5 of 'tok_i tok_{i+1}') for every adjacent token
    pair, all docs. Scan-side."""
    sc = df.sparkSession.sparkContext

    def build(t):
        n = F.greatest(F.size(t) - 1, F.lit(0))
        return F.transform(
            F.slice(t, 1, n),
            lambda x, i: F.md5(F.concat_ws(" ", x, F.get(t, i + 1))),
        )

    return (
        df.repartition(sc.defaultParallelism, F.col(id_col))
        .select(
            F.col(id_col).alias("id"),
            F.explode(with_tokens(F.col(text_col), build)).alias("bg"),
        )
    )


def ngram_lm_score(
    df: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc under the corpus's own bigram LM.

    Output per doc: n_bigrams, known_bigrams (count >= min_count in
    the corpus LM), ilog2_sum = Σ floor(log2(count)) over known
    bigrams (exact bigint), and score = round(ilog2_sum / n_bigrams,
    4) (one exact-integer IEEE division — engine-identical; 0.0 for
    empty docs). Higher = more corpus-typical; the tail below a
    score cut is the junk a perplexity gate would drop."""
    bgs = _doc_bigrams(df, text_col, id_col)
    lm = (
        bgs.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        # floor(log2(c)) = len(binary(c)) - 1: exact integer in both
        # engines, no float log anywhere
        .select("bg", (F.length(F.bin(F.col("c"))) - 1).cast("bigint").alias("ilog2"))
    )
    per_doc = (
        bgs.join(lm, "bg", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count(F.col("ilog2")).alias("known_bigrams"),
            F.coalesce(F.sum("ilog2"), F.lit(0)).cast("bigint").alias("ilog2_sum"),
        )
    )
    out = df.select(F.col(id_col)).join(
        per_doc.withColumnRenamed("id", id_col), id_col, "left"
    )
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce(F.col("known_bigrams"), F.lit(0)).cast("bigint").alias("known_bigrams"),
        F.coalesce(F.col("ilog2_sum"), F.lit(0)).cast("bigint").alias("ilog2_sum"),
        F.when(
            F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
            F.round(
                F.col("ilog2_sum").cast("double") / F.col("n_bigrams").cast("double"), 4
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
