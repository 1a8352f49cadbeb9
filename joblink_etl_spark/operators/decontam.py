"""Test-set decontamination: flag corpus documents sharing word
n-grams with a benchmark/eval corpus.

The standard contamination check in large-scale training-data
pipelines: any document whose text contains an n-gram that also
appears in an evaluation set is flagged (and typically dropped or
scrubbed) before training. Generalizes the reference's
duplicate-guard idea (reference docs/setup.md:104-112 — key-overlap
between a live table and a guard set) from whole-key equality to
n-gram containment.

Scale design (100 TB):
- The benchmark side (eval sets) is tiny relative to the corpus —
  its distinct gram-hash set is broadcast, so the corpus side never
  shuffles: scan → explode grams → LEFT broadcast-hash-join →
  partial count agg. One shuffle, keyed by doc id, carrying one
  combined row per doc (map-side combine collapses the gram rows).
- Grams travel as 60-bit md5 ints (fixed width), not strings.
- The per-doc gram explode is scan-side codegen (no Python); the
  token array is bound as a lambda variable (with_tokens) so the
  higher-order-function lambda does O(tokens) work, not O(tokens²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _bound_ngrams, md5_int


def _doc_grams(
    df: DataFrame, id_col: str, text_col: str, n: int, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(id, *carry, grams array) with the token array BOUND as a
    lambda variable (dedup._bound_ngrams): project-collapse cannot
    inline the tokenizer into the n-gram lambda, so it runs once per
    row — same O(tokens) guarantee the old materialization pin gave,
    with nothing persisted and nothing run at construction time."""
    return df.select(
        F.col(id_col), *carry, _bound_ngrams(F.col(text_col), n).alias("grams")
    )


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document contamination stats against a benchmark corpus.

    Returns (id_col, *carry, n_grams, n_overlap, contaminated): the
    number of distinct word n-grams in the doc, how many of them also
    occur anywhere in the benchmark, and whether that count is > 0.

    Single-pass shape: explode_outer(grams) → LEFT broadcast-join the
    benchmark hash set → one groupBy(doc). The corpus is read ONCE
    (no per-doc-count branch rejoined later), and `carry` columns
    ride through the codegen pipeline as extra group keys — they are
    duplicated only in the streamed explode rows, never shuffled wide
    (partial aggregation collapses to one row per doc before the
    exchange). That makes the operator safely composable as the last
    stage of a fused pipeline (see curate.py) with zero extra plan
    consumers."""
    doc_grams = _doc_grams(docs, id_col, text_col, n, carry=carry)
    bench_hashes = (
        _doc_grams(benchmark, id_col, text_col, n)
        .select(F.explode("grams").alias("gram"))
        .select(md5_int(F.col("gram")).alias("gram_h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    exploded = doc_grams.select(
        id_col,
        *carry,
        F.size("grams").alias("n_grams"),
        F.explode_outer("grams").alias("gram"),
    ).select(id_col, *carry, "n_grams", md5_int(F.col("gram")).alias("gram_h"))
    return (
        exploded.join(F.broadcast(bench_hashes), "gram_h", "left")
        .groupBy(id_col, *carry, "n_grams")
        .agg(F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_overlap"))
        .select(
            id_col,
            *carry,
            "n_grams",
            "n_overlap",
            (F.col("n_overlap") > 0).alias("contaminated"),
        )
    )
