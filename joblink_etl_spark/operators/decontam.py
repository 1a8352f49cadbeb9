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

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _bound_ngrams, md5_int

# Bloom geometry: m bits (m/64 bigint words) and k hash seeds. At the
# defaults the bitmap is 8 KiB — FIXED size however large the
# benchmark set is, which is the whole point (see bloom_decontam).
BLOOM_BITS = 1 << 16
BLOOM_SEEDS = 3


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


def _bloom_pos(gram: Column, seed: int, m: int) -> Column:
    """Bit position of `gram` under hash seed `seed`: the portable
    60-bit md5 int of 'bloom<seed>:<gram>' mod m. Non-negative on
    both engines, so % agrees with DuckDB."""
    return md5_int(F.concat(F.lit(f"bloom{seed}:"), gram)) % m


def build_bloom(
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m: int = BLOOM_BITS,
    k: int = BLOOM_SEEDS,
) -> DataFrame:
    """ONE-ROW DataFrame holding the benchmark's n-gram Bloom bitmap
    as `map<int, bigint>` (word index → 64-bit word; absent words are
    all-zero). Built fully distributed: explode grams → k positions
    each → groupBy(word) with a map-side-combinable bit_or → collapse
    to one row. The collect_list is bounded by m/64 entries (1024 at
    the default), not by benchmark size."""
    grams = _doc_grams(benchmark, id_col, text_col, n).select(
        F.explode("grams").alias("gram")
    )
    return _bloom_from_grams(grams, m, k)


def _bloom_from_grams(grams: DataFrame, m: int, k: int) -> DataFrame:
    """Bitmap build over an already-derived `gram` column (shared by
    build_bloom and bloom_decontam's fused single-benchmark-pass
    plan)."""
    pos = grams.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("gram"), i, m) for i in range(k)])
        ).alias("pos")
    )
    words = (
        pos.select(
            F.floor(F.col("pos") / 64).cast("int").alias("widx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words.groupBy().agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("widx", "word")))
        ).alias("bloom")
    )


def bloom_decontam(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m: int = BLOOM_BITS,
    k: int = BLOOM_SEEDS,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Decontamination with a Bloom prefilter: per-document
    (n_grams, n_candidates, n_overlap, contaminated), where
    n_candidates counts grams the bitmap admits and n_overlap the
    exactly-verified subset (Bloom has no false negatives, so
    n_overlap equals ngram_overlap's count bit-for-bit).

    Why this exists next to ngram_overlap: the broadcast there is the
    benchmark's FULL distinct gram-hash set — linear in benchmark
    size, which stops working when the eval suite is itself large
    (multi-benchmark contamination sweeps). Here the broadcast is the
    FIXED-size bitmap (8 KiB at defaults, vs ~8 bytes/gram), the
    membership test is pure scan-side bitwise math, and only the
    bloom-admitted grams reach the exact verify — expected FP rate
    (1 - e^(-kn/m))^k of the clean grams.

    Shuffle shape (the r05 bench regression was getting this wrong:
    an un-broadcast verify join moved EVERY exploded gram row through
    the exchange, O(total grams) shuffle volume):

    - ``broadcast_bench=True`` (default): the verify join is a
      broadcast-hash join, so exploded rows never shuffle; the only
      exchange is the final groupBy(doc), map-side combined to ONE
      row per doc. Right whenever the benchmark's distinct gram-hash
      set fits an executor (the common case even for multi-benchmark
      sweeps — hashes are 8 bytes/gram).
    - ``broadcast_bench=False`` (scale path, benchmark too big to
      broadcast): aggregate per doc FIRST — one map-side-combined
      shuffle carrying (n_grams, n_candidates, admitted-hash array)
      per doc — then explode only the admitted hashes into the
      shuffled verify join. Exchange volume is O(admitted grams)
      ~= O(contaminated + FP*clean), never O(total grams)."""
    # ONE benchmark pass feeds both derivations: the distinct gram set
    # is pinned lazily (benchmark-sized — small by assumption) and the
    # bitmap + exact hash set read the cache instead of re-tokenizing.
    # Cache lifetime is the CALLER's responsibility (unpersist or
    # catalog.clearCache after the consuming action, as bench.py does)
    bg = (
        _doc_grams(benchmark, id_col, text_col, n)
        .select(F.explode("grams").alias("gram"))
        .distinct()
        .persist()
    )
    bloom = _bloom_from_grams(bg, m, k)
    bench_hashes = bg.select(md5_int(F.col("gram")).alias("_jk")).withColumn(
        "_hit", F.lit(1)
    )
    exploded = (
        _doc_grams(docs, id_col, text_col, n)
        .select(
            id_col,
            F.size("grams").alias("n_grams"),
            F.explode_outer("grams").alias("gram"),
        )
        .crossJoin(F.broadcast(bloom))
        .withColumns({f"_p{i}": _bloom_pos(F.col("gram"), i, m) for i in range(k)})
    )
    bits_set = [
        F.coalesce(
            F.element_at(F.col("bloom"), F.floor(F.col(f"_p{i}") / 64).cast("int")),
            F.lit(0).cast("bigint"),
        ).bitwiseAND(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 64 AS INT))")
        )
        != 0
        for i in range(k)
    ]
    flagged = exploded.withColumn("_maybe", reduce(lambda a, b: a & b, bits_set)).withColumn(
        "_jk", F.when(F.col("_maybe"), md5_int(F.col("gram")))
    )
    if broadcast_bench:
        # verify join is map-side (broadcast hash): non-candidates'
        # NULL keys never probe, nothing shuffles until the one-row-
        # per-doc combined agg
        return (
            flagged.join(F.broadcast(bench_hashes), "_jk", "left")
            .groupBy(id_col, "n_grams")
            .agg(
                F.sum(F.when(F.col("_maybe"), 1).otherwise(0)).cast("bigint").alias("n_candidates"),
                F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_overlap"),
            )
            .select(
                id_col,
                "n_grams",
                "n_candidates",
                "n_overlap",
                (F.col("n_overlap") > 0).alias("contaminated"),
            )
        )
    # Scale path: doc-level pre-agg (collect_list drops the NULL _jk
    # of non-admitted grams, so the arrays — and everything downstream
    # — are FP-rate-sized), then verify only the admitted hashes.
    doc_level = flagged.groupBy(id_col).agg(
        F.first("n_grams").alias("n_grams"),
        F.sum(F.when(F.col("_maybe"), 1).otherwise(0)).cast("bigint").alias("n_candidates"),
        F.collect_list("_jk").alias("_cand"),
    )
    overlap = (
        doc_level.select(id_col, F.explode("_cand").alias("_jk"))
        .join(bench_hashes.select("_jk"), "_jk", "inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    return doc_level.join(overlap, id_col, "left").select(
        id_col,
        "n_grams",
        "n_candidates",
        F.coalesce("n_overlap", F.lit(0).cast("bigint")).alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0).cast("bigint")) > 0).alias("contaminated"),
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


def semantic_decontam(
    corpus: DataFrame,
    bench: DataFrame,
    min_cosine: float = 0.99,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space test-set decontamination: flag every corpus
    vector whose cosine similarity to SOME benchmark/eval vector
    reaches `min_cosine` — the semantic sibling of ngram_overlap /
    bloom_decontam, catching paraphrased or re-tokenized eval leakage
    that exact n-gram matching misses.

    Scale design (100 TB):
    - Candidates come from sign-LSH band buckets (the shared
      lsh_banded front end): both sides get LSH_PLANES sign bits in
      one narrow scan-side pass — per-corpus-row cost is FIXED
      (16 dot products), independent of corpus and benchmark size.
      The first cut of this operator blocked by IVF cell instead;
      with stride-sampled centroids K ∝ N, that assignment crossJoin
      is O(N·K) — the 10x scale probe measured 14x wall-clock at 10x
      data. The LSH front end probes linear (see PERF.md round 7).
    - Contaminated pairs are near-identical, so their sign bits agree
      everywhere and they collide in EVERY band — recall on true
      leakage ~ 1 (exact clones: exactly 1).
    - The benchmark side is eval sets — tiny next to the corpus; its
      band rows broadcast, so the corpus side never shuffles until
      the per-id argmax of the (rare) verified hits.
    - Scores are IEEE doubles over identical element order on both
      engines (the documented bit-stable cosine form).

    Returns the flagged set: (id, best_bench_id, best_score), one
    row per contaminated corpus vector.
    """
    from .similarity import as_double, cosine, lsh_banded

    c_banded = lsh_banded(corpus, dims, id_col, vec_col).select(
        F.col("id").alias("corpus_id"), "band", "bucket"
    )
    b_banded = lsh_banded(bench, dims, id_col, vec_col).select(
        F.col("id").alias("bench_id"), "band", "bucket"
    )
    cand = (
        c_banded.join(F.broadcast(b_banded), ["band", "bucket"])
        .select("corpus_id", "bench_id")
        .distinct()
    )
    cv = corpus.select(
        F.col(id_col).alias("corpus_id"), as_double(F.col(vec_col)).alias("v")
    )
    bv = bench.select(
        F.col(id_col).alias("bench_id"), as_double(F.col(vec_col)).alias("bv")
    )
    scored = (
        cand.join(cv, "corpus_id")
        .join(F.broadcast(bv), "bench_id")
        .withColumn("score", cosine(F.col("v"), F.col("bv")))
        .filter(F.col("score") >= min_cosine)
    )
    w = Window.partitionBy("corpus_id").orderBy(
        F.col("score").desc(), F.col("bench_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("corpus_id").alias(id_col),
            F.col("bench_id").alias("best_bench_id"),
            F.col("score").alias("best_score"),
        )
    )
