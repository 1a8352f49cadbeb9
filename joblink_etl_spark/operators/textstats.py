"""Text analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language-ID heuristic, document
fingerprinting (generalization of the reference's text functions
F10-F14 to the LLM-pipeline north star).

All pure Column expressions — at 100 TB these run as a single
narrow projection over the document scan, no shuffle, fully inside
whole-stage codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ASCII punctuation class — written explicitly so the Java and RE2
# engines agree character-for-character.
PUNCT_CLASS = r"[!-/:-@\[-`{-~]"

# BPE-ish pre-tokenizer: word runs or single non-word-non-space chars.
BPE_TOKEN_RE = r"\w+|[^\w\s]"

# tiny per-language stopword sets for the n-gram/stopword language
# heuristic; priority order breaks ties deterministically.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "zu"],
    "zh": ["的", "是", "在", "了", "我", "有", "和", "就"],
}
LANG_PRIORITY = ["en", "es", "fr", "de", "zh"]


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased, trimmed text; empty text
    → empty array (split would yield [''])."""
    t = F.trim(F.lower(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def with_tokens(text: Column, build) -> Column:
    """Evaluate tokens(text) ONCE per row and hand it to `build`
    (Column -> Column) as a higher-order-function lambda variable.

    Catalyst's project-collapse substitutes column references into
    downstream expressions — including into HOF lambdas, where the
    substituted tokenizer then re-evaluates PER ELEMENT (no CSE in
    the interpreted path), turning O(tokens) passes into O(tokens²).
    A lambda binding is substitution-proof: `transform` over a
    single-element array evaluates the tokenizer once and every
    reference inside `build` sees the bound value. Unlike the
    persist/localCheckpoint pins this replaces, it materializes
    nothing, runs nothing at plan-construction time, and stays
    inside whole-stage codegen."""
    return F.get(F.transform(F.array(tokens(text)), build), 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Approximate subword token count via the BPE-ish regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    n_punct = F.length(F.regexp_replace(text, "[^" + PUNCT_CLASS[1:], ""))
    return F.when(n > 0, n_punct.cast("double") / n).otherwise(F.lit(0.0))


def stopword_hits(text: Column, lang: str) -> Column:
    sw = LANG_STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(sw)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_hits(text, lang).cast("double") / n).otherwise(F.lit(0.0))


def avg_token_len(text: Column) -> Column:
    tl = F.aggregate(
        F.transform(tokens(text), F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n = token_count(text)
    return F.when(n > 0, tl.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic document-quality heuristic in [0,1]:
    0.4·min(n_tokens/100, 1) + 0.3·(1 − punct_ratio) +
    0.3·min(4·stopword_ratio, 1). Length rewards substance, low
    punctuation penalizes markup/boilerplate, stopword presence
    rewards natural language (cf. quality filters in C4/Gopher-style
    pipelines)."""
    n = token_count(text)
    length_term = F.least(n.cast("double") / 100.0, F.lit(1.0))
    punct_term = 1.0 - punct_ratio(text)
    sw_term = F.least(stopword_ratio(text, "en") * 4.0, F.lit(1.0))
    return F.round(
        F.least(0.4 * length_term + 0.3 * punct_term + 0.3 * sw_term, F.lit(1.0)), 4
    )


def lang_guess(text: Column) -> Column:
    """Stopword-profile language ID; ties break in LANG_PRIORITY
    order via the first-match when() chain; all-zero → 'und'."""
    hits = {lang: stopword_hits(text, lang) for lang in LANG_PRIORITY}
    expr = F.lit("und")
    chain = None
    conds = []
    for lang in LANG_PRIORITY:
        cond = hits[lang] > 0
        for other in LANG_PRIORITY:
            if other != lang:
                # >= keeps first-in-priority on ties
                cond = cond & (hits[lang] >= hits[other])
        conds.append((cond, lang))
    chain = F.when(conds[0][0], F.lit(conds[0][1]))
    for cond, lang in conds[1:]:
        chain = chain.when(cond, F.lit(lang))
    return chain.otherwise(expr)


def normalize_text(text: Column) -> Column:
    """lower + collapse whitespace + trim — the dedup normal form."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint = md5 of the normal form (stable across
    engines and runs — used as the exact-dedup key)."""
    return F.md5(normalize_text(text))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_bpe_tokens": bpe_token_count(t),
            "avg_token_len": F.round(avg_token_len(t), 4),
            "punct_ratio": F.round(punct_ratio(t), 4),
            "stopword_ratio": F.round(stopword_ratio(t), 4),
            "quality": quality_score(t),
            "lang_guess": lang_guess(t),
            "fingerprint": fingerprint(t),
        }
    )


def repetition_stats(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Within-document repetition: fraction of word n-gram OCCURRENCES
    that are repeats of an earlier n-gram in the same doc (the
    duplicate-n-gram quality signal used by corpus-filtering
    pipelines — high ratio = boilerplate/spam).

    Pure narrow column work: tokens are materialized into a column
    FIRST (expressions inside higher-order-function lambdas re-run
    per element), then n-grams via indexed access, no shuffle.
    Adds n_ngrams, n_distinct_ngrams, repetition_ratio.
    """
    toks_df = df.withColumn("_toks", tokens(F.col(text_col)))
    # guard: sequence(0, -1) would be a DESCENDING two-element array,
    # so short docs must short-circuit to an empty index list
    idx = F.when(
        F.size("_toks") >= n, F.sequence(F.lit(0), F.size("_toks") - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at("_toks", (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    out = (
        toks_df.withColumn("_grams", grams)
        .withColumn("n_ngrams", F.size("_grams"))
        .withColumn("n_distinct_ngrams", F.size(F.array_distinct("_grams")))
        .withColumn(
            "repetition_ratio",
            F.when(
                F.col("n_ngrams") > 0,
                F.round(
                    1.0 - F.col("n_distinct_ngrams") / F.col("n_ngrams").cast("double"), 4
                ),
            ).otherwise(F.lit(0.0)),
        )
    )
    return out.drop("_toks", "_grams")


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-training/embedding prep step. Chunk i covers tokens
    [i·stride, i·stride + chunk_tokens); the last window is kept even
    if short, and stride < chunk_tokens gives overlap.

    Pure narrow scan-side work: the whole chunk list is ONE bound
    expression (with_tokens — the tokenizer evaluates once per doc,
    never per chunk), and the explode multiplies rows without any
    shuffle. At 100 TB this parallelizes per input split with zero
    coordination; chunk provenance (doc_id, chunk_index) keeps the
    mapping invertible.

    Output: id_col, chunk_index, chunk_text, n_chunk_tokens.
    """

    def build(t: Column) -> Column:
        n = F.size(t)
        # number of windows: 1 + ceil(max(n - chunk_tokens, 0) / stride)
        n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
            F.lit(1)
            + F.ceil(
                F.greatest(n - F.lit(chunk_tokens), F.lit(0)).cast("double")
                / F.lit(stride)
            ).cast("int")
        )
        idx = F.when(n_chunks <= 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(0), n_chunks - 1)
        )
        return F.transform(
            idx,
            lambda i: F.struct(
                i.alias("chunk_index"),
                F.array_join(
                    F.slice(t, i * stride + 1, chunk_tokens), " "
                ).alias("chunk_text"),
                F.size(F.slice(t, i * stride + 1, chunk_tokens)).alias(
                    "n_chunk_tokens"
                ),
            ),
        )

    return df.select(
        F.col(id_col), F.explode(with_tokens(F.col(text_col), build)).alias("_c")
    ).select(
        id_col,
        F.col("_c.chunk_index").alias("chunk_index"),
        F.col("_c.chunk_text").alias("chunk_text"),
        F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


# The Gopher/MassiveText document-quality rule set (Rae et al. 2021,
# "Scaling Language Models", table A1) — the published heuristics
# most large-scale web-corpus pipelines apply before dedup. Written
# in INTEGER arithmetic only (ratio bounds become cross-multiplied
# comparisons) so the flags are engine-exact — no float ratio ever
# reaches a compared output.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3  # chars
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_STOPWORD_TYPES = 2


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = GOPHER_MIN_WORDS,
    min_stopword_types: int = GOPHER_MIN_STOPWORD_TYPES,
) -> DataFrame:
    """Per-document Gopher quality flags + the overall gate.

    Rules (integer-exact forms):
    - word count in [50, 100000]
    - mean word length in [3, 10]   (3*n <= chars <= 10*n)
    - symbol-to-word ratio < 0.1    (10*(n_hash + n_ellipsis) < n)
    - >= 80% words alphabetic       (5*n_alpha >= 4*n)
    - >= 2 distinct required stopwords present
    - < 90% of lines bullet-started (10*bullets < 9*lines)
    - < 30% of lines ellipsis-ended (10*ellipsis_lines < 3*lines)

    One narrow projection over the scan — no shuffle, no Python; the
    token array is bound once per row (with_tokens) so every
    token-derived count is O(tokens). The word-count floor and
    stopword-type floor are parameters (published defaults) — real
    pipelines tune gates per corpus/language, and a corpus whose
    vocabulary lacks English function words (or is not English at
    all) needs a lower stopword bar."""
    text = F.col(text_col)

    def build(t: Column) -> Column:
        return F.struct(
            F.size(t).cast("bigint").alias("n_words"),
            F.aggregate(
                t, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
            ).alias("word_chars"),
            F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast("bigint").alias(
                "n_alpha_words"
            ),
            reduce(
                lambda a, b: a + b,
                [
                    F.when(F.array_contains(t, w), 1).otherwise(0)
                    for w in GOPHER_REQUIRED_STOPWORDS
                ],
            )
            .cast("bigint")
            .alias("n_stopword_types"),
        )

    lines = F.split(text, "\n")
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    out = df.select(
        F.col(id_col),
        with_tokens(text, build).alias("_g"),
        (n_hash + n_ellipsis).cast("bigint").alias("n_symbols"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
        .cast("bigint")
        .alias("n_bullet_lines"),
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))
        .cast("bigint")
        .alias("n_ellipsis_lines"),
    ).select(
        id_col,
        F.col("_g.n_words").alias("n_words"),
        F.col("_g.word_chars").alias("word_chars"),
        F.col("_g.n_alpha_words").alias("n_alpha_words"),
        F.col("_g.n_stopword_types").alias("n_stopword_types"),
        "n_symbols",
        "n_lines",
        "n_bullet_lines",
        "n_ellipsis_lines",
    )
    n = F.col("n_words")
    flags = out.select(
        "*",
        ((n >= min_words) & (n <= GOPHER_MAX_WORDS)).alias("ok_word_count"),
        (
            (F.col("word_chars") >= GOPHER_MIN_MEAN_WORD_LEN * n)
            & (F.col("word_chars") <= GOPHER_MAX_MEAN_WORD_LEN * n)
        ).alias("ok_mean_word_len"),
        (10 * F.col("n_symbols") < n).alias("ok_symbol_ratio"),
        (5 * F.col("n_alpha_words") >= 4 * n).alias("ok_alpha_ratio"),
        (F.col("n_stopword_types") >= min_stopword_types).alias("ok_stopwords"),
        (10 * F.col("n_bullet_lines") < 9 * F.col("n_lines")).alias("ok_bullets"),
        (10 * F.col("n_ellipsis_lines") < 3 * F.col("n_lines")).alias("ok_ellipsis"),
    )
    return flags.withColumn(
        "pass_gopher",
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_alpha_ratio")
        & F.col("ok_stopwords")
        & F.col("ok_bullets")
        & F.col("ok_ellipsis"),
    )


# UTF-8-decoded-as-Latin-1/cp1252 artifact SEQUENCES (the ftfy
# class). Full lead+continuation sequences, not bare lead letters:
# U+00C3/U+00C2/U+00E2 alone are legitimate accented-Latin letters
# (French/Portuguese/Vietnamese), so counting them as mojibake
# false-positives correct text. A UTF-8 continuation byte 0x80-0xBF
# after a wrong decode shows up as U+0080-U+00BF (Latin-1) or as
# cp1252's printable remappings of bytes 0x80-0x9F — that class
# immediately after a lead is the actual corruption signature.
_MOJI_CONT = (
    "\u0080-\u00bf"  # Latin-1 view of continuation bytes
    # cp1252 view of bytes 0x80-0x9F (printable remappings)
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160"
    "\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014"
    "\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"
)
# 2-byte UTF-8 leads C2/C3 + one continuation char; 3-byte lead E2 +
# two; BOM ghost EF BB BF as a literal. Counted by engine-exact
# character-removal arithmetic (regexp_replace / replace are
# non-overlapping left-to-right in both Spark's Java regex and
# DuckDB's RE2, and every match of one pattern has a fixed
# character width).
MOJI_TWO_RE = "[\u00c2\u00c3][" + _MOJI_CONT + "]"
MOJI_THREE_RE = "\u00e2[" + _MOJI_CONT + "][" + _MOJI_CONT + "]"
BOM_GHOST = "\u00ef\u00bb\u00bf"
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


def _occurrences(text: Column, marker: str) -> Column:
    removed = F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))
    return (removed / F.lit(len(marker))).cast("bigint")


def _re_occurrences(text: Column, pattern: str, width: int) -> Column:
    """Count non-overlapping regex matches where EVERY match of the
    pattern is exactly `width` characters, via removal arithmetic
    (the quotient is always an exact integer)."""
    removed = F.length(text) - F.length(F.regexp_replace(text, pattern, ""))
    return (removed / F.lit(width)).cast("bigint")


def encoding_artifacts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document encoding-corruption report: mojibake sequence count
    (UTF-8 read as Latin-1/cp1252 — '\u00c3\u00a9' for '\u00e9', '\u00e2\u20ac\u2122' for a
    curly quote; full lead+continuation SEQUENCES, so bare accented
    letters in correct French/Portuguese/Vietnamese text do NOT
    count), U+FFFD replacement characters (lossy transcode),
    and C0 control characters (binary contamination). `clean` gates
    on all three — the standard pre-tokenizer hygiene filter in
    web-corpus curation.

    One narrow projection over the scan: no shuffle, no Python, all
    counts via character-exact length/replace arithmetic."""
    text = F.col(text_col)
    n_moji = (
        _re_occurrences(text, MOJI_TWO_RE, 2)
        + _re_occurrences(text, MOJI_THREE_RE, 3)
        + _occurrences(text, BOM_GHOST)
    )
    n_repl = _occurrences(text, "\ufffd")
    n_ctrl = (
        F.length(text) - F.length(F.regexp_replace(text, _CTRL_RE, ""))
    ).cast("bigint")
    return df.select(
        F.col(id_col),
        n_moji.alias("n_mojibake"),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        ((n_moji == 0) & (n_repl == 0) & (n_ctrl == 0)).alias("clean"),
    )


def distribution_drift(
    df: DataFrame,
    snap_col: str = "snap",
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Corpus drift monitor: compare the unigram distributions of two
    corpus snapshots (snap_col values 'base' and 'cur' — e.g. last
    week's crawl vs this week's) per group, with log-free metrics so
    every number is engine-exact:

    - tv_micro: total-variation distance in micro-units. Each
      token's frequency is quantized to p_micro = (1e6·count) div
      total (exact bigint, bounded by 1e6 regardless of corpus
      size — no overflow at any scale), and TV = Σ|p−q| // 2.
      Quantization error is ≤ vocab·1e-6 — report-grade, and the
      price of bit-reproducibility (a float Σ|p−q| would wobble with
      summation order; KL/JS need libm logs).
    - new_mass_micro: probability mass of 'cur' on tokens never seen
      in 'base' (the neologism/spam-influx signal).
    - vocab_base/vocab_cur/vocab_common + jaccard: vocabulary
      overlap (one exact division, round 6).

    Scale: tokens travel as md5-60bit ints; two shuffles — the
    (group, token) count (map-side combinable) and the |groups|-row
    final aggregate. Nothing is ever per-doc after the explode, and
    no driver action.
    """
    from .dedup import md5_int

    toks = df.select(
        F.col(group_col).alias("grp"),
        F.col(snap_col).alias("snap"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("grp", "snap", md5_int(F.col("tok")).alias("t"))
    cts = toks.groupBy("grp", "t").agg(
        F.sum(F.when(F.col("snap") == "base", 1).otherwise(0))
        .cast("bigint")
        .alias("a_ct"),
        F.sum(F.when(F.col("snap") == "cur", 1).otherwise(0))
        .cast("bigint")
        .alias("b_ct"),
    )
    tot = cts.groupBy("grp").agg(
        F.sum("a_ct").cast("bigint").alias("na"),
        F.sum("b_ct").cast("bigint").alias("nb"),
    )
    # totals are |groups| rows — broadcast explicitly so the
    # vocab-sized counts side keeps its (grp, t) partitioning instead
    # of reshuffling by grp (a skew magnet: one partition per lang)
    micro = (
        cts.join(F.broadcast(tot), "grp")
        .withColumn("pa", F.expr("case when na > 0 then (1000000 * a_ct) div na else 0 end"))
        .withColumn("pb", F.expr("case when nb > 0 then (1000000 * b_ct) div nb else 0 end"))
    )
    out = micro.groupBy("grp").agg(
        F.max("na").alias("n_tokens_base"),
        F.max("nb").alias("n_tokens_cur"),
        F.sum(F.when(F.col("a_ct") > 0, 1).otherwise(0)).cast("bigint").alias("vocab_base"),
        F.sum(F.when(F.col("b_ct") > 0, 1).otherwise(0)).cast("bigint").alias("vocab_cur"),
        F.sum(F.when((F.col("a_ct") > 0) & (F.col("b_ct") > 0), 1).otherwise(0))
        .cast("bigint")
        .alias("vocab_common"),
        F.expr("sum(abs(pa - pb)) div 2").cast("bigint").alias("tv_micro"),
        F.sum(F.when(F.col("a_ct") == 0, F.col("pb")).otherwise(0))
        .cast("bigint")
        .alias("new_mass_micro"),
    )
    return out.select(
        F.col("grp").alias(group_col),
        "n_tokens_base",
        "n_tokens_cur",
        "vocab_base",
        "vocab_cur",
        "vocab_common",
        F.round(
            F.col("vocab_common").cast("double")
            / (F.col("vocab_base") + F.col("vocab_cur") - F.col("vocab_common")).cast(
                "double"
            ),
            6,
        ).alias("jaccard"),
        "tv_micro",
        "new_mass_micro",
    )


def vocab_growth(
    df: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve: distinct-token count
    after each successive tenth of the corpus in id order — the
    corpus-side diagnostic for tokenizer/vocab sizing (how fast does
    the open vocabulary still grow at the corpus tail? a flat tail
    says a bigger vocab buys nothing; a steep one predicts OOV/
    fertility pain).

    Mechanics (all exact integers): each distinct token's FIRST
    document (min doc id over an md5-60bit token key — map-side
    combinable), each doc's position from operators/rank.py::
    global_rank (distributed range sort, no single-partition
    window), bucket = ((rank−1)·n_buckets) div n_docs + 1; then two
    |buckets|-row cumulative sums give (n_docs, vocab_size,
    new_tokens) per bucket.

    Scale: one token-count shuffle (the LM/dedup family's shape) +
    one doc-rank range sort; everything after is bucket-cardinality.
    Carries global_rank's bounded plan-build action + persist
    contract."""
    from pyspark.sql.window import Window

    from .dedup import md5_int
    from .rank import global_rank

    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    ).select("_doc", md5_int(F.col("_tok")).alias("_t"))
    first = toks.groupBy("_t").agg(F.min("_doc").alias("_first_doc"))
    docs = df.select(F.col(id_col).alias("_doc")).distinct()
    ranked = global_rank(docs, ["_doc"], out_col="_rnk")
    n_row = ranked.agg(F.max("_rnk").cast("bigint").alias("_n"))
    deciled = (
        ranked.crossJoin(F.broadcast(n_row))
        .withColumn(
            "bucket",
            (F.expr(f"((_rnk - 1) * {int(n_buckets)}) div _n") + 1).cast("bigint"),
        )
    )
    docs_per = deciled.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("_bdocs")
    )
    new_per = (
        first.join(
            deciled.select(F.col("_doc").alias("_d2"), "bucket"),
            F.col("_first_doc") == F.col("_d2"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_tokens"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        docs_per.join(new_per, "bucket", "left")
        .withColumn("new_tokens", F.coalesce(F.col("new_tokens"), F.lit(0)).cast("bigint"))
        .withColumn("n_docs", F.sum("_bdocs").over(w).cast("bigint"))
        .withColumn("vocab_size", F.sum("new_tokens").over(w).cast("bigint"))
        .select("bucket", "n_docs", "vocab_size", "new_tokens")
    )


def symbol_density_routing(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    math_bp: int = 800,
    code_bp: int = 500,
) -> DataFrame:
    """Route documents to prose/math/code sub-corpora by character-
    class density — the cheap first-stage router a mixed crawl runs
    before handing each bucket to its specialized pipeline (math
    docs keep equations and skip stopword gates; code docs skip
    punctuation-ratio gates and go to a lexer).

    Densities are integer basis points (10000·count div n_chars) so
    the thresholds and the oracle comparison stay float-free:
    - digit_bp / op_bp over [0-9] and [+*/=<>%-]: their sum ≥ math_bp
      reads as equation-heavy;
    - code_bp over [{}()\\[\\];]: ≥ code_bp reads as source-code-like
      (brace/semicolon density separates code from prose an order of
      magnitude more cleanly than keywords do).
    Precedence: code beats math beats prose (a doc dense in both is
    routed to the stricter lexer path).

    Scale: one narrow projection over the scan — regexp_replace
    length-diff counting is JVM codegen, no shuffle, no Python; the
    router composes scan-side with any downstream per-bucket filter
    so Catalyst prunes the other buckets' work entirely.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("bigint")

    def _count(cls: str) -> Column:
        return (F.length(t) - F.length(F.regexp_replace(t, cls, ""))).cast("bigint")

    # non-negative domain throughout: Spark `div` == DuckDB `//` (floor)
    out = df.withColumns(
        {
            "n_chars": n_chars,
            "_dig": _count("[0-9]"),
            "_op": _count("[+*/=<>%-]"),
            "_code": _count(r"[{}()\[\];]"),
        }
    ).withColumns(
        {
            "digit_bp": F.expr("CASE WHEN n_chars > 0 THEN (_dig * 10000) div n_chars ELSE 0 END").cast("bigint"),
            "op_bp": F.expr("CASE WHEN n_chars > 0 THEN (_op * 10000) div n_chars ELSE 0 END").cast("bigint"),
            "code_bp": F.expr("CASE WHEN n_chars > 0 THEN (_code * 10000) div n_chars ELSE 0 END").cast("bigint"),
        }
    )
    return out.withColumn(
        "route",
        F.when(F.col("code_bp") >= code_bp, F.lit("code"))
        .when(F.col("digit_bp") + F.col("op_bp") >= math_bp, F.lit("math"))
        .otherwise(F.lit("prose")),
    ).select(id_col, "n_chars", "digit_bp", "op_bp", "code_bp", "route")


def distinct_ngram_diversity(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    ns: tuple = (1, 2),
) -> DataFrame:
    """Distinct-n diversity per group — the corpus-level counterpart
    of the within-doc repetition ratio, and the standard check that a
    source (or a synthetic-generation run) isn't mode-collapsed:
    distinct_bp = 10000·|distinct n-grams| div |total n-grams|. Low
    distinct-2 with normal distinct-1 is the template-generation
    signature (same words, same order).

    Output: one row per (group, n) with total/distinct gram counts
    and the integer-basis-point ratio.

    Scale: tokens explode once per n; the count+count_distinct agg is
    one shuffle per n on (group, gram) with map-side partial dedup,
    unioned over the (tiny) ns list. Output cardinality |groups|·|ns|.
    Grams are counted WITH multiplicity in the denominator — this is
    deliberately not the deduped shingle set the near-dup family
    uses."""
    def _grams(t, n):
        # non-distinct n-grams: every position, multiplicity kept;
        # the token array arrives as a bound lambda variable so the
        # tokenizer runs once per row, not once per element
        return F.transform(
            F.slice(t, 1, F.greatest(F.size(t) - (n - 1), F.lit(0))),
            lambda x, i: F.concat_ws(" ", x, *[F.get(t, i + j) for j in range(1, n)]),
        )

    def _build(nn):
        # single-parameter lambda: Spark HOFs infer lambda arity from
        # the signature, so the loop variable must bind via closure,
        # not a defaulted second parameter
        return lambda t: _grams(t, nn)

    out = None
    for n in ns:
        if n == 1:
            grams = tokens(F.col(text_col))
        else:
            grams = with_tokens(F.col(text_col), _build(n))
        part = (
            docs.select(F.col(group_col).alias("grp"), F.explode(grams).alias("g"))
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("total_grams"),
                F.count_distinct("g").cast("bigint").alias("distinct_grams"),
            )
            .select(
                "grp",
                F.lit(n).cast("bigint").alias("n"),
                "total_grams",
                "distinct_grams",
                F.expr("(10000 * distinct_grams) div total_grams").alias("distinct_bp"),
            )
        )
        out = part if out is None else out.unionAll(part)
    return out


# GPT-2-style pre-tokenization, restricted to the RE2 ∩ Java-regex
# common subset (no lookarounds): a token is an optionally
# space-prefixed letter run, digit run, or punctuation run, else a
# whitespace run. Alternation order is load-bearing and identical in
# both engines (leftmost, first-alternative).
BPE_ISH_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def regex_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token counting under a GPT-2-style pre-tokenization regex,
    side by side with the whitespace count — the budget planner's two
    denominators (whitespace words for quality gates, pre-tokens as
    the subword-count proxy). The space-prefixed run classes are what
    distinguish this from the coarser BPE_TOKEN_RE used in
    add_text_stats: a leading space fuses into the following token
    exactly as GPT-2's pre-tokenizer does. Output per doc: n_chars,
    n_ws_tokens, n_regex_tokens, and regex-per-whitespace fertility
    in basis points (0 for empty docs).

    Scale: a pure narrow projection — both counts run scan-side in
    codegen, no shuffle, no Python."""
    t = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        F.length(t).cast("bigint").alias("n_chars"),
        token_count(t).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), 0))
        .cast("bigint")
        .alias("n_regex_tokens"),
    )
    return base.withColumn(
        "fertility_bp",
        F.when(
            F.col("n_ws_tokens") > 0,
            F.expr("(10000 * n_regex_tokens) div n_ws_tokens"),
        )
        .otherwise(F.lit(0))
        .cast("bigint"),
    )
