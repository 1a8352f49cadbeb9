"""Data selection scoring for training-corpus curation.

Two corpus-level signals that rank raw documents for inclusion:

- dsir_scores: importance ranking in the spirit of DSIR (Xie et al.
  2023, "Data Selection for Language Models via Importance
  Resampling"): represent documents by HASHED word features, model
  target and raw corpora by their feature counts, and score each raw
  document by a log-likelihood-ratio sum over its features. This
  engine quantizes the log to the exact integer floor(log2(count+1))
  (binary length — no libm anywhere), so the per-doc sum is exact
  bigint arithmetic and cross-engine reproducible; ranking fidelity
  is the coarse-log tradeoff, the selection mechanics are identical.

- novelty_scores: the fraction of a document's distinct n-grams that
  occur NOWHERE else in the corpus (document frequency 1) — high
  novelty = unique content, low = boilerplate. The complement of the
  repetition/dup-gram signals in textstats.

Scale design: both are two-shuffle pipelines — explode features,
aggregate per feature (map-side combined), then one join back and a
per-doc aggregate. The DSIR feature table is bounded by the hash
bucket count (2^12 rows), broadcast back to the scan; the novelty
doc-frequency table is gram-keyed and shuffles gram hashes (8 B),
never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _bound_ngrams, md5_int

N_FEATURE_BUCKETS = 1 << 12


def _feature_buckets(
    df: DataFrame, id_col: str, text_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(id, feature) pairs: distinct hashed-unigram buckets per doc.
    ``carry`` columns ride through the explode — carrying a label
    here is strictly better than re-joining it onto the exploded
    relation afterwards (the r12 x100 broadcast audit caught Catalyst
    BuildLeft-broadcasting the corpus-token-scale exploded side of
    that re-join: post-Generate size estimates are guesses)."""
    toks = df.select(
        F.col(id_col), *carry, _bound_ngrams(F.col(text_col), 1).alias("grams")
    )
    return toks.select(
        id_col, *carry, F.explode("grams").alias("gram")
    ).select(
        id_col, *carry, (md5_int(F.col("gram")) % N_FEATURE_BUCKETS).alias("feature")
    )


def _log2_floor(c):
    """Exact integer floor(log2(x)) for x >= 1: binary length - 1.
    Shared primitive with the bigram-LM scorer (operators/lmscore.py);
    DuckDB spells it length(format('{:b}', x)) - 1."""
    return (F.length(F.bin(c)) - 1).cast("bigint")


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score raw docs by target-likeness: per distinct feature f of
    the doc, add floor(log2(ct_target(f)+1)) - floor(log2(ct_raw(f)+1)).
    Returns (id, n_features, score) — higher = more target-like.
    """
    raw_f = _feature_buckets(raw, id_col, text_col)
    tgt_f = _feature_buckets(target, id_col, text_col)
    raw_ct = raw_f.groupBy("feature").agg(F.count(F.lit(1)).alias("ct_raw"))
    tgt_ct = tgt_f.groupBy("feature").agg(F.count(F.lit(1)).alias("ct_tgt"))
    # bucket table is <= 2^12 rows — broadcast it back over the scan
    lr = (
        raw_ct.join(tgt_ct, "feature", "full_outer")
        .select(
            "feature",
            (
                _log2_floor(F.coalesce("ct_tgt", F.lit(0)) + 1)
                - _log2_floor(F.coalesce("ct_raw", F.lit(0)) + 1)
            ).alias("llr"),
        )
    )
    doc_feats = raw_f.distinct()
    return (
        doc_feats.join(F.broadcast(lr), "feature", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_features"),
            F.sum(F.coalesce("llr", F.lit(0))).cast("bigint").alias("score"),
        )
    )


def novelty_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, n_grams, n_unique, novelty): distinct word n-grams per
    doc, how many have corpus-wide document frequency 1, and their
    ratio (one deterministic IEEE division per doc)."""
    grams = docs.select(
        F.col(id_col), _bound_ngrams(F.col(text_col), n).alias("grams")
    ).select(id_col, F.explode("grams").alias("gram"))
    # gram hashes travel, not strings; df via one map-side-combined agg
    pairs = grams.select(id_col, md5_int(F.col("gram")).alias("g")).distinct()
    df_ct = pairs.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        pairs.join(df_ct, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("bigint").alias("n_unique"),
        )
        .select(
            id_col,
            "n_grams",
            "n_unique",
            (F.col("n_unique").cast("double") / F.col("n_grams").cast("double")).alias(
                "novelty"
            ),
        )
    )


def nb_train_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multinomial Naive Bayes over hashed unigram features, trained
    AND applied in one plan — the language-ID / quality-classifier
    shape (fastText-without-embeddings), made engine-exact.

    Everything is counts: per-(label, feature) counts from the train
    split, add-one smoothing, and log-probabilities quantized to the
    exact integer floor(log2(count + 1)) (binary length — no libm).
    A doc's score under label L is Σ_f [log2q(ct(L, f) + 1) −
    log2q(total(L) + 1)] + log2q(prior(L) + 1); the argmax with a
    deterministic label tie-break is the prediction. Quantized logs
    trade calibration for bit-reproducibility — ranking fidelity at
    the argmax is what the operator contracts (pinned by the
    separable-vocabulary test).

    Scale: the model is ≤ |labels| × 2^12 count rows — broadcast back
    over the test scan; training is one map-side-combined shuffle.
    Returns (id, label, predicted, score, correct)."""
    tr_f = _feature_buckets(
        train.select(id_col, label_col, text_col), id_col, text_col, carry=(label_col,)
    )
    model = tr_f.groupBy(label_col, "feature").agg(F.count(F.lit(1)).alias("ct"))
    totals = model.groupBy(label_col).agg(F.sum("ct").alias("tot"))
    priors = train.groupBy(label_col).agg(F.count(F.lit(1)).alias("prior"))
    labels = (
        totals.join(priors, label_col)
        .select(
            F.col(label_col).alias("_lab"),
            _log2_floor(F.col("tot") + 1).alias("_ltot"),
            _log2_floor(F.col("prior") + 1).alias("_lprior"),
        )
    )
    lweights = model.select(
        F.col(label_col).alias("_lab"),
        "feature",
        _log2_floor(F.col("ct") + 1).alias("_lct"),
    )
    te_f = _feature_buckets(test.select(id_col, text_col), id_col, text_col).distinct()
    # every (doc, feature) × every label: the label set is tiny, the
    # weight table is broadcast; absent (label, feature) pairs score
    # log2q(0 + 1) = 0 via the left join's coalesce
    scored = (
        te_f.crossJoin(F.broadcast(labels))
        .join(F.broadcast(lweights), ["_lab", "feature"], "left")
        .groupBy(id_col, "_lab")
        .agg(
            (
                F.sum(F.coalesce("_lct", F.lit(0)) - F.col("_ltot"))
                + F.min("_lprior")
            ).alias("score")
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("_lab"))
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("_lab").alias("predicted"), "score")
    )
    return best.join(test.select(id_col, label_col), id_col).select(
        id_col,
        F.col(label_col).alias("label"),
        "predicted",
        "score",
        (F.col(label_col) == F.col("predicted")).alias("correct"),
    )


def preference_pairs(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str = "doc_id",
    min_margin: int = 1,
) -> DataFrame:
    """Best-vs-worst preference-pair mining: for each group (prompt /
    query / source), pair the highest-scoring candidate as `chosen`
    with the lowest-scoring as `rejected` — the standard construction
    for preference-tuning (RLHF/DPO) training rows from scored
    candidate pools. Pairs need a strict margin (>= min_margin, so
    ties never produce a training signal) and at least two distinct
    candidates.

    Deterministic on any engine/partitioning: both extremes tie-break
    on id (smallest id among top scores wins chosen; largest id among
    bottom scores wins rejected — so a group where all scores tie
    yields chosen_id != rejected_id and is then dropped by the margin
    gate, not by chance).

    Scale: two row_number windows over ONE shuffle key (group) —
    partial-agg friendly, no joins bigger than group count; at 100 TB
    groups are prompt ids (small fan-in per group), so no skew beyond
    AQE's reach."""
    from pyspark.sql import Window

    w_top = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w_bot = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).desc()
    )
    ranked = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("cand_id"),
        F.col(score_col).alias("score"),
        F.row_number().over(w_top).alias("_top"),
        F.row_number().over(w_bot).alias("_bot"),
    )
    chosen = ranked.filter(F.col("_top") == 1).select(
        "group",
        F.col("cand_id").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
    )
    rejected = ranked.filter(F.col("_bot") == 1).select(
        "group",
        F.col("cand_id").alias("rejected_id"),
        F.col("score").alias("rejected_score"),
    )
    return (
        chosen.join(rejected, "group")
        .withColumn("margin", F.col("chosen_score") - F.col("rejected_score"))
        .filter(
            (F.col("chosen_id") != F.col("rejected_id"))
            & (F.col("margin") >= min_margin)
        )
        .select(
            "group", "chosen_id", "rejected_id", "chosen_score", "rejected_score", "margin"
        )
    )


def doremi_weights(
    df: DataFrame,
    group_col: str = "lang",
    uniform_mix_milli: int = 100,
    eta_milli: int = 100,
    exp_cap: int = 20,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One multiplicative-weights step of DoReMi-style domain
    reweighting (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures
    Speeds Up Language Model Pretraining"): up-weight domains whose
    proxy-model loss exceeds the reference, then mix with uniform.

    The published update is w ∝ w₀·exp(η·excess_loss) under a
    trained proxy LM. This engine-exact instantiation keeps the
    mechanics and swaps the unverifiable parts: the "loss" is the
    corpus-bigram-LM unknown-rate in integer milli-units
    (floor(1000·Σ(n−known)/Σn) per domain — the same hardness signal
    a perplexity proxy gives, computed from operators/lmscore.py's
    exact-integer LM), and exp(η·x) is discretized to
    2^min(excess_milli // eta_milli, exp_cap) so the multiplier is a
    bigint shift, bit-identical across engines. The final mix
    w' = (1−u)·ŵ + u/k is the paper's uniform smoothing.

    Scale: one lmscore pass over the corpus (two shuffles,
    corpus-linear), then domain aggregates of |groups| rows and a
    one-row broadcast corpus total — the reweighting itself never
    touches doc-level data again.

    Output per domain: n_docs, loss_milli, excess_milli, exponent,
    weight (normalized multiplicative weight, round 8), mixed_weight
    (uniform-smoothed, round 8).
    """
    from .lmscore import ngram_lm_score

    scored = ngram_lm_score(df, min_count=min_count, text_col=text_col, id_col=id_col)
    dom = (
        scored.join(df.select(id_col, group_col), id_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("sum_bigrams"),
            F.sum(F.col("n_bigrams") - F.col("known_bigrams"))
            .cast("bigint")
            .alias("sum_unknown"),
        )
        .withColumn(
            "loss_milli",
            F.when(
                F.col("sum_bigrams") > 0,
                F.expr("(1000 * sum_unknown) div sum_bigrams"),
            ).otherwise(F.lit(0)).cast("bigint"),
        )
    )
    corpus = dom.agg(
        F.count(F.lit(1)).cast("bigint").alias("_k"),
        F.when(
            F.sum("sum_bigrams") > 0,
            F.expr("(1000 * sum(sum_unknown)) div sum(sum_bigrams)"),
        ).otherwise(F.lit(0)).cast("bigint").alias("_corpus_loss"),
    )
    stepped = (
        dom.crossJoin(F.broadcast(corpus))
        .withColumn(
            "excess_milli",
            F.greatest(F.lit(0).cast("bigint"), F.col("loss_milli") - F.col("_corpus_loss")),
        )
        .withColumn(
            "exponent",
            F.least(
                F.expr(f"excess_milli div {int(eta_milli)}"), F.lit(int(exp_cap)).cast("bigint")
            ).cast("int"),
        )
        .withColumn(
            "_unnorm",
            F.expr("n_docs * shiftleft(cast(1 as bigint), exponent)").cast("bigint"),
        )
    )
    total = stepped.agg(F.sum("_unnorm").cast("bigint").alias("_tot"))
    u = uniform_mix_milli / 1000.0
    return (
        stepped.crossJoin(F.broadcast(total))
        .withColumn(
            "weight",
            F.round(F.col("_unnorm").cast("double") / F.col("_tot").cast("double"), 8),
        )
        .withColumn(
            "mixed_weight",
            F.round(
                F.lit(1.0 - u) * F.col("weight")
                + F.lit(u) / F.col("_k").cast("double"),
                8,
            ),
        )
        .select(
            group_col, "n_docs", "loss_milli", "excess_milli", "exponent",
            "weight", "mixed_weight",
        )
    )


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group Spearman rank correlation between two doc-level
    signals — the curation diagnostic for "is my quality filter
    secretly a length filter?" (quality/perplexity scores are known
    to correlate with document length; a gate that reproduces the
    length distribution adds nothing over a length cut).

    Ranks are rank-of-record (ties broken deterministically by
    id_col), so ρ = 1 − 6·Σd²/(n·(n²−1)) is a pure function of
    integer ranks: Σd² is exact bigint, and the final expression is
    a fixed dag of correctly-rounded IEEE ops — engine-identical
    under round(…, 6).

    Scale: each rank pass is operators/rank.py::grouped_rank — a
    range exchange + per-(partition, group) local window — so no
    group ever sits on one task (a plain window partitionBy(group)
    would OOM on a billion-row language bucket). Groups with n ≤ 1
    return NULL rho."""
    from .rank import grouped_rank

    slim = df.select(id_col, group_col, x_col, y_col)
    rx = grouped_rank(slim, [group_col], [x_col, id_col], out_col="_rx")
    rxy = grouped_rank(rx, [group_col], [y_col, id_col], out_col="_ry")
    d2 = (F.col("_rx") - F.col("_ry")) * (F.col("_rx") - F.col("_ry"))
    n_d = F.col("n").cast("double")
    return (
        rxy.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(d2).cast("bigint").alias("sum_d2"),
        )
        .withColumn(
            "spearman",
            F.when(
                F.col("n") > 1,
                F.round(
                    F.lit(1.0)
                    - F.lit(6.0) * F.col("sum_d2").cast("double")
                    / (n_d * (n_d * n_d - F.lit(1.0))),
                    6,
                ),
            ),
        )
    )


def render_sft(
    pairs: DataFrame,
    system_prompt: str,
    prompt_col: str = "prompt",
    response_col: str = "response",
    id_col: str = "pair_id",
) -> DataFrame:
    """Render (prompt, response) rows into chat-template training
    strings with the loss-mask boundary precomputed — the SFT data
    prep step between pair mining (preference_pairs) and packing
    (pack_shards): tokens before `prompt_tokens` get label −100 so
    the model trains only on the assistant span.

    Template: <|system|>\\n{sys}\\n<|user|>\\n{prompt}\\n<|assistant|>\\n
    {response}<|end|>. Boundary metrics are computed ON the rendered
    prefix (char length + whitespace-token count), so they stay
    consistent with the rendered string however the template
    evolves; swap token_count for the BPE regex variant when the
    downstream tokenizer is subword.

    Scale: pure scan-side string projection — no shuffle, fully
    codegen."""
    from .textstats import token_count

    # token boundary counts on the newline-free core: the whitespace
    # tokenizer (shared trim-splits-only-spaces semantics, both
    # engines) would otherwise emit a terminal '' token for the
    # trailing template newline and the boundary would overcount by 1
    core = F.concat(
        F.lit("<|system|>\n" + system_prompt + "\n<|user|>\n"),
        F.col(prompt_col),
        F.lit("\n<|assistant|>"),
    )
    prefix = F.concat(core, F.lit("\n"))
    rendered = F.concat(prefix, F.col(response_col), F.lit("<|end|>"))
    return pairs.select(
        F.col(id_col),
        rendered.alias("rendered"),
        F.length(prefix).cast("bigint").alias("prompt_chars"),
        F.length(rendered).cast("bigint").alias("total_chars"),
        token_count(core).cast("bigint").alias("prompt_tokens"),
        token_count(rendered).cast("bigint").alias("total_tokens"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-group quantile normalization of a score column: each
    row's WITHIN-group rank is mapped to the matching position in
    the POOLED distribution and the pooled value there becomes the
    normalized score. Afterwards every group's score distribution is
    (a subsample of) the same pooled one — the standard fix when
    heterogeneous sources produce incomparable raw quality scores
    and a single global threshold would drain some sources dry.

    Exact integer mapping (no float quantiles): within-group rank
    r ∈ [1, n_g] lands at pooled position
    p = 1 + ((r−1)·(N−1)) div (n_g−1); a singleton group maps to
    the pooled median position (N+1) div 2. Ties break by id on
    both sides, so the map replays bit-for-bit in the oracle.

    Scale: the within-group rank is a window partitioned by group
    (distributed); the pooled ranking uses rank.global_rank's
    range-partition + per-partition-offset scheme — NO single
    global-order window over the corpus; the final lookup is a
    shuffle join on the pooled position. Output:
    (id, group, raw_score, src_rank, norm_score)."""
    from pyspark.sql.window import Window

    from .rank import global_rank

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("bigint").alias("raw_score"),
    )
    pooled = global_rank(
        base.select("raw_score", "id"), ["raw_score", "id"], "_prnk"
    ).select(F.col("raw_score").alias("_pv"), F.col("_prnk").alias("_pp"))
    nn = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    wg = Window.partitionBy("grp").orderBy("raw_score", "id")
    ranked = base.withColumns(
        {
            "src_rank": F.row_number().over(wg).cast("bigint"),
            "_ng": F.count(F.lit(1)).over(Window.partitionBy("grp")).cast("bigint"),
        }
    )
    pos = ranked.crossJoin(F.broadcast(nn)).withColumn(
        "_p",
        F.expr(
            "CASE WHEN _ng > 1 THEN 1 + ((src_rank - 1) * (_n - 1)) div (_ng - 1) "
            "ELSE (_n + 1) div 2 END"
        ).cast("bigint"),
    )
    return pos.join(pooled, pos["_p"] == pooled["_pp"]).select(
        "id", "grp", "raw_score", "src_rank", F.col("_pv").alias("norm_score")
    )


def preference_cycles(
    prefs: DataFrame,
    winner_col: str = "winner_id",
    loser_col: str = "loser_id",
) -> DataFrame:
    """Consistency audit of a pairwise-preference relation (the QA
    step before preference-tuning on judge labels): find the
    2-cycles (A≻B and B≻A — two judges, or one judge flip-flopping)
    and 3-cycles (A≻B≻C≻A — intransitivity) that make a preference
    dataset unlearnable as a ranking. Returns one row per violation:
    (kind, a, b, c) with kind '2cycle' (a < b, c = 0) or '3cycle'
    canonicalized to the rotation starting at the smallest node, so
    each cycle reports exactly once.

    Scale: duplicate edges collapse first (one distinct); 2-cycles
    are ONE self-equi-join on the reversed (loser, winner) key;
    3-cycles are two equi-joins chaining winner→loser plus the
    closing-edge check — worklist size is O(paths of length 2),
    bounded in practice because preference graphs are per-prompt
    cliques, not global webs. Self-pairs are excluded defensively."""
    p = (
        prefs.select(
            F.col(winner_col).cast("bigint").alias("w"),
            F.col(loser_col).cast("bigint").alias("l"),
        )
        .filter(F.col("w") != F.col("l"))
        .distinct()
    )
    two = (
        p.alias("x")
        .join(
            p.alias("y"),
            (F.col("x.w") == F.col("y.l")) & (F.col("x.l") == F.col("y.w")),
        )
        .filter(F.col("x.w") < F.col("x.l"))
        .select(
            F.lit("2cycle").alias("kind"),
            F.col("x.w").alias("a"),
            F.col("x.l").alias("b"),
            F.lit(0).cast("bigint").alias("c"),
        )
    )
    three = (
        p.alias("p1")
        .join(p.alias("p2"), F.col("p1.l") == F.col("p2.w"))
        .join(
            p.alias("p3"),
            (F.col("p2.l") == F.col("p3.w")) & (F.col("p3.l") == F.col("p1.w")),
        )
        .filter(
            (F.col("p1.w") < F.col("p2.w"))
            & (F.col("p1.w") < F.col("p3.w"))
            & (F.col("p2.w") != F.col("p3.w"))
        )
        .select(
            F.lit("3cycle").alias("kind"),
            F.col("p1.w").alias("a"),
            F.col("p2.w").alias("b"),
            F.col("p3.w").alias("c"),
        )
    )
    return two.unionAll(three)
