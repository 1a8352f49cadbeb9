"""Unit tests for the corpus scrub layer: decontamination, PII
redaction, and token-budget mixture sampling."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ngram_overlap_flags_shared_trigrams(spark):
    from joblink_etl_spark.operators.decontam import ngram_overlap

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [
            (1, "something about the quick brown fox here"),  # shares 2 trigrams
            (2, "completely unrelated words in this doc"),
            (3, "ab"),  # < 3 tokens → zero grams
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in ngram_overlap(docs, bench, n=3).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_overlap"] == 2
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]


def test_bloom_decontam_matches_exact_overlap(spark):
    from joblink_etl_spark.operators.decontam import bloom_decontam, ngram_overlap

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps"), (101, "lorem ipsum dolor sit amet")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "something about the quick brown fox here"),
            (2, "completely unrelated words in this doc"),
            (3, "ab"),  # < 3 tokens → zero grams
            (4, "lorem ipsum dolor sit amet exactly"),
        ],
        ["doc_id", "text"],
    )
    exact = {r["doc_id"]: r for r in ngram_overlap(docs, bench, n=3).collect()}
    bloomed = {r["doc_id"]: r for r in bloom_decontam(docs, bench, n=3).collect()}
    assert set(exact) == set(bloomed)
    for i in exact:
        # no false negatives: the verified overlap equals the exact one
        assert bloomed[i]["n_overlap"] == exact[i]["n_overlap"], i
        assert bloomed[i]["contaminated"] == exact[i]["contaminated"], i
        assert bloomed[i]["n_grams"] == exact[i]["n_grams"], i
        # the prefilter can only over-admit, never under-admit
        assert bloomed[i]["n_candidates"] >= bloomed[i]["n_overlap"], i
    # the huge-benchmark path (doc-level pre-agg + admitted-only
    # verify join) must agree row-for-row with the broadcast path
    scale = {
        r["doc_id"]: r
        for r in bloom_decontam(docs, bench, n=3, broadcast_bench=False).collect()
    }
    assert set(scale) == set(exact)
    for i in exact:
        for c in ("n_grams", "n_overlap", "contaminated"):
            assert scale[i][c] == exact[i][c], (i, c)
        assert scale[i]["n_candidates"] == bloomed[i]["n_candidates"], i


def test_bloom_decontam_shuffle_shape(spark):
    """Plan guards for the r05 bench regression: the default verify
    join must be broadcast (exploded gram rows never shuffle); the
    scale path's shuffled verify join must consume the admitted-hash
    arrays, not the raw gram explode."""
    from joblink_etl_spark.operators.decontam import bloom_decontam

    bench = spark.createDataFrame([(100, "a b c d")], ["doc_id", "text"])
    docs = spark.createDataFrame([(1, "a b c x y")], ["doc_id", "text"])

    default_plan = bloom_decontam(docs, bench, n=3)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in default_plan

    scale_plan = (
        bloom_decontam(docs, bench, n=3, broadcast_bench=False)
        ._jdf.queryExecution()
        .toString()
    )
    # the only explode feeding a shuffled join is the _cand array
    assert "_cand" in scale_plan


def test_build_bloom_bitmap_membership(spark):
    from joblink_etl_spark.operators.decontam import (
        BLOOM_BITS,
        _bloom_pos,
        build_bloom,
    )

    bench = spark.createDataFrame([(1, "alpha beta gamma delta")], ["doc_id", "text"])
    bitmap = build_bloom(bench, n=3).first()["bloom"]
    assert bitmap and all(isinstance(w, int) for w in bitmap.values())
    # every seed position of a known benchmark gram must have its bit set
    pos = (
        spark.range(1)
        .select(
            *[
                _bloom_pos(F.lit("alpha beta gamma"), i, BLOOM_BITS).alias(f"p{i}")
                for i in range(3)
            ]
        )
        .first()
    )
    for i in range(3):
        p = pos[f"p{i}"]
        assert bitmap.get(p // 64, 0) & (1 << (p % 64)), f"seed {i} bit unset"


def test_pii_counts_and_redaction(spark):
    from joblink_etl_spark.functions import pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c%d@sub.example.org or call +44 20 7946 0958 now"),
            (2, "server at 192.168.0.1 and 10.0.0.2"),
            # digits+dots inside an email local part must redact as
            # ONE email, not leak an <IP> fragment
            (3, "ping user10.0.0.1@example.com ok"),
            (4, "no identifiers here"),
        ],
        ["id", "t"],
    )
    c = pii.pii_counts(F.col("t"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            c["n_emails"].alias("e"),
            c["n_phones"].alias("p"),
            c["n_ips"].alias("i"),
            pii.redact_pii(F.col("t")).alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["p"], out[1]["i"]) == (1, 1, 0)
    assert out[1]["red"] == "mail <EMAIL> or call <PHONE> now"
    assert out[2]["i"] == 2 and out[2]["red"] == "server at <IP> and <IP>"
    assert out[3]["red"] == "ping <EMAIL> ok"
    assert "<" not in out[4]["red"]


def test_token_budget_sample_respects_budget(spark):
    from joblink_etl_spark.operators.sampling import token_budget_sample

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
        F.lit(100).alias("n_chars"),
    )
    out = token_budget_sample(
        docs, "lang", {"en": 5_000}, weight_col="n_chars", default_budget=None
    )
    by_lang = {
        r["lang"]: r["w"]
        for r in out.groupBy("lang").agg(F.sum("n_chars").alias("w")).collect()
    }
    # en: capped near 5k (overshoot bounded by one bucket = one doc here)
    assert 5_000 <= by_lang["en"] <= 5_000 + 100
    # zh has no budget listed and default is None → keep everything
    assert by_lang["zh"] == 250 * 100


def test_upsample_to_budget_epoch_counts(spark):
    from joblink_etl_spark.operators.sampling import upsample_to_budget

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n_chars")
    )  # total weight 1000
    out = upsample_to_budget(docs, budget=2_600, weight_col="n_chars")
    counts = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(
            F.count("*").alias("n"), F.max("epoch").alias("mx"), F.min("epoch").alias("mn")
        ).collect()
    }
    # 2600/1000 → every doc 2 or 3 copies; ~60% of docs get the third
    assert set(counts.values()) <= {2, 3}
    n3 = sum(1 for v in counts.values() if v == 3)
    assert 40 <= n3 <= 80, n3
    # epochs are contiguous from 0 per doc
    rows = {r["doc_id"]: (r["mn"], r["mx"]) for r in out.groupBy("doc_id").agg(
        F.min("epoch").alias("mn"), F.max("epoch").alias("mx")).collect()}
    assert all(mn == 0 and mx == counts[d] - 1 for d, (mn, mx) in rows.items())
    # deterministic: a repartitioned rerun produces the identical multiset
    again = upsample_to_budget(docs.repartition(7), budget=2_600, weight_col="n_chars")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # budget below total → pure epoch-0 subsample
    small = upsample_to_budget(docs, budget=400, weight_col="n_chars")
    got = small.agg(F.max("epoch"), F.count("*")).first()
    assert got[0] == 0 and 20 <= got[1] <= 60


def test_token_budget_sample_partitioning_independent(spark):
    from joblink_etl_spark.operators.sampling import token_budget_sample

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        (F.col("id") % 37 + 1).alias("n_chars"),
    )
    kept1 = token_budget_sample(
        docs, "lang", {"en": 2_000}, weight_col="n_chars"
    )
    kept2 = token_budget_sample(
        docs.repartition(7), "lang", {"en": 2_000}, weight_col="n_chars"
    )
    ids1 = sorted(r["doc_id"] for r in kept1.collect())
    ids2 = sorted(r["doc_id"] for r in kept2.collect())
    assert ids1 == ids2 and len(ids1) > 0


def test_kmv_exact_below_k(spark):
    from joblink_etl_spark.operators.sketches import kmv_distinct

    df = spark.range(1000).select(
        F.lit("g").alias("grp"), (F.col("id") % 10).alias("v")
    )
    row = kmv_distinct(df, "grp", "v", k=64).collect()[0]
    # 10 distinct values < k → the sketch is exact
    assert row["n_seen"] == 10 and row["est_distinct"] == 10.0


def test_kmv_estimate_accuracy(spark):
    from joblink_etl_spark.operators.sketches import kmv_distinct

    df = spark.range(20_000).select(
        F.lit("g").alias("grp"), (F.col("id") % 5_000).alias("v")
    )
    row = kmv_distinct(df, "grp", "v", k=256).collect()[0]
    # KMV relative error ~ 1/sqrt(k) ≈ 6%; allow 3 sigma
    assert row["n_seen"] == 256
    assert abs(row["est_distinct"] - 5_000) / 5_000 < 0.2


def test_cms_never_undercounts_and_is_exact_when_sparse(spark):
    from joblink_etl_spark.operators.sketches import cms_build, cms_estimate

    rows = [(i % 7,) for i in range(700)] + [(999,)] * 3
    df = spark.createDataFrame(rows, "k long")
    sketch = cms_build(df, "k")
    est = {r["key"]: r["est"] for r in cms_estimate(sketch, df, "k").collect()}
    true = {"999": 3, **{str(i): 100 for i in range(7)}}
    for k, t in true.items():
        assert est[k] >= t, k  # CMS can only over-count
        # 8 keys in 4x1024 counters: collisions are impossible here
        assert est[k] == t, k

    # merge property: sketch(a ∪ b) == sketch(a) + sketch(b) per cell
    a, b = df.filter(F.col("k") < 3), df.filter(F.col("k") >= 3)
    merged = (
        cms_build(a, "k")
        .unionAll(cms_build(b, "k"))
        .groupBy("seed", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r["seed"], r["pos"]): r["cnt"] for r in sketch.collect()}
    assert {(r["seed"], r["pos"]): r["cnt"] for r in merged.collect()} == whole


def test_histogram_quantiles_within_one_bin(spark):
    from joblink_etl_spark.operators.sketches import histogram_quantiles

    vals = [(float(i),) for i in range(1000)]
    df = spark.createDataFrame(vals, "v double")
    out = {r["q"]: r for r in histogram_quantiles(df, "v", qs=(0.5, 0.9), bins=100).collect()}
    bin_w = 999.0 / 100
    # upper-edge estimate: within one bin width above the true quantile
    for q, true in [(0.5, 499.5), (0.9, 899.1)]:
        assert true - bin_w <= out[q]["est"] <= true + bin_w, (q, out[q]["est"])

    again = histogram_quantiles(df.repartition(7), "v", qs=(0.5, 0.9), bins=100).collect()
    assert sorted(map(tuple, again)) == sorted(
        tuple(out[q]) for q in sorted(out)
    )

    # constant column: every quantile is the constant
    const = spark.createDataFrame([(5.0,)] * 20, "v double")
    for r in histogram_quantiles(const, "v", qs=(0.5, 0.99), bins=8).collect():
        assert r["est"] == 5.0


def test_quantize_embeddings_roundtrip(spark):
    from joblink_etl_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector → scale falls back to 1
        ],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[1]["q_codes"] == [64, -127, 32, 0]  # round(x * 127 / maxabs)
    assert abs(out[1]["q_scale"] - 1.0 / 127) < 1e-12
    # reconstruction error bounded by (scale/2)^2
    assert out[1]["q_mse"] <= (out[1]["q_scale"] / 2) ** 2
    assert out[2]["q_scale"] == 1.0 and out[2]["q_codes"] == [0, 0, 0, 0]
    assert out[2]["q_mse"] == 0.0


# --- composed curation pipeline (operators/curate.py) ------------------


def test_curate_applies_every_gate(spark):
    from joblink_etl_spark.operators.curate import curate

    good = "the cat sat on the mat and the dog ran to the park in the sun"
    rows = [
        (1, good),                                  # kept
        (2, good),                                  # exact dup of 1 → dropped
        (3, "zzz qqq xxx vvv kkk mmm nnn ppp rrr"),  # lang 'und' → dropped
        (4, "the " * 2 + "!!! ??? ... ;;; ::: @@@"),  # punct-heavy → low quality
        (5, "the bench gram marker and more of the usual words to pass quality"),
        (6, good + " extra tail keeps the fingerprint distinct here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(99, "the bench gram marker appears here")], ["doc_id", "text"]
    )
    kept = {r.doc_id for r in curate(docs, bench, langs=("en",), min_quality=0.5).collect()}
    # 5 shares the 3-gram 'the bench gram' (and more) with the benchmark
    assert kept == {1, 6}


def test_curate_dup_canonical_is_min_id(spark):
    from joblink_etl_spark.operators.curate import curate

    text = "the quick brown fox jumps over the lazy dog and the cat in the hat"
    docs = spark.createDataFrame(
        [(7, text), (3, text), (9, text)], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(99, "nothing shared at all")], ["doc_id", "text"])
    kept = [r.doc_id for r in curate(docs, bench, langs=("en",)).collect()]
    assert kept == [3]


def test_chunk_documents_windows_and_provenance(spark):
    from joblink_etl_spark.operators.textstats import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, "")], ["doc_id", "text"]
    )
    rows = chunk_documents(docs, chunk_tokens=40, stride=30).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 100 tokens, windows at 0/30/60 → 1+ceil(60/30)=3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_index)
    assert [r.chunk_index for r in c1] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in c1] == [40, 40, 40]
    assert c1[1].chunk_text.startswith("w30 ")  # stride offset
    # overlap: last 10 tokens of chunk 0 == first 10 of chunk 1
    assert c1[0].chunk_text.split()[30:] == c1[1].chunk_text.split()[:10]
    # short doc: single (short) chunk; empty doc: no chunks
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 2
    assert 3 not in by_doc


def test_temperature_mixture_flattens_distribution(spark):
    from joblink_etl_spark.operators.sampling import temperature_mixture

    rows = [(i, "big") for i in range(900)] + [(i + 1000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r["lang"]: r for r in temperature_mixture(df, "lang", budget=500).collect()}
    assert out["big"]["n_docs"] == 900 and out["small"]["n_docs"] == 100
    # weights sum to ~1 and sqrt flattens: 9:1 counts -> 3:1 weights
    wsum = out["big"]["weight"] + out["small"]["weight"]
    assert abs(wsum - 1.0) < 1e-6
    ratio = out["big"]["weight"] / out["small"]["weight"]
    assert abs(ratio - 3.0) < 1e-6
    # targets respect the budget and the group sizes
    assert sum(r["target_rows"] for r in out.values()) <= 500
    assert all(r["target_rows"] <= r["n_docs"] for r in out.values())


def test_quantile_bins_near_equal_frequency(spark):
    from joblink_etl_spark.operators.sketches import quantile_bins

    df = spark.range(1000).select(F.col("id").alias("event_id"), (F.col("id") * 1.0).alias("v"))
    out = quantile_bins(df, "v", n_bins_out=10, bins=100)
    counts = {r["bucket"]: r["n"] for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(1, 11))
    # equal-frequency up to one sketch-bin error (1000/100 = 10 rows)
    assert all(80 <= c <= 120 for c in counts.values()), counts
    # buckets are ordered: every value in bucket b is <= every value in b+1
    maxes = {r["bucket"]: r["mx"] for r in out.groupBy("bucket").agg(F.max("v").alias("mx")).collect()}
    mins = {r["bucket"]: r["mn"] for r in out.groupBy("bucket").agg(F.min("v").alias("mn")).collect()}
    for b in range(1, 10):
        assert maxes[b] <= mins[b + 1]


def test_temperature_sample_hits_targets(spark):
    from joblink_etl_spark.operators.sampling import temperature_mixture, temperature_sample

    rows = [(i, "big") for i in range(900)] + [(i + 1000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    targets = {
        r["lang"]: r["target_rows"]
        for r in temperature_mixture(df, "lang", budget=500).collect()
    }
    got = {
        r["lang"]: r["n"]
        for r in temperature_sample(df, "lang", budget=500)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, tgt in targets.items():
        # hash granularity: within ~10% of the integer target
        assert abs(got.get(lang, 0) - tgt) <= max(5, tgt * 0.15), (lang, got, tgt)
    # deterministic under repartitioning
    again = sorted(
        r["doc_id"] for r in temperature_sample(df.repartition(7), "lang", budget=500).collect()
    )
    assert again == sorted(r["doc_id"] for r in temperature_sample(df, "lang", budget=500).collect())
