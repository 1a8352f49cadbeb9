"""BPE trainer tests — the classic Sennrich et al. (ACL 2016)
low/lower/newest/widest corpus pins the exact merge sequence, plus
greedy-overlap and segmentation semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from joblink_etl_spark.operators import bpe


def _corpus(spark):
    # word frequencies: low x5, lower x2, newest x6, widest x3
    text = "low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3
    return spark.createDataFrame([(text.strip(),)], "text STRING")


def test_word_freqs(spark):
    wf = {r["word"]: r["n"] for r in bpe.word_freqs(_corpus(spark)).collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_merge_sequence_matches_sennrich(spark):
    merges = bpe.train_bpe(_corpus(spark), n_merges=5)
    # (e,s)=9 from newest6+widest3; (es,t</w>)=9; (l,o)=7 from
    # low5+lower2; (e,w)=6 — then (ew,est</w>)=6 beats (lo,w</w>)=5
    assert merges == [
        (0, "e", "s", 9),
        (1, "es", "t</w>", 9),
        (2, "l", "o", 7),
        (3, "e", "w", 6),
        (4, "ew", "est</w>", 6),
    ]


def test_segmentation_uses_learned_units(spark):
    merges = bpe.train_bpe(_corpus(spark), n_merges=10)
    words = spark.createDataFrame(
        [("newest",), ("low",), ("lowest",)], "word STRING"
    )
    out = {r["word"]: r["tokens"] for r in bpe.bpe_segment_words(words, merges).collect()}
    assert out["newest"] == ["newest</w>"]
    assert out["low"] == ["low</w>"]
    # unseen word: falls back to the largest learned pieces
    assert out["lowest"] == ["lo", "w", "est</w>"]


def test_greedy_overlap_semantics(spark):
    # "aaa" -> symbols a,a,a</w>; merging (a,a) greedily consumes the
    # first pair only: [aa, a</w>]
    words = spark.createDataFrame([("aaa",)], "word STRING")
    out = bpe.bpe_segment_words(words, [(0, "a", "a", 1)]).collect()[0]
    assert out["tokens"] == ["aa", "a</w>"]
    assert out["n_tokens"] == 2


def test_pair_counts_top_order_deterministic(spark):
    pc = bpe.bpe_pair_counts(_corpus(spark), top=3).collect()
    assert [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in pc] == [
        ("e", "s", 9),
        ("s", "t</w>", 9),
        ("w", "e", 8),
    ]


def test_merge_loop_stops_when_no_pairs(spark):
    # single-char words have no adjacent pairs at all
    df = spark.createDataFrame([("a b c a b",)], "text STRING")
    merges = bpe.train_bpe(df, n_merges=4)
    assert merges == []


def test_bpe_encode_corpus_counts(spark):
    """Encoding the Sennrich corpus with its own learned merges:
    per-doc subword counts equal the sum of each word's segmented
    length; empty docs report zeros."""
    from joblink_etl_spark.operators import bpe

    docs = spark.createDataFrame(
        [
            (1, "low low lower"),
            (2, "newest widest"),
            (3, ""),
        ],
        "doc_id BIGINT, text STRING",
    )
    merges = bpe.train_bpe(docs, n_merges=4)
    spark.catalog.clearCache()
    words = spark.createDataFrame(
        [("low",), ("lower",), ("newest",), ("widest",)], ["word"]
    )
    seg = {
        r["word"]: r["n_tokens"]
        for r in bpe.bpe_segment_words(words, merges).collect()
    }
    got = {r["doc_id"]: r for r in bpe.bpe_encode(docs, merges).collect()}
    spark.catalog.clearCache()
    assert got[1]["n_words"] == 3
    assert got[1]["n_subwords"] == 2 * seg["low"] + seg["lower"]
    assert got[1]["n_chars"] == len("lowlowlower")
    assert got[2]["n_subwords"] == seg["newest"] + seg["widest"]
    assert got[3]["n_words"] == 0 and got[3]["n_subwords"] == 0 and got[3]["n_chars"] == 0


def test_bpe_encode_fixed_matches_duckdb_fold_replay(spark):
    """The frozen-merge apply (bpe_encode_fixed) and its DuckDB
    run-parity oracle agree on the adversarial cases: same-symbol
    runs (greedy takes every other pair: lllll -> [ll, ll, l</w>]),
    a stacked merge ((a,r) then (p,ar): parar -> [par, a, r</w>]),
    and whitespace-only / empty docs (all-zero rows, not missing)."""
    import duckdb

    from joblink_etl_spark.operators import bpe
    from joblink_etl_spark.plans.ext_q import (
        BPE_ENCODE_FIXED_SQL,
        FIXED_BPE_MERGES,
        _sql_lit,
    )

    rows = [
        (1, "lower power tower"),
        (2, "llll lllll ll l llama parallel"),
        (3, "parar paper part partner era er"),
        (4, "tomorrow into winter looow"),
        (5, ""),
        (6, "   "),
        (7, "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = [(r, l, rt, 0) for r, l, rt in FIXED_BPE_MERGES]
    got = {
        r.doc_id: (r.n_words, r.n_subwords, r.n_chars)
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {_sql_lit(t)})" for i, t in rows)
        + ") t(doc_id, text)"
    )
    exp = {r[0]: (r[1], r[2], r[3]) for r in con.execute(BPE_ENCODE_FIXED_SQL).fetchall()}
    assert got == exp
    assert got[5] == (0, 0, 0) and got[6] == (0, 0, 0)

    seg = {
        r.word: list(r.tokens)
        for r in bpe.bpe_segment_words(
            spark.createDataFrame([("lllll",), ("llll",), ("parar",)], ["word"]),
            merges,
        ).collect()
    }
    assert seg["lllll"] == ["ll", "ll", "l</w>"]
    assert seg["llll"] == ["ll", "l", "l</w>"]
    assert seg["parar"] == ["par", "a", "r</w>"]
