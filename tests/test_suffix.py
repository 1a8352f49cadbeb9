"""Planted-boilerplate tests for the suffix-fidelity substring dedup
layer (operators/suffix.py) — the span-fidelity cases a token-n-gram
run merge (dedup.repeated_spans) structurally cannot resolve:
overlapping periodic repeats, nested repeats, and merged runs that
never recur as a unit."""

from __future__ import annotations

import pytest

from joblink_etl_spark.operators import dedup as D
from joblink_etl_spark.operators import suffix as SX


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )


class TestLongestRepeatedSubstring:
    def test_overlapping_periodic_repeat(self, spark):
        # "ABCD" * 3: "ABCDABCD" occurs at pos 3 and (overlapping) 7.
        # Occurrences are (doc,pos) pairs, so the LRS is the length-8
        # period doubling — a fact only visible when overlapping
        # occurrences count, which gram-run merging cannot express.
        docs = _docs(spark, ["zzABCDABCDABCDqq"])
        L, text, occ = SX.longest_repeated_substring(docs, min_count=2, min_len=2)
        assert (L, text, occ) == (8, "ABCDABCD", 2)

    def test_nested_repeats_pick_outermost(self, spark):
        # outer block repeated twice across docs; the inner marker
        # appears 4x. LRS must return the full outer block, not the
        # more frequent nested inner one.
        inner = "needle-needle"
        outer = f"<<{inner}||{inner}>>"
        docs = _docs(spark, [f"aa{outer}bb", f"cc{outer}dd"])
        L, text, occ = SX.longest_repeated_substring(docs, min_count=2, min_len=2)
        assert text == outer
        assert L == len(outer)
        assert occ == 2

    def test_min_count_three(self, spark):
        docs = _docs(spark, ["xx STOP yy", "zz STOP qq", "rr STOP ss", "tt ONCE-ONCE uu", "vv ONCE-ONCE ww"])
        # " STOP " repeats 3x; "ONCE-ONCE" only 2x — at min_count=3
        # the longer pair-repeat must be ignored.
        L, text, occ = SX.longest_repeated_substring(docs, min_count=3, min_len=2)
        assert (L, text, occ) == (6, " STOP ", 3)

    def test_no_repeat_returns_zero(self, spark):
        docs = _docs(spark, ["abcdefgh", "ijklmnop"])
        assert SX.longest_repeated_substring(docs, min_count=2, min_len=4) == (0, "", 0)


class TestSpanUnitRepeats:
    K = 8

    def test_merged_run_that_never_recurs_is_flagged(self, spark):
        # Blocks A and B are each cross-doc repeated, and sit
        # ADJACENT in doc0 only. The k-gram run in doc0 merges A+B
        # into one candidate span — but "A+B" as a unit occurs
        # exactly once in the corpus. The n-gram operator reports the
        # merged span as one repeat region; the unit verifier must
        # flag it unit_repeat=false while the pure A-run (doc1/doc2
        # context) verifies true.
        A = "AAAAaaaaAAAAaaaa"  # 16 chars
        B = "BBBBbbbbBBBBbbbb"
        docs = _docs(
            spark,
            [
                f"{A}{B}",          # doc0: A and B adjacent
                f"xxxx{A}yyyy",     # doc1: A alone
                f"pppp{B}qqqq",     # doc2: B alone
            ],
        )
        out = SX.span_unit_repeats(docs, k=self.K, min_docs=2, top_n=50).collect()
        by_len = {r["span_len"]: r for r in out}
        # the doc0 merged A+B candidate: 32 chars, never recurs
        assert 32 in by_len
        assert by_len[32]["unit_repeat"] is False
        assert by_len[32]["n_occurrences"] == 1
        # the A (and B) 16-char spans verify as true unit repeats
        assert 16 in by_len
        assert by_len[16]["unit_repeat"] is True
        assert by_len[16]["n_docs"] == 2
        # contrast: the token-n-gram run operator cannot make the
        # distinction — with the same adjacency planted in token
        # space, doc0 reports ONE merged span covering A+B even
        # though A+B never recurs as a unit anywhere.
        At = "alpha beta alpha beta"
        Bt = "gamma delta gamma delta"
        tok_docs = _docs(
            spark, [f"{At} {Bt}", f"xx {At} yy", f"pp {Bt} qq"]
        )
        spans0 = (
            D.repeated_spans(tok_docs, ngram=2, min_docs=2)
            .filter("doc_id = 0")
            .collect()
        )
        assert len(spans0) == 1  # A+B merged, indistinguishable

    def test_occurrence_count_is_greedy_nonoverlapping(self, spark):
        # span "ABAB" in "ABABAB": greedy replace counts 1 — the
        # documented (engine-exact) semantics of the verifier.
        blk = "REPEATBLOCK123"
        docs = _docs(spark, [f"{blk}{blk}{blk}", f"zz{blk}zz"])
        out = SX.span_unit_repeats(docs, k=self.K, min_docs=2, top_n=50).collect()
        # the top candidate covers doc0's triple run; its greedy
        # count in doc0 is floor(42/len) and 1 in doc1
        top = max(out, key=lambda r: r["span_len"])
        assert top["span_len"] == len(blk) * 3
        assert top["unit_repeat"] is False  # triple-block only in doc0

    def test_k20_profile_matches_bruteforce(self, spark):
        # repeat_profile vs a Python brute force on a small corpus
        texts = ["the cat sat on the mat on the mat", "the cat sat on a hat", "mat on the mat cat sat"]
        docs = _docs(spark, texts)
        for L in (4, 8):
            from collections import Counter

            c = Counter(t[i : i + L] for t in texts for i in range(len(t) - L + 1))
            rep = {g: n for g, n in c.items() if n >= 2}
            row = [
                r
                for r in SX.repeat_profile(docs, lengths=(L,), min_count=2).collect()
            ][0]
            assert row["n_repeated_grams"] == len(rep)
            assert row["n_repeated_positions"] == sum(rep.values())
            assert row["max_occ"] == (max(rep.values()) if rep else 0)


class TestCharRepeatSpans:
    def test_span_text_recovery(self, spark):
        boiler = "unsubscribe from this newsletter by clicking here"
        docs = _docs(spark, [f"intro. {boiler} outro1", f"other. {boiler} tail22"])
        spans = SX.char_repeat_spans(docs, k=10, min_docs=2).collect()
        assert len(spans) >= 2
        assert any(boiler in r["span_text"] for r in spans)
        # char coordinates are exact: substr(text, start, len) == span_text
        txts = {0: f"intro. {boiler} outro1", 1: f"other. {boiler} tail22"}
        for r in spans:
            t = txts[r["doc_id"]]
            assert t[r["span_start"] - 1 : r["span_start"] - 1 + r["span_len"]] == r["span_text"]


class TestScrubRepeatedSpans:
    def test_canonical_keeper_and_stitching(self, spark):
        # contexts differ IMMEDIATELY at both span boundaries so the
        # detected span is exactly the boilerplate block
        boiler = "click here to unsubscribe from this newsletter today"
        d0 = f"HEAD_{boiler}+TAIL0"   # doc 0: canonical keeper — untouched
        d1 = f"one2-{boiler}=TAIL1"   # doc 1: span cut
        d2 = "completely unrelated content with no repeats at all"
        docs = _docs(spark, [d0, d1, d2])
        out = {
            r["doc_id"]: r
            for r in SX.scrub_repeated_spans(docs, k=10, min_docs=2).collect()
        }
        assert len(out) == 3
        # keeper keeps the boilerplate; others lose exactly that span
        assert out[0]["scrubbed_text"] == d0
        assert out[0]["n_spans_cut"] == 0
        assert out[1]["scrubbed_text"] == "one2-=TAIL1"
        assert out[1]["n_spans_cut"] == 1
        assert out[1]["chars_cut"] == len(boiler)
        # untouched doc passes through bit-identical
        assert out[2]["scrubbed_text"] == d2
        assert out[2]["n_spans_cut"] == 0

    def test_multiple_disjoint_cuts_in_one_doc(self, spark):
        b1 = "FIRST-BOILERPLATE-BLOCK-AAAA"
        b2 = "SECOND-BOILERPLATE-BLOCK-BBB"
        filler = "#some sufficiently long unique filler text here*"
        d0 = f"k0_{b1}+z1"
        d1 = f"k1-{b2}=z2"
        d2 = f"x%{b1}{filler}{b2}@y"  # two cuts, disjoint islands
        docs = _docs(spark, [d0, d1, d2])
        out = {
            r["doc_id"]: r
            for r in SX.scrub_repeated_spans(docs, k=10, min_docs=2).collect()
        }
        r2 = out[2]
        assert r2["n_spans_cut"] == 2
        assert b1 not in r2["scrubbed_text"] and b2 not in r2["scrubbed_text"]
        assert r2["scrubbed_text"] == f"x%{filler}@y"
        assert r2["chars_cut"] == len(b1) + len(b2)


class TestCdcChunks:
    def test_chunks_tile_the_document(self, spark):
        texts = ["the quick brown fox jumps over the lazy dog " * 8,
                 "pack my box with five dozen liquor jugs " * 6]
        docs = _docs(spark, texts)
        rows = SX.cdc_chunks(docs, w=8).collect()
        for did, t in enumerate(texts):
            segs = sorted(
                [(r["chunk_start"], r["chunk_len"]) for r in rows if r["doc_id"] == did]
            )
            # chunks tile [1, len] exactly: start at 1, contiguous, end at len
            assert segs[0][0] == 1
            for (s1, l1), (s2, _) in zip(segs, segs[1:]):
                assert s1 + l1 == s2
            assert segs[-1][0] + segs[-1][1] - 1 == len(t)

    def test_content_defined_shift_invariance(self, spark):
        # THE property CDC exists for: prepending text to a doc must
        # leave the chunking of the untouched remainder identical
        # (a fixed-stride chunker would shift every boundary).
        body = "shared content that should chunk identically " * 10
        docs = _docs(spark, [body, "PREFIX-INSERTED-HERE " + body])
        rows = SX.cdc_chunks(docs, w=8).collect()
        md5s0 = {r["chunk_md5"] for r in rows if r["doc_id"] == 0}
        md5s1 = {r["chunk_md5"] for r in rows if r["doc_id"] == 1}
        shared = md5s0 & md5s1
        # all of doc0's chunks except (at most) its head chunk reappear
        # verbatim in the shifted doc
        assert len(shared) >= len(md5s0) - 1
        # and the copy counts reflect the cross-doc duplication
        assert any(r["n_copies"] >= 2 for r in rows)


class TestWinnowing:
    def test_shared_substring_guarantee(self, spark):
        # SIGMOD 2003 guarantee: any shared substring of length
        # >= k + w - 1 yields at least one shared fingerprint
        k, w = 8, 5
        shared = "this exact block is long enough to guarantee a match"
        assert len(shared) >= k + w - 1
        docs = _docs(spark, [f"aaa {shared} bbb", f"ccccc {shared} ddd",
                             "totally different content with nothing in common!"])
        fps = SX.minimizer_fingerprints(docs, k=k, w=w).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        assert by_doc[0] & by_doc[1], "shared substring must share a fingerprint"
        pairs = SX.winnowing_pairs(docs, k=k, w=w, min_shared=1).collect()
        assert any(r["id_a"] == 0 and r["id_b"] == 1 for r in pairs)

    def test_density_reduction(self, spark):
        # winnowing keeps ~2/(w+1) of positions — assert a hard upper
        # bound well below 1 (here: at most 40% for w=5)
        text = "the quick brown fox jumps over the lazy dog " * 20
        docs = _docs(spark, [text])
        n_pos = len(text) - 8 + 1
        n_fp = SX.minimizer_fingerprints(docs, k=8, w=5).count()
        assert 0 < n_fp < 0.4 * n_pos

    def test_fingerprints_are_actual_positions(self, spark):
        text = "abcdefghijklmnopqrstuvwxyz0123456789" * 3
        docs = _docs(spark, [text])
        for r in SX.minimizer_fingerprints(docs, k=8, w=5).collect():
            import hashlib
            gram = text[r["pos"] - 1 : r["pos"] - 1 + 8]
            assert hashlib.md5(gram.encode()).hexdigest() == r["fp"]


class TestIncrementalRepeatSpans:
    def test_new_batch_vs_index(self, spark):
        idx = _docs(spark, [
            "the index corpus contains this exact boilerplate passage verbatim",
            "another indexed document with its own unique wording here",
        ])
        new = spark.createDataFrame(
            [(100, "prefix! this exact boilerplate passage verbatim suffix?"),
             (101, "zq9 xv7 totally fresh material 123 nothing matches 456!?")],
            "doc_id BIGINT, text STRING",
        )
        spans = SX.incremental_repeat_spans(new, idx, k=10).collect()
        by_doc = {}
        for r in spans:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 100's copied middle comes back as one span; the novel
        # doc yields nothing
        assert 100 in by_doc and len(by_doc[100]) == 1
        assert "boilerplate passage" in by_doc[100][0]["span_text"]
        assert 101 not in by_doc
        # the index is never self-paired: index-internal repeats are
        # not reported (output contains only new-batch doc ids)
        assert all(r["doc_id"] >= 100 for r in spans)


class TestWinnowingMaxDf:
    def test_hot_fingerprint_pruned(self, spark):
        # boilerplate shared by ALL docs is dropped at max_df=3; the
        # rare shared block between docs 0 and 1 survives
        hot = "THIS-HOT-BOILERPLATE-IS-EVERYWHERE-IN-THE-CORPUS"
        rare = "rare shared passage only in the first two documents"
        docs = _docs(spark, [f"{hot} a {rare} x", f"{hot} b {rare} y",
                             f"{hot} c uniq3", f"{hot} d uniq4", f"{hot} e uniq5"])
        capped = SX.winnowing_pairs(docs, k=8, w=4, min_shared=1, max_df=3).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in capped}
        assert (0, 1) in pairs
        # pairs that ONLY shared the hot boilerplate disappear
        uncapped = SX.winnowing_pairs(docs, k=8, w=4, min_shared=1).collect()
        assert len({(r["id_a"], r["id_b"]) for r in uncapped}) > len(pairs)


def test_lrs_exact_fixed_pinned_constant(spark):
    """lrs_exact_fixed's answer over the SF-invariant enum corpus is
    a known constant: 'NATION_1' (len 8), the shared prefix of
    NATION_1 and NATION_10..NATION_19 (11 (doc,pos) occurrences).
    Pins the frozen-corpus twin locally so a trainer/tie-break
    regression is loud before the driver's oracle row sees it."""
    import hashlib

    from joblink_etl_spark.plans.ext_q import lrs_exact_fixed_q

    row = lrs_exact_fixed_q(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["lrs_len"] == 8
    assert row["lrs_md5"] == hashlib.md5(b"NATION_1").hexdigest()
    assert row["occurrences"] == 11
