"""Property-based tests (SURVEY.md §5.5) via hypothesis:
canonicalization idempotence, confidence bounds, clamp rules,
truncation caps — evaluated in batches through one Spark job per
property to keep runtime sane."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from joblink_etl_spark.functions import text as T
from joblink_etl_spark.functions import url as U
from joblink_etl_spark.operators.decide import decide

_param = st.sampled_from(
    U.TRACKING_PARAMS + ["keep", "page", "q", "ref", "UTM_SOURCE"]
)
_qpair = st.tuples(_param, st.text(string.ascii_lowercase + string.digits, max_size=5))


@st.composite
def urls(draw):
    host = draw(st.sampled_from(["a.com", "jobs.lever.co", "www.x.io", "boards.greenhouse.io"]))
    path = "/" + "/".join(draw(st.lists(st.text(string.ascii_lowercase + string.digits, min_size=1, max_size=6), max_size=3)))
    pairs = draw(st.lists(_qpair, max_size=5))
    qs = "&".join(f"{k}={v}" for k, v in pairs)
    frag = draw(st.sampled_from(["", "#apply", "#x=1"]))
    return f"https://{host}{path}" + (f"?{qs}" if qs else "") + frag


@settings(max_examples=30, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=30))
def test_canonicalization_idempotent_and_clean(spark_prop, us):
    df = spark_prop.createDataFrame([(u,) for u in us], "u string")
    out = df.select(
        "u",
        U.make_canonical(F.col("u")).alias("c1"),
        U.make_canonical(U.make_canonical(F.col("u"))).alias("c2"),
    ).collect()
    for r in out:
        assert r["c1"] == r["c2"], f"not idempotent: {r['u']}"
        q = r["c1"].split("#")[0].split("?")
        if len(q) > 1:
            keys = {p.split("=")[0] for p in q[1].split("&")}
            assert not (keys & set(U.TRACKING_PARAMS)), r["c1"]


@st.composite
def page_shapes(draw):
    role = draw(st.sampled_from(["Staff Analyst", "Sign in", "", "Acme — Lead Dev"]))
    h1 = draw(st.booleans())
    ogsite = draw(st.sampled_from(["", "Acme", "LinkedIn"]))
    jsonld = draw(st.booleans())
    url = draw(st.sampled_from([
        "https://www.linkedin.com/jobs/view/1",
        "https://boards.greenhouse.io/acme/jobs/1",
        "https://x.example.com/p",
        "not a url",
    ]))
    html = ""
    if jsonld:
        html += '<script type="application/ld+json">{"@type":"JobPosting","title":"LD Role","hiringOrganization":{"name":"LD Co"}}</script>'
    if role:
        html += f"<h1>{role}</h1>" if h1 else f"<title>{role}</title>"
    if ogsite:
        html += f'<meta property="og:site_name" content="{ogsite}">'
    return (url, html)


@settings(max_examples=25, deadline=None)
@given(st.lists(page_shapes(), min_size=1, max_size=25))
def test_decide_conf_invariants(spark_prop, pages):
    df = spark_prop.createDataFrame(pages, "final_url string, html string")
    out = decide(df).select("company", "role", "conf").collect()
    for r in out:
        assert 0.0 <= r["conf"] <= 1.0
        if not r["company"] or not r["role"]:
            # missing-field clamp (reference :771-773)
            assert r["conf"] <= 0.5 + 1e-9


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(max_size=400), min_size=1, max_size=25))
def test_truncation_cap(spark_prop, texts):
    df = spark_prop.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(F.length(T.truncate(F.col("t"), 280)).alias("n")).collect()
    assert all((r["n"] or 0) <= 280 for r in out)


_words = st.lists(
    st.text(string.ascii_lowercase, min_size=1, max_size=6), min_size=0, max_size=120
)


@settings(max_examples=15, deadline=None)
@given(_words, st.integers(2, 20), st.integers(1, 20))
def test_chunking_covers_every_token_in_order(spark_prop, words, chunk, stride):
    """Concatenating chunks at stride offsets reconstructs the token
    stream: chunk i's tokens are exactly tokens[i*stride : i*stride+chunk],
    and the union covers every token."""
    from joblink_etl_spark.operators.textstats import chunk_documents

    stride = min(stride, chunk)  # stride > chunk would skip tokens
    df = spark_prop.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, stride=stride).collect(),
        key=lambda r: r.chunk_index,
    )
    toks = " ".join(words).split()
    if not toks:
        assert rows == []
        return
    seen = set()
    for r in rows:
        lo = r.chunk_index * stride
        expect = toks[lo : lo + chunk]
        assert r.chunk_text.split() == expect
        seen.update(range(lo, min(lo + chunk, len(toks))))
    assert seen == set(range(len(toks)))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=60),
    st.integers(2, 9),
)
def test_salted_join_always_matches_plain_join(spark_prop, fact_rows, buckets):
    from joblink_etl_spark.operators.skew import salted_join

    fact = spark_prop.createDataFrame(fact_rows, ["k", "v"])
    dim = spark_prop.createDataFrame([(i, f"d{i}") for i in range(0, 6, 2)], ["k", "name"])
    got = sorted(map(tuple, salted_join(fact, dim, "k", salt_buckets=buckets).collect()))
    want = sorted(map(tuple, fact.join(dim, "k").collect()))
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=30),
        min_size=2,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_repeated_spans_match_pure_python_oracle(spark_prop, docs, ngram):
    """repeated_spans vs an independent pure-Python reimplementation
    on tiny random corpora (4-letter alphabet forces collisions):
    identical span sets, and per-doc spans are disjoint with
    span_tokens >= ngram."""
    from collections import defaultdict

    from joblink_etl_spark.operators.dedup import repeated_spans

    texts = [" ".join(t) for t in docs]
    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_grams"])
        for r in repeated_spans(df, ngram=ngram, min_docs=2).collect()
    }

    # independent oracle
    gram_docs = defaultdict(set)
    positions = defaultdict(list)
    for i, toks in enumerate(docs):
        for p in range(max(len(toks) - ngram + 1, 0)):
            g = " ".join(toks[p : p + ngram])
            gram_docs[g].add(i)
            positions[i].append((p, g))
    want = set()
    for i, pgs in positions.items():
        run: list[int] = []
        for p, g in pgs:  # pgs already in pos order
            if len(gram_docs[g]) < 2:
                continue
            if run and p - run[-1] > ngram:
                want.add((i, run[0], run[-1] + ngram - 1, run[-1] + ngram - run[0], len(run)))
                run = []
            run.append(p)
        if run:
            want.add((i, run[0], run[-1] + ngram - 1, run[-1] + ngram - run[0], len(run)))
    assert got == want

    # disjointness + minimum width per doc
    by_doc = defaultdict(list)
    for d, s, e, w, n in got:
        assert w == e - s + 1 >= ngram
        by_doc[d].append((s, e))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 < s2


def _synth_wav(samples: list[int], rate: int, channels: int) -> bytes:
    import struct

    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(1, 2),
)
def test_wav_parse_roundtrip_and_exact_rms(samples, rate, channels):
    """Pure-Python fuzz of the real audio decoder: any synthesized
    PCM16 container parses back to its exact parameters, and rms_q
    equals the isqrt formula over the raw samples."""
    import math

    from joblink_etl_spark.operators.multimodal import (
        _real_audio_meta,
        parse_wav_header,
    )

    data = _synth_wav(samples, rate, channels)
    sr, ch, bits, n, pcm = parse_wav_header(data)
    assert (sr, ch, bits) == (rate, channels, 16)
    assert n == len(samples) // channels
    meta = _real_audio_meta(data)
    # a trailing half-frame (odd word count at 2 channels) yields zero
    # COMPLETE frames — the decoder reports silence rather than
    # averaging a torn frame
    want_rms = (
        math.isqrt(sum(s * s for s in samples) // len(samples)) if n > 0 else 0
    )
    assert meta == (rate, channels, 16, n, n * 1000 // rate, want_rms, "wav")


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=32),
        min_size=2,
        max_size=60,
    ),
    st.sampled_from([4, 16]),
)
def test_histogram_quantile_upper_edge_bounds(spark_prop, vals, bins):
    """For any data: the histogram estimate is ≥ the true rank
    quantile and within one bin width above it (upper-edge rule)."""
    import math

    from joblink_etl_spark.operators.sketches import histogram_quantiles

    df = spark_prop.createDataFrame([(float(v),) for v in vals], "v double")
    out = {r["q"]: r["est"] for r in histogram_quantiles(df, "v", qs=(0.5,), bins=bins).collect()}
    lo, hi = min(vals), max(vals)
    n = len(vals)
    true = sorted(vals)[math.ceil(0.5 * n) - 1]
    est = out[0.5]
    width = (hi - lo) / bins
    eps = 1e-9 * max(abs(hi), abs(lo), 1.0)
    assert true - eps <= est <= true + width + eps, (true, est, width)
    assert lo - eps <= est <= hi + eps


# --- suffix-layer properties (round 4) --------------------------------

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "omega", "zz"])
_doc = st.lists(_word, min_size=0, max_size=18).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=6))
def test_lrs_matches_bruteforce(spark_prop, texts):
    """Exact LRS vs a quadratic Python brute force on tiny corpora:
    same maximal length and occurrence count under the same
    (doc,pos)-occurrence semantics."""
    from joblink_etl_spark.operators import suffix as SX

    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    min_len = 2
    # brute force: count all substrings of every length
    from collections import Counter

    best = (0, 0)  # (length, occ)
    for L in range(min_len, max((len(t) for t in texts), default=0) + 1):
        c = Counter(t[i : i + L] for t in texts for i in range(len(t) - L + 1))
        rep = {g: n for g, n in c.items() if n >= 2}
        if rep:
            best = (L, max(rep.values()))
    L, text, occ = SX.longest_repeated_substring(df, min_count=2, min_len=min_len)
    assert L == best[0]
    if L:
        # the champion string must really occur `occ` times
        true_occ = sum(
            1 for t in texts for i in range(len(t) - L + 1) if t[i : i + L] == text
        )
        assert occ == true_occ >= 2


@settings(max_examples=8, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=6))
def test_scrub_never_leaves_cut_content_and_conserves_chars(spark_prop, texts):
    """Scrub invariants on random corpora: chars_cut + len(scrubbed)
    == len(original) for every doc, and a doc with nothing cut
    passes through bit-identical."""
    from joblink_etl_spark.operators import suffix as SX

    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    out = {r["doc_id"]: r for r in SX.scrub_repeated_spans(df, k=4, min_docs=2).collect()}
    assert set(out) == set(range(len(texts)))
    for i, t in enumerate(texts):
        r = out[i]
        assert len(r["scrubbed_text"]) + r["chars_cut"] == len(t)
        if r["n_spans_cut"] == 0:
            assert r["scrubbed_text"] == t


# ---------------------------------------------------------------------------
# Round-5 properties
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 30),           # key
            st.integers(0, 1000),         # seq
            st.sampled_from(["I", "U", "D"]),
            st.text(string.ascii_lowercase, max_size=6),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cdc_apply_matches_python_fold(spark_prop, chg_rows):
    """apply_changelog == a pure-Python last-writer-wins fold over
    arbitrary changelogs (random keys, seqs incl. duplicates, ops)."""
    from joblink_etl_spark.operators.cdc import apply_changelog

    base_rows = [(k, f"base{k}") for k in range(0, 20)]
    base = spark_prop.createDataFrame(base_rows, "k BIGINT, name STRING")
    chg = spark_prop.createDataFrame(chg_rows, "k BIGINT, seq BIGINT, op STRING, name STRING")

    # python reference: winner per key by (seq, op) desc
    winner = {}
    for k, seq, op, name in chg_rows:
        if k not in winner or (seq, op) > (winner[k][0], winner[k][1]):
            winner[k] = (seq, op, name)
    want = {}
    for k, name in base_rows:
        if k not in winner:
            want[k] = name
    for k, (seq, op, name) in winner.items():
        if op != "D":
            want[k] = name
    got = {r["k"]: r["name"] for r in apply_changelog(base, chg, "k").collect()}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=30),
    st.integers(1, 3),
)
def test_pagerank_matches_python_fixed_point(spark_prop, raw_edges, iters):
    """Integer PageRank == a pure-Python replica of the fixed-point
    recurrence on arbitrary symmetric graphs."""
    from joblink_etl_spark.operators import graph as G

    edges = sorted({(a, b) for a, b in raw_edges if a != b} | {(b, a) for a, b in raw_edges if a != b})
    if not edges:
        return
    df = spark_prop.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r["node"]: r["rank_scaled"] for r in G.pagerank(df, iters=iters).collect()}

    nodes = sorted({n for e in edges for n in e})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: G.SCALE for n in nodes}
    base = (G.DAMP_DEN - G.DAMP_NUM) * G.SCALE // G.DAMP_DEN
    for _ in range(iters):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += r[s] // outdeg[s]
        r = {n: base + (G.DAMP_NUM * contrib[n]) // G.DAMP_DEN for n in nodes}
    assert got == r


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 100), st.integers(1, 10_000)), min_size=2, max_size=60), st.integers(1, 10))
def test_priority_sample_matches_python_reference(spark_prop, rows, k):
    """priority_sample == the pure-Python top-k by the same integer
    priorities (dedup'd ids; est_weight formula replayed)."""
    import hashlib

    from joblink_etl_spark.operators.sampling import priority_sample

    uniq = {}
    for i, w in rows:
        uniq[i] = w
    rows = sorted(uniq.items())
    df = spark_prop.createDataFrame(rows, "doc_id BIGINT, w BIGINT")
    got = sorted(map(tuple, priority_sample(df, "w", k=k, salt="pp").collect()))

    def pri(i, w):
        u = int(hashlib.md5(f"pp:{i}".encode()).hexdigest()[:15], 16) % (1 << 30) + 1
        return (w << 30) // u

    scored = sorted(((pri(i, w), i, w) for i, w in rows), key=lambda t: (-t[0], t[1]))
    top = scored[:k]
    tau = scored[k][0] if len(scored) > k else 0
    want = sorted(
        (i, w, p, float(max(w << 30, tau)) / float(1 << 30)) for p, i, w in top
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 200), st.integers(-500, 500)),
        min_size=1,
        max_size=40,
    ),
    st.integers(2, 20),
)
def test_gap_fill_locf_matches_python(spark_prop, rows, bucket):
    """gap_fill_locf == a pure-Python grid+LOCF fold for arbitrary
    per-key series (duplicate timestamps resolved by the eid
    tiebreaker in both)."""
    from joblink_etl_spark.operators.timeseries import gap_fill_locf

    rows = [(k, t, c, i) for i, (k, t, c) in enumerate(rows)]
    df = spark_prop.createDataFrame(rows, "k BIGINT, t BIGINT, c BIGINT, eid BIGINT")
    got = {
        (r["k"], r["bucket"]): (r["c"], r["is_observed"])
        for r in gap_fill_locf(df, "k", "t", "c", bucket, ("eid",)).collect()
    }

    want = {}
    bykey = {}
    for k, t, c, eid in rows:
        bykey.setdefault(k, []).append((t, eid, c))
    for k, obs in bykey.items():
        per_bucket = {}
        for t, eid, c in obs:
            b = t // bucket
            if b not in per_bucket or (t, eid) > per_bucket[b][:2]:
                per_bucket[b] = (t, eid, c)
        b0, b1 = min(per_bucket), max(per_bucket)
        last = None
        for b in range(b0, b1 + 1):
            if b in per_bucket:
                last = per_bucket[b][2]
                want[(k, b)] = (last, True)
            else:
                want[(k, b)] = (last, False)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.lists(st.integers(-20, 20), min_size=4, max_size=4), min_size=2, max_size=15),
    st.integers(1, 4),
)
def test_mmr_matches_python_greedy(spark_prop, vecs, k):
    """mmr_rerank == a pure-Python greedy MMR with the same integer
    scores and smallest-id tie-break."""
    from joblink_etl_spark.operators.similarity import mmr_rerank

    q = spark_prop.createDataFrame([(0, vecs[0])], "qid BIGINT, q_codes ARRAY<INT>")
    cand = list(enumerate(vecs[1:], start=1))
    c = spark_prop.createDataFrame(cand, "did BIGINT, d_codes ARRAY<INT>")
    got = {
        r["rank"]: (r["did"], r["score"])
        for r in mmr_rerank(q, c, k=k, rel_w=2, div_w=1).collect()
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    qv = vecs[0]
    rel = {i: dot(qv, v) for i, v in cand}
    picked, want = [], {}
    max_sim = {i: None for i, _ in cand}
    for rank in range(1, min(k, len(cand)) + 1):
        best = None
        for i, v in cand:
            if i in picked:
                continue
            s = rel[i] if rank == 1 else 2 * rel[i] - max_sim[i]
            if best is None or s > best[0] or (s == best[0] and i < best[1]):
                best = (s, i)
        want[rank] = (best[1], best[0])
        picked.append(best[1])
        pv = dict(cand)[best[1]]
        for i, v in cand:
            s = dot(v, pv)
            max_sim[i] = s if max_sim[i] is None else max(max_sim[i], s)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    st.integers(1, 5),
    st.integers(1, 6),
)
def test_epoch_shuffle_is_bijection_with_balanced_shards(spark_prop, ids, epoch, shards):
    """For ANY id set: epoch_pos is a bijection onto 1..n and shard
    sizes differ by at most one."""
    from joblink_etl_spark.operators.sampling import epoch_shuffle

    df = spark_prop.createDataFrame([(i,) for i in ids], "doc_id BIGINT")
    out = epoch_shuffle(df, epoch=epoch, n_shards=shards).collect()
    spark_prop.catalog.clearCache()
    assert sorted(r["epoch_pos"] for r in out) == list(range(1, len(ids) + 1))
    sizes = [0] * shards
    for r in out:
        sizes[r["shard"]] += 1
    assert max(sizes) - min(sizes) <= 1


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(string.ascii_lowercase + " ", max_size=40),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 9),
)
def test_length_bucket_batches_conserves_rows_and_waste(spark_prop, texts, bsz):
    """For ANY corpus: every row lands in exactly one batch, no batch
    exceeds batch_size, waste == n*max - sum, and each batch's rows
    share one power-of-two length band."""
    from joblink_etl_spark.operators.sampling import length_bucket_batches

    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    out = length_bucket_batches(df, batch_size=bsz).collect()
    spark_prop.catalog.clearCache()
    assert sum(r["n_examples"] for r in out) == len(texts)
    for r in out:
        assert 1 <= r["n_examples"] <= bsz
        assert r["waste_tokens"] == r["n_examples"] * r["max_tokens"] - r["sum_tokens"]
        if r["bucket"] >= 0:
            assert 2 ** r["bucket"] <= r["max_tokens"] < 2 ** (r["bucket"] + 1)
        else:
            assert r["max_tokens"] == 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
        min_size=2,
        max_size=40,
    )
)
def test_spearman_bounded_and_self_correlated(spark_prop, pairs):
    """ρ ∈ [-1, 1] for arbitrary integer data; ρ(x, x) = 1 exactly
    (rank-of-record ranks are identical when x = y and tie-breaks
    use the same id)."""
    from joblink_etl_spark.operators.select import spearman_by_group

    rows = [(i, "g", x, y) for i, (x, y) in enumerate(pairs)]
    df = spark_prop.createDataFrame(rows, "doc_id INT, grp STRING, x INT, y INT")
    r = spearman_by_group(df, "grp", "x", "y").collect()[0]
    assert -1.0 <= r["spearman"] <= 1.0
    same = [(i, "g", x, x) for i, (x, _) in enumerate(pairs)]
    df2 = spark_prop.createDataFrame(same, "doc_id INT, grp STRING, x INT, y INT")
    r2 = spearman_by_group(df2, "grp", "x", "y").collect()[0]
    assert r2["spearman"] == 1.0
    spark_prop.catalog.clearCache()


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(1, 40), min_size=1, max_size=8),  # group sizes
    st.integers(0, 400),  # budget
)
def test_waterfill_is_max_min_fair(spark_prop, sizes, budget):
    """Waterfill invariants on arbitrary group profiles: allocations
    never exceed sizes, the budget binds exactly (Σ alloc =
    min(budget, N)), and max-min fairness holds — no group could gain
    without a LARGER-allocated group losing (equivalently: any group
    below its size is within 1 of the maximum allocation)."""
    from joblink_etl_spark.operators.sampling import waterfill_allocation

    rows = [(f"g{gi:02d}",) for gi, n in enumerate(sizes) for _ in range(n)]
    df = spark_prop.createDataFrame(rows, "grp string")
    out = {r.grp: (r.n_docs, r.alloc) for r in
           waterfill_allocation(df, "grp", budget=budget).collect()}
    assert len(out) == len(sizes)
    total = sum(a for _, a in out.values())
    assert total == min(budget, sum(sizes))
    allocs = [a for _, a in out.values()]
    for n, a in out.values():
        assert 0 <= a <= n
        # capped groups (a < n) sit within 1 of the max allocation
        if a < n:
            assert a >= max(allocs) - 1


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12)), min_size=1, max_size=40
    )
)
def test_triangle_counts_match_bruteforce(spark_prop, raw_edges):
    """Degree-ordered enumeration equals the brute-force triangle
    count on arbitrary small graphs (self-loops and duplicate edges
    included in the input)."""
    from itertools import combinations

    from joblink_etl_spark.operators.graph import triangle_counts

    df = spark_prop.createDataFrame(raw_edges, "id_a bigint, id_b bigint")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}

    und = {tuple(sorted(e)) for e in raw_edges if e[0] != e[1]}
    nodes = {v for e in und for v in e}
    want = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=25),
    st.integers(1, 5),
)
def test_grouped_priority_sample_is_per_group_topk(spark_prop, weights, k):
    """The grouped draw equals, per group, the top-k of the SAME
    integer priority computed directly — the window spelling adds no
    selection drift."""
    from joblink_etl_spark.operators.sampling import grouped_priority_sample

    rows = [(i, f"g{i % 3}", w + 1) for i, w in enumerate(weights)]
    df = spark_prop.createDataFrame(rows, "doc_id bigint, lang string, n_chars bigint")
    out = grouped_priority_sample(df, "lang", "n_chars", k=k, id_col="doc_id")
    got = {}
    for r in out.collect():
        got.setdefault(r.grp, []).append((r.doc_id, r.priority))

    import hashlib

    def md5i(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = {}
    for i, w in enumerate(weights):
        g = f"g{i % 3}"
        u = (md5i(f"gpri:{i}") % (1 << 30)) + 1
        q = ((w + 1) * (1 << 30)) // u
        want.setdefault(g, []).append((i, q))
    for g in want:
        top = sorted(want[g], key=lambda t: (-t[1], t[0]))[:k]
        assert sorted(got.get(g, [])) == sorted(top)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=6, max_size=20
        ),
        min_size=1,
        max_size=6,
    )
)
def test_containment_prefix_quote_is_always_full(spark_prop, token_lists):
    """For any corpus, a prefix quote of >= ngram tokens has
    containment exactly 10000 bp inside its base document (its gram
    set is a subset by construction)."""
    from joblink_etl_spark.operators.dedup import containment_pairs

    rows, expect = [], set()
    for i, toks in enumerate(token_lists):
        base_id = i * 2
        quote_id = i * 2 + 1
        rows.append((base_id, " ".join(toks)))
        keep = max(3, len(toks) // 2)
        rows.append((quote_id, " ".join(toks[:keep])))
        expect.add((base_id, quote_id))
    df = spark_prop.createDataFrame(rows, "doc_id bigint, text string")
    out = containment_pairs(df, ngram=3, min_containment_bp=0)
    full = {
        (r.id_a, r.id_b)
        for r in out.collect()
        if max(r.contain_a_bp, r.contain_b_bp) == 10000
    }
    # every planted (base, quote) pair reaches full containment
    # (other cross-doc pairs may too on tiny alphabets — that's fine)
    assert expect <= full


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=4, max_size=40))
def test_pit_join_assigns_each_fact_to_at_most_one_version(spark_prop, tss):
    """PIT semantics: half-open validity intervals partition time, so
    a fact matches exactly one version row if any version precedes it
    (and zero otherwise) — even with duplicate timestamps."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [(7, i, ts) for i, ts in enumerate(tss)]
    df = spark_prop.createDataFrame(rows, "user_id bigint, event_id bigint, ts_us bigint")
    dim0 = df.filter(F.col("event_id") % 3 == 0)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    dim = dim0.select(
        "user_id",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w).alias("valid_to_us"),
    )
    fact = df.filter(F.col("event_id") % 3 != 0).select(
        "user_id", F.col("event_id").alias("fact_id"), F.col("ts_us").alias("fact_ts")
    )
    joined = fact.join(
        dim,
        (fact["user_id"] == dim["user_id"])
        & (dim["valid_from_us"] <= fact["fact_ts"])
        & (dim["valid_to_us"].isNull() | (fact["fact_ts"] < dim["valid_to_us"])),
    )
    counts = [r.n for r in joined.groupBy("fact_id").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert all(n == 1 for n in counts)
    # facts at/after the first version all match
    first_version = min(tss[i] for i in range(len(tss)) if i % 3 == 0)
    expected_matches = sum(
        1 for i, ts in enumerate(tss) if i % 3 != 0 and ts >= first_version
    )
    assert sum(counts) == expected_matches


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["A", "B", "C"]), st.integers(0, 4)),
        min_size=2,
        max_size=40,
    )
)
def test_t_closeness_invariants(spark_prop, rows):
    """t_bp is a valid basis-point value; a group whose distribution
    EQUALS the global one (the whole corpus as one group) has EMD
    exactly 0; emd_scaled is always even-denominator-consistent
    (non-negative bigint)."""
    from joblink_etl_spark.operators.privacy import t_closeness

    df = spark_prop.createDataFrame(rows, "g STRING, b BIGINT")
    out = t_closeness(df, ["g"], "b").collect()
    assert {r.g for r in out} == {g for g, _ in rows}
    for r in out:
        assert 0 <= r.t_bp <= 10000, r
        assert r.emd_scaled >= 0
    # one-group corpus == global distribution -> t is exactly 0
    one = df.select(F.lit("all").alias("g"), "b")
    solo = t_closeness(one, ["g"], "b").collect()
    assert len(solo) == 1 and solo[0].emd_scaled == 0 and solo[0].t_bp == 0
