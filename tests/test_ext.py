"""Tests for the north-star extensions: IVF recall vs brute force,
planted near-dup recovery, simhash locality, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from joblink_etl_spark.operators import dedup as D
from joblink_etl_spark.operators import multimodal as M
from joblink_etl_spark.operators import similarity as SIM
from joblink_etl_spark.sources import table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings").cache()


def test_ivf_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    brute = SIM.knn_bruteforce(emb, queries, k=5)
    ivf = SIM.knn_ivf(emb, queries, k=5, nprobe=5, every=20)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.4, f"IVF recall {recall} too low"


def test_minhash_finds_planted_neardups(spark, docs):
    planted = docs.filter((F.col("doc_id") % 4 == 0) & (F.col("doc_id") < 100))
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionAll(
        planted.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat("text", F.lit(" zz end marker")).alias("text"),
        )
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidate_pairs(corpus, min_jaccard=0.5).collect()
    }
    planted_ids = [r["doc_id"] for r in planted.select("doc_id").collect()]
    found = sum((i, i + 10000) in pairs for i in planted_ids)
    # LSH with b=4,r=4 at J≈0.9 should find nearly all planted pairs
    assert found / len(planted_ids) >= 0.9


def test_exact_dedup_flags_only_clones(spark, docs):
    corpus = docs.select("doc_id", "text").unionAll(
        docs.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    out = D.exact_duplicates(corpus)
    dups = {r["doc_id"]: r["canonical_id"] for r in out.filter("is_duplicate").collect()}
    assert set(dups) == {i + 10000 for i in range(0, 500, 50)}
    assert all(v == k - 10000 for k, v in dups.items())


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_simhash_locality(spark, docs):
    base = docs.filter(F.col("doc_id") < 40).select("doc_id", "text")
    mutated = base.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" zz")).alias("text"),
    )
    sh = {r["id"]: r["simhash"] for r in D.simhash(base.unionAll(mutated)).collect()}
    near = [_hamming(sh[i], sh[i + 10000]) for i in range(40) if i in sh]
    far = [_hamming(sh[i], sh[j]) for i in range(0, 40, 7) for j in range(1, 40, 11) if i != j]
    assert sum(near) / len(near) < sum(far) / len(far), "simhash lost locality"


def test_kmeans_codes_recovers_planted_clusters(spark):
    """Three well-separated integer-code blobs; deterministic seeds
    (ids 0/20/40, one per blob) must converge to one cluster per
    blob, invariant to partitioning."""
    from joblink_etl_spark.operators.similarity import kmeans_codes

    rows = [
        (i, [100 * (i // 20) + (i % 7) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, q_codes array<int>")
    out = {r["vec_id"]: r["cluster_id"] for r in kmeans_codes(df, k_every=20, iters=2).collect()}
    assert len(out) == 60
    for i in range(60):
        assert out[i] == out[(i // 20) * 20], i  # same blob → same cluster
    assert len({out[0], out[20], out[40]}) == 3  # blobs stay separate

    again = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_codes(df.repartition(7), k_every=20, iters=2).collect()
    }
    assert again == out


def test_pq_codes_and_adc_search(spark):
    """Two well-separated planted blobs (ids 0-29 vs 30-59): PQ codes
    must map blob-mates to the same codebook entry per subspace, ADC
    must rank same-blob vectors strictly ahead of cross-blob ones,
    and the whole pipeline must be partitioning-invariant."""
    from joblink_etl_spark.operators.similarity import knn_pq, pq_codes

    rows = [
        (i, [100 * (i // 30) + (i % 5) for _ in range(16)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, q_codes array<int>")
    codes = pq_codes(df, n_sub=4, k_every=30, iters=2).collect()
    assert len(codes) == 60 * 4  # one code per (vector, subspace)
    by_vec: dict[int, dict[int, int]] = {}
    for r in codes:
        by_vec.setdefault(r["vec_id"], {})[r["sub"]] = r["code_id"]
    for i in range(60):
        assert by_vec[i] == by_vec[(i // 30) * 30], i  # blob-mates share codes
    assert by_vec[0] != by_vec[30]  # blobs get distinct codebook entries

    queries = df.filter(F.col("vec_id").isin(0, 30))
    nn = knn_pq(df, queries, k=5, n_sub=4, k_every=30, iters=2).collect()
    assert len(nn) == 10
    for r in nn:
        same_blob = (r["query_id"] // 30) == (r["neighbor_id"] // 30)
        assert same_blob, r  # top-5 of 29 blob-mates never crosses blobs
        assert r["neighbor_id"] != r["query_id"]

    again = knn_pq(df.repartition(7), queries, k=5, n_sub=4, k_every=30, iters=2).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, nn))


def test_pq_recall_beats_chance_on_real_embeddings(spark, emb):
    """PQ/ADC and IVF-PQ against exact brute-force cosine on the
    synthetic embeddings: with a 4×~10-entry codebook on near-random
    64-dim data the theoretical ceiling is low, but the ranking must
    still be clearly better than chance (random recall@10 over 500
    vectors ≈ 0.02; the measured deterministic values are 0.11 and
    0.125 — floors set at half that). Everything is integer-exact, so
    these are fixed numbers, not statistics."""
    from joblink_etl_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivfpq,
        knn_pq,
        quantize_embeddings_global,
    )

    codes = quantize_embeddings_global(emb).select("vec_id", "q_codes")
    q = emb.filter(F.col("vec_id") < 20)
    qc = codes.filter(F.col("vec_id") < 20)

    def tops(df):
        d: dict[int, set[int]] = {}
        for r in df.collect():
            d.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return d

    brute = tops(knn_bruteforce(emb, q, k=10))
    pq = tops(knn_pq(codes, qc, k=10, n_sub=4, k_every=50, iters=2, k_cap=100))
    ivfpq = tops(
        knn_ivfpq(codes, qc, k=10, nprobe=3, coarse_every=25, n_sub=4,
                  k_every=50, iters=2, k_cap=100)
    )
    n = 10 * len(brute)
    assert sum(len(pq[i] & brute[i]) for i in brute) / n >= 0.055
    assert sum(len(ivfpq[i] & brute[i]) for i in brute) / n >= 0.055


def test_knn_ivfpq_planted_blobs(spark):
    """IVF-PQ with one coarse cell per planted blob: probing nprobe=1
    must keep every neighbor inside the query's own blob, and the
    whole index must be partitioning-invariant."""
    from joblink_etl_spark.operators.similarity import knn_ivfpq

    rows = [
        (i, [100 * (i // 30) + (i % 5) for _ in range(16)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, q_codes array<int>")
    queries = df.filter(F.col("vec_id").isin(0, 30))
    nn = knn_ivfpq(
        df, queries, k=5, nprobe=1, coarse_every=30, n_sub=4, k_every=30, iters=1
    ).collect()
    assert len(nn) == 10
    for r in nn:
        assert (r["query_id"] // 30) == (r["neighbor_id"] // 30), r
        assert r["neighbor_id"] != r["query_id"]

    again = knn_ivfpq(
        df.repartition(7), queries, k=5, nprobe=1, coarse_every=30, n_sub=4,
        k_every=30, iters=1,
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, nn))


def test_residual_ivfpq_recall_beats_plain_on_clustered_data(spark):
    """The residual win, demonstrated on data shaped like real
    embedding corpora: 3 well-separated blobs (offset 2000·blob) each
    containing the SAME 5 prototype sub-structures. A plain codebook
    must spend its entries across blobs×prototypes = 15 distinct
    subvector values; the residual codebook sees only the 5 shared
    prototypes (the coarse cell removes the blob offset), so the same
    entry budget discriminates within-cell neighbors that plain PQ
    collapses. Everything is integer-exact, so the recalls are fixed
    numbers: residual 0.90 vs plain 0.70 at k_every=13 (floors set
    just under). On ISOTROPIC random data residual does NOT help —
    residuals of random vectors are more spread than the vectors —
    which is why this test plants structure instead of reusing the
    synthetic embeddings table."""
    import numpy as np

    from joblink_etl_spark.operators.similarity import knn_ivfpq

    DIM, PER, NPROTO = 16, 30, 5

    def vec(i):
        blob, p = i // PER, i % NPROTO
        return [2000 * blob + 40 * p + 9 * ((p * (d + 1)) % 7) + (i % 3) for d in range(DIM)]

    rows = [(i, vec(i)) for i in range(3 * PER)]
    df = spark.createDataFrame(rows, "vec_id long, q_codes array<int>")
    qids = [0, 7, 30, 37, 60, 67]
    queries = df.filter(F.col("vec_id").isin(qids))

    V = np.array([r[1] for r in rows], dtype=np.int64)
    gt = {}
    for qi in qids:
        d2 = ((V - V[qi]) ** 2).sum(1)
        order = sorted((int(d), j) for j, d in enumerate(d2) if j != qi)
        gt[qi] = set(j for _, j in order[:10])

    def tops(df_):
        d: dict[int, set[int]] = {}
        for r in df_.collect():
            d.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return d

    common = dict(k=10, nprobe=1, coarse_every=PER, n_sub=4, k_every=13, iters=2)
    plain = tops(knn_ivfpq(df, queries, **common))
    res = tops(knn_ivfpq(df, queries, by_residual=True, **common))
    n = 10 * len(qids)
    plain_recall = sum(len(plain.get(q, set()) & gt[q]) for q in qids) / n
    res_recall = sum(len(res.get(q, set()) & gt[q]) for q in qids) / n
    assert res_recall >= plain_recall, (res_recall, plain_recall)
    assert res_recall >= 0.85, res_recall
    assert plain_recall >= 0.6, plain_recall


def test_repeated_spans_finds_planted_boilerplate(spark):
    """A 10-token paragraph shared by two docs yields one maximal
    span per doc at exactly the planted token coordinates; the
    third doc (no shared 8-gram) contributes nothing."""
    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "unique one two three " + boiler),  # boiler at pos 4..13
        (2, boiler + " tail words here only"),  # boiler at pos 0..9
        (3, "totally different words nothing shared at all here friend"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in D.repeated_spans(df, ngram=8, min_docs=2).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["span_start"], out[1]["span_end"], out[1]["span_tokens"]) == (4, 13, 10)
    assert (out[2]["span_start"], out[2]["span_end"], out[2]["span_tokens"]) == (0, 9, 10)
    # 10-token run of 8-grams = 3 overlapping grams, merged into one span
    assert out[1]["n_grams"] == 3 and out[2]["n_grams"] == 3


def test_exact_dedup_salted_matches_and_bounds_skew(spark, docs):
    """90%-hot-key corpus: the salted path must (a) agree with the
    plain window path bit-for-bit and (b) actually SPLIT the hot
    fingerprint across shuffle partitions instead of pinning one."""
    base = docs.filter(F.col("doc_id") < 100).select("doc_id", "text")
    hot = (
        docs.filter(F.col("doc_id") < 900)
        .select((F.col("doc_id") + 50000).alias("doc_id"))
        .withColumn("text", F.lit("the same boilerplate page"))
    )
    corpus = base.unionAll(hot.select("doc_id", "text"))  # ~90% one key

    cols = ["doc_id", "fingerprint", "canonical_id", "is_duplicate"]
    plain = {tuple(r) for r in D.exact_duplicates(corpus).select(*cols).collect()}
    salted = D.exact_duplicates_salted(corpus, salt_buckets=8)
    assert {tuple(r) for r in salted.select(*cols).collect()} == plain

    # Bounded partitions: salting only matters on the SHUFFLE join
    # path (when the canonical map is small Spark broadcasts it and
    # there is no skew problem to solve), so force the sort-merge
    # plan and keep AQE from re-coalescing; then no post-join
    # partition may hold the whole hot key (900 rows) — salting must
    # cap it near 900/8 + the long tail of cold keys.
    forced = {
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in forced}
    for k, v in forced.items():
        spark.conf.set(k, v)
    try:
        per_part = (
            D.exact_duplicates_salted(corpus, salt_buckets=8)
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert max(r["count"] for r in per_part) < 450, per_part


def test_multimodal_decode_and_features(spark, docs):
    df = M.attach_fake_payload(docs.filter(F.col("doc_id") < 20).select("doc_id", "text"))
    decoded = M.decode_images(df)
    rows = decoded.select("doc_id", "width", "height", "channels", "format").collect()
    assert len(rows) == 20
    assert all(16 <= r["width"] < 80 and r["channels"] == 3 for r in rows)
    # determinism: same payload → same decode
    again = M.decode_images(df).select("doc_id", "width").collect()
    assert {r["doc_id"]: r["width"] for r in rows} == {r["doc_id"]: r["width"] for r in again}

    feats = df.select("doc_id", M.image_features("content").alias("f")).collect()
    assert all(len(r["f"]) == M.N_FEATURES for r in feats)
    assert all(0.0 <= v < 1.0 for r in feats for v in r["f"])


def _tiny_png(w=2, h=1):
    """Fully valid PNG (signature, IHDR, IDAT, IEND) via stdlib zlib."""
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_multimodal_real_backend_decodes(spark):
    import struct

    jpeg = (
        b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 9, 7) + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"  # SOF: height, width
        + b"\xff\xd9"
    )
    gif = b"GIF89a" + struct.pack("<HH", 11, 5) + b"\x00" * 6
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 13, -6) + b"\x00" * 12
    blobs = [
        (1, bytearray(_tiny_png(3, 2)), 3, 2, 3, "png"),
        (2, bytearray(jpeg), 7, 9, 3, "jpeg"),
        (3, bytearray(gif), 11, 5, 3, "gif"),
        (4, bytearray(bmp), 13, 6, 3, "bmp"),  # negative height = top-down BMP
        (5, bytearray(b"P6 4 3 255\n" + b"\x00" * 36), 4, 3, 3, "ppm"),
        (6, bytearray(b"P5 8 2 255\n" + b"\x00" * 16), 8, 2, 1, "pgm"),
        (7, bytearray(b"not an image at all"), 0, 0, 0, "unknown"),
        (8, bytearray(b""), 0, 0, 0, "empty"),
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b, *_ in blobs], "doc_id int, content binary"
    )
    got = {
        r["doc_id"]: r
        for r in M.decode_images(df, backend="real").collect()
    }
    for i, _, w, h, c, fmt in blobs:
        r = got[i]
        assert (r["width"], r["height"], r["channels"], r["format"]) == (w, h, c, fmt), fmt

    with pytest.raises(ValueError, match="backend"):
        M.decode_images(df, backend="bogus")


def test_resize_and_frame_sampling(spark, docs):
    df = M.decode_images(
        M.attach_fake_payload(docs.limit(10).select("doc_id", "text"))
    )
    resized = M.resize_meta(df, max_dim=32).collect()
    assert all(max(r["out_width"], r["out_height"]) <= 32 for r in resized)

    frames = M.sample_frames(
        M.attach_fake_payload(docs.limit(5).select("doc_id", "text")), every_n=4
    )
    rows = frames.select("doc_id", "n_frames", "frame_index").collect()
    assert all(r["frame_index"] % 4 == 0 for r in rows)
    assert all(r["frame_index"] < r["n_frames"] for r in rows)


def _tiny_wav(samples, rate=8000, channels=1, extra_chunk=False):
    """Fully valid RIFF/WAVE container around 16-bit PCM samples."""
    import struct

    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = b""
    if extra_chunk:  # chunk-walk must skip unrelated chunks (word-aligned)
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_audio_real_backend_decodes(spark):
    import math

    tone = [1000, -1000] * 800  # 1600 samples, constant magnitude
    quiet = [0] * 400
    blobs = [
        (1, _tiny_wav(tone), 8000, 1, 1600, 200, 1000, "wav"),
        (2, _tiny_wav(quiet, rate=16000, extra_chunk=True), 16000, 1, 400, 25, 0, "wav"),
        (3, b"not audio", 0, 0, 0, 0, 0, "unknown"),
        (4, b"", 0, 0, 0, 0, 0, "empty"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b, *_ in blobs], "doc_id int, content binary"
    )
    got = {r["doc_id"]: r for r in M.decode_audio(df, backend="real").collect()}
    for i, _, sr, ch, n, dur, rms, fmt in blobs:
        r = got[i]
        assert (
            r["sample_rate"], r["audio_channels"], r["n_samples"],
            r["duration_ms"], r["rms_q"], r["audio_format"],
        ) == (sr, ch, n, dur, rms, fmt), fmt
    # integer-exact RMS: mixed magnitudes, verified against isqrt
    mixed = [300, -400, 500, 0]
    want = math.isqrt(sum(s * s for s in mixed) // len(mixed))
    one = spark.createDataFrame(
        [(9, bytearray(_tiny_wav(mixed)))], "doc_id int, content binary"
    )
    assert M.decode_audio(one, backend="real").first()["rms_q"] == want

    with pytest.raises(ValueError, match="backend"):
        M.decode_audio(df, backend="bogus")


def test_audio_fake_backend_and_windows(spark, docs):
    df = M.decode_audio(
        M.attach_fake_payload(docs.limit(20).select("doc_id", "text"))
    )
    rows = df.collect()
    assert all(r["sample_rate"] in (8000, 16000, 24000) for r in rows)
    assert all(r["duration_ms"] == r["n_samples"] * 1000 // r["sample_rate"] for r in rows)

    win = M.sample_audio_windows(df, window_ms=100).collect()
    by_doc = {}
    for r in win:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rs in by_doc.values():
        dur = rs[0]["duration_ms"]
        assert len(rs) == max(-(-dur // 100), 1)
        assert all(r["win_end_ms"] <= dur or dur == 0 for r in rs)
        assert sorted(r["window_index"] for r in rs) == list(range(len(rs)))


# --- curation layer: connected components, as-of join, sampling ------


def test_connected_components_two_clusters(spark):
    edges = spark.createDataFrame(
        # chain 1-2-3-4 plus isolated pair 10-11; edge direction mixed
        [(2, 1), (2, 3), (4, 3), (11, 10)], ["id_a", "id_b"]
    )
    from joblink_etl_spark.operators.dedup import connected_components

    got = {
        r["node"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_resolve_duplicates_canonical_flag(spark):
    edges = spark.createDataFrame([(5, 9), (9, 7)], ["id_a", "id_b"])
    from joblink_etl_spark.operators.dedup import resolve_duplicates

    rows = {r["doc_id"]: r for r in resolve_duplicates(edges).collect()}
    assert all(rows[d]["cluster_id"] == 5 for d in (5, 7, 9))
    assert rows[5]["is_canonical"] and not rows[7]["is_canonical"]


def test_asof_join_backward_inclusive(spark):
    import datetime as dt

    from joblink_etl_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(10), "a"), (1, t(20), "b"), (2, t(5), "c")],
        ["user_id", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, t(10), 100), (1, t(15), 101), (2, t(6), 102)],
        ["user_id", "ts", "ref"],
    )
    out = {
        (r["user_id"], r["tag"]): (r["asof_ref"], r["asof_ts"])
        for r in asof_join(left, right, on="user_id").collect()
    }
    # equal-ts right row matches (inclusive)
    assert out[(1, "a")] == (100, t(10))
    # latest at-or-before wins
    assert out[(1, "b")] == (101, t(15))
    # right row strictly after -> no match
    assert out[(2, "c")] == (None, None)


def test_stratified_sample_deterministic(spark, sf_dir):
    from joblink_etl_spark.operators.sampling import stratified_sample
    from joblink_etl_spark.sources import table

    docs = table(spark, sf_dir, "documents")
    s1 = stratified_sample(docs, "lang", {"en": 0.25}, default_fraction=0.5)
    a = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(7), "lang", {"en": 0.25}, default_fraction=0.5
        ).select("doc_id").collect()
    )
    assert a == b  # partitioning-independent
    n_en = docs.filter("lang = 'en'").count()
    kept_en = s1.filter("lang = 'en'").count()
    assert 0 < kept_en < n_en  # roughly a quarter, definitely a strict subset
    # zero and one fractions are exact
    assert stratified_sample(docs, "lang", {"en": 0.0}, default_fraction=0.0).count() == 0


def test_repetition_stats_edges(spark):
    from joblink_etl_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b"), (2, "x y z x y z x y"), (3, "")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["n_ngrams"] == 0 and rows[1]["repetition_ratio"] == 0.0
    # 6 trigrams, 3 distinct -> half are repeats
    assert rows[2]["n_ngrams"] == 6 and rows[2]["n_distinct_ngrams"] == 3
    assert rows[2]["repetition_ratio"] == 0.5
    assert rows[3]["n_ngrams"] == 0 and rows[3]["repetition_ratio"] == 0.0


def test_pack_shards_budget_boundaries(spark):
    from joblink_etl_spark.operators.sampling import pack_shards

    # single bucket: weights 6,6,6 with budget 10 -> start offsets
    # 0,6,12 -> shards 0,0,1 (second doc straddles, standard contract)
    df = spark.createDataFrame([(0, 6), (8, 6), (16, 6)], ["doc_id", "n_chars"])
    out = {r["doc_id"]: (r["offset"], r["shard_id"])
           for r in pack_shards(df, budget=10, n_buckets=8).collect()}
    assert out == {0: (0, 0), 8: (6, 0), 16: (12, 1)}


def test_blocked_near_dups_full_recall_on_clones(spark, sf_dir):
    from joblink_etl_spark.operators.similarity import cosine_near_dup_pairs_blocked
    from joblink_etl_spark.sources import table

    emb = table(spark, sf_dir, "embeddings")
    clones = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    pairs = cosine_near_dup_pairs_blocked(emb.unionAll(clones), min_cosine=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {
        (r["vec_id"], r["vec_id"] + 10000)
        for r in emb.filter(F.col("vec_id") % 10 == 0).select("vec_id").collect()
    }
    # identical vectors share an argmax cell, so every planted clone
    # pair is found despite the blocked (non-all-pairs) join
    assert planted <= got


# --- TF-IDF sparse cosine (operators/tfidf.py) -------------------------


def _tfidf_corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),  # exact clone of 1
        (3, "alpha beta gamma delta zeta"),  # near clone of 1
        (4, "omega psi chi phi upsilon"),  # disjoint
        (5, "common common common common"),  # only the ubiquitous term
        (6, "common alpha omega unique"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_clone_pair_is_unit_cosine(spark):
    from joblink_etl_spark.operators import tfidf as TI

    docs = _tfidf_corpus(spark)
    pairs = TI.tfidf_cosine_pairs(docs, n_docs=6, min_sim=0.6, max_df_ratio=(1, 1))
    got = {(r.id_a, r.id_b): r.sim for r in pairs.collect()}
    assert got[(1, 2)] == 1.0  # exact clones
    # near clones share 4/5 terms; idf up-weights the two differing
    # rare terms, so the cosine sits well below the naive 0.8
    assert 0.6 <= got[(1, 3)] < 0.9
    assert not any({a, b} & {4} and {a, b} & {1, 2, 3} for a, b in got)


def test_tfidf_df_prune_drops_ubiquitous_terms(spark):
    from joblink_etl_spark.operators import tfidf as TI

    docs = spark.createDataFrame(
        [(i, "everywhere rare" + str(i)) for i in range(10)], ["doc_id", "text"]
    )
    # 'everywhere' has df=10/10; prune at df/N > 1/2 must drop it,
    # and each rareN term survives with tf=1
    postings = TI.tfidf_postings(docs, n_docs=10, max_df_ratio=(1, 2))
    toks = {r.token for r in postings.collect()}
    assert "everywhere" not in toks
    assert len(toks) == 10


def test_tfidf_top_terms_ranks_rare_first(spark):
    from joblink_etl_spark.operators import tfidf as TI

    docs = _tfidf_corpus(spark)
    top = TI.tfidf_top_terms(docs, n_docs=6, k=2, max_df_ratio=(1, 1))
    by_doc = {}
    for r in top.collect():
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.token))
    # doc 6: 'unique' (df=1) must outrank 'common' (df=2) and 'alpha' (df=4)
    assert sorted(by_doc[6])[0][1] == "unique"
    assert all(len(v) <= 2 for v in by_doc.values())


def test_lsh_near_dups_recall_vs_allpairs(spark, emb):
    """RHP-LSH candidates must recover nearly all true ≥0.95 pairs
    (clone corpus: every vec_id%10==0 vector duplicated)."""
    clones = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionAll(clones)
    truth = {
        (r["id_a"], r["id_b"])
        for r in SIM.cosine_near_dup_pairs(corpus, min_cosine=0.95).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in SIM.cosine_near_dup_pairs_lsh(corpus, min_cosine=0.95).collect()
    }
    assert got <= truth  # exact verify: no false positives, ever
    assert len(got & truth) / len(truth) >= 0.9, (len(got), len(truth))


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """approx_percentile is the 100 TB path (t-digest-style sketch,
    one pass, mergeable); pin it to the exact interpolated percentile
    within the value range tolerance."""
    from joblink_etl_spark.plans.events_q import value_percentiles

    exact = {r["event_type"]: (r["p50"], r["p95"]) for r in
             value_percentiles(spark, sf_dir).collect()}
    approx = {
        r["event_type"]: (r["a50"], r["a95"])
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("a50"),
            F.percentile_approx("value", 0.95, 10000).alias("a95"),
        )
        .collect()
    }
    for et, (p50, p95) in exact.items():
        a50, a95 = approx[et]
        assert abs(a50 - p50) / max(abs(p50), 1e-9) < 0.05
        assert abs(a95 - p95) / max(abs(p95), 1e-9) < 0.05


def test_incremental_near_dups_finds_sources(spark, docs):
    """Each mutated clone in the new batch must match its source doc
    in the index, and the index is never paired with itself."""
    base = docs.filter(F.col("doc_id") < 80).select("doc_id", "text")
    new = base.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" zz end marker")).alias("text"),
    )
    got = {
        (r["new_id"], r["index_id"]): r["jaccard"]
        for r in D.incremental_near_dups(new, base, min_jaccard=0.5).collect()
    }
    planted = [i for i in range(0, 80, 4)]
    found = sum((i + 10000, i) in got for i in planted)
    assert found / len(planted) >= 0.9
    assert all(nid >= 10000 for nid, _ in got)  # new side only on the left


def test_bm25_ranks_relevant_and_normalizes_length(spark):
    from joblink_etl_spark.operators.tfidf import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "quantum flux capacitor design notes"),
            (2, "quantum flux capacitor design notes with many extra words "
                "padding padding padding padding padding padding padding"),
            (3, "unrelated cooking recipe with garlic and butter"),
            (4, "slightly related design notes"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(100, "quantum flux capacitor")], "doc_id long, text string")
    out = bm25_rank(docs, q, k=4, max_df_ratio=(1, 1)).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # both quantum docs beat the others; the SHORTER one wins (length
    # normalization: same tf, smaller dl)
    assert ranked[0] == 1 and ranked[1] == 2, ranked
    assert 3 not in ranked[:2]
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["score_q"] > by_id[2]["score_q"]
    assert by_id[1]["shared_terms"] == 3


def test_bm25_unpinned_path_matches_pinned(spark):
    """pin_tf=False (the lineage-recoverable spelling recommended for
    the 100 TB design point — tfidf.py docstring) must produce rows
    IDENTICAL to the default pinned path: the pin is purely a
    materialization barrier, never a semantics change. Small-SF parity
    on the real documents table (ADVICE r11 — the opt-out path had no
    test)."""
    from joblink_etl_spark.operators.tfidf import bm25_rank

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    q = docs.filter(F.col("doc_id") % 97 == 0).limit(3)
    cols = ["query_id", "doc_id", "rank", "score_q", "shared_terms"]
    pinned = sorted(
        tuple(r) for r in bm25_rank(docs, q, k=5).select(*cols).collect()
    )
    unpinned = sorted(
        tuple(r) for r in bm25_rank(docs, q, k=5, pin_tf=False).select(*cols).collect()
    )
    assert pinned == unpinned
    assert len(pinned) > 0


def test_rrf_fusion_prefers_cross_system_agreement(spark):
    from joblink_etl_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, doc_id long, rank int"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([lex, dense], k=4).collect()}
    # doc 11 appears in BOTH lists -> beats each system's solo #1
    assert out[11]["rank"] == 1
    assert set(out) == {10, 11, 12, 13}
    # doc 10 (lex #1 only) beats doc 13 (dense #2 only)
    assert out[10]["rrf_score"] > out[13]["rrf_score"]
    # deterministic under input repartitioning
    again = rrf_fuse([lex.repartition(3), dense.repartition(2)], k=4).collect()
    assert sorted(map(tuple, again)) == sorted(
        tuple(out[d]) for d in sorted(out)
    )


def test_robust_outliers_resist_extremes(spark, tmp_path):
    """MAD-based flags: one planted extreme value is flagged without
    dragging the median/MAD the way a mean/stddev gate would."""
    from joblink_etl_spark.plans.events_q import robust_outliers

    rows = [(i, "2024-01-01 12:00:00", 1, "t", float(v)) for i, v in enumerate(
        [10, 11, 12, 13, 14, 15, 16, 17, 18, 1000])]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "events.parquet")
    df.write.parquet(src)
    out = robust_outliers(spark, str(tmp_path)).collect()
    r = out[0]
    assert r["n"] == 10 and r["n_outliers"] == 1
    assert 13 <= r["median"] <= 15  # the 1000 didn't move it
    assert r["mad"] <= 5


def _tiny_mp4(timescale=1000, duration=5000, version=0, pad_box=False):
    import struct

    def box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body

    if version == 0:
        mvhd = box(b"mvhd", b"\x00" * 4 + b"\x00" * 8 + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    else:
        mvhd = box(b"mvhd", b"\x01" + b"\x00" * 3 + b"\x00" * 16 + struct.pack(">IQ", timescale, duration) + b"\x00" * 80)
    moov = box(b"moov", mvhd)
    pre = box(b"free", b"\x00" * 12) if pad_box else b""
    return box(b"ftyp", b"isom" + b"\x00" * 8) + pre + moov


def test_video_real_backend_and_audio_rms_series(spark):
    from joblink_etl_spark.operators.multimodal import (
        audio_window_rms,
        decode_video,
        parse_mp4_header,
    )

    assert parse_mp4_header(_tiny_mp4()) == ("isom", 1000, 5000, 5000)
    assert parse_mp4_header(_tiny_mp4(90000, 450000, version=1, pad_box=True)) == (
        "isom", 90000, 450000, 5000)
    assert parse_mp4_header(b"definitely not an mp4") is None

    blobs = [
        (1, _tiny_mp4(600, 1800), "isom", 600, 1800, 3000),
        (2, b"garbage", "unknown", 0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b, *_ in blobs], "doc_id int, content binary"
    )
    got = {r["doc_id"]: r for r in decode_video(df, backend="real").collect()}
    for i, _, brand, ts, du, ms in blobs:
        r = got[i]
        assert (r["video_brand"], r["timescale"], r["duration_units"],
                r["video_duration_ms"]) == (brand, ts, du, ms)

    # audio loudness envelope: three 1-second windows of known RMS
    samples = [500] * 8000 + [1000] * 8000 + [2000] * 4000
    wav = _tiny_wav(samples, rate=8000, channels=1)
    adf = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"junk"))], "doc_id int, content binary"
    )
    out = {r["doc_id"]: list(r["rms_series"]) for r in audio_window_rms(adf).collect()}
    assert out[1] == [500, 1000, 2000]
    assert out[2] == []


def test_time_weighted_avg_exact_intervals(spark, tmp_path):
    from joblink_etl_spark.plans.events_q import time_weighted_avg

    # value 10 holds 30s, value 20 holds 10s, trailing value ignored
    rows = [
        (1, "2024-01-01 00:00:00", 7, "t", 10.0),
        (2, "2024-01-01 00:00:30", 7, "t", 20.0),
        (3, "2024-01-01 00:00:40", 7, "t", 99.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(str(tmp_path / "events.parquet"))
    r = time_weighted_avg(spark, str(tmp_path)).first()
    assert r["n_intervals"] == 2
    assert r["twap"] == 12.5  # (10*30 + 20*10) / 40


def test_embedding_moments_match_numpy(spark, sf_dir):
    """The exact integer sufficient statistics reproduce numpy's
    covariance bit-for-bit when assembled (cov = (S - n·mean·meanᵀ)
    over the same int codes)."""
    import numpy as np

    from joblink_etl_spark.operators.similarity import (
        embedding_second_moments,
        quantize_embeddings_global,
    )
    from joblink_etl_spark.sources import table

    emb = table(spark, sf_dir, "embeddings")
    codes = np.array(
        [r["q_codes"] for r in quantize_embeddings_global(emb).select("q_codes").collect()],
        dtype=np.int64,
    )
    rows = embedding_second_moments(emb).collect()
    n = rows[0]["n"]
    assert n == codes.shape[0]
    S = np.zeros((codes.shape[1], codes.shape[1]), dtype=np.int64)
    for r in rows:
        S[r["i"], r["j"]] = r["sum_prod"]
        S[r["j"], r["i"]] = r["sum_prod"]
    assert np.array_equal(S, codes.T @ codes)
    sums = {r["i"]: r["sum_i"] for r in rows if r["i"] == r["j"]}
    assert all(sums[i] == codes[:, i].sum() for i in sums)


def test_dedup_method_recall_planted_truth(spark):
    """The self-evaluation must report perfect recall for the exact
    methods on their subsets and hit/found/truth counts that are
    internally consistent."""
    from joblink_etl_spark.plans.ext_q import dedup_method_recall_q

    rows = {r["method"]: r for r in dedup_method_recall_q(spark, "/root/testdata/sf0.001").collect()}
    spark.catalog.clearCache()
    assert set(rows) == {"minhash_lsh", "prefix_jaccard", "ngram_jaccard"}
    for r in rows.values():
        assert 0 <= r["n_hit"] <= min(r["n_truth"], r["n_found"])
        assert r["recall"] == r["n_hit"] / r["n_truth"]
    # exact (non-probabilistic) methods must find every planted pair
    assert rows["ngram_jaccard"]["recall"] == 1.0
    assert rows["prefix_jaccard"]["recall"] == 1.0


def test_ann_method_recall_consistency(spark):
    """recall = hit/truth; hits bounded by both sets; both indexes
    return a full top-k per query."""
    from joblink_etl_spark.plans.ext_q import ann_method_recall_q

    rows = {r["method"]: r for r in ann_method_recall_q(spark, "/root/testdata/sf0.001").collect()}
    spark.catalog.clearCache()
    assert set(rows) == {"knn_ivf", "knn_ivfpq"}
    for r in rows.values():
        assert 0 <= r["n_hit"] <= min(r["n_truth"], r["n_found"])
        assert r["recall"] == r["n_hit"] / r["n_truth"]
        assert r["n_truth"] == 50  # 5 queries x k=10 exact neighbors
