"""North-star extension queries: text analytics, dedup (exact /
MinHash-LSH / SimHash / n-gram Jaccard), and embedding similarity —
each with a DuckDB oracle that replicates the md5-derived hashing
bit-for-bit, so the probabilistic sketches are verified exactly, not
just row-counted.

Near-duplicate corpora are synthesized identically in both engines
(clones / mutated clones unioned onto the base tables) so the dedup
operators have guaranteed positives to find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import similarity as SIM
from ..operators import textstats as TS
from ..sources import table

# ---------------------------------------------------------------------------
# text_stats — tokenization, quality, language-ID, fingerprint.
# ---------------------------------------------------------------------------


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return TS.add_text_stats(docs.select("doc_id", "text")).drop("text")


_TOKS = "CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[] ELSE string_split_regex(trim(lower(text)), '\\s+') END"


def _hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TS.LANG_STOPWORDS[lang])
    return f"len(list_filter(toks, t -> list_contains([{words}], t)))"


TEXT_STATS_SQL = f"""
WITH tok AS (
  SELECT doc_id, text, {_TOKS} AS toks FROM documents
), st AS (
  SELECT doc_id, text, toks,
    len(toks) AS n_tokens,
    CASE WHEN len(text) > 0
         THEN len(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g'))::DOUBLE / len(text)
         ELSE 0.0 END AS pr,
    CASE WHEN len(toks) > 0
         THEN {_hits("en")}::DOUBLE / len(toks) ELSE 0.0 END AS sr,
    {_hits("en")} AS h_en, {_hits("es")} AS h_es, {_hits("fr")} AS h_fr,
    {_hits("de")} AS h_de, {_hits("zh")} AS h_zh
  FROM tok
)
SELECT doc_id,
  n_tokens,
  len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpe_tokens,
  round(CASE WHEN n_tokens > 0
        THEN list_sum(list_transform(toks, t -> len(t)))::DOUBLE / n_tokens
        ELSE 0.0 END, 4) AS avg_token_len,
  round(pr, 4) AS punct_ratio,
  round(sr, 4) AS stopword_ratio,
  round(least(0.4 * least(n_tokens / 100.0, 1.0) + 0.3 * (1.0 - pr)
              + 0.3 * least(sr * 4.0, 1.0), 1.0), 4) AS quality,
  CASE
    WHEN h_en > 0 AND h_en >= h_es AND h_en >= h_fr AND h_en >= h_de AND h_en >= h_zh THEN 'en'
    WHEN h_es > 0 AND h_es >= h_en AND h_es >= h_fr AND h_es >= h_de AND h_es >= h_zh THEN 'es'
    WHEN h_fr > 0 AND h_fr >= h_en AND h_fr >= h_es AND h_fr >= h_de AND h_fr >= h_zh THEN 'fr'
    WHEN h_de > 0 AND h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
    WHEN h_zh > 0 AND h_zh >= h_en AND h_zh >= h_es AND h_zh >= h_fr AND h_zh >= h_de THEN 'zh'
    ELSE 'und'
  END AS lang_guess,
  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM st
"""

# ---------------------------------------------------------------------------
# exact dedup — md5-fingerprint groupBy over a corpus with clones.
# ---------------------------------------------------------------------------


def _docs_with_clones(docs: DataFrame) -> DataFrame:
    base = docs.select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), F.col("text")
    )
    return base.unionAll(clones)


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_clones(table(spark, sf_dir, "documents"))
    return D.exact_duplicates(docs).select(
        "doc_id", "fingerprint", "canonical_id", "is_duplicate"
    )


EXACT_DEDUP_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
       min(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS canonical_id,
       doc_id <> min(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS is_duplicate
FROM corpus
"""

# ---------------------------------------------------------------------------
# MinHash-LSH near-dup pairs — corpus with mutated clones; the oracle
# replays signature/banding/bucketing/jaccard from the same md5 hashes.
# ---------------------------------------------------------------------------


def _docs_with_neardups(docs: DataFrame) -> DataFrame:
    base = docs.select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz end marker")).alias("text"),
    )
    return base.unionAll(mutated)


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_neardups(table(spark, sf_dir, "documents"))
    return D.minhash_candidate_pairs(docs, min_jaccard=0.5)


MINHASH_PAIRS_SQL = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, text || ' zz end marker' FROM documents WHERE doc_id % 4 = 0
), tok AS (
  SELECT id, {_TOKS} AS toks FROM corpus
), sh AS (
  SELECT id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                       i -> array_to_string(toks[i:i+2], ' '))) AS shingles
  FROM tok
), sig AS (
  SELECT id, shingles,
         list_transform(range(0, {D.NUM_HASHES}),
           i -> list_aggregate(list_transform(shingles,
                  s -> ('0x' || substr(md5(i::VARCHAR || ':' || s), 1, 15))::BIGINT), 'min')) AS sig
  FROM sh WHERE len(shingles) > 0
), bands AS (
  SELECT id, u.b AS band,
         md5(array_to_string(list_transform(sig[u.b*{D.ROWS_PER_BAND}+1 : u.b*{D.ROWS_PER_BAND}+{D.ROWS_PER_BAND}],
             v -> v::VARCHAR), ',')) AS bucket
  FROM sig, (SELECT unnest(range(0, {D.BANDS})) AS b) u
), cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
)
SELECT id_a, id_b,
       round(CASE WHEN len(list_distinct(a.shingles || b.shingles)) > 0
             THEN len(list_intersect(a.shingles, b.shingles))::DOUBLE
                  / len(list_distinct(a.shingles || b.shingles))
             ELSE 0.0 END, 4) AS jaccard
FROM cand
JOIN sh a ON a.id = cand.id_a
JOIN sh b ON b.id = cand.id_b
WHERE CASE WHEN len(list_distinct(a.shingles || b.shingles)) > 0
      THEN len(list_intersect(a.shingles, b.shingles))::DOUBLE
           / len(list_distinct(a.shingles || b.shingles))
      ELSE 0.0 END >= 0.5
"""

# ---------------------------------------------------------------------------
# n-gram Jaccard exact all-pairs (verification baseline, small subset).
# ---------------------------------------------------------------------------


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_neardups(table(spark, sf_dir, "documents"))
    subset = docs.filter((F.col("doc_id") % 10000) < 60)
    return D.ngram_jaccard_pairs(subset, min_jaccard=0.3)


NGRAM_JACCARD_SQL = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id + 10000, text || ' zz end marker' FROM documents
  WHERE doc_id % 4 = 0 AND doc_id < 60
), tok AS (
  SELECT id, {_TOKS} AS toks FROM corpus
), sh AS (
  SELECT id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM tok
  WHERE len(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
            i -> array_to_string(toks[i:i+2], ' ')))) > 0
)
SELECT l.id AS id_a, r.id AS id_b,
       round(len(list_intersect(l.sh, r.sh))::DOUBLE
             / len(list_distinct(l.sh || r.sh)), 4) AS jaccard
FROM sh l JOIN sh r ON l.id < r.id
WHERE round(len(list_intersect(l.sh, r.sh))::DOUBLE
            / len(list_distinct(l.sh || r.sh)), 4) >= 0.3
"""

# ---------------------------------------------------------------------------
# SimHash signatures.
# ---------------------------------------------------------------------------


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.simhash(docs).withColumnRenamed("id", "doc_id")


SIMHASH_DOCS_SQL = f"""
WITH tok AS (
  SELECT id, unnest(list_distinct(toks)) AS tok FROM (
    SELECT doc_id AS id, {_TOKS} AS toks FROM documents
  )
), h AS (
  SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok
), bits AS (
  SELECT id, u.bit,
         CASE WHEN (h >> u.bit) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM h, (SELECT unnest(range({D.SIMHASH_BITS})) AS bit) u
), votes AS (
  SELECT id, bit, sum(vote) AS v FROM bits GROUP BY id, bit
)
SELECT id AS doc_id,
       sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM votes GROUP BY id
"""

# ---------------------------------------------------------------------------
# Embedding similarity: brute-force cosine top-k + near-dup pairs.
# ---------------------------------------------------------------------------


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return SIM.knn_bruteforce(emb, queries, k=10)


KNN_BRUTEFORCE_SQL = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), q AS (
  SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e, e)) > 0
              THEN list_dot_product(qv, e)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e, e)))
              ELSE 0.0 END AS score
  FROM v CROSS JOIN q
  WHERE q.query_id <> v.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 10
"""


def cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    clones = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    return SIM.cosine_near_dup_pairs(emb.unionAll(clones), min_cosine=0.95)


COSINE_NEAR_DUPS_SQL = """
WITH corpus AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, embedding::DOUBLE[] FROM embeddings WHERE vec_id % 10 = 0
), scored AS (
  SELECT l.id AS id_a, r.id AS id_b,
         CASE WHEN sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v)) > 0
              THEN list_dot_product(l.v, r.v)
                   / (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v)))
              ELSE 0.0 END AS score
  FROM corpus l JOIN corpus r ON l.id < r.id
)
SELECT id_a, id_b, score FROM scored WHERE score >= 0.95
"""
