"""View-maintenance and join-infrastructure queries: incremental
join-view deltas, CDC changelog apply, and the Bloom-filtered
semi-join. Each oracle is the FROM-SCRATCH spelling of the result
the incremental/filtered operator maintains, so a green driver hash
proves the maintenance algebra (or filter transparency), not just
row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import bloomjoin as BJ
from ..operators import cdc as CDC
from ..operators import incremental as INC
from ..sources import table

# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance: V = customers ⋈ orders; both
# sides receive an insert batch (custkey % 7 == 0 / orderkey % 10 ==
# 0 are "new"). The operator computes Δ V = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB;
# the oracle derives the SAME delta from the from-scratch new join —
# a green hash proves the delta algebra misses nothing and double-
# counts nothing.
# ---------------------------------------------------------------------------


def join_view_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), "o_orderkey", "o_totalprice"
    )
    a_old = cust.filter(F.col("k") % 7 != 0)
    d_a = cust.filter(F.col("k") % 7 == 0)
    b_old = orders.filter(F.col("o_orderkey") % 10 != 0)
    d_b = orders.filter(F.col("o_orderkey") % 10 == 0)
    return INC.join_view_delta(a_old, d_a, b_old, d_b, "k")


JOIN_VIEW_DELTA_SQL = """
SELECT c.c_custkey AS k, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey % 7 = 0 OR o.o_orderkey % 10 = 0
"""


# ---------------------------------------------------------------------------
# CDC apply: a changelog synthesized from lineitem (upserts, deletes,
# and brand-new keys with unique sequence numbers) folded onto the
# part snapshot. The oracle replays last-writer-wins + apply from
# scratch.
# ---------------------------------------------------------------------------


def cdc_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")
    li = table(spark, sf_dir, "lineitem")
    changelog = li.select(
        F.when(F.col("l_linenumber") == 7, F.col("l_partkey") + 500000)
        .otherwise(F.col("l_partkey"))
        .alias("p_partkey"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("seq"),
        F.when(F.col("l_orderkey") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("cdc-"), F.col("l_orderkey").cast("string")).alias("p_name"),
        F.col("l_extendedprice").alias("p_retailprice"),
    )
    return CDC.apply_changelog(base, changelog, "p_partkey")


CDC_APPLY_SQL = """
WITH chg AS (
  SELECT CASE WHEN l_linenumber = 7 THEN l_partkey + 500000 ELSE l_partkey END AS p_partkey,
         l_orderkey * 8 + l_linenumber AS seq,
         CASE WHEN l_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
         'cdc-' || l_orderkey::VARCHAR AS p_name,
         l_extendedprice AS p_retailprice
  FROM lineitem
), last AS (
  SELECT p_partkey, op, p_name, p_retailprice FROM (
    SELECT *, row_number() OVER (PARTITION BY p_partkey ORDER BY seq DESC, op DESC) AS rn
    FROM chg
  ) WHERE rn = 1
)
SELECT coalesce(b.p_partkey, c.p_partkey) AS p_partkey,
       CASE WHEN c.op IS NULL THEN b.p_name ELSE c.p_name END AS p_name,
       CASE WHEN c.op IS NULL THEN b.p_retailprice ELSE c.p_retailprice END AS p_retailprice
FROM part b FULL OUTER JOIN last c ON b.p_partkey = c.p_partkey
WHERE c.op IS NULL OR c.op <> 'D'
"""


# ---------------------------------------------------------------------------
# Bloom-filtered semi-join: lineitem ⋉ (selective part subset). The
# oracle is the PLAIN semi-join — a green hash proves the Bloom
# prefilter is transparent (no false negatives, exact verify on the
# admitted rows).
# ---------------------------------------------------------------------------


def bloom_semi_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    dim = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return BJ.bloom_semi_join(fact, dim, "l_partkey", "p_partkey")


BLOOM_SEMI_JOIN_SQL = """
SELECT l_orderkey, l_partkey, l_quantity
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')
"""


# ---------------------------------------------------------------------------
# Join-size estimation from CMS sketches: |orders ⋈ BUILDING
# customers| on custkey, estimated from two fixed-size counter
# sketches (the inputs never join), with the exact size alongside so
# the driver hash pins both the estimator arithmetic and its
# over-count-only property.
# ---------------------------------------------------------------------------


def join_cardinality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_build, cms_join_size

    orders = table(spark, sf_dir, "orders").select("o_custkey")
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    sk_o = cms_build(orders, "o_custkey")
    sk_c = cms_build(cust, "c_custkey")
    est = cms_join_size(sk_o, sk_c)
    exact = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("exact_join_size"))
    return est.crossJoin(exact).select(
        "est_join_size",
        "exact_join_size",
        (F.col("est_join_size") - F.col("exact_join_size")).alias("overcount"),
    )


JOIN_CARDINALITY_SQL = """
WITH seeds AS (SELECT unnest(range(0, 4)) AS seed),
ska AS (
  SELECT seed,
         ('0x' || substr(md5('cms' || seed || ':' || o_custkey::VARCHAR), 1, 15))::BIGINT % 1024 AS pos,
         count(*) AS cnt
  FROM orders, seeds GROUP BY seed, pos
), skb AS (
  SELECT seed,
         ('0x' || substr(md5('cms' || seed || ':' || c_custkey::VARCHAR), 1, 15))::BIGINT % 1024 AS pos,
         count(*) AS cnt
  FROM customer, seeds WHERE c_mktsegment = 'BUILDING' GROUP BY seed, pos
), ip AS (
  SELECT a.seed, sum(a.cnt * b.cnt) AS ip
  FROM ska a JOIN skb b ON a.seed = b.seed AND a.pos = b.pos
  GROUP BY a.seed
), est AS (SELECT min(ip)::BIGINT AS est_join_size FROM ip),
exact AS (
  SELECT count(*)::BIGINT AS exact_join_size
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment = 'BUILDING'
)
SELECT est_join_size, exact_join_size,
       (est_join_size - exact_join_size)::BIGINT AS overcount
FROM est, exact
"""
