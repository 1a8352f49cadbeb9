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


# ---------------------------------------------------------------------------
# Incremental ANN index add: scale + coarse cells + PQ codebooks are
# trained on the BASE embeddings only (frozen index); a new batch
# (+10000-id clones) is scaled, cell-assigned, and PQ-encoded against
# them. The oracle replays the frozen training and the new-batch
# encode bit-for-bit.
# ---------------------------------------------------------------------------


def ann_index_add_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_index_add
    from ..sources import parallelize

    emb = parallelize(table(spark, sf_dir, "embeddings"))
    base = emb.select("vec_id", "embedding")
    new = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    return pq_index_add(base, new, n_sub=4, k_every=50, iters=2, k_cap=100, coarse_every=25)


def _ann_add_sql(
    n_sub: int = 4, k_every: int = 50, iters: int = 2, k_cap: int = 100, coarse_every: int = 25
) -> str:
    def dist(x: str, c: str, xf: str = "sc", cf: str = "cv") -> str:
        return (
            f"(list_sum(list_transform(range(1, len({x}.{xf}) + 1), "
            f"i -> ({x}.{xf}[i] - {c}.{cf}[i])::BIGINT * "
            f"({x}.{xf}[i] - {c}.{cf}[i])::BIGINT)))::BIGINT"
        )

    w = f"(len(codes) // {n_sub})"
    ctes = [
        "baseall AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        (
            "newb AS (SELECT vec_id + 10000 AS vec_id, embedding::DOUBLE[] AS e "
            "FROM embeddings WHERE vec_id % 5 = 0)"
        ),
        (
            "g AS (SELECT CASE WHEN max(list_max(list_transform(e, x -> abs(x)))) > 0 "
            "THEN max(list_max(list_transform(e, x -> abs(x)))) / 127.0 ELSE 1.0 END AS scale "
            "FROM baseall)"
        ),
        (
            "vb AS (SELECT vec_id, list_transform(e, x -> floor(x / scale + 0.5)::INTEGER) AS codes "
            "FROM baseall, g)"
        ),
        (
            "vn AS (SELECT vec_id, list_transform(e, x -> floor(x / scale + 0.5)::INTEGER) AS codes "
            "FROM newb, g)"
        ),
        (
            f"cc AS (SELECT vec_id AS ccid, codes AS ccv FROM vb "
            f"WHERE vec_id % {coarse_every} = 0 AND vec_id < {coarse_every * k_cap})"
        ),
        (
            f"cellassign AS (SELECT vec_id, ccid AS cell FROM ("
            f"SELECT x.vec_id, cc.ccid, {dist('x', 'cc', 'codes', 'ccv')} AS d2, "
            f"row_number() OVER (PARTITION BY x.vec_id "
            f"ORDER BY {dist('x', 'cc', 'codes', 'ccv')}, cc.ccid) AS rn "
            f"FROM vn x, cc) WHERE rn = 1)"
        ),
        (
            f"subsb AS (SELECT vec_id, s.sub, codes[s.sub * {w} + 1 : (s.sub + 1) * {w}] AS sc "
            f"FROM vb, (SELECT unnest(range(0, {n_sub})) AS sub) s)"
        ),
        (
            f"subsn AS (SELECT vec_id, s.sub, codes[s.sub * {w} + 1 : (s.sub + 1) * {w}] AS sc "
            f"FROM vn, (SELECT unnest(range(0, {n_sub})) AS sub) s)"
        ),
        (
            f"c0 AS (SELECT sub, vec_id AS cid, sc AS cv FROM subsb "
            f"WHERE vec_id % {k_every} = 0 AND vec_id < {k_every * k_cap})"
        ),
    ]
    for i in range(1, iters + 1):
        ctes += [
            (
                f"a{i} AS (SELECT x.vec_id, x.sub, x.sc, c.cid, {dist('x', 'c')} AS d2 "
                f"FROM subsb x JOIN c{i - 1} c USING (sub))"
            ),
            (
                f"s{i} AS (SELECT vec_id, sub, sc, cid FROM ("
                f"SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn "
                f"FROM a{i}) WHERE rn = 1)"
            ),
            (
                f"m{i} AS (SELECT sub, cid, u.i - 1 AS pos, "
                f"floor(sum(sc[u.i])::DOUBLE / count(*))::INT AS m "
                f"FROM s{i}, unnest(range(1, len(sc) + 1)) AS u(i) GROUP BY sub, cid, u.i)"
            ),
            (
                f"c{i} AS (SELECT sub, cid, list(m ORDER BY pos) AS cv FROM m{i} "
                f"GROUP BY sub, cid)"
            ),
        ]
    ctes.append(
        f"enc AS (SELECT vec_id, sub, cid, d2 FROM ("
        f"SELECT x.vec_id, x.sub, c.cid, {dist('x', 'c')} AS d2, "
        f"row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY {dist('x', 'c')}, c.cid) AS rn "
        f"FROM subsn x JOIN c{iters} c USING (sub)) WHERE rn = 1)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT e.vec_id, ca.cell, e.sub, e.cid AS code_id, e.d2 AS sq_dist\n"
        "FROM enc e JOIN cellassign ca USING (vec_id)"
    )


ANN_INDEX_ADD_SQL = _ann_add_sql()


# ---------------------------------------------------------------------------
# Data-quality constraint gate over orders: row-local rules fold into
# one scan; uniqueness and referential integrity add one keyed agg /
# anti-join each. Oracle recomputes every violation count.
# ---------------------------------------------------------------------------


def quality_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import check_constraints

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return check_constraints(
        orders,
        not_null=("o_custkey", "o_orderdate"),
        ranges={"o_totalprice": (0.0, 1_000_000.0)},
        accepted={"o_orderstatus": ("F", "O", "P")},
        unique=(("o_orderkey",),),
        references={"o_custkey": (cust, "c_custkey")},
    )


QUALITY_GATE_SQL = """
WITH v AS (
  SELECT
    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS nn_ck,
    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT AS nn_od,
    sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0 OR o_totalprice > 1000000.0
        THEN 1 ELSE 0 END)::BIGINT AS rng,
    sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END)::BIGINT AS acc
  FROM orders
), uq AS (
  SELECT coalesce(sum(n - 1), 0)::BIGINT AS d
  FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey) WHERE n > 1
), rf AS (
  SELECT count(*)::BIGINT AS o FROM orders
  WHERE o_custkey IS NOT NULL AND o_custkey NOT IN (SELECT c_custkey FROM customer)
)
SELECT t.rule, t.col, t.n_violations
FROM (
  SELECT 'accepted_values' AS rule, 'o_orderstatus' AS col, (SELECT acc FROM v) AS n_violations
  UNION ALL SELECT 'not_null', 'o_custkey', (SELECT nn_ck FROM v)
  UNION ALL SELECT 'not_null', 'o_orderdate', (SELECT nn_od FROM v)
  UNION ALL SELECT 'range', 'o_totalprice', (SELECT rng FROM v)
  UNION ALL SELECT 'references', 'o_custkey', (SELECT o FROM rf)
  UNION ALL SELECT 'unique', 'o_orderkey', (SELECT d FROM uq)
) t
"""


# ---------------------------------------------------------------------------
# ANALYZE-style table profile: per-column row/null counts + HLL
# distinct-count estimates over lineitem, all columns profiled in ONE
# unioned pass (column name rides as the group key, so the HLL layer
# is the existing per-group operator unchanged). Restricted to
# integer/string columns whose string form is engine-identical (a
# double's string rendering is not).
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus")


def table_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from ..operators.sketches import hll_estimate, hll_registers

    li = table(spark, sf_dir, "lineitem")
    stacked = reduce(
        lambda a, b: a.unionAll(b),
        [
            li.select(
                F.lit(c).alias("col"), F.col(c).cast("string").alias("val")
            )
            for c in _PROFILE_COLS
        ],
    )
    counts = stacked.groupBy("col").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
    )
    ndv = hll_estimate(
        hll_registers(stacked.filter(F.col("val").isNotNull()), "col", "val"), "col"
    )
    return counts.join(ndv, "col").select(
        "col", "n_rows", "n_null", "n_buckets_used", "inv_sum_scaled",
        F.col("est_distinct").alias("est_ndv"),
    )


TABLE_PROFILE_SQL = """
WITH stacked AS (
  SELECT 'l_orderkey' AS col, l_orderkey::VARCHAR AS val FROM lineitem
  UNION ALL SELECT 'l_suppkey', l_suppkey::VARCHAR FROM lineitem
  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
), counts AS (
  SELECT col, count(*)::BIGINT AS n_rows,
         sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null
  FROM stacked GROUP BY col
), base AS (
  SELECT col, ('0x' || substr(md5(val), 1, 15))::BIGINT AS h
  FROM stacked WHERE val IS NOT NULL
), reg AS (
  SELECT col, (h % 64)::INT AS bucket,
         max(CASE WHEN h // 64 > 0 THEN 55 - length(format('{:b}', h // 64))
                  ELSE 55 END)::INT AS register
  FROM base GROUP BY col, h % 64
), agg AS (
  SELECT col, count(*) AS n_buckets_used,
         sum(1::BIGINT << (55 - register))::BIGINT AS used_inv
  FROM reg GROUP BY col
)
SELECT c.col, c.n_rows, c.n_null,
       a.n_buckets_used::BIGINT AS n_buckets_used,
       (a.used_inv + (64 - a.n_buckets_used) * (1::BIGINT << 55))::BIGINT AS inv_sum_scaled,
       round(2905.460551022604 * (1::BIGINT << 55)::DOUBLE
             / (a.used_inv + (64 - a.n_buckets_used) * (1::BIGINT << 55))::DOUBLE,
             4) AS est_ndv
FROM counts c JOIN agg a ON a.col = c.col
"""
