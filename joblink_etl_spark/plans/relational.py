"""Core relational query plans over the TPC-H-ish driver tables.

These exercise the engine's relational operator surface — scans,
filters, equi-joins (broadcast + shuffle), aggregations, windows,
anti/semi joins, top-k — the generalized forms of the reference's key
lookups and existence checks (SURVEY.md §2.3-§2.6).

Scale notes (100 TB design):
- Dimension tables (region/nation/customer/supplier/part) are
  broadcast-joined explicitly; the fact tables (lineitem/orders)
  shuffle only when the aggregation key demands it.
- Aggregations are expressed as groupBy().agg() so Catalyst plans
  partial (map-side) aggregation before the shuffle.
- Top-k uses orderBy+limit, which Spark executes as TakeOrdered
  (per-partition heap + driver merge) — no global sort shuffle.
- Float aggregates are rounded in both the Spark plan and the DuckDB
  oracle so parallel-summation order differences don't flip the
  value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Single scan → partial agg → one shuffle on the (tiny) group key.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            # avg as rounded-sum / count: keeps the quotient
            # bit-identical across engines (see events_q.sliding_avg)
            F.round(F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)), 4).alias("avg_qty"),
            F.round(F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1)), 4).alias("avg_price"),
            F.round(F.round(F.sum("l_discount"), 2) / F.count(F.lit(1)), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                            AS sum_qty,
       round(sum(l_extendedprice), 2)                                       AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                    AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)      AS sum_charge,
       round(round(sum(l_quantity), 2) / count(*), 4)                       AS avg_qty,
       round(round(sum(l_extendedprice), 2) / count(*), 4)                  AS avg_price,
       round(round(sum(l_discount), 2) / count(*), 4)                       AS avg_disc,
       count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top-10 orders by revenue in a market segment.

    customer is broadcast (small dim); orders⋈lineitem shuffles on
    l_orderkey; top-k via TakeOrdered, tie-broken on the unique key so
    the result is deterministic across engines.
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


TOP_REVENUE_ORDERS_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style star join: revenue rolled up to nation/region.

    All four dimensions broadcast; the only shuffles are the
    lineitem⋈orders join and the final small-key aggregation.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name", "n_name")
    )


REVENUE_BY_NATION_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k: each customer's 3 highest-value orders.

    One shuffle on o_custkey; rank computed per partition. At scale
    AQE splits skewed customer partitions automatically.
    """
    orders = table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_customer", F.row_number().over(w))
        .filter(F.col("rank_in_customer") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rank_in_customer",
        )
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS totalprice,
       rank_in_customer
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_customer
  FROM orders
)
WHERE rank_in_customer <= 3
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — the reference's enqueue-idempotency primitive
    (J2, reference code-LLM-intergration.js:185-188) generalized:
    customers with no URGENT order in 1995.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT'
                    AND o_orderdate < TIMESTAMP '1996-01-01')
"""


def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — existence check (reference J1/J2 family)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .withColumn("c_acctbal", F.round("c_acctbal", 2))
    )


CUSTOMERS_WITH_OPEN_ORDERS_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def duplicate_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's duplicate highlight (J4/A1: COUNTIFS(...)>1,
    reference docs/setup.md:104-112) as a groupBy-having.

    Key = (custkey, orderstatus, orderpriority) stands in for the
    (canonical, company, role) identity triple.
    """
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey", "o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


DUPLICATE_GUARD_SQL = """
SELECT o_custkey, o_orderstatus, o_orderpriority, count(*) AS dup_count
FROM orders
GROUP BY o_custkey, o_orderstatus, o_orderpriority
HAVING count(*) > 1
"""


def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate (generalized §2.4): order counts by
    status/priority with subtotals; NULL grouping cells normalized to
    'ALL' so both engines hash identically."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "total_price",
        )
    )


ORDER_PRIORITY_ROLLUP_SQL = """
SELECT coalesce(o_orderstatus, 'ALL')   AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*)                          AS n_orders,
       round(sum(o_totalprice), 2)       AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT, §2.6) — parts with no lineitem."""
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp")
    )
    part_keys = part.select("p_partkey")
    ordered_keys = li.select(F.col("l_partkey").alias("p_partkey"))
    return part_keys.exceptAll(ordered_keys.distinct()).join(
        F.broadcast(part), "p_partkey"
    ).select("p_partkey", "p_name", "p_brand")


PARTS_NEVER_ORDERED_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                        WHERE l_shipdate < TIMESTAMP '1995-06-01')
"""


def salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact⋈dim join (operators/skew.py): lineitem
    salted 8 ways against orders, then rolled up per priority. The
    oracle SQL is a PLAIN join — proving salting changes the physical
    partitioning, never the result."""
    from ..operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, "l_orderkey", salt_buckets=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


SALTED_JOIN_AGG_SQL = """
SELECT o_orderpriority,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate with grouping_id: all four subtotal combinations
    of (returnflag, linestatus) in one shuffle — the generalized form
    of the reference's duplicate-count rollup (A1). gid pins which
    cells are aggregates so 'ALL' placeholders stay unambiguous."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            F.col("gid").cast("bigint").alias("gid"),
            "n_items",
            "sum_qty",
        )
    )


LINEITEM_CUBE_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
       count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def customer_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: order counts per customer vs the high-balance
    customer roster — rows survive from either side (customers with
    orders but low balance; high-balance customers with no orders).
    Completes the join-type surface (inner/left/semi/anti/outer)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    a = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    b = cust.select("c_custkey", "c_name")
    return (
        a.join(b, a.o_custkey == b.c_custkey, "full_outer")
        .select(
            F.coalesce("o_custkey", "c_custkey").alias("custkey"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.col("c_name").isNotNull().alias("high_balance"),
        )
        .orderBy("custkey")
    )


CUSTOMER_ORDER_COVERAGE_SQL = """
WITH a AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
), b AS (
  SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
)
SELECT coalesce(o_custkey, c_custkey) AS custkey,
       coalesce(n_orders, 0) AS n_orders,
       c_name IS NOT NULL AS high_balance
FROM a FULL OUTER JOIN b ON o_custkey = c_custkey
ORDER BY custkey
"""


def zorder_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order key over (l_quantity, l_extendedprice) — the
    multi-column clustering key sources/io.zorder_layout sorts by.
    The key arithmetic (double binning + bit interleave) is
    engine-neutral, so the oracle replays it bit-for-bit."""
    from ..sources.io import zorder_key

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return zorder_key(li, ["l_quantity", "l_extendedprice"], bits=10).select(
        "l_orderkey", "l_linenumber", "z_key"
    )


def _zorder_sql(cols: list[str], bits: int) -> str:
    """DuckDB twin of sources/io.zorder_key: identical double binning
    and the same (j*n_cols + k) bit-interleave."""
    lo = {c: f"(SELECT min({c}::DOUBLE) FROM lineitem)" for c in cols}
    hi = {c: f"(SELECT max({c}::DOUBLE) FROM lineitem)" for c in cols}
    n_bins = 1 << bits
    bins = ",\n         ".join(
        f"CASE WHEN {c} IS NULL OR hi_{c} <= lo_{c} THEN 0 "
        f"ELSE least(floor(({c}::DOUBLE - lo_{c}) / (hi_{c} - lo_{c}) * {n_bins}.0), {n_bins - 1}) "
        f"END::BIGINT AS bin_{c}" for c in cols
    )
    bounds = ", ".join(
        f"{lo[c]} AS lo_{c}, {hi[c]} AS hi_{c}" for c in cols
    )
    terms = " | ".join(
        f"(((bin_{c} >> {j}) & 1) << {j * len(cols) + k})"
        for j in range(bits)
        for k, c in enumerate(cols)
    )
    return f"""
WITH b AS (
  SELECT l_orderkey, l_linenumber,
         {bins}
  FROM lineitem, (SELECT {bounds}) bounds
)
SELECT l_orderkey, l_linenumber, ({terms})::BIGINT AS z_key
FROM b
"""


ZORDER_KEY_SQL = _zorder_sql(["l_quantity", "l_extendedprice"], 10)


def hilbert_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Hilbert clustering key over (l_quantity, l_extendedprice)
    — zorder_key's seam-free sibling; the unrolled xy2d integer
    transform is engine-neutral and replayed bit-for-bit."""
    from ..sources.io import hilbert_key

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return hilbert_key(li, ["l_quantity", "l_extendedprice"], bits=8).select(
        "l_orderkey", "l_linenumber", "h_key"
    )


def _hilbert_sql(cols: list[str], bits: int) -> str:
    """DuckDB twin of sources/io.hilbert_key: identical binning, then
    the xy2d levels unrolled as chained CTEs."""
    n_bins = 1 << bits
    lo = {c: f"(SELECT min({c}::DOUBLE) FROM lineitem)" for c in cols}
    hi = {c: f"(SELECT max({c}::DOUBLE) FROM lineitem)" for c in cols}
    bins = ",\n         ".join(
        f"CASE WHEN {c} IS NULL OR hi_{c} <= lo_{c} THEN 0 "
        f"ELSE least(floor(({c}::DOUBLE - lo_{c}) / (hi_{c} - lo_{c}) * {n_bins}.0), {n_bins - 1}) "
        f"END::BIGINT AS bin_{c}"
        for c in cols
    )
    bounds = ", ".join(f"{lo[c]} AS lo_{c}, {hi[c]} AS hi_{c}" for c in cols)
    ctes = [
        f"""b{bits} AS (
  SELECT l_orderkey, l_linenumber,
         bin_{cols[0]} AS hx, bin_{cols[1]} AS hy, 0::BIGINT AS hd
  FROM (
    SELECT l_orderkey, l_linenumber,
         {bins}
    FROM lineitem, (SELECT {bounds}) bounds
  )
)"""
    ]
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        ctes.append(
            f"""b{lvl} AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN ry = 0 AND rx = 1 THEN {n_bins - 1} - hy
              WHEN ry = 0 THEN hy ELSE hx END AS hx,
         CASE WHEN ry = 0 AND rx = 1 THEN {n_bins - 1} - hx
              WHEN ry = 0 THEN hx ELSE hy END AS hy,
         hd + {s * s}::BIGINT * (CASE WHEN rx = 1 AND ry = 0 THEN 3
                                      WHEN rx = 1 AND ry = 1 THEN 2
                                      WHEN rx = 0 AND ry = 1 THEN 1
                                      ELSE 0 END)::BIGINT AS hd
  FROM (
    SELECT *, CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS rx,
              CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS ry
    FROM b{lvl + 1}
  )
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT l_orderkey, l_linenumber, hd AS h_key FROM b0"
    )


HILBERT_KEY_SQL = _hilbert_sql(["l_quantity", "l_extendedprice"], 8)


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: average yearly
    revenue lost if sub-threshold (qty < 0.2 x the part's average)
    orders of one brand moved to bulk. The correlated scalar
    subquery becomes a per-part aggregate joined back to the fact —
    the Catalyst-friendly decorrelation.

    Cross-engine exactness: l_quantity is integer-valued, so the
    threshold `qty < 0.2 * avg(qty)` is spelled 5*qty*cnt < sum_qty —
    all-integer arithmetic in doubles (exact), no float quotient ever
    compared. The revenue output uses the proven round(round(sum,2)/7, 2)
    quotient shape (see pricing_summary).

    Scale: part is the small side (broadcast); the per-part agg is
    map-side-combinable on l_partkey; the fact joins the one-row-
    per-part threshold relation — two broadcast-ready joins, one
    corpus-wide agg. No window, no correlated re-scan."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pt = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select(
        "p_partkey"
    )
    brand_li = li.join(
        F.broadcast(pt), li["l_partkey"] == pt["p_partkey"]
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresh = brand_li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("_sum_qty"),
        F.count(F.lit(1)).cast("bigint").alias("_cnt"),
    )
    small = brand_li.join(thresh, "l_partkey").filter(
        F.lit(5) * F.col("l_quantity") * F.col("_cnt") < F.col("_sum_qty")
    )
    return small.agg(
        F.round(F.round(F.sum("l_extendedprice"), 2) / F.lit(7.0), 2).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_small_lines"),
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#11'
), thresh AS (
  SELECT l_partkey, sum(l_quantity) AS sum_qty, count(*)::BIGINT AS cnt
  FROM brand_li GROUP BY l_partkey
)
SELECT round(round(sum(l.l_extendedprice), 2) / 7.0, 2) AS avg_yearly,
       count(*)::BIGINT AS n_small_lines
FROM brand_li l JOIN thresh t ON l.l_partkey = t.l_partkey
WHERE 5 * l.l_quantity * t.cnt < t.sum_qty
"""


def sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style blame query (adapted to this schema's
    l_returnflag in place of commit/receipt dates): suppliers who
    were the ONLY supplier with returned ('R') lines in a
    multi-supplier order — the supplier you chase. The classic
    EXISTS (another supplier in the order) AND NOT EXISTS (another
    supplier with a return) pair, decorrelated into two per-order
    aggregates.

    Scale: both aggregates are map-side-combinable counts over the
    distinct (order, supplier) projection; no correlated re-scan, no
    window, and the supplier dimension broadcasts. No LIMIT — the
    full deterministic set returns (LIMIT over count ties is
    engine-order-dependent)."""
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    rpairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi = (
        pairs.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_n_supp"))
        .filter(F.col("_n_supp") >= 2)
        .select("l_orderkey")
    )
    solo_r = (
        rpairs.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_n_r"))
        .filter(F.col("_n_r") == 1)
        .select("l_orderkey")
    )
    blamed = rpairs.join(multi, "l_orderkey").join(solo_r, "l_orderkey")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


SOLE_RETURNED_SUPPLIER_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), rpairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
), multi AS (
  SELECT l_orderkey FROM pairs GROUP BY 1 HAVING count(*) >= 2
), solo_r AS (
  SELECT l_orderkey FROM rpairs GROUP BY 1 HAVING count(*) = 1
)
SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait
FROM rpairs
JOIN multi USING (l_orderkey)
JOIN solo_r USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
"""


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: the supplier(s) whose total
    discounted revenue equals the global maximum — the view + max
    correlated pattern, decorrelated into one aggregate and a
    broadcast one-row max join.

    Cross-engine exactness: revenue is accumulated as exact integer
    CENTI-CENTS — cents = round(l_extendedprice·100) and
    keep_pct = 100 − round(l_discount·100) are both exact integers,
    so Σ cents·keep_pct is order-independent where a double sum's
    last ulp (and therefore an argmax tie at the top) is not. The
    one float division to display dollars happens after the compare.

    Scale: one map-side-combinable groupBy on l_suppkey; the global
    max is a broadcast one-row aggregate; supplier broadcasts."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("_cc"),
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("_cc").cast("bigint").alias("rev_cc"))
    mx = rev.agg(F.max("rev_cc").alias("_mx"))
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_cc") == F.col("_mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            "rev_cc",
            F.round(F.col("rev_cc").cast("double") / F.lit(10000.0), 2).alias(
                "total_revenue"
            ),
        )
    )


TOP_REVENUE_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(round(l_extendedprice * 100)::BIGINT
             * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS rev_cc
  FROM lineitem GROUP BY l_suppkey
), mx AS (SELECT max(rev_cc) AS m FROM rev)
SELECT s_suppkey, s_name, rev_cc,
       round(rev_cc::DOUBLE / 10000.0, 2) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey, mx
WHERE rev_cc = mx.m
"""


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style volume shipping: discounted revenue flowing
    between two trading nations (supplier nation ↔ customer nation,
    both directions) per ship year.

    Cross-engine exactness: revenue accumulates as exact integer
    CENTI-CENTS (the Q15 idiom — cents·keep_pct bigints), so the
    group sums are order-independent; dollars are derived after.

    Scale: the only big shuffle is lineitem⋈orders on the order key;
    supplier, customer and nation broadcast (the nation-pair filter
    prunes the dims BEFORE the broadcast, so the lineitem side is
    filtered by the join itself). Group key is (nation, nation,
    year) — tiny."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("_cc"),
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(1, 2))
        .select("s_suppkey", F.col("s_nationkey").alias("_sn"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(1, 2))
        .select("c_custkey", F.col("c_nationkey").alias("_cn"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("_sn") != F.col("_cn"))
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "supp_nation")),
            F.col("_sn") == F.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "cust_nation")),
            F.col("_cn") == F.col("n_nationkey"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("_cc").cast("bigint").alias("rev_cc"))
        .select(
            "supp_nation",
            "cust_nation",
            F.col("l_year").cast("bigint").alias("l_year"),
            "rev_cc",
            F.round(F.col("rev_cc").cast("double") / 10000.0, 2).alias("revenue"),
        )
    )


VOLUME_SHIPPING_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS rev_cc,
       round(sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::DOUBLE / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE s_nationkey IN (1, 2) AND c_nationkey IN (1, 2)
  AND s_nationkey <> c_nationkey
GROUP BY 1, 2, 3
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share per ship month: what
    fraction of discounted revenue came from PROMO-type parts.

    The share is a QUOTIENT — the dangerous class — so it's computed
    as integer round-half-up basis points over exact centi-cent
    sums: (2·promo_cc·10000 + total_cc) div (2·total_cc), both
    operands non-negative (div == floor == the DuckDB // spelling).

    Scale: part broadcasts into the lineitem scan (one projection +
    map-side-combined groupBy(year, month)); no other shuffle."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("l_year"),
        F.month("l_shipdate").alias("l_month"),
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("_cc"),
    )
    part = table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("_promo")
    )
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_year", "l_month")
        .agg(
            F.sum(F.when(F.col("_promo"), F.col("_cc")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("promo_cc"),
            F.sum("_cc").cast("bigint").alias("total_cc"),
        )
    )
    return agg.select(
        F.col("l_year").cast("bigint").alias("l_year"),
        F.col("l_month").cast("bigint").alias("l_month"),
        "promo_cc",
        "total_cc",
        F.expr("(2 * promo_cc * 10000 + total_cc) div (2 * total_cc)").alias(
            "promo_bp"
        ),
    )


PROMO_REVENUE_SHARE_SQL = """
WITH agg AS (
  SELECT year(l_shipdate)::BIGINT AS l_year, month(l_shipdate)::BIGINT AS l_month,
         sum(CASE WHEN p_type = 'PROMO'
                  THEN round(l_extendedprice * 100)::BIGINT
                       * (100 - round(l_discount * 100)::BIGINT)
                  ELSE 0 END)::BIGINT AS promo_cc,
         sum(round(l_extendedprice * 100)::BIGINT
             * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS total_cc
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT l_year, l_month, promo_cc, total_cc,
       (2 * promo_cc * 10000 + total_cc) // (2 * total_cc) AS promo_bp
FROM agg
"""


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume customers: orders whose total
    line quantity exceeds 150 units, with the owning customer.

    The IN-(grouped-HAVING-subquery) of the spec is decorrelated
    into one map-side-combined groupBy(l_orderkey) + threshold
    filter, then ordinary keyed joins back to orders and customer.
    l_quantity is integral in this corpus (checked) so the sum is an
    exact bigint.

    Scale: quantity rollup shuffles on the order key once; the
    orders join reuses that key; customer broadcasts at test SFs and
    becomes a keyed shuffle at cluster scale (AQE decides)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.round("l_quantity").cast("bigint").alias("_q")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("_q").cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
    )


LARGE_VOLUME_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, sum(round(l_quantity)::BIGINT)::BIGINT AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive-predicate revenue: an OR of three
    (brand, size-range, quantity-range) conjuncts — the classic test
    that a planner pushes a disjunction into the scan instead of
    materializing the join first (Catalyst pushes the part-side
    prefilter `p_size >= 1 AND (brand conjuncts)` below the join and
    AQE broadcasts the filtered part side).

    One row out: exact centi-cent revenue + the qualifying item
    count."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round("l_quantity").cast("bigint").alias("_q"),
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("_cc"),
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("_q").between(1, 11))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(1, 25) & F.col("_q").between(10, 20))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 35) & F.col("_q").between(20, 30))
    )
    return j.filter(cond).agg(
        F.sum("_cc").cast("bigint").alias("rev_cc"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


DISJUNCTIVE_REVENUE_SQL = """
SELECT sum(round(l_extendedprice * 100)::BIGINT
           * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS rev_cc,
       count(*)::BIGINT AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND round(l_quantity)::BIGINT BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 25
       AND round(l_quantity)::BIGINT BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
       AND round(l_quantity)::BIGINT BETWEEN 20 AND 30)
"""


def acctbal_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style prospects: customers whose account balance is
    above the average positive balance AND who have gone DORMANT (no
    order since 2000-01-01 — every customer in this corpus has
    ordered at least once, so the spec's never-ordered anti-join
    would be vacuously empty; dormancy keeps the shape and makes the
    result non-trivial), rolled up by a synthetic country code
    (c_custkey % 10 — this corpus has no phone column).

    The correlated scalar-avg compare is spelled WITHOUT a float
    quotient: bal_c · n_pos > sum_pos_c over exact integer cents —
    the broadcast one-row aggregate replaces the correlated
    subquery, and the anti-join replaces NOT EXISTS.

    Scale: one-row positive-balance aggregate broadcasts; the
    anti-join shuffles customer vs the DISTINCT o_custkey side
    (both map-side combinable); final rollup is 10 groups."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("_bal_c"),
    )
    pos = cust.filter(F.col("_bal_c") > 0).agg(
        F.sum("_bal_c").cast("bigint").alias("_sum_pos"),
        F.count(F.lit(1)).cast("bigint").alias("_n_pos"),
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("_bal_c") * F.col("_n_pos") > F.col("_sum_pos"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            F.sum("_bal_c").cast("bigint").alias("total_bal_c"),
        )
        .select(
            "cntrycode",
            "n_cust",
            "total_bal_c",
            F.round(F.col("total_bal_c").cast("double") / 100.0, 2).alias(
                "total_bal"
            ),
        )
    )


ACCTBAL_PROSPECTS_SQL = """
WITH c AS (
  SELECT c_custkey, round(c_acctbal * 100)::BIGINT AS bal_c FROM customer
), pos AS (
  SELECT sum(bal_c)::BIGINT AS sum_pos, count(*)::BIGINT AS n_pos
  FROM c WHERE bal_c > 0
)
SELECT c_custkey % 10 AS cntrycode,
       count(*)::BIGINT AS n_cust,
       sum(bal_c)::BIGINT AS total_bal_c,
       round(sum(bal_c)::DOUBLE / 100.0, 2) AS total_bal
FROM c, pos
WHERE bal_c * n_pos > sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Round 9 batch 3: the remaining classic TPC-H shapes expressible on
# this corpus (no partsupp table; no l_shipmode/commitdate/
# receiptdate — the Q4/Q12 lateness predicates are adapted onto the
# l_shipdate − o_orderdate lag). Money stays exact integer
# centi-cents; every quotient is round-half-up integer basis points.
# ---------------------------------------------------------------------------


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecast revenue: sum(extendedprice * discount)
    over one ship year, a discount band and a quantity cap — the
    classic pushed-scan single-aggregate (no join at all; the filter
    and the 3-column projection must reach the parquet scan).
    Discounts are exact 0.01 steps in this corpus, so the band is
    compared on round(discount*100) integers, and revenue
    accumulates as cents × pct (an exact bigint)."""
    li = table(spark, sf_dir, "lineitem")
    d = F.round(F.col("l_discount") * 100).cast("bigint")
    sel = li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & d.between(5, 7)
        & (F.round("l_quantity").cast("bigint") < 24)
    )
    return sel.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint") * d)
        .cast("bigint")
        .alias("forecast_cc"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    ).select(
        "forecast_cc",
        "n_items",
        F.round(F.col("forecast_cc").cast("double") / 10000.0, 2).alias(
            "forecast_revenue"
        ),
    )


FORECAST_REVENUE_SQL = """
SELECT sum(round(l_extendedprice * 100)::BIGINT
           * round(l_discount * 100)::BIGINT)::BIGINT AS forecast_cc,
       count(*)::BIGINT AS n_items,
       round(sum(round(l_extendedprice * 100)::BIGINT
                 * round(l_discount * 100)::BIGINT)::DOUBLE / 10000.0, 2)
         AS forecast_revenue
FROM lineitem
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  AND round(l_discount * 100)::BIGINT BETWEEN 5 AND 7
  AND round(l_quantity)::BIGINT < 24
"""


def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check, lateness adapted to this
    corpus's columns: count Q1-1997 orders per priority where EXISTS
    a lineitem shipped more than 60 days after the order date. The
    EXISTS decorrelates to a LEFT SEMI join whose condition mixes
    the orderkey equi-key with the lag inequality — Spark plans the
    equi part as the shuffle key and applies the lag as a join
    residual, exactly what the spec's correlated subquery needs."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    # derived scan-side prefilter: a line item shipped >60 days after
    # an order placed on/after 1997-01-01 must ship after 1997-03-02
    # — implied by the join predicate (semantic no-op), but it reaches
    # the parquet scan and cuts the semi-join shuffle ~20x
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-03-02"
    ).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (F.datediff(li.l_shipdate, orders.o_orderdate) > 60),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_late_orders"))
    )


LATE_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*)::BIGINT AS n_late_orders
FROM orders o
WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND datediff('day', o.o_orderdate, l.l_shipdate) > 60)
GROUP BY o_orderpriority
"""


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: within AMERICA-region
    customers and MEDIUM-type parts, the share of yearly discounted
    revenue supplied by NATION_1, in round-half-up basis points over
    exact centi-cent sums.

    Scale: lineitem⋈orders is the one big shuffle (orderkey);
    part/supplier/customer/nation/region all broadcast, and the
    region+type filters prune the fact rows through the joins."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("_cc"),
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "MEDIUM").select(
        "p_partkey"
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nat = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", (F.col("n_name") == "NATION_1").alias("_target"))
    )
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_nat), orders.o_custkey == cust_nat.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("_target"), F.col("_cc")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("nation_cc"),
            F.sum("_cc").cast("bigint").alias("total_cc"),
        )
    )
    return agg.select(
        F.col("o_year").cast("bigint").alias("o_year"),
        "nation_cc",
        "total_cc",
        F.expr("(2 * nation_cc * 10000 + total_cc) div (2 * total_cc)").alias(
            "mkt_share_bp"
        ),
    )


NATION_MARKET_SHARE_SQL = """
WITH agg AS (
  SELECT year(o_orderdate)::BIGINT AS o_year,
         sum(CASE WHEN sn.n_name = 'NATION_1'
                  THEN round(l_extendedprice * 100)::BIGINT
                       * (100 - round(l_discount * 100)::BIGINT)
                  ELSE 0 END)::BIGINT AS nation_cc,
         sum(round(l_extendedprice * 100)::BIGINT
             * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS total_cc
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = 'MEDIUM' AND r_name = 'AMERICA'
  GROUP BY 1
)
SELECT o_year, nation_cc, total_cc,
       (2 * nation_cc * 10000 + total_cc) // (2 * total_cc) AS mkt_share_bp
FROM agg
"""


def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report: the 20 customers losing
    the most revenue to returns (l_returnflag = 'R') on orders
    placed in one quarter, with their nation. Top-k is deterministic
    (revenue desc, custkey asc tie-break) and exact (centi-cents)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("_cc"),
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    ).select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("_cc").cast("bigint").alias("lost_cc"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "lost_cc",
            F.round(F.col("lost_cc").cast("double") / 10000.0, 2).alias(
                "lost_revenue"
            ),
        )
        .orderBy(F.col("lost_cc").desc(), "c_custkey")
        .limit(20)
    )


RETURNED_ITEM_REPORT_SQL = """
WITH lost AS (
  SELECT o_custkey, sum(round(l_extendedprice * 100)::BIGINT
             * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS lost_cc
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_name AS nation,
       round(c_acctbal, 2) AS c_acctbal, lost_cc,
       round(lost_cc::DOUBLE / 10000.0, 2) AS lost_revenue
FROM lost
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY lost_cc DESC, c_custkey
LIMIT 20
"""


def shiplag_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style shipping-delay audit, the shipmode dimension
    adapted to this corpus's ship-lag buckets (early < 30 days,
    standard 30-90, late > 90 between order and ship date): per
    bucket, how many line items belong to critical-priority orders
    (1-URGENT / 2-HIGH) vs the rest for one ship year — the classic
    conditional two-count aggregate over one join."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lag < 30, F.lit("early"))
        .when(lag <= 90, F.lit("standard"))
        .otherwise(F.lit("late"))
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(bucket.alias("lag_bucket"), crit.alias("_crit"))
        .groupBy("lag_bucket")
        .agg(
            F.sum(F.when(F.col("_crit"), 1).otherwise(0))
            .cast("bigint")
            .alias("critical_count"),
            F.sum(F.when(F.col("_crit"), 0).otherwise(1))
            .cast("bigint")
            .alias("normal_count"),
        )
    )


SHIPLAG_PRIORITY_COUNTS_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 30 THEN 'early'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'standard'
            ELSE 'late' END AS lag_bucket,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS critical_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS normal_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
GROUP BY 1
"""


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit, completing the classic
    family (r9 verdict item 4). This corpus has no partsupp, so the
    line's cost basis is the part's list price (p_retailprice ×
    quantity) instead of ps_supplycost — the join/agg shape is
    unchanged: per (supplier nation, order year), exact centi-cent
    profit on '%gear%' parts. Profit can be negative, so the output
    stays a pure integer sum (no division — signed integer division
    never crosses engines safely).

    Scale: the '%gear%' filter prunes part BEFORE its broadcast;
    lineitem⋈orders is the only big shuffle (orderkey); supplier⋈
    nation broadcasts. Five-table join, two broadcast sides."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("_rev_cc"),
        F.col("l_quantity").cast("bigint").alias("_qty"),
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select(
            "p_partkey",
            (F.round(F.col("p_retailprice") * 100).cast("bigint") * 100).alias(
                "_unit_cost_cc"
            ),
        )
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("bigint").alias("o_year")
    )
    supp_nat = (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .groupBy("nation", "o_year")
        .agg(
            F.sum(F.col("_rev_cc") - F.col("_unit_cost_cc") * F.col("_qty"))
            .cast("bigint")
            .alias("profit_cc")
        )
    )


PRODUCT_TYPE_PROFIT_SQL = """
SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
       sum(round(l_extendedprice*100)::BIGINT * (100 - round(l_discount*100)::BIGINT)
           - round(p_retailprice*100)::BIGINT * 100 * l_quantity::BIGINT)::BIGINT
         AS profit_cc
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
"""


def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important stock: per part, the exact
    centi-cent value shipped by EUROPE-region suppliers; keep parts
    whose value exceeds 1.5× the mean part value. Q11's fixed
    fraction is SF-dependent by construction (TPC-H scales it as
    0.0001/SF); a threshold relative to the MEAN is the SF-invariant
    adaptation (verified non-empty at sf0.001/0.01/0.1), and the
    comparison stays in exact integers (value·n·2 > 3·total).

    Scale: the supplier-region filter broadcasts into the lineitem
    scan as a semi-join; ONE corpus shuffle (partkey groupBy with
    map-side combine); the threshold is a one-row aggregate
    cross-joined in — the decorrelated spelling of Q11's scalar
    subquery."""
    euro = (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation")
                .join(
                    F.broadcast(
                        table(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    val = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            (
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
            ).alias("_cc"),
        )
        .join(
            F.broadcast(euro),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum("_cc").cast("bigint").alias("value_cc"))
    )
    tot = val.agg(
        F.sum("value_cc").cast("bigint").alias("_total_cc"),
        F.count(F.lit(1)).cast("bigint").alias("_n_parts"),
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cc") * F.col("_n_parts") * 2 > 3 * F.col("_total_cc"))
        .select(
            "p_partkey",
            "value_cc",
            F.expr(
                "(2 * value_cc * 10000 + _total_cc) div (2 * _total_cc)"
            ).alias("share_bp"),
        )
    )


IMPORTANT_STOCK_SQL = """
WITH euro AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
val AS (
  SELECT l_partkey AS p_partkey,
         sum(round(l_extendedprice*100)::BIGINT
             * (100 - round(l_discount*100)::BIGINT))::BIGINT AS value_cc
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM euro)
  GROUP BY 1
),
tot AS (SELECT sum(value_cc)::BIGINT AS total_cc, count(*)::BIGINT AS n_parts FROM val)
SELECT p_partkey, value_cc,
       (2 * value_cc * 10000 + total_cc) // (2 * total_cc) AS share_bp
FROM val, tot
WHERE value_cc * n_parts * 2 > 3 * total_cc
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer distribution: how many customers
    placed exactly k qualifying orders (urgent-priority orders from
    1999 on — this corpus's analogue of Q13's comment-pattern
    exclusion), INCLUDING k = 0. The defining shape is the group-by
    over a left-join-with-zero-count: every customer has orders here
    (r8 lesson), so zeros only exist if the count is taken over the
    left join's matched side, not the order table.

    Scale: orders pre-aggregate to per-customer counts (map-side
    combine) before the customer join on custkey; the final
    histogram aggregate is tiny. No broadcast of the counts side —
    it scales with |customers|, so the join shuffles on the key (AQE
    broadcasts it at test SF)."""
    qualifying = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1999-01-01")
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_cnt"))
    )
    per_cust = (
        table(spark, sf_dir, "customer")
        .select("c_custkey")
        .join(qualifying, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("_cnt"), F.lit(0)).cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey
   AND o_orderpriority = '1-URGENT'
   AND o_orderdate >= '1999-01-01'
  GROUP BY c_custkey
)
SELECT c_count, count(*)::BIGINT AS custdist
FROM per_cust
GROUP BY c_count
"""


def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier-part relationship: for selected
    (brand, type, size) part classes, how many DISTINCT suppliers
    actually shipped them — partsupp is derived from lineitem (the
    shipped supplier↔part pairs), and Q16's complaint exclusion
    becomes the low-acctbal supplier set (s_acctbal < 2500,
    non-empty at every SF), spelled as the same NOT-IN anti-join.

    Scale: part filter prunes before broadcast; the exclusion set is
    a broadcast anti-join; count(DISTINCT supplier) per class is the
    one shuffle (partial distinct on the map side)."""
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 2500
    ).select("s_suppkey")
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


SUPPLIER_PART_VARIETY_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2500)
GROUP BY 1, 2, 3
"""


def promo_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style potential promotion: EUROPE suppliers who, for
    some '%bolt%' part, concentrated more than half of their
    all-time shipped quantity of that part into 1997 — the derived-
    partsupp adaptation of Q20's availqty > ½·yearly-shipments
    doubly-nested subquery. The ORACLE keeps Q20's nested spelling
    (correlated EXISTS over a per-part HAVING between the two
    aggregates); the Spark plan is the hand-DECORRELATED form — both
    per-pair aggregates fold into ONE conditional groupBy — so a
    green hash certifies the decorrelation itself (two different
    algorithms hashing identically, the r8 hierarchy-rollup trick).

    Scale: bolt-part semi-join broadcasts into the lineitem scan;
    one shuffle on (suppkey, partkey) with map-side combine; the
    supplier/nation/region dimensions broadcast onto the surviving
    pair keys."""
    bolt = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    in_97 = (F.col("l_shipdate") >= "1997-01-01") & (
        F.col("l_shipdate") < "1998-01-01"
    )
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(F.broadcast(bolt), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("_qty_all"),
            F.sum(
                F.when(in_97, F.col("l_quantity").cast("bigint")).otherwise(F.lit(0))
            ).alias("_qty_97"),
        )
        .filter(2 * F.col("_qty_97") > F.col("_qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    euro_supp = (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation")
                .join(
                    F.broadcast(
                        table(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return euro_supp.join(
        F.broadcast(pairs), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


PROMO_STOCK_SUPPLIERS_SQL = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND EXISTS (
  SELECT 1 FROM lineitem l JOIN part ON l.l_partkey = p_partkey
  WHERE p_name LIKE '%bolt%' AND l.l_suppkey = s_suppkey
  GROUP BY l.l_partkey
  HAVING 2 * sum(CASE WHEN l.l_shipdate >= '1997-01-01'
                       AND l.l_shipdate < '1998-01-01'
                      THEN l.l_quantity::BIGINT ELSE 0 END)
         > sum(l.l_quantity::BIGINT)
)
"""
