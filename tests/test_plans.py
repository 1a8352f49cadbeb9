"""Physical-plan regression tests: the scale properties we claim
(broadcast dims, filter pushdown, column pruning, bucketed
shuffle-free joins, skew salting) asserted against `.explain`
output, so a refactor that silently degrades the plan fails CI."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from joblink_etl_spark.plans import relational as R

SF_SMALL = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_star_join_broadcasts_all_dims(spark):
    plan = plan_of(R.revenue_by_nation(spark, SF_SMALL))
    # customer, nation, region all broadcast; only the fact join and
    # the final agg may shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    assert "AdaptiveSparkPlan" in plan


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    plan = plan_of(R.pricing_summary(spark, SF_SMALL))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "l_shipdate" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
    # Q1 touches 7 of 16 lineitem columns; the scan must not read the
    # wide comment column
    assert "l_comment" not in plan


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Pre-bucketing both sides on the join key is the co-location
    strategy for repeated 100 TB joins: the shuffle happens once at
    write time, then every join is exchange-free."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    for name, df, key in (("t_orders_b", orders, "o_orderkey"), ("t_li_b", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(4, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_li_b").join(
            spark.table("t_orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-locates both sides
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_li_b")


def test_salted_join_matches_plain_join_on_hot_key(spark):
    from joblink_etl_spark.operators.skew import salted_join

    # 90% of fact rows share one hot key — the scenario salting exists for
    fact = spark.createDataFrame(
        [(1 if i % 10 else i, float(i)) for i in range(1000)], ["k", "v"]
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(0, 1000, 10)], ["k", "name"])
    got = salted_join(fact, dim, "k", salt_buckets=4)
    want = fact.join(dim, "k")
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    # the physical join key is (k, _salt): the hot key's rows are
    # spread over 4 shuffle partitions
    assert "_salt" in plan_of(got)


def test_salted_join_left_keeps_unmatched(spark):
    from joblink_etl_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    dim = spark.createDataFrame([(1, "d1")], ["k", "name"])
    rows = {tuple(r) for r in salted_join(fact, dim, "k", how="left").collect()}
    assert rows == {(1, "a", "d1"), (2, "b", None)}


def test_optimize_layout_range_partitions_and_sorts(spark):
    from joblink_etl_spark.sources.io import optimize_layout

    df = spark.createDataFrame([(i % 7, i) for i in range(100)], ["k", "v"])
    out = optimize_layout(df, ["k"], n_partitions=4)
    plan = plan_of(out, mode="extended")
    assert "RepartitionByExpression" in plan or "rangepartitioning" in plan.lower()
    assert "Sort" in plan
    # content is unchanged
    assert out.count() == 100
    # within every partition, k is nondecreasing
    def check(it):
        ks = [r.k for r in it]
        assert ks == sorted(ks)
        return iter([len(ks)])
    assert sum(out.rdd.mapPartitions(check).collect()) == 100


def test_tfidf_builders_run_no_action_at_construction(spark):
    """Plan construction must be action-free: n_docs is derived
    in-plan (broadcast one-row aggregate), not via an eager count()
    — at scale an eager count is a full extra corpus pass per
    query build."""
    from joblink_etl_spark.plans import ext_q as E

    sc = spark.sparkContext
    group = "tfidf-plan-build-lazy-check"
    sc.setJobGroup(group, "assert no Spark job during plan construction")
    try:
        E.tfidf_pairs(spark, "/root/testdata/sf0.001")
        E.tfidf_top_terms_q(spark, "/root/testdata/sf0.001")
    finally:
        for prop in ("spark.jobGroup.id", "spark.job.description", "spark.job.interruptOnCancel"):
            sc.setLocalProperty(prop, None)
    assert list(sc.statusTracker().getJobIdsForGroup(group)) == []
